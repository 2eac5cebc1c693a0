"""URL normalize/hash/defragment: oracle semantics + Column parity."""

from __future__ import annotations

from hashlib import sha256

from pyspark.sql import functions as F

from spacetime_crawler4py_spark.functions import urlnorm as U
from tests.conftest import URL_CORPUS


def test_normalize_strips_all_trailing_slashes():
    assert U.py_normalize("https://a.ics.uci.edu///") == "https://a.ics.uci.edu"
    assert U.py_normalize("https://a.ics.uci.edu/x") == "https://a.ics.uci.edu/x"
    assert U.py_normalize("https://a.ics.uci.edu") == "https://a.ics.uci.edu"


def test_urlhash_matches_reference_formula():
    # reference: sha256 of "{netloc}/{path}/{params}/{query}/{fragment}"
    # (utils/__init__.py:25-30)
    url = "https://www.ics.uci.edu/a/b;p=1?q=2#f"
    expected = sha256("www.ics.uci.edu//a/b/p=1/q=2/f".encode()).hexdigest()
    assert U.py_urlhash(url) == expected


def test_urlhash_scheme_insensitive_fragment_sensitive():
    assert U.py_urlhash("http://x.ics.uci.edu/p") == U.py_urlhash(
        "https://x.ics.uci.edu/p"
    )
    assert U.py_urlhash("https://x.ics.uci.edu/p#a") != U.py_urlhash(
        "https://x.ics.uci.edu/p#b"
    )


def test_defragment():
    assert U.py_defragment("https://a.ics.uci.edu/p#x#y") == "https://a.ics.uci.edu/p"
    assert U.py_defragment("https://a.ics.uci.edu/p") == "https://a.ics.uci.edu/p"


def test_column_parity(spark):
    df = spark.createDataFrame([(u,) for u in URL_CORPUS], ["url"])
    rows = df.select(
        "url",
        U.col_normalize(F.col("url")).alias("norm"),
        U.col_urlhash(F.col("url")).alias("hash"),
        U.col_defragment(F.col("url")).alias("defrag"),
    ).collect()
    for r in rows:
        assert r["norm"] == U.py_normalize(r["url"]), r["url"]
        assert r["hash"] == U.py_urlhash(r["url"]), r["url"]
        assert r["defrag"] == U.py_defragment(r["url"]), r["url"]


def test_pandas_udf_parity(spark):
    df = spark.createDataFrame([(u,) for u in URL_CORPUS], ["url"])
    rows = df.select(
        "url", U.pdf_urlhash(F.col("url")).alias("hash")
    ).collect()
    for r in rows:
        assert r["hash"] == U.py_urlhash(r["url"])


def test_normalize_idempotent():
    for u in URL_CORPUS:
        assert U.py_normalize(U.py_normalize(u)) == U.py_normalize(u)
