"""is_valid (F1-F4): oracle behavior incl. load-bearing bugs + Column parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from spacetime_crawler4py_spark.functions import validity as V
from tests.conftest import URL_CORPUS


def test_scheme_filter():
    assert not V.py_is_valid("ftp://www.ics.uci.edu/x")
    assert not V.py_is_valid("mailto:a@ics.uci.edu")
    assert V.py_is_valid("http://www.ics.uci.edu/x")
    assert V.py_is_valid("https://www.ics.uci.edu/x")


def test_domain_allowlist_requires_leading_dot():
    # scraper.py:108-112 — apex domain fails, subdomains pass
    assert not V.py_is_valid("https://ics.uci.edu/apex")
    assert V.py_is_valid("https://www.ics.uci.edu/x")
    assert V.py_is_valid("https://sub.domain.ics.uci.edu/x")
    assert not V.py_is_valid("https://example.com/x")
    # the regex is .*(...).* so a host merely CONTAINING the domain passes
    assert V.py_is_valid("https://evil.ics.uci.edu.example.com/x")


def test_trap_filter_never_fires_verbatim():
    # F3 bug: tested against netloc (no '/'), fused alternates →
    # calendar/repeating-dir URLs are NOT filtered (scraper.py:120-125)
    assert V.py_is_valid("https://www.ics.uci.edu/calendar/2023")
    assert V.py_is_valid("https://www.ics.uci.edu/a/b/a/b/")
    # corrected rule DOES fire on the path
    assert not V.py_is_valid(
        "https://www.ics.uci.edu/a/b/a/b/", strict_reference_parity=False
    )
    assert not V.py_is_valid(
        "https://www.ics.uci.edu/events/calendar", strict_reference_parity=False
    )


def test_extension_blacklist_on_path_only():
    assert not V.py_is_valid("https://www.ics.uci.edu/file.pdf")
    assert not V.py_is_valid("https://www.ics.uci.edu/file.PDF")
    assert not V.py_is_valid("https://www.ics.uci.edu/file.tar.gz")
    # query/fragment do not participate
    assert not V.py_is_valid("https://www.ics.uci.edu/style.css?v=3")
    assert V.py_is_valid("https://www.ics.uci.edu/page?f=x.pdf")
    assert V.py_is_valid("https://www.ics.uci.edu/~u/KidneyData.txt")  # .txt allowed


def test_none_href():
    assert not V.py_is_valid(None)


def test_column_parity(spark):
    df = spark.createDataFrame([(u,) for u in URL_CORPUS], ["url"])
    for strict in (True, False):
        rows = df.select(
            "url", V.col_is_valid(F.col("url"), strict).alias("v")
        ).collect()
        for r in rows:
            assert r["v"] == V.py_is_valid(r["url"], strict), (r["url"], strict)


def test_pandas_udf_parity(spark):
    df = spark.createDataFrame([(u,) for u in URL_CORPUS], ["url"])
    rows = df.select("url", V.pdf_is_valid(F.col("url")).alias("v")).collect()
    for r in rows:
        assert r["v"] == V.py_is_valid(r["url"])


def test_trap_path_repetition_parity(spark):
    """col_trap_path_repetition == the pure-Python oracle on the
    adversarial corpus + hand-built trap shapes."""
    from spacetime_crawler4py_spark.functions.validity import (
        col_trap_path_repetition,
        py_trap_path_repetition,
    )
    from tests.conftest import URL_CORPUS

    extra = [
        "https://h.ics.uci.edu/a/b/a/b/a/b",          # seg x3
        "https://h.ics.uci.edu/a/a",                  # x2 — not a trap
        "https://h.ics.uci.edu/" + "/".join(f"p{i}" for i in range(21)),
        "https://h.ics.uci.edu/" + "/".join(f"p{i}" for i in range(20)),
        "https://h.ics.uci.edu/cal/2024/cal/2024/cal",
        "https://h.ics.uci.edu/",                     # empty path
        "https://h.ics.uci.edu/A/a/a",                # case-folded x3
    ]
    urls = [u for u in URL_CORPUS if u is not None] + extra
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {
        r["url"]: r["t"]
        for r in df.select(
            "url", col_trap_path_repetition(F.col("url")).alias("t")
        ).collect()
    }
    for u in urls:
        assert got[u] == py_trap_path_repetition(u), u
    assert got["https://h.ics.uci.edu/a/b/a/b/a/b"] is True
    assert got["https://h.ics.uci.edu/a/a"] is False
    assert got["https://h.ics.uci.edu/A/a/a"] is True
