"""WARC source/sink: framing, determinism, and the text byte-identity
invariant through the WARC path (BASELINE.json input_hint)."""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import os

from pyspark.sql import functions as F

from spacetime_crawler4py_spark.sources.warc import (
    parse_warc,
    read_warc,
    response_record,
    warcinfo_record,
    write_warc,
)


def test_record_roundtrip_unit():
    ts = dt.datetime(2024, 3, 5, 12, 30, 7)
    html = "<html><body>héllo &amp; worlds</body></html>".encode()
    rec = response_record("https://www.ics.uci.edu/a?q=1", ts, html)
    # plain, gzipped, and member-concatenated-with-warcinfo forms
    # all parse to the same single response
    blobs = [
        rec,
        gzip.compress(rec, mtime=0),
        gzip.compress(warcinfo_record("f.warc.gz"), mtime=0)
        + gzip.compress(rec, mtime=0),
    ]
    for blob in blobs:
        out = list(parse_warc(blob))
        assert out == [("https://www.ics.uci.edu/a?q=1", ts, html)]


def test_parse_multi_record_order_and_empty_body():
    ts = dt.datetime(2024, 1, 1)
    recs = [
        response_record(f"https://x.ics.uci.edu/p{i}", ts, f"<p>{i}</p>".encode())
        for i in range(5)
    ]
    recs.insert(0, warcinfo_record("w"))
    out = list(parse_warc(b"".join(recs)))
    assert [u for u, _, _ in out] == [
        f"https://x.ics.uci.edu/p{i}" for i in range(5)
    ]
    # zero-length html survives framing
    rec0 = response_record("https://x.ics.uci.edu/empty", ts, b"")
    assert list(parse_warc(rec0)) == [("https://x.ics.uci.edu/empty", ts, b"")]


def _docs_as_pages(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return d.select(
        F.concat(
            F.lit("https://corpus.example/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id"),
        ).alias("url"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("doc_id").cast("double"))
        ).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")
            ),
            "utf-8",
        ).alias("html"),
    )


def test_write_read_roundtrip(spark, tmp_path):
    src = _docs_as_pages(spark)
    out = str(tmp_path / "warc")
    manifest = write_warc(src, out, n_shards=4)
    assert {m["shard"] for m in manifest} <= set(range(4))
    assert sum(m["n_records"] for m in manifest) == src.count()

    back = read_warc(spark, f"{out}/*.warc.gz")

    def key(df):
        return sorted(
            (r["url"], str(r["warc_ts"]), hashlib.md5(bytes(r["html"])).hexdigest())
            for r in df.collect()
        )

    assert key(back) == key(src)


def test_write_is_byte_deterministic(spark, tmp_path):
    src = _docs_as_pages(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ma = write_warc(src, a, n_shards=3)
    mb = write_warc(src, b, n_shards=3)
    assert [m["shard"] for m in ma] == [m["shard"] for m in mb]
    for ra, rb in zip(ma, mb):
        with open(ra["path"], "rb") as fa, open(rb["path"], "rb") as fb:
            assert fa.read() == fb.read()
    # uncompressed variant parses identically
    mc = write_warc(src, str(tmp_path / "c"), n_shards=3, compress=False)
    assert sum(m["n_records"] for m in mc) == sum(m["n_records"] for m in ma)


def test_pages_through_warc_text_invariant(spark, corpus80, tmp_path):
    """pages -> WARC -> read -> extract_text(html) must reproduce
    pages.text byte-for-byte: the input_hint invariant holds when
    the corpus is routed through the Common-Crawl-style format."""
    from spacetime_crawler4py_spark.operators.parse import extract_text

    corpus_dir, _ = corpus80
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    out = str(tmp_path / "warc")
    write_warc(pages.select("url", "warc_ts", "html"), out, n_shards=2)
    back = read_warc(spark, f"{out}/*.warc.gz")
    got = {
        r["url"]: extract_text(bytes(r["html"])) for r in back.collect()
    }
    want = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    assert got == want
