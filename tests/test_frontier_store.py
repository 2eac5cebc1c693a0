"""FrontierStore visibility + crash-recovery invariants.

Readers must filter to committed-set MEMBERSHIP (not ``<= max``):
streaming-ingest markers commit high ids (STREAM_NS namespace) into
the same store, and a crashed crawl attempt leaves lower-id data
files with no marker — neither may leak into reads.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spacetime_crawler4py_spark.frontier.store import STREAM_NS, FrontierStore


def _rows(spark, batch_id: int, n: int):
    return spark.createDataFrame(
        [
            (f"h{batch_id}-{i}", f"https://x/{batch_id}/{i}", "x", i, 0)
            for i in range(n)
        ],
        "url_hash string, url string, host string, seq long, depth int",
    ).select(
        "url_hash",
        "url",
        "host",
        "seq",
        "depth",
        F.current_timestamp().alias("discovered_ts"),
        F.lit(batch_id).cast("long").alias("batch_id"),
    )


def test_streaming_commit_does_not_expose_uncommitted_crawl_data(spark, tmp_path):
    store = FrontierStore(spark, str(tmp_path / "state"))
    store.append_discovered(_rows(spark, 1, 3))
    store.commit(1, {})
    store.append_discovered(_rows(spark, 2, 4))  # crash: marker never written
    store.append_discovered(_rows(spark, STREAM_NS, 2))
    store.commit(STREAM_NS, {})

    # crawl batch numbering must not jump into the streaming namespace
    assert store.last_batch_id() == 1
    # membership filter: the streaming commit must NOT expose batch 2
    seen = {r["url_hash"] for r in store.discovered().collect()}
    assert seen == {f"h1-{i}" for i in range(3)} | {
        f"h{STREAM_NS}-{i}" for i in range(2)
    }


def test_quarantine_removes_only_uncommitted(spark, tmp_path):
    store = FrontierStore(spark, str(tmp_path / "state"))
    store.append_discovered(_rows(spark, 1, 3))
    store.commit(1, {})
    store.append_discovered(_rows(spark, 2, 4))  # orphan (no marker)
    store.append_rows("crawl_order", 1, {"fetch_order": [0], "url": ["a"]})
    store.append_rows("crawl_order", 2, {"fetch_order": [0], "url": ["b"]})

    removed = store.quarantine_uncommitted()
    assert removed == 2  # discovered batch_id=2 dir + crawl_order part file

    # committed data intact; orphan gone even at the raw-file level
    assert store.discovered().count() == 3
    raw = spark.read.parquet(str(tmp_path / "state" / "discovered"))
    assert raw.where("batch_id = 2").count() == 0
    order = spark.read.parquet(str(tmp_path / "state" / "crawl_order"))
    assert [r["url"] for r in order.collect()] == ["a"]

    # idempotent: second pass removes nothing
    assert store.quarantine_uncommitted() == 0
