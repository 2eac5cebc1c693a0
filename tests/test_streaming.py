"""Structured Streaming surfaces: availableNow file-stream parse,
watermarked rollup, foreachBatch frontier ingest (exactly-once)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spacetime_crawler4py_spark.datagen.pages import PAGES_SCHEMA, write_corpus
from spacetime_crawler4py_spark.streaming.pipeline import (
    stream_event_rollup,
    stream_frontier_ingest,
    stream_page_ingest,
)


def test_stream_page_ingest(spark, tmp_path):
    write_corpus(spark, str(tmp_path / "c"), n_pages=30, seed=42)
    q = stream_page_ingest(
        spark,
        str(tmp_path / "c" / "pages.parquet"),
        PAGES_SCHEMA,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    n = out.count()
    assert 0 < n <= 30  # length gates drop the tiny/huge pages
    assert "links" in out.columns and "wc" in out.columns


def test_stream_event_rollup_batch_parity(spark, tmp_path):
    # run the streaming aggregation over a bounded file stream and
    # compare with the batch twin
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(str(tmp_path / "ev"))
    src = spark.readStream.schema(events.schema).parquet(str(tmp_path / "ev"))
    agg = stream_event_rollup(src)
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from rollup_test")
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    # append-mode emits only watermark-closed windows → subset of batch
    g = {(r["window_start"], r["event_type"]): r["n"] for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert g, "stream produced no closed windows"
    assert all(b[k] == v for k, v in g.items())


def test_stream_frontier_ingest_exactly_once(spark, tmp_path):
    links = spark.createDataFrame(
        [(f"https://www.ics.uci.edu/p{i}",) for i in range(20)]
        + [("https://www.ics.uci.edu/p0",)]      # dup
        + [("https://example.com/off",)],        # invalid
        "url string",
    )
    links.write.mode("overwrite").parquet(str(tmp_path / "links"))
    src = spark.readStream.schema("url string").parquet(str(tmp_path / "links"))
    q = stream_frontier_ingest(
        spark, src, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    from spacetime_crawler4py_spark.frontier.store import FrontierStore

    store = FrontierStore(spark, str(tmp_path / "state"))
    assert store.discovered().count() == 20  # dedup'd + validity-filtered

    # replay the same stream with a fresh checkpoint → foreachBatch
    # marker makes it a no-op (exactly-once)
    src2 = spark.readStream.schema("url string").parquet(str(tmp_path / "links"))
    q2 = stream_frontier_ingest(
        spark, src2, str(tmp_path / "state"), str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    assert store.discovered().count() == 20


def test_stream_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState session windows: every emitted session
    must byte-match a session of the batch twin (same 30-min-gap
    semantics), and chronological chunked feeding must close most of
    them via event-time timeout."""
    from spacetime_crawler4py_spark.streaming.pipeline import stream_sessionize

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # two chronological chunks → watermark advances between
    # micro-batches (maxFilesPerTrigger=1), closing earlier sessions
    by_ts = events.withColumn(
        "_t", F.col("ts").cast("timestamp").cast("long")
    )
    mid = by_ts.approxQuantile("_t", [0.6], 0.0)[0]
    early = by_ts.where(F.col("_t") <= mid).drop("_t")
    late = by_ts.where(F.col("_t") > mid).drop("_t")
    early.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "ev" / "a"))
    late.coalesce(1).write.mode("append").parquet(str(tmp_path / "ev" / "a"))

    src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "ev" / "a"))
    )
    out = stream_sessionize(src, gap_s=1800, watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from sess_test").collect()
    assert got, "no sessions closed"

    # batch twin: same gap rule, with start/end/n per session
    from pyspark.sql import Window

    e = events.withColumn("_ts_s", F.col("ts").cast("timestamp").cast("long"))
    w = Window.partitionBy("user_id").orderBy("_ts_s", "event_id")
    gap = F.col("_ts_s") - F.lag("_ts_s").over(w)
    sid = F.sum(
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    batch = (
        e.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.min("_ts_s").alias("session_start"),
            F.max("_ts_s").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    bset = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    gset = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got
    }
    assert gset <= bset, gset - bset  # every emitted session is exact
    # no duplicate emissions
    assert len(gset) == len(got)


def test_stream_dedup_matches_arrival(spark, tmp_path):
    """Streaming near-dup dedup == batch arrival-mode dedup over the
    concatenated stream (chunks arrive in id order), and replaying
    the stream adds nothing (exactly-once)."""
    import os

    from spacetime_crawler4py_spark.operators.dedup import (
        dedup_representatives,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from spacetime_crawler4py_spark.streaming.pipeline import stream_dedup_ingest

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    mid = 25
    docs.where(F.col("doc_id") < mid).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "in")
    )
    docs.where(F.col("doc_id") >= mid).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "in")
    )
    src = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    state = str(tmp_path / "state")
    q = stream_dedup_ingest(
        spark, src, state, str(tmp_path / "ckpt"), threshold=0.5
    )
    q.awaitTermination(240)
    kept_stream = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(state, "kept_docs")).collect()
    }

    sigs = minhash_signatures(docs, "text", "doc_id")
    pairs = minhash_lsh_pairs(sigs, bands=32, rows=2, threshold=0.5)
    kept_batch = {
        r["doc_id"]
        for r in dedup_representatives(docs, pairs, "doc_id", "arrival").collect()
    }
    assert kept_stream == kept_batch
    assert len(kept_stream) < docs.count()  # something was actually dropped

    # replay: same checkpoint, no new files → nothing new appended
    q2 = stream_dedup_ingest(
        spark,
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in")),
        state,
        str(tmp_path / "ckpt"),
        threshold=0.5,
    )
    q2.awaitTermination(120)
    again = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(state, "kept_docs")).collect()
    }
    assert again == kept_stream


def test_stream_ingest_crash_replay_no_duplicates(spark, tmp_path):
    """A crashed attempt's marker-less discovered files must be
    quarantined when the batch replays — not doubled into the same
    committed partition."""
    import os

    from spacetime_crawler4py_spark.frontier.store import STREAM_NS, FrontierStore
    from spacetime_crawler4py_spark.streaming.pipeline import stream_frontier_ingest

    links = spark.createDataFrame(
        [(f"https://www.ics.uci.edu/q{i}",) for i in range(10)], "url string"
    )
    links.write.mode("overwrite").parquet(str(tmp_path / "links"))

    # simulate the dead first attempt: orphan rows under the marker
    # id this stream's batch 0 will use, with NO commit marker
    state = str(tmp_path / "state")
    orphan_dir = os.path.join(state, "discovered", f"batch_id={STREAM_NS}")
    spark.createDataFrame(
        [("deadbeef", "https://www.ics.uci.edu/q0", "www.ics.uci.edu", 1, None, None)],
        "url_hash string, url string, host string, seq long, depth int, discovered_ts timestamp",
    ).write.mode("overwrite").parquet(orphan_dir)

    src = spark.readStream.schema("url string").parquet(str(tmp_path / "links"))
    q = stream_frontier_ingest(spark, src, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    store = FrontierStore(spark, state)
    rows = store.discovered().collect()
    assert len(rows) == 10
    assert not any(r["url_hash"] == "deadbeef" for r in rows)


def test_stream_dedup_crash_replay_no_duplicates(spark, tmp_path):
    """Same quarantine contract for the dedup ingest's kept_docs /
    kept_sigs partitions."""
    import os

    from spacetime_crawler4py_spark.streaming.pipeline import stream_dedup_ingest

    docs = spark.createDataFrame(
        [(i, f"unique document number {i} " * 5) for i in range(6)],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "in"))
    state = str(tmp_path / "state")
    # dead first attempt: doc rows under batch 0, no _meta marker
    docs.limit(2).withColumn("batch_id", F.lit(0).cast("long")).write.mode(
        "overwrite"
    ).partitionBy("batch_id").parquet(os.path.join(state, "kept_docs"))

    src = spark.readStream.schema(docs.schema).parquet(str(tmp_path / "in"))
    q = stream_dedup_ingest(spark, src, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    kept = spark.read.parquet(os.path.join(state, "kept_docs")).collect()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == [0, 1, 2, 3, 4, 5]  # no doc duplicated, none lost


def test_interleaved_stream_and_crawl_seq_unique(spark, corpus80, tmp_path):
    """A streaming ingest committing BETWEEN two crawl batches on the
    same store must not make the engine reuse its cached seq range —
    every discovered row keeps a unique seq (total discovery order)."""
    from collections import Counter

    from spacetime_crawler4py_spark.crawl.loop import CrawlEngine
    from spacetime_crawler4py_spark.datagen.pages import SEED_URLS
    from spacetime_crawler4py_spark.frontier.store import FrontierStore
    from spacetime_crawler4py_spark.streaming.pipeline import stream_frontier_ingest

    corpus_dir, _ = corpus80
    state = str(tmp_path / "state")
    eng = CrawlEngine(
        spark,
        state_dir=state,
        pages_path=f"{corpus_dir}/pages.parquet",
        status_path=f"{corpus_dir}/fetch_status.parquet",
        seeds=SEED_URLS,
    )
    eng.run(max_batches=1)

    links = spark.createDataFrame(
        [(f"https://www.ics.uci.edu/streamed{i}",) for i in range(7)],
        "url string",
    )
    links.write.mode("overwrite").parquet(str(tmp_path / "links"))
    q = stream_frontier_ingest(
        spark,
        spark.readStream.schema("url string").parquet(str(tmp_path / "links")),
        state,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    eng.run(max_batches=1)  # same engine instance, cached _max_seq

    store = FrontierStore(spark, state)
    seqs = [r["seq"] for r in store.discovered().select("seq").collect()]
    dupes = {s: c for s, c in Counter(seqs).items() if c > 1}
    assert not dupes, dupes


def test_stream_sketch_matches_batch(spark, tmp_path):
    """The folded streaming CMS/HLL state must equal the batch
    sketches of the concatenated stream CELL-FOR-CELL (CMS cells are
    linear, HLL registers max-mergeable), and a checkpoint replay
    with no new files must leave the fold unchanged."""
    import os

    from spacetime_crawler4py_spark.operators.sketches import (
        cms_build,
        hll_estimate,
        hll_registers,
    )
    from spacetime_crawler4py_spark.streaming.pipeline import (
        sketch_state,
        stream_sketch_ingest,
    )

    items = spark.createDataFrame(
        [(f"w{i % 37}",) for i in range(500)], "word string"
    )
    items.write.mode("overwrite").parquet(str(tmp_path / "in"))
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    def run():
        src = (
            spark.readStream.schema("word string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / "in"))
        )
        q = stream_sketch_ingest(spark, src, "word", state, ckpt, w=64, d=3, b=6)
        q.awaitTermination(180)

    run()
    cms_s, hll_s = sketch_state(spark, state)
    full = spark.read.parquet(str(tmp_path / "in"))
    cms_b = cms_build(full, "word", w=64, d=3)
    hll_b = hll_registers(full, "word", b=6)
    as_set = lambda df: {tuple(r) for r in df.collect()}
    assert as_set(cms_s) == as_set(cms_b)
    assert as_set(hll_s) == as_set(hll_b)
    assert hll_estimate(hll_s, b=6) == hll_estimate(hll_b, b=6)
    # replay: same checkpoint, no new input → byte-identical fold
    run()
    cms_r, hll_r = sketch_state(spark, state)
    assert as_set(cms_r) == as_set(cms_b)
    assert as_set(hll_r) == as_set(hll_b)


def test_stream_sketch_crash_replay_quarantine(spark, tmp_path):
    """A dead first attempt's marker-less cms/hll partitions must be
    quarantined on replay, not summed twice into the fold."""
    import os

    from spacetime_crawler4py_spark.operators.sketches import cms_build
    from spacetime_crawler4py_spark.streaming.pipeline import (
        sketch_state,
        stream_sketch_ingest,
    )

    items = spark.createDataFrame([(f"x{i}",) for i in range(100)], "word string")
    items.write.mode("overwrite").parquet(str(tmp_path / "in"))
    state = str(tmp_path / "state")
    # orphan: batch 0 cells written, no marker
    (
        cms_build(items, "word", w=64, d=3)
        .withColumn("batch_id", F.lit(0).cast("long"))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(os.path.join(state, "cms_cells"))
    )
    src = spark.readStream.schema("word string").parquet(str(tmp_path / "in"))
    q = stream_sketch_ingest(spark, src, "word", state, str(tmp_path / "ckpt"), w=64, d=3, b=6)
    q.awaitTermination(180)
    cms_s, _ = sketch_state(spark, state)
    total = cms_s.groupBy("row").agg(F.sum("cnt").alias("t")).collect()
    assert all(r["t"] == 100 for r in total)  # counted once, not twice
