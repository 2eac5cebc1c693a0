"""Structured Streaming surfaces of the engine.

The reference's crawl loop is feedback-iterative (frontier output
feeds frontier input), which a single linear streaming query cannot
express (SURVEY §2.8 T1) — the batch driver loop in crawl/loop.py
is the idiomatic shape for that.  What IS stream-shaped:

- ``stream_page_ingest``   a pages stream (e.g. WARC drops landing
  in a directory) → status/length gates → parse features →
  append sink.  File-source + availableNow trigger ≡ incremental
  batch; the same code runs continuously on a cluster.
- ``stream_event_rollup``  watermarked tumbling-window aggregation
  over an event stream (the streaming twin of the
  t_hourly_event_rollup batch query).
- ``stream_frontier_ingest``  foreachBatch micro-batch handler that
  pushes each arriving link batch through the SAME dedup + commit
  path as the batch engine (exactly-once via the FrontierStore
  commit markers keyed by streaming batch id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.operators.parse import parse_pages


def stream_page_ingest(
    spark, in_dir: str, schema, out_dir: str, checkpoint_dir: str
):
    """pages files → gates → parse → parquet append (availableNow).

    Returns the started StreamingQuery; caller awaits termination.
    """
    src = spark.readStream.schema(schema).parquet(in_dir)
    gated = src.where(
        F.col("html").isNotNull()
        & (F.length("text") >= 500)
        & (F.length("text") <= 100_000)
    )
    feats = parse_pages(gated)
    return (
        feats.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_event_rollup(events_stream: DataFrame) -> DataFrame:
    """Watermarked tumbling 1-hour window per event_type.

    Late rows beyond 2 hours are dropped; state is bounded by the
    watermark — the standard streaming-agg memory contract.
    """
    # event-time watermarks require TIMESTAMP (parquet NTZ is cast)
    events_stream = events_stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_frontier_ingest(
    spark, links_stream: DataFrame, state_dir: str, checkpoint_dir: str
):
    """Stream of candidate links → frontier via foreachBatch.

    Each micro-batch runs the batch engine's link path (normalize →
    validity → hash → dedup vs seen → append + commit).  The
    FrontierStore marker doubles as the idempotency guard: a
    replayed batch id is a no-op, preserving exactly-once.
    """
    from spacetime_crawler4py_spark.frontier.store import STREAM_NS, FrontierStore
    from spacetime_crawler4py_spark.functions.urlnorm import (
        col_netloc,
        col_normalize,
        col_urlhash,
    )
    from spacetime_crawler4py_spark.functions.validity import col_is_valid

    store = FrontierStore(spark, state_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        marker = STREAM_NS + batch_id  # streaming id namespace
        if marker in set(store.committed_batches()):
            return  # replay → no-op (exactly-once)
        # crash-replay safety: a prior attempt may have appended
        # discovered/batch_id=<marker> files and died BEFORE the
        # marker; re-appending would make both copies visible once
        # this attempt commits.  Quarantine the orphan first (only
        # this handler's own partition — never another writer's).
        import os
        import shutil

        orphan = os.path.join(
            state_dir, "discovered", f"batch_id={marker}"
        )
        if os.path.isdir(orphan):
            shutil.rmtree(orphan)
        # validity on the RAW link, then normalize — same load-bearing
        # order as the batch engine (scraper.py:44 → frontier.add_url)
        cand = (
            batch_df.where(col_is_valid(F.col("url")))
            .withColumn("url", col_normalize(F.col("url")))
            .withColumn("url_hash", col_urlhash(F.col("url")))
            .dropDuplicates(["url_hash"])
        )
        new = cand.join(store.seen_hashes(), "url_hash", "left_anti")
        base = store.max_seq()
        from spacetime_crawler4py_spark.operators.ids import (
            with_contiguous_index,
        )

        # seq order contract UNIFIED with the batch engine: discovery
        # position (fetch_order, pos) when the stream carries it,
        # else deterministic url order — assigned distributed (no
        # single-partition window), same as crawl/loop.py.
        order_cols = [
            c for c in ("fetch_order", "pos") if c in new.columns
        ] or ["url"]
        indexed, _interm = with_contiguous_index(
            new, order_cols, "seq", start=base + 1
        )
        rows = indexed.select(
            "url_hash",
            "url",
            col_netloc(F.col("url")).alias("host"),
            "seq",
            F.lit(None).cast("int").alias("depth"),
            F.current_timestamp().alias("discovered_ts"),
            F.lit(marker).cast("long").alias("batch_id"),
        )
        store.append_discovered(rows)
        _interm.unpersist()
        store.commit(marker, {"kind": "stream_ingest"})

    return (
        links_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize(
    events_stream: DataFrame,
    gap_s: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom STATEFUL streaming operator: per-user session windows
    via ``applyInPandasWithState`` (the engine's example of state
    Spark's built-ins don't express — session contents, not just
    counts, with explicit timeout control).

    Semantics match the batch twin (queries.w_sessionize): a new
    session starts when the gap since the previous event exceeds
    ``gap_s`` (strictly).  Sessions are emitted when CLOSED — either
    by a later in-stream event beyond the gap, or by event-time
    timeout once the watermark passes session_end + gap.  State per
    user is one open (start, end, n) triple — O(users) state, bounded
    by the watermark contract regardless of stream length.

    Returns (user_id, session_start, session_end, n_events) with
    epoch-second bounds (append mode).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", LongType()),
            StructField("session_end", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start", LongType()),
            StructField("end", LongType()),
            StructField("n", LongType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        uid = key[0]
        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [s],
                    "session_end": [e],
                    "n_events": [n],
                }
            )
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf["_ts_s"])
        ts.sort()
        s = e = n = None
        if state.exists:
            s, e, n = state.get
        closed = []
        for t in ts:
            if s is None:
                s, e, n = t, t, 1
            elif t - e > gap_s:
                closed.append((s, e, n))
                s, e, n = t, t, 1
            else:
                # min/max, NOT assignment: a watermark-admissible
                # late event from a later micro-batch can sort
                # before the open session's bounds — rewinding
                # session_end would emit end < start and mis-set
                # the timeout
                s, e, n = min(s, t), max(e, t), n + 1
        if s is not None:
            state.update((s, e, n))
            # timeout fires when the event-time watermark passes the
            # gap horizon; must be strictly beyond current watermark
            state.setTimeoutTimestamp(
                max((e + gap_s) * 1000, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    ev = (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .withColumn("_ts_s", F.col("ts").cast("long"))
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def stream_dedup_ingest(
    spark,
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    bands: int = 32,
    rows: int = 2,
):
    """Streaming near-dup dedup: each arriving document batch is
    deduplicated WITHIN itself (arrival semantics — the reference's
    incremental-index rule) and AGAINST all previously-kept docs
    (banded minhash join vs the signature store), then kept docs +
    signatures append with a marker-last commit.

    Exactly-once: a replayed foreachBatch id short-circuits on its
    marker.  State is the kept-signature table — k longs per kept
    doc, partitioned by batch; the cross join shuffles band keys,
    never text.  End-to-end this equals batch
    ``dedup_representatives(mode='arrival')`` over the concatenated
    stream when batches arrive in id order (pinned by
    tests/test_streaming.py::test_stream_dedup_matches_arrival).
    """
    import json
    import os

    from spacetime_crawler4py_spark.operators.dedup import (
        dedup_representatives,
        minhash_cross_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    sig_dir = os.path.join(state_dir, "kept_sigs")
    docs_dir = os.path.join(state_dir, "kept_docs")
    meta_dir = os.path.join(state_dir, "_meta")

    def committed() -> list[int]:
        if not os.path.isdir(meta_dir):
            return []
        return sorted(
            int(n[:-5]) for n in os.listdir(meta_dir) if n.endswith(".json")
        )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(os.path.join(meta_dir, f"{batch_id}.json")):
            return  # replay after crash-with-marker: already visible
        # crash-replay safety: drop any orphaned data this batch id
        # wrote before dying marker-less — otherwise the re-append
        # doubles kept docs/sigs once the marker lands
        import shutil

        for d in (docs_dir, sig_dir):
            orphan = os.path.join(d, f"batch_id={batch_id}")
            if os.path.isdir(orphan):
                shutil.rmtree(orphan)
        sigs = minhash_signatures(batch_df, "text", "doc_id")
        # ORDER MATTERS for arrival parity: history-dropping runs
        # FIRST — a doc dropped for similarity to an earlier kept doc
        # must not suppress its in-batch neighbors (global arrival
        # would keep them), so in-batch arrival sees only survivors.
        seen = committed()
        if seen:
            hist = (
                spark.read.parquet(sig_dir)
                .where(F.col("batch_id").isin(seen))
                .select("id", "sig")
            )
            drop = (
                minhash_cross_pairs(hist, sigs, bands, rows, threshold)
                .select(F.col("id_b").alias("doc_id"))
                .distinct()
            )
            batch_df = batch_df.join(drop, "doc_id", "left_anti")
            sigs = sigs.join(
                drop.select(F.col("doc_id").alias("id")), "id", "left_anti"
            )
        in_pairs = minhash_lsh_pairs(sigs, bands, rows, threshold)
        kept = dedup_representatives(
            batch_df, in_pairs, "doc_id", "arrival"
        ).cache()
        (
            kept.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("append").partitionBy("batch_id").parquet(docs_dir)
        )
        (
            sigs.join(kept.select(F.col("doc_id").alias("id")), "id", "left_semi")
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("append").partitionBy("batch_id").parquet(sig_dir)
        )
        kept.unpersist()
        os.makedirs(meta_dir, exist_ok=True)
        tmp = os.path.join(meta_dir, f".{batch_id}.tmp")
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id}, f)
        os.replace(tmp, os.path.join(meta_dir, f"{batch_id}.json"))

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_sketch_ingest(
    spark,
    items_stream: DataFrame,
    col: str,
    state_dir: str,
    checkpoint_dir: str,
    w: int = 256,
    d: int = 4,
    b: int = 8,
):
    """Streaming CMS + HLL maintenance: per-micro-batch sketch cells
    append partitioned by batch_id with a marker-last commit; the
    running sketch is a FOLD over committed partitions — sum-combine
    for CMS cells (the sketch is a linear operator) and max-combine
    for HLL registers (mergeable by construction, operators/
    sketches.py).  Approximate monitoring stats over an unbounded
    stream therefore cost O(d·w + 2^b) state per batch, never a
    second pass over the data.

    Exactly-once mirrors stream_dedup_ingest: a replayed foreachBatch
    id short-circuits on its marker; a crashed marker-less attempt's
    orphan partitions are quarantined before re-append — so
    sketch_state() equals the batch sketch of the concatenated
    stream EXACTLY (cell-for-cell, pinned by
    tests/test_streaming.py::test_stream_sketch_matches_batch).
    """
    import json
    import os
    import shutil

    from spacetime_crawler4py_spark.operators.sketches import (
        cms_build,
        hll_registers,
    )

    cms_dir = os.path.join(state_dir, "cms_cells")
    hll_dir = os.path.join(state_dir, "hll_regs")
    meta_dir = os.path.join(state_dir, "_meta")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(os.path.join(meta_dir, f"{batch_id}.json")):
            return  # replay after crash-with-marker: already visible
        for dpath in (cms_dir, hll_dir):
            orphan = os.path.join(dpath, f"batch_id={batch_id}")
            if os.path.isdir(orphan):
                shutil.rmtree(orphan)
        (
            cms_build(batch_df, col, w=w, d=d)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("append").partitionBy("batch_id").parquet(cms_dir)
        )
        (
            hll_registers(batch_df, col, b=b)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("append").partitionBy("batch_id").parquet(hll_dir)
        )
        os.makedirs(meta_dir, exist_ok=True)
        tmp = os.path.join(meta_dir, f".{batch_id}.tmp")
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "kind": "sketch"}, f)
        os.replace(tmp, os.path.join(meta_dir, f"{batch_id}.json"))

    return (
        items_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sketch_state(spark, state_dir: str) -> tuple[DataFrame, DataFrame]:
    """(cms, hll): the running sketches folded over COMMITTED batch
    partitions only — cms is (row, bucket, cnt) with summed counts,
    hll is (bucket, r) with max registers.  Uncommitted (crash-
    orphan) partitions are invisible, same reader contract as the
    FrontierStore committed filter."""
    import os

    meta_dir = os.path.join(state_dir, "_meta")
    committed = []
    if os.path.isdir(meta_dir):
        committed = [
            int(n[:-5])
            for n in os.listdir(meta_dir)
            if n.endswith(".json") and not n.startswith(".")
        ]
    if not committed:
        empty_cms = spark.createDataFrame([], "row int, bucket long, cnt long")
        empty_hll = spark.createDataFrame([], "bucket long, r int")
        return empty_cms, empty_hll
    cms = (
        spark.read.parquet(os.path.join(state_dir, "cms_cells"))
        .where(F.col("batch_id").isin(committed))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    hll = (
        spark.read.parquet(os.path.join(state_dir, "hll_regs"))
        .where(F.col("batch_id").isin(committed))
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
    )
    return cms, hll
