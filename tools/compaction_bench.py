"""Compaction evidence (VERDICT r3 #2 done-criterion): schedule-stage
cost must stay FLAT as the batch count grows when ``compact()`` runs
on a cadence, vs growing with the raw log when it never runs.

Synthesizes a frontier history deterministically — B batches, each
appending ``rows_per_batch`` discovered rows and completing the
previous batch's rows (the crawl loop's steady-state shape: the live
pending set stays ~one batch wide while the logs grow linearly).
After every ``measure_every`` batches it times ``pending()`` twice —
once against a never-compacted twin store, once against a
compact-every-``compact_every`` store — and prints one markdown table
for BENCH.md.

Usage: python tools/compaction_bench.py [n_batches] [rows_per_batch]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_batch(spark, bid: int, n: int):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.md5(F.concat_ws("-", F.lit(bid), F.col("id"))).alias("url_hash"),
            F.concat(F.lit(f"http://h{bid}.example.com/p"), F.col("id")).alias("url"),
            F.concat(F.lit("h"), F.lit(bid % 50)).alias("host"),
            (F.lit(bid) * n + F.col("id")).alias("seq"),
            F.lit(1).alias("depth"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("discovered_ts"),
            F.lit(bid).cast("long").alias("batch_id"),
        )
    )


def run(spark, n_batches: int, rows: int, compact_every: int) -> list[tuple[int, float, int]]:
    """Returns [(batches_so_far, pending_seconds, n_pending)]."""
    from pyspark.sql import functions as F

    from spacetime_crawler4py_spark.frontier.store import FrontierStore

    state = tempfile.mkdtemp(prefix=f"compact_bench_{compact_every}_")
    out = []
    try:
        store = FrontierStore(spark, state)
        measure_every = max(n_batches // 4, 1)
        for b in range(1, n_batches + 1):
            batch = synth_batch(spark, b, rows)
            store.append_discovered(batch)
            if b > 1:  # complete the previous batch's rows
                prev = synth_batch(spark, b - 1, rows).select(
                    "url_hash", F.lit(b).cast("long").alias("batch_id")
                )
                store.append_completed(prev)
            store.commit(b, {"n": rows})
            if compact_every and b % compact_every == 0:
                store.compact()
            if b % measure_every == 0 or b == n_batches:
                t0 = time.time()
                n_pending = store.pending().count()
                dt = time.time() - t0
                # steady state: only the newest batch is pending
                assert n_pending == rows, (b, n_pending)
                out.append((b, dt, n_pending))
        return out
    finally:
        shutil.rmtree(state, ignore_errors=True)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    from spacetime_crawler4py_spark.session import get_spark

    spark = get_spark(app_name="compaction-bench", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/scan path before timing
    run(spark, 4, rows, compact_every=0)

    raw = run(spark, n_batches, rows, compact_every=0)
    comp = run(spark, n_batches, rows, compact_every=10)
    print()
    print(f"| batches | pending() no-compact (s) | pending() compact-every-10 (s) |")
    print("|---|---|---|")
    for (b, t_raw, _), (_, t_c, _) in zip(raw, comp):
        print(f"| {b} | {t_raw:.2f} | {t_c:.2f} |")
    grow_raw = raw[-1][1] / raw[0][1]
    grow_c = comp[-1][1] / comp[0][1]
    print(f"\ngrowth {raw[0][0]}→{raw[-1][0]} batches: "
          f"no-compact {grow_raw:.2f}×, compacted {grow_c:.2f}× "
          f"({rows} rows/batch, steady-state pending = one batch)")


if __name__ == "__main__":
    main()
