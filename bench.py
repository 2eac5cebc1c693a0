"""Benchmark runner (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and a crawl
throughput section on a generated bench corpus, then prints ONE
JSON line:

  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {"pages_per_sec": ..., "dedup_ops_per_sec": ...}}

Scaling evidence (north_rule two-cluster-size criterion) is produced
by tools/scaling_bench.py which runs this same workload at two
parallelism levels in separate JVMs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_revenue_by_nation",
    "j3_part_revenue_top20",
    "o6_topk_per_group",
    "t_hourly_event_rollup",
    "p2_url_hash",
    "a5_word_frequency_top100",
    "a6a8_tfidf",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_kept",
    "ann_cosine_top20",
    "ann_ivf_top10",
    "sk_cms_word_counts",
    "semdedup_kept",
    "ann_pq_adc_top10",
    "ann_ivf_pq_top10",
    # round 5: written-index IVFADC serving (build+write+pruned-scan
    # serve, cold) and the weights-join deployment path of the
    # linear quality scorer
    "ann_ivf_pq_index_top10",
    "quality_linear_weighted_scores",
    # round 5: winnowing fingerprint selection + MOSS match join
    "dedup_winnow_pairs",
    "corpus_build_domain_counts",
]

BENCH_CORPUS_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "6000"))
# politeness window for the crawl bench: cap/host = window/delay(500ms).
# Default 1e6 → 2000/host; widen (e.g. 8e6 → 16k/host) for the
# wide-batch scale-stress configuration (BENCH.md "wide-batch" row).
BENCH_WINDOW_MS = int(os.environ.get("SPARK_GRAFT_BENCH_WINDOW_MS", "1000000"))


def _bench_corpus_dir(spark) -> str:
    d = f"/tmp/spark_graft_bench_corpus_{BENCH_CORPUS_PAGES}"
    if not os.path.exists(os.path.join(d, "pages.parquet")):
        from spacetime_crawler4py_spark.datagen.pages import write_corpus

        write_corpus(spark, d, n_pages=BENCH_CORPUS_PAGES, seed=42)
    return d


def run_crawl_bench(spark) -> dict:
    import shutil
    import tempfile

    from spacetime_crawler4py_spark.crawl.loop import CrawlEngine
    from spacetime_crawler4py_spark.datagen.pages import SEED_URLS

    corpus = _bench_corpus_dir(spark)
    state = tempfile.mkdtemp(prefix="crawl_bench_state_")
    try:
        eng = CrawlEngine(
            spark,
            state_dir=state,
            pages_path=f"{corpus}/pages.parquet",
            status_path=f"{corpus}/fetch_status.parquet",
            seeds=SEED_URLS,
            window_ms=BENCH_WINDOW_MS,  # default cap 2000/host: drain fast
            # fold frontier logs every N batches (0 = off) — the
            # wide-batch stress runs with this ON to evidence flat
            # schedule-stage cost as history grows (BENCH.md)
            compact_every=int(
                os.environ.get("SPARK_GRAFT_BENCH_COMPACT_EVERY", "0")
            ),
        )
        t0 = time.time()
        eng.run()
        wall = time.time() - t0
        n_fetched = len(eng.crawl_order())
        # dedup ops = candidate links pushed through the bloom +
        # anti-join path (posexplode output post-validity)
        from pyspark.sql import functions as F

        n_links = (
            eng.crawled_pages()
            .agg(F.sum("n_unique_anchors").alias("s"))
            .collect()[0]["s"]
            or 0
        )
        m = (
            spark.read.parquet(os.path.join(state, "metrics"))
            .agg(
                F.count("*").alias("n_batches"),
                F.max("n_fetched").alias("max_batch"),
                F.sum("t_sched_ms").alias("sched"),
                F.sum("t_parse_ms").alias("parse"),
                F.sum("t_links_ms").alias("links"),
            )
            .collect()[0]
        )
        return {
            "wall_sec": round(wall, 2),
            "n_fetched": n_fetched,
            "pages_per_sec": round(n_fetched / wall, 2),
            "n_link_candidates": int(n_links),
            "dedup_ops_per_sec": round(int(n_links) / wall, 2),
            "n_batches": int(m["n_batches"]),
            "max_batch_urls": int(m["max_batch"]),
            "stage_ms": {
                "schedule": int(m["sched"]),
                "fetch_parse_sink": int(m["parse"]),
                "link_pipeline": int(m["links"]),
            },
        }
    finally:
        shutil.rmtree(state, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from spacetime_crawler4py_spark.queries import QUERIES
    from spacetime_crawler4py_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM codegen + Python worker pool before timing
    # (CLAUDE.md: cold first query otherwise pays ~4s of JIT/session
    # setup that no steady-state deployment would see)
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").agg(F.sum("l_quantity")).count()
    from spacetime_crawler4py_spark.functions.tokenizers import (
        pdf_tokenize_alnum,
    )

    spark.createDataFrame([("warm up the arrow workers",)], ["text"]).select(
        pdf_tokenize_alnum(F.col("text"))
    ).count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        # count() forces full execution without driver-side collect cost
        fn(spark, sf_dir).count()
        dt = time.time() - t0
        per_query[name] = round(dt, 3)
        total += dt

    crawl = run_crawl_bench(spark)
    total += crawl["wall_sec"]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(total, 2),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
                "crawl": crawl,
            }
        )
    )


if __name__ == "__main__":
    main()
