"""spark-submit entry point (north_rule: "launched via spark-submit
--py-files at N and 4N executors").

Self-contained: imports ONLY from the --py-files zip (never from a
repo checkout), generates a corpus, runs the crawl engine to
exhaustion, prints one JSON summary line.

Usage:
  /opt/spark/bin/spark-submit --master local[8] \
    --py-files /tmp/stc_spark_pkg.zip tools/submit_crawl.py [n_pages]

On a real cluster the same command targets yarn/k8s masters; the
engine code is identical (session.get_spark is bypassed — the
session comes from spark-submit's conf).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import SparkSession


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    spark = SparkSession.builder.appName("submit-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from spacetime_crawler4py_spark.crawl.loop import CrawlEngine
    from spacetime_crawler4py_spark.datagen.pages import SEED_URLS, write_corpus

    work = tempfile.mkdtemp(prefix="submit_crawl_")
    write_corpus(spark, f"{work}/corpus", n_pages=n_pages, seed=42)
    eng = CrawlEngine(
        spark,
        state_dir=f"{work}/state",
        pages_path=f"{work}/corpus/pages.parquet",
        status_path=f"{work}/corpus/fetch_status.parquet",
        seeds=SEED_URLS,
        window_ms=256_000,
    )
    t0 = time.time()
    n_batches = eng.run()
    wall = time.time() - t0
    n = len(eng.crawl_order())
    print(
        json.dumps(
            {
                "submitted_via": "spark-submit --py-files",
                "master": spark.conf.get("spark.master"),
                "n_pages": n_pages,
                "n_batches": n_batches,
                "n_fetched": n,
                "pages_per_sec": round(n / wall, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
