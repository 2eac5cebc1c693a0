"""One scaling-workload run at ``local[$SPARK_GRAFT_CPUS]``.

The north_rule's two-cluster-size criterion is evidenced by running
THIS script at two parallelism levels (N and 4N cores) on the same
input and comparing throughput.  The workload measures the stages
where parallelism actually helps (SURVEY §7: politeness caps the
fetch schedule by design, so scaling is measured on parse + dedup +
aggregation throughput):

- parse:   page_features mapInPandas over the bench corpus
           replicated ×REP (Arrow-batched DOM parsing)
- dedup:   url normalize→validity→sha256-hash→distinct over
           replicated synthetic URLs (the frontier link path)
- agg:     TPC-H-ish q1 + tfidf over sf0.1

Prints one JSON line {"cpus": N, "parse": {...}, ...} with rows/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _best(fn, n: int = 3) -> float:
    """Best-of-n wall time: damps scheduler/GC noise between JVMs."""
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rep_parse = int(os.environ.get("SPARK_GRAFT_REP_PARSE", "60"))
    rep_url = int(os.environ.get("SPARK_GRAFT_REP_URL", "1500"))

    from spacetime_crawler4py_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus}

    # ---------------- parse throughput (Arrow UDF scaling)
    from bench import _bench_corpus_dir
    from spacetime_crawler4py_spark.operators.parse import parse_pages

    corpus = _bench_corpus_dir(spark)
    pages = spark.read.parquet(f"{corpus}/pages.parquet")
    replicated = (
        pages.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(rep_parse))))
        .repartition(cpus * 2)
        .cache()
    )
    n_rows = replicated.count()  # materialize cache before timing
    # warm-up: spin up the Python worker pool + JIT the codegen OUTSIDE
    # the timed region (one pass over a small slice)
    parse_pages(replicated.limit(max(cpus * 200, 2000))).count()
    dt = _best(lambda: parse_pages(replicated).select(F.sum("wc")).collect())
    out["parse"] = {"rows": n_rows, "sec": round(dt, 2), "rows_per_sec": round(n_rows / dt, 1)}
    replicated.unpersist()

    # ---------------- frontier-dedup throughput (JVM url path)
    from spacetime_crawler4py_spark.functions.urlnorm import col_normalize, col_urlhash
    from spacetime_crawler4py_spark.functions.validity import col_is_valid

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    urls = (
        docs.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(rep_url))))
        .select(
            F.concat(
                F.lit("https://h"),
                (F.col("doc_id") % 97).cast("string"),
                F.lit(".ics.uci.edu/p/"),
                F.col("doc_id").cast("string"),
                F.lit("/"),
                F.col("rep").cast("string"),
                F.when(F.col("rep") % 3 == 0, F.lit("#frag")).otherwise(F.lit("")),
            ).alias("url")
        )
        .repartition(cpus * 2)
        .cache()
    )
    n_urls = urls.count()
    (
        urls.limit(50_000)
        .select(col_urlhash(col_normalize(F.col("url"))).alias("h"))
        .count()
    )  # JIT warm-up

    def _dedup():
        (
            urls.select(col_normalize(F.col("url")).alias("url"))
            .where(col_is_valid(F.col("url")))
            .select(col_urlhash(F.col("url")).alias("h"))
            .agg(F.countDistinct("h"))
            .collect()
        )

    dt = _best(_dedup)
    out["dedup"] = {"rows": n_urls, "sec": round(dt, 2), "rows_per_sec": round(n_urls / dt, 1)}
    urls.unpersist()

    # ---------------- aggregation throughput (replicated relational)
    rep_agg = int(os.environ.get("SPARK_GRAFT_REP_AGG", "12"))
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(rep_agg))))
        .repartition(cpus * 2)
        .cache()
    )
    n_li = li.count()

    def _agg():
        (
            li.groupBy("l_returnflag", "l_linestatus", "rep")
            .agg(
                F.sum("l_quantity"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                F.avg("l_discount"),
                F.count("*"),
            )
            .count()
        )

    _agg()  # warm-up
    dt = _best(_agg)
    out["agg"] = {"rows": n_li, "sec": round(dt, 2), "rows_per_sec": round(n_li / dt, 1)}
    li.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
