"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship frontier-ingest pipeline; ``queries`` /
``oracle_sql`` expose the operator catalog in
``spacetime_crawler4py_spark/queries.py`` (each entry cites its
SURVEY.md §2 operator row; oracles are DuckDB ANSI-SQL twins with
identical column aliases).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the frontier-ingest pipeline on sf0.001.

    URL synthesis → P1 normalize → F1-F4 validity → P2 sha256
    url-hash → exact dedup → per-host pending counts, all JVM-side
    (the crawl engine's link-processing hot path, SURVEY §2.2-2.3).
    """
    from spacetime_crawler4py_spark.functions.urlnorm import (
        col_netloc,
        col_normalize,
        col_urlhash,
    )
    from spacetime_crawler4py_spark.functions.validity import col_is_valid
    from spacetime_crawler4py_spark.queries import _urls_df

    sf_dir = "/root/testdata/sf0.001"
    urls = _urls_df(spark, sf_dir)
    return (
        urls.withColumn("url", col_normalize(F.col("url")))
        .where(col_is_valid(F.col("url")))
        .withColumn("url_hash", col_urlhash(F.col("url")))
        .dropDuplicates(["url_hash"])
        .groupBy(col_netloc(F.col("url")).alias("host"))
        .agg(F.count("*").alias("n_pending"))
        .orderBy(F.desc("n_pending"), F.asc("host"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spacetime_crawler4py_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from spacetime_crawler4py_spark.queries import ORACLES

    return dict(ORACLES)
