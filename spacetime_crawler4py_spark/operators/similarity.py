"""Similarity search over embedding columns (array<float>).

Two tiers, same result contract (vec_id, score desc):

- ``brute_force_topk``   exact cosine against every row — the
  correctness baseline; one scan, JVM-only expressions (zip_with
  dot + aggregate norms), top-k plans as TakeOrderedAndProject.
- ``lsh_topk``           random-hyperplane bucket probe (the scale
  path): only rows whose sign-bucket is within ``probe_hamming``
  bits of the query's bucket are scored — at 10^9 vectors the scan
  touches ~bucket_fraction of the table; recall/probe trade-off is
  the standard multi-probe LSH knob.
- ``knn_join``           per-row top-k neighbors via bucket
  self-join (ANN all-pairs), for building k-NN graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.operators.dedup import (
    cosine_sim,
    hyperplane_bucket,
    make_planes,
)


def _query_lit(query_vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine: full scan, no shuffle except the final
    TakeOrdered reduction."""
    q = _query_lit(query_vec)
    return (
        emb.select(
            F.col(id_col).alias("vec_id"),
            cosine_sim(F.col(vec_col), q).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    probe_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: score only rows in sign-buckets within
    ``probe_hamming`` bits of the query bucket (multi-probe LSH).

    The bucket filter is a JVM bit_count on a precomputable int —
    with the bucket materialized as a table column (as a real
    deployment would), this prunes partitions before any arithmetic.
    """
    dim = len(query_vec)
    planes = make_planes(dim, n_planes, seed)
    q = _query_lit(query_vec)
    import numpy as np

    qbits = 0
    for i, p in enumerate(planes):
        if float(np.dot(query_vec, p)) >= 0:
            qbits |= 1 << i
    bucket = hyperplane_bucket(F.col(vec_col), planes)
    return (
        emb.withColumn("_bucket", bucket)
        .where(
            F.bit_count(
                F.col("_bucket").bitwiseXOR(F.lit(qbits)).cast("long")
            )
            <= probe_hamming
        )
        .select(
            F.col(id_col).alias("vec_id"),
            cosine_sim(F.col(vec_col), q).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def knn_join(
    emb: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """(vec_id, neighbor_id, score): approximate k-NN graph.

    Candidates share a sign-bucket; rank within vec_id by cosine.
    Window-per-id replaces a global sort; bucket sizes bound the
    join fan-out (n_planes tunes bucket granularity).
    """
    from pyspark.sql import Window

    planes = make_planes(dim, n_planes, seed)
    b = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    l = b.select(F.col("id").alias("vec_id"), F.col("v").alias("v_l"), "bucket")
    r = b.select(F.col("id").alias("neighbor_id"), F.col("v").alias("v_r"), "bucket")
    pairs = (
        l.join(r, "bucket")
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .withColumn("score", cosine_sim(F.col("v_l"), F.col("v_r")))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("vec_id", "neighbor_id", "score")
    )
