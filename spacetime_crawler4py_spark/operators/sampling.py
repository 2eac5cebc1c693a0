"""Deterministic corpus sampling/splitting for training-data
pipelines (engine extension; the reference has no sampling surface).

Everything here is HASH-based, not RNG-based: Spark's sample()/
sampleBy() draw from a per-partition RNG stream, so results change
under repartitioning, AQE re-planning, or retry — unacceptable for
a 100 TB corpus where the train/val split must be reproducible
bit-for-bit across runs and engines.  A row's fate is a pure
function of (salt, id): u(id) = md5-hash of "salt:id" mapped to
[0,1).  That makes every operator:

  - deterministic under any partitioning / task retry / speculative
    execution (pure Column math, whole-stage codegen, no state);
  - cross-engine verifiable (same md5 construction the dedup/sketch
    family uses, so DuckDB oracles replay it exactly);
  - stable under incremental growth: adding new rows never changes
    an existing row's split (the property that matters for
    append-only crawl corpora — a re-run after ingesting a new batch
    must not shuffle old docs between train and val).

- hash_unit        u(id) in [0,1) as a Column
- hash_split       label each row train/val/... by consecutive
                   cumulative-weight intervals of u(id)
- stratified_sample keep each row iff u(id) < fraction[stratum] —
                   deterministic per-stratum rates (sampleBy twin)
- mixture_sample   stratified_sample with rates derived from target
                   mixture weights over observed stratum counts
                   (corpus mixing: down-sample over-represented
                   sources toward a target distribution)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^60: the md5-top-15-hex-digits value range (shared with
# operators/dedup.shingle_key60 so oracles reuse the same idiom)
_HASH_RANGE = float(1 << 60)


def hash_unit(id_col: Column, salt: str = "split") -> Column:
    """u(id) ∈ [0,1): top 60 bits of md5('salt:id') / 2^60.

    DuckDB twin: ('0x' || substr(md5(salt || ':' || id), 1, 15))
    ::BIGINT / 2^60.
    """
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), id_col)), 1, 15),
        16,
        10,
    ).cast("long")
    return h / F.lit(_HASH_RANGE)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to one label by
    consecutive [cum_i, cum_{i+1}) intervals of u(id).

    Weights are normalized; insertion order of ``weights`` fixes the
    interval order (and therefore the assignment), so pass an
    explicit ordering.  Every row gets a label (the last interval is
    closed at 1.0 against float round-off).
    """
    total = float(sum(weights.values()))
    u = hash_unit(F.col(id_col), salt)
    labels = list(weights)
    cum = 0.0
    expr = F.lit(labels[-1])  # fallback: last label catches u ~ 1.0
    bounds: list[tuple[str, float]] = []
    for name in labels[:-1]:
        cum += weights[name] / total
        bounds.append((name, cum))
    for name, hi in reversed(bounds):
        expr = F.when(u < hi, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep each row iff u(id) < fractions[stratum] — the
    deterministic twin of DataFrame.sampleBy.  Strata absent from
    ``fractions`` are dropped (rate 0.0), matching sampleBy.

    The fractions ride a CASE expression over the (small) strata
    map, not a join — one narrow filter stage, fully pushed into
    whole-stage codegen; at 100 TB the scan's partition pruning and
    column pruning are untouched.
    """
    u = hash_unit(F.col(id_col), salt)
    rate = F.lit(0.0)
    for stratum, frac in fractions.items():
        rate = F.when(
            F.col(strata_col) == stratum, F.lit(float(frac))
        ).otherwise(rate)
    return df.where(u < rate)


def mixture_sample(
    df: DataFrame,
    target_weights: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Down-sample strata toward a target mixture distribution.

    Computes observed stratum counts (one small agg), derives the
    keep-rate per stratum so the surviving corpus approaches the
    target weights with NO stratum up-sampled (the limiting stratum
    — the one most under-represented relative to its target — keeps
    rate 1.0 and everything else scales down proportionally), then
    applies stratified_sample.  The count agg collects one row per
    stratum (sources are few by construction); rates are embedded as
    literals so the sampling pass itself is a single narrow filter.
    """
    total_w = float(sum(target_weights.values()))
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
        if r["s"] in target_weights
    }
    if not counts:
        return df.where(F.lit(False))
    # scale: the stratum with the smallest count/target ratio stays
    # whole; others down-sample to match its implied corpus size
    limit = min(
        counts[s] / (target_weights[s] / total_w) for s in counts
    )
    fractions = {
        s: min(1.0, (target_weights[s] / total_w) * limit / counts[s])
        for s in counts
    }
    return stratified_sample(df, fractions, strata_col, id_col, salt)
