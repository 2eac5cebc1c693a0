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

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------


def _bigram_buckets(text: Column, n_buckets: int) -> Column:
    """Hashed-bigram feature buckets of a text Column (DSIR §3.1's
    hashed n-gram featurization, bigram variant): array of
    shingle_key60(bigram) mod n_buckets, one per adjacent token
    pair.  DuckDB twin: the same md5-top-60-bit construction the
    dedup/sampling family already replays."""
    from spacetime_crawler4py_spark.functions.text_quality import tokens_ws
    from spacetime_crawler4py_spark.operators.dedup import shingle_key60

    words = tokens_ws(F.coalesce(text, F.lit("")))
    k = F.size(words) - F.lit(1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.pmod(
                shingle_key60(F.concat_ws(" ", F.slice(words, i, 2))),
                F.lit(n_buckets),
            ).cast("int"),
        ),
    ).otherwise(F.array().cast("array<int>"))


def dsir_logweights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-doc DSIR importance log-weight (Xie et al. 2023 §3):
    log w(x) = Σ_f c_f(x) · (ln p_target(f) − ln p_source(f)) over
    hashed-bigram feature buckets, with add-``alpha`` smoothed
    bag-of-features multinomials fit on ``target`` (the domain you
    want more of) and ``df`` itself (the raw source pool).

    Returns (id, logw); docs with no bigrams score 0.0 (their
    importance is indistinguishable from the pool).

    Scale shape: two partial-agg groupBys over 4-byte bucket keys
    (the LMs — at most n_buckets rows each), one one-row totals
    cross-join (broadcast, same idiom as unigram_logprob), one
    per-(doc, bucket) count groupBy, and one broadcast join of the
    ≤n_buckets-row ratio table back to doc-bucket counts.  The
    corpus shuffles once, keyed by (doc, bucket); nothing all-pairs,
    nothing through the driver.
    """
    a = float(alpha)
    b_lit = float(n_buckets)
    src_occ = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_bigram_buckets(F.col(text_col), n_buckets)).alias("_b"),
    )
    tgt_occ = target.select(
        F.explode(_bigram_buckets(F.col(text_col), n_buckets)).alias("_b")
    )
    cs = src_occ.groupBy("_b").agg(F.count("*").alias("_cs"))
    ct = tgt_occ.groupBy("_b").agg(F.count("*").alias("_ct"))
    totals = cs.agg(F.sum("_cs").alias("_ts")).crossJoin(
        ct.agg(F.coalesce(F.sum("_ct"), F.lit(0)).alias("_tt"))
    )
    lm = (
        cs.join(ct, "_b", "full")
        .crossJoin(F.broadcast(totals))
        .select(
            "_b",
            (
                F.log(
                    (F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(a))
                    / (F.col("_tt") + F.lit(a * b_lit))
                )
                - F.log(
                    (F.coalesce(F.col("_cs"), F.lit(0)) + F.lit(a))
                    / (F.col("_ts") + F.lit(a * b_lit))
                )
            ).alias("_r"),
        )
    )
    docb = src_occ.groupBy("_id", "_b").agg(F.count("*").alias("_c"))
    scored = (
        docb.join(F.broadcast(lm), "_b")
        .groupBy("_id")
        .agg(F.sum(F.col("_c") * F.col("_r")).alias("logw"))
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("logw"), F.lit(0.0)).alias("logw"),
        )
    )


def dsir_sample(
    df: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR selection: Gumbel-top-k over the importance log-weights
    (Xie et al. 2023 §3.2's sampling-without-replacement), made
    deterministic the way every sampler here is — the Gumbel noise
    g = −ln(−ln(u)) draws u from ``hash_unit(id, salt)`` (shifted by
    +0.5/2^60 so u ∈ (0,1) strictly), a pure function of (salt, id)
    that is retry/partitioning-stable and DuckDB-replayable.

    Returns (id, logw, gumbel_key) — the k selected rows, ordered by
    (round(key, 6) DESC, id): rounding before ordering pins the
    boundary against engine-fold FP jitter, ids break exact ties.
    Plans as TakeOrderedAndProject — no global sort at any scale.
    """
    w = dsir_logweights(df, target, id_col, text_col, n_buckets, alpha)
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(_HASH_RANGE)
    key = F.col("logw") + (-F.log(-F.log(u)))
    return (
        w.select(id_col, "logw", key.alias("gumbel_key"))
        .orderBy(F.round("gumbel_key", 6).desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------
# cluster-balanced diversity sampling
# ---------------------------------------------------------------------


def cluster_balanced_sample(
    emb: DataFrame,
    per_cluster: int,
    k: int = 8,
    n_iter: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "diverse",
    assign: str = "auto",
) -> DataFrame:
    """Diversity sampling over an embedding column: k-means the
    corpus, then keep (up to) ``per_cluster`` rows from EVERY cluster
    — the cluster-balanced selection used to counter mode collapse in
    web corpora (boilerplate-heavy regions of embedding space stop
    drowning out rare ones; cf. the cluster step of SemDedup, Abbas
    et al. 2023, pointed at retention instead of removal).

    Within a cluster, rows are ranked by the deterministic hash unit
    u(id) (ties by id) — retry/partitioning-stable like every sampler
    here, and SQL-replayable (same md5 idiom).  The fit is the
    deterministic rounded Lloyd of ``similarity.kmeans_fit``, so the
    entire fit + assign + rank + cut replays in a DuckDB oracle.

    Returns (id, cid, rnk) for the selected rows.

    Scale shape: assign is the literal/broadcast-join argmin (no
    shuffle); the rank is one row_number window keyed by cid.  The
    window's skew exposure is bounded by design — the whole POINT of
    the fit is clusters of comparable size, and per_cluster ≪ |c|
    rows survive; for degenerate fits pre-thin with
    ``stratified_sample`` on cid first.
    """
    from spacetime_crawler4py_spark.operators.similarity import (
        _assign,
        kmeans_fit,
    )

    if centroids is None:
        centroids = kmeans_fit(
            emb, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col,
            assign=assign,
        )
    assigned = _assign(emb, centroids, vec_col, id_col, assign)
    u = hash_unit(F.col(id_col), salt)
    w = Window.partitionBy("cid").orderBy(u.asc(), F.col(id_col).asc())
    return (
        assigned.select(id_col, "cid")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= per_cluster)
    )


# ---------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis)
# ---------------------------------------------------------------------


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsamp",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the
    Efraimidis–Spirakis A-Res key u(id)^(1/w) — take the k largest
    keys and the inclusion probabilities match sequential weighted
    draws exactly (Efraimidis & Spirakis 2006, IPL 97(5)).  The
    uniform draw is the md5 hash unit (shifted into (0,1)), so the
    sample is a pure function of (salt, id, w): partitioning-,
    retry- and append-stable like every sampler here, and replayable
    in one line of SQL.

    Rows with weight ≤ 0 or NULL are excluded (key undefined).
    Plans as TakeOrderedAndProject on (round(key, 9) DESC, id) —
    no global sort; ties broken by id after rounding pins the
    boundary against FP jitter.

    This is the corpus-mixing primitive quality-weighted selection
    wants (sample k docs ∝ quality score) — the importance-weighted
    cousin of ``dsir_sample``'s Gumbel-top-k (Gumbel keys add
    log-weights; A-Res exponentiates — both deterministic here).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(_HASH_RANGE)
    w = F.col(weight_col).cast("double")
    key = F.pow(u, F.lit(1.0) / w)
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("samp_key", key)
        .orderBy(F.round("samp_key", 9).desc(), F.col(id_col))
        .limit(k)
    )
