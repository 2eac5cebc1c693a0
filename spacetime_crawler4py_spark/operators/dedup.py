"""Deduplication operator family for large-scale training-data
pipelines (engine extension beyond the reference; the reference's
own dedup ops are F8 url-hash, F10 url-defrag and F11 simhash —
all in frontier/ and indexing/).

Every operator here follows the same scale shape:

  per-doc signature (JVM expressions where possible)
  → candidate pairs via an EQUI-join on a bounded bucket key
    (bands / shingles / hyperplane signs — never an O(n²) cross)
  → exact verification filter on the candidates
  → representative selection: keep the lowest doc id of each
    duplicate group (drop any doc with an edge to a lower id)

- exact_dedup          hash-groupBy on md5(text) — one shuffle
- ngram_jaccard_pairs  word n-gram shingles, Jaccard via shared
                       shingle counts (pure joins+aggs, SQL-oracle-able)
- minhash_lsh_*        MinHash signatures (Broder 1997) from
                       md5-derived (SQL-oracle-able; xxhash64 opt-in)
                       shingle hashes under k universal hash perms
                       (Carter-Wegman a*h+b mod p), LSH banding
                       (Leskovec et al., MMDS ch.3)
- simhash              see indexing.postings.simhash_dedup
- embedding_neardup_pairs  cosine ≥ t via random-hyperplane LSH
                       buckets (Charikar 2002) + exact cosine check
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# Mersenne prime 2^31-1: universal-hash modulus.  Chosen so a*h+b
# with a,h < p stays under 2^62 — no long overflow under Spark's
# ANSI arithmetic (default in Spark 4).
MERSENNE_P = (1 << 31) - 1


# ------------------------------------------------------------- exact


def normalize_text(col: Column) -> Column:
    """Dedup normalization (the "normalized exact" pre-hash step of
    CCNet/Dolma-style pipelines): lowercase, non-alphanumerics to
    spaces, whitespace collapsed, trimmed — so case, punctuation and
    formatting variants of the same document hash identically.

    Cross-engine note: DuckDB's regexp_replace replaces only the
    FIRST match unless passed the 'g' flag; Spark's is global by
    default.  Every SQL oracle twin of this function must pass 'g'.
    """
    t = F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalized: bool = False,
) -> DataFrame:
    """Keep the lowest-id doc per identical text (md5 group key);
    ``normalized=True`` hashes ``normalize_text`` output instead, so
    case/punctuation/whitespace variants collapse to one copy.

    groupBy on the 128-bit hash, not the text itself — the shuffle
    moves 16-byte keys instead of documents.
    """
    key = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    reps = (
        df.select(F.md5(key).alias("_h"), F.col(id_col).alias("_id"))
        .groupBy("_h")
        .agg(F.min("_id").alias(id_col))
        .select(id_col)
    )
    return df.join(reps, id_col, "left_semi")


# ------------------------------------------------- n-gram Jaccard


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams as strings, JVM-side (split + transform).

    Empty tokens (leading whitespace artifacts of regex split) are
    filtered so shingles match a filtered-token oracle exactly.

    Docs with fewer than ``n`` words (and null texts) yield the
    empty array — the k<=0 branch must be guarded because
    ``sequence(1, 0)`` is a DESCENDING sequence in Spark, whose
    second element would reach ``slice(words, 0, n)`` and throw
    under ANSI mode.
    """
    words = F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")
    k = F.size(words) - F.lit(n - 1)
    sh = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(sh)


def shingle_key60(col: Column) -> Column:
    """Shingle string → 60-bit int join key (top 15 hex digits of
    md5).  Used so the shingle self-join shuffles 8-byte longs
    instead of full shingle strings (several-fold fewer shuffle
    bytes at 100 TB).  Cross-engine reproducible — DuckDB:
    ``('0x' || substr(md5(s), 1, 15))::BIGINT`` — so the SQL oracle
    joins on the SAME key and sees the same (negligible, ~2⁻⁶⁰-rate)
    collisions; parity is exact by construction, not probabilistic.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def ngram_hot_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int = 1000,
    shingle_key: str = "hash60",
) -> DataFrame:
    """Audit twin of ngram_jaccard_pairs' hot-shingle guard: the
    (s, df) rows the pair join DROPS under ``max_df`` (document
    frequency > max_df).  One agg — run it alongside a capped pair
    job to account for every shingle the cap silenced (the repo's
    no-silent-caps rule)."""
    key = (
        shingle_key60(F.col("s")).alias("s")
        if shingle_key == "hash60"
        else F.col("s")
    )
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("s"),
    ).select("id", key)
    return (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_df)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    shingle_key: str = "hash60",  # "hash60" | "string"
    max_df: int = 1000,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with shingle-Jaccard ≥ t.

    Exact (not approximate): candidates come from the shingle
    equi-self-join — only docs sharing ≥1 shingle are compared, and
    Jaccard is computed from exact shared/size counts.  The join key
    is the 60-bit md5-derived shingle hash by default (8-byte
    shuffle rows; see shingle_key60) — ``shingle_key='string'``
    keeps the raw-shingle join for debugging/audit.  Hot shingles
    are the skew risk, so pair generation drops shingles occurring
    in more than ``max_df`` docs (ubiquitous shingles can't push a
    pair over a high threshold alone but quadratically blow up the
    join).  The cap is NOT silent: it is a parameter, the active
    value is logged, and ``ngram_hot_shingles(...)`` returns exactly
    the (s, df) rows it dropped for audit; per-doc shingle SIZES are
    computed before the cap, so Jaccard denominators are unaffected
    — only candidate generation through hot shingles is.
    """
    from spacetime_crawler4py_spark.operators.ids import (
        ensure_min_partitions,
        scratch_cache,
    )

    key = (
        shingle_key60(F.col("s")).alias("s")
        if shingle_key == "hash60"
        else F.col("s")
    )
    # referenced 3x below (sizes, df-filter, join) — shingle
    # generation is the CPU-heavy step and must not re-run per
    # branch; scratch_cache self-evicts on the next operator call
    sh = scratch_cache(
        ensure_min_partitions(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(F.col(text_col), n)).alias("s"),
        )
        .select("id", key)
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    log.info(
        "ngram_jaccard_pairs: hot-shingle cap max_df=%d active "
        "(audit dropped shingles via ngram_hot_shingles)", max_df,
    )
    rare = sh.join(
        sh.groupBy("s").agg(F.count("*").alias("df")).where(F.col("df") <= max_df),
        "s",
    )
    pairs = (
        rare.alias("a")
        .join(rare.alias("b"), "s")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def ngram_jaccard_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, threshold: float = 0.8, max_df: int = 1000,
) -> DataFrame:
    pairs = ngram_jaccard_pairs(df, text_col, id_col, n, threshold, max_df=max_df)
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")


# ------------------------------------------------------- MinHash LSH


def _perm_coeffs(k: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(k)
    ]


def shingle_base_hash(col: Column, base_hash: str = "md5") -> Column:
    """Shingle → int in [0, MERSENNE_P), JVM-side.

    - ``md5``       (default) top-60-bits of md5 as an int — chosen
      because it is reproducible in ANSI SQL (DuckDB:
      ``('0x' || substr(md5(s), 1, 15))::BIGINT``), so the full
      MinHash pipeline is hard-verifiable by the driver's oracle.
    - ``xxhash64``  the faster JVM hash for production runs where
      cross-engine verification isn't needed.
    Both stay inside whole-stage codegen; md5 costs ~1 extra digest
    per shingle.
    """
    if base_hash == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(MERSENNE_P))
    if base_hash == "md5":
        return F.pmod(
            F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"),
            F.lit(MERSENNE_P),
        )
    raise ValueError(f"unknown base_hash {base_hash!r}: use 'md5' or 'xxhash64'")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 64,
    seed: int = 42,
    base_hash: str = "md5",
) -> DataFrame:
    """(id, sig array<long>) — k MinHash values, fully JVM-side and
    SHUFFLE-FREE.

    Each permutation is (a*h + b) mod p over the Mersenne prime
    2^31-1.  The k mins are computed per row as one ``aggregate``
    fold over the doc's shingle-hash array: each shingle hash is
    evaluated ONCE (one md5 per shingle) and folded into a k-long
    running-min vector via zip_with/least.  No explode, no groupBy —
    a narrow map stage whose output is k longs/doc, so signature
    computation never shuffles at all (the earlier explode +
    k-partial-min groupBy shape paid a shuffle of partial aggregates
    per doc).  ``base_hash`` picks the shingle hash (see
    shingle_base_hash).
    """
    from spacetime_crawler4py_spark.operators.ids import ensure_min_partitions

    df = ensure_min_partitions(df)
    coeffs = _perm_coeffs(k, seed)
    shingles = word_shingles(F.col(text_col), n)
    hashes = F.transform(shingles, lambda s: shingle_base_hash(s, base_hash))
    ab = F.array(
        *[
            F.struct(
                F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b")
            )
            for (a, b) in coeffs
        ]
    )
    # init = p sentinel (every perm value is < p); h < p and a < p so
    # h*a + b < 2^62 — no ANSI overflow
    init = F.array(*([F.lit(MERSENNE_P).cast("long")] * k))
    sig = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            ab,
            lambda m, c: F.least(
                m, F.pmod(h * c["a"] + c["b"], F.lit(MERSENNE_P))
            ),
        ),
    )
    # Empty-doc guard: equivalent to size(shingles) > 0 but CHEAP —
    # a doc yields >=1 shingle iff it has >= n words.  The guard
    # matters for the plan, not just the rows: Catalyst pushes
    # deterministic filters below the ensure_min_partitions
    # round-robin exchange, so whatever the predicate computes runs
    # on the UNSPREAD scan partitions.  Filtering on size(shingles)
    # rebuilt the whole shingle array (split + slice + concat_ws +
    # array_distinct per doc) single-core before the spread — a
    # 1-task stage that dominated signature wall-clock; the word
    # count is one split+filter, leaving the heavy fold above the
    # exchange where it runs at session parallelism.
    n_words = F.size(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    )
    return df.where(n_words >= n).select(
        F.col(id_col).alias("id"), sig.alias("sig")
    )


def _banded(sigs: DataFrame, bands: int, rows: int) -> DataFrame:
    """(id, sig, band, bkey): one row per LSH band per signature."""
    return sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",", *[F.element_at("sig", bi * rows + ri + 1) for ri in range(rows)]
                        )
                    ).alias("bkey"),
                )
                for bi in range(bands)
            ])
        ).alias("b"),
    ).select("id", "sig", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))


def _cap_buckets(banded: DataFrame, max_bucket: int | None, who: str) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket`` before a pair
    join.  The count window partitions by the SAME (band, bkey) key
    the join shuffles on, so the exchange is reused — the cap costs
    no extra shuffle.  Not silent: the active cap is logged and
    ``minhash_hot_buckets(...)`` returns the dropped buckets."""
    if max_bucket is None:
        return banded
    log.info(
        "%s: hot-bucket cap max_bucket=%d active "
        "(audit dropped buckets via minhash_hot_buckets)", who, max_bucket,
    )
    w = Window.partitionBy("band", "bkey")
    return (
        banded.withColumn("_bsz", F.count("*").over(w))
        .where(F.col("_bsz") <= max_bucket)
        .drop("_bsz")
    )


def minhash_hot_buckets(
    sigs: DataFrame, bands: int = 16, rows: int = 4, max_bucket: int = 1000
) -> DataFrame:
    """Audit twin of the pair APIs' ``max_bucket`` guard: the
    (band, bkey, size) buckets the all-pairs join DROPS.  One agg."""
    return (
        _banded(sigs, bands, rows)
        .groupBy("band", "bkey")
        .agg(F.count("*").alias("size"))
        .where(F.col("size") > max_bucket)
    )


def _score_band_candidates(cand: DataFrame, threshold: float) -> DataFrame:
    """Estimate Jaccard (fraction of agreeing minhash components)
    and dedup candidate edges.  The est filter runs BEFORE the
    (id_a, id_b) distinct, so the dedup exchange shuffles 24-byte
    rows instead of two k-long signature arrays per candidate —
    at web scale the candidate stream is the widest point of the
    whole dedup pipeline, and scoring first collapses it to
    (long, long, double) before it ever moves."""
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    ) / F.size("sig_a")
    return (
        cand.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_cross_pairs(
    sigs_a: DataFrame,
    sigs_b: DataFrame,
    bands: int = 16,
    rows: int = 4,
    threshold: float = 0.7,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """(id_a ∈ sigs_a, id_b ∈ sigs_b, est_jaccard) — the TWO-TABLE
    banded join (streaming/incremental dedup: history vs new batch).
    Same estimator as minhash_lsh_pairs; no id ordering constraint
    across the two sides.  Each side's buckets are capped at
    ``max_bucket`` (the cross blow-up is |a_bucket|·|b_bucket|)."""
    a = _cap_buckets(
        _banded(sigs_a, bands, rows), max_bucket, "minhash_cross_pairs"
    ).select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bkey"
    )
    b = _cap_buckets(
        _banded(sigs_b, bands, rows), max_bucket, "minhash_cross_pairs"
    ).select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bkey"
    )
    cand = a.join(b, ["band", "bkey"]).select("id_a", "id_b", "sig_a", "sig_b")
    return _score_band_candidates(cand, threshold)


def minhash_lsh_pairs(
    sigs: DataFrame,
    bands: int = 16,
    rows: int = 4,
    threshold: float = 0.7,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """(id_a, id_b, est_jaccard): LSH band join + signature check —
    the ALL-PAIRS listing API.

    est_jaccard = fraction of matching minhash components (unbiased
    Jaccard estimator); band key is a hash of each ``rows``-slice of
    the signature, so the self-join shuffles a bounded key.

    All-pairs within a bucket is inherently O(c²): a c-member
    boilerplate mega-cluster (the #1 web-corpus skew pathology —
    every member shares EVERY band key) would emit ~c²/2 candidates
    per band.  ``max_bucket`` bounds that: buckets larger than the
    cap contribute no pairs (logged; audit the dropped buckets via
    ``minhash_hot_buckets``).  For the DEDUP consumer, which only
    needs connectivity, use ``minhash_star_edges`` instead — O(c)
    edges per bucket, no cap needed.
    """
    banded = _cap_buckets(_banded(sigs, bands, rows), max_bucket, "minhash_lsh_pairs")

    a = banded.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bkey"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bkey"
    )
    cand = (
        a.join(b, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
    )
    return _score_band_candidates(cand, threshold)


def minhash_star_edges(
    sigs: DataFrame, bands: int = 16, rows: int = 4, threshold: float = 0.7
) -> DataFrame:
    """(id_a, id_b, est_jaccard) STAR edges: within each (band, bkey)
    bucket, each member is compared only to the bucket-MIN id —
    O(c) edges per bucket instead of the all-pairs O(c²), so a
    boilerplate mega-cluster (every member sharing every band key)
    costs c·bands edge candidates instead of c²/2 per band.  No cap
    is needed; nothing is dropped.

    Edge semantics vs minhash_lsh_pairs: the signature-agreement
    threshold is still verified per edge, so a bucket member whose
    est-Jaccard to the bucket min is below t contributes no edge even
    if it is ≥t-similar to some OTHER bucket member — star trades
    that heterogeneous-bucket recall (each minhash band is ~rows/64
    of the signature; genuinely similar pairs co-occur in many
    buckets and get many chances) for the c² → c candidate bound.
    On the pathology the bound exists for — near-identical
    boilerplate, where every member matches the min — components are
    identical to all-pairs.  id_a < id_b always (the min is minimal
    in its bucket).
    """
    banded = _banded(sigs, bands, rows)
    w = Window.partitionBy("band", "bkey")
    # min over struct(id, sig): ids are distinct within a bucket, so
    # ordering never reaches the array field — this is argmin-by-id
    # carrying the min's signature, in the same (band, bkey) window
    # shuffle the bucket grouping needs anyway.
    m = F.min(F.struct(F.col("id"), F.col("sig"))).over(w)
    cand = (
        banded.select(
            "id",
            "sig",
            m.getField("id").alias("id_a"),
            m.getField("sig").alias("sig_a"),
        )
        .where(F.col("id") != F.col("id_a"))
        .select(
            "id_a",
            F.col("id").alias("id_b"),
            "sig_a",
            F.col("sig").alias("sig_b"),
        )
    )
    return _score_band_candidates(cand, threshold)


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    rows: int = 4,
    threshold: float = 0.7,
    seed: int = 42,
    base_hash: str = "md5",
    mode: str = "min_edge",
    pair_mode: str = "star",
) -> DataFrame:
    """MinHash near-dup dedup.  ``pair_mode='star'`` (default) feeds
    the representative selection with bucket-star edges — the
    scale-safe O(c)-per-bucket shape (see minhash_star_edges);
    ``'all_pairs'`` uses the capped all-pairs listing."""
    sigs = minhash_signatures(df, text_col, id_col, n, k, seed, base_hash)
    if pair_mode == "star":
        pairs = minhash_star_edges(sigs, bands, rows, threshold)
    elif pair_mode == "all_pairs":
        pairs = minhash_lsh_pairs(sigs, bands, rows, threshold)
    else:
        raise ValueError(f"unknown pair_mode {pair_mode!r}: use 'star' or 'all_pairs'")
    return dedup_representatives(df, pairs, id_col, mode)


# --------------------------------------------- embedding near-dup


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, JVM-side
    (zip_with dot product + aggregate norms; no Python crossing).

    NULL when either vector has zero norm (ANSI mode would otherwise
    raise DIVIDE_BY_ZERO): a zero vector is never a near-dup and
    never ranks in top-k — threshold filters drop the NULL, desc
    sorts put it last.  Engine note: DuckDB's
    list_cosine_similarity yields -1.0 for the same zero-norm input;
    both fail any ``>= eps`` gate (eps > -1) so every current oracle
    agrees, but a query surfacing the RAW cosine of a zero-norm
    vector would diverge — coalesce to a pinned sentinel on both
    sides before oracle-gating such a query."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    denom = na * nb
    return F.when(denom != 0, dot / denom)


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane sign bucket (Charikar 2002 SimHash for
    vectors): bit i = sign(<v, plane_i>).  Planes are literals —
    the whole expression is JVM-side."""
    bits = []
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec, lit, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def make_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def embedding_neardup_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, cos) with cosine ≥ t; candidates share an LSH
    sign-bucket (near-identical vectors agree on all signs with
    overwhelming probability), verified with exact cosine."""
    planes = make_planes(dim, n_planes, seed)
    bucketed = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    a = bucketed.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "bucket")
    b = bucketed.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_sim(F.col("v_a"), F.col("v_b")))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# ------------------------------------ representative selection modes


def dedup_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    mode: str = "min_edge",
    small_edges_threshold: int = 100_000,
) -> DataFrame:
    """Reduce near-dup PAIRS (id_a, id_b edges) to the kept rows of
    ``df`` under an explicit, chosen semantics (VERDICT r1 #10: the
    divergence between modes is a choice, pinned by tests — see
    tests/test_training_ops.py::test_chained_cluster_semantics):

    - ``min_edge``  (default, the round-1 rule): drop any doc with an
      edge to a LOWER id.  One anti-join.  On a chained cluster
      A~B~C (A≁C) this drops C even though C is not similar to the
      kept A.
    - ``cc_min``: connected components over the pair graph
      (large-star/small-star, operators/graph.py); keep the minimum
      id per component.  Same kept set as min_edge on every graph
      (the min of a component never has an edge to a lower id; every
      other member reaches the min by a path, and its first hop
      witnesses an edge to a lower id — both rules keep exactly the
      component minima); materially different COST shape: O(log²)
      rounds but produces cluster ids for downstream audit.
      Returns an extra ``component`` column.
    - ``arrival``: the reference's incremental-index semantics
      (SimhashIndex arrival order, indexer.py): docs arrive in id
      order; a doc is dropped iff it is similar to an already-KEPT
      doc.  On A~B~C: B dropped (near kept A), C KEPT (near only B,
      which was dropped).  Computed per-component via applyInPandas
      — components from LSH near-dup graphs are small (bounded by
      cluster diameter), so the per-group Python loop is bounded;
      the sequential dependency is confined INSIDE a component,
      which is the only place it exists semantically.
    """
    if mode == "min_edge":
        # orientation-insensitive: the HIGHER endpoint of each edge
        # has an edge to a lower id (operators emit id_a < id_b, but
        # don't rely on it)
        drop = pairs.select(
            F.greatest("id_a", "id_b").alias(id_col)
        ).distinct()
        return df.join(drop, id_col, "left_anti")

    if mode not in ("cc_min", "arrival"):
        raise ValueError(f"unknown mode {mode!r}")

    # Adaptive cutover (same principle as operators/ids.py): the
    # EDGE LIST is derived data, usually orders of magnitude smaller
    # than the corpus.  Under the threshold, collect the edges and
    # resolve clusters driver-side (exact union-find / arrival sim —
    # one job + one broadcast join, instead of the O(log^2) CC
    # iteration whose per-round fixed costs dominate small graphs).
    # Above it, the distributed large-star/small-star path runs.
    from spacetime_crawler4py_spark.operators.ids import scratch_cache

    # cache the edge list: the probe below and the CC/arrival pass
    # both evaluate it, and for minhash graphs it is the expensive
    # LSH band join
    pairs = scratch_cache(pairs.select("id_a", "id_b"))
    edge_rows = None
    if small_edges_threshold > 0:
        # one job: fetch threshold+1 rows; a full result means "too
        # big, go distributed" without having counted everything
        probe = (
            pairs.select("id_a", "id_b")
            .limit(small_edges_threshold + 1)
            .collect()
        )
        if len(probe) <= small_edges_threshold:
            edge_rows = probe
    if edge_rows is not None:
        nodes = sorted({r["id_a"] for r in edge_rows} | {r["id_b"] for r in edge_rows})
        if mode == "cc_min":
            parent = {n: n for n in nodes}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for r in edge_rows:
                ra, rb = find(r["id_a"]), find(r["id_b"])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            comp_of = {n: find(n) for n in nodes}
            cmin: dict = {}
            for n, c in comp_of.items():
                cmin[c] = min(cmin.get(c, n), n)
            keep_rows = [(n, cmin[comp_of[n]]) for n in nodes if n == cmin[comp_of[n]]]
            keep_df = df.sparkSession.createDataFrame(
                keep_rows or [], f"{id_col} long, component long"
            )
            members = df.sparkSession.createDataFrame(
                [(n,) for n in nodes] or [], f"{id_col} long"
            )
            non_members = df.join(
                F.broadcast(members), id_col, "left_anti"
            ).withColumn("component", F.col(id_col))
            return df.join(F.broadcast(keep_df), id_col, "inner").unionByName(
                non_members
            )
        # arrival: id-order incremental sim over the edge list
        nbr = {n: set() for n in nodes}
        for r in edge_rows:
            nbr[r["id_a"]].add(r["id_b"])
            nbr[r["id_b"]].add(r["id_a"])
        kept_set: set = set()
        for n in nodes:
            if not (nbr[n] & kept_set):
                kept_set.add(n)
        dropped = df.sparkSession.createDataFrame(
            [(n,) for n in nodes if n not in kept_set] or [], f"{id_col} long"
        )
        return df.join(F.broadcast(dropped), id_col, "left_anti")

    from spacetime_crawler4py_spark.operators.graph import connected_components

    comp = connected_components(pairs, "id_a", "id_b")

    if mode == "cc_min":
        keep = comp.where(F.col("node") == F.col("component")).select(
            F.col("node").alias(id_col), "component"
        )
        non_members = df.join(
            comp.select(F.col("node").alias(id_col)), id_col, "left_anti"
        ).withColumn("component", F.col(id_col))
        return df.join(keep, id_col, "inner").unionByName(non_members)

    if mode == "arrival":
        import pandas as pd

        from pyspark.sql.types import LongType, StructField, StructType

        edges_by_comp = (
            pairs.select(
                F.least("id_a", "id_b").alias("lo"),
                F.greatest("id_a", "id_b").alias("hi"),
            )
            .distinct()
            .join(
                comp.select(F.col("node").alias("lo"), "component"), "lo"
            )
        )

        out_schema = StructType([StructField(id_col, LongType())])

        def kept_of_component(pdf: pd.DataFrame) -> pd.DataFrame:
            nodes = sorted(set(pdf["lo"]) | set(pdf["hi"]))
            nbr = {n: set() for n in nodes}
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                nbr[lo].add(hi)
                nbr[hi].add(lo)
            kept: list[int] = []
            kept_set: set[int] = set()
            for n in nodes:  # arrival = id order
                if not (nbr[n] & kept_set):
                    kept.append(n)
                    kept_set.add(n)
            return pd.DataFrame({id_col: kept})

        kept_ids = edges_by_comp.groupBy("component").applyInPandas(
            kept_of_component, out_schema
        )
        non_members = df.join(
            comp.select(F.col("node").alias(id_col)), id_col, "left_anti"
        )
        return df.join(kept_ids, id_col, "inner").unionByName(non_members)

    raise ValueError(f"unknown mode {mode!r}")


# --------------------------------------------------------- winnowing


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm), word
    k-gram variant: the ORDERED sequence of k-gram hashes h_1..h_m is
    scanned with a window of ``w`` consecutive hashes, each window
    contributes its minimum, and the fingerprint set is the distinct
    window minima.

    The paper's guarantee carries over: any run of ``w + k - 1``
    words shared by two documents selects at least one common
    fingerprint, so matching is recall-complete for runs of that
    length while keeping ~2/(w+1) of all gram hashes.  The selected
    SET is tie-break-independent (equal minima pick the same value),
    so no positional tie rule is needed for set semantics and
    positions are deliberately not emitted — at 100 TB the
    fingerprint table is (doc, 8-byte hash) rows, nothing else.

    Entirely JVM-side (split / transform / slice / array_min): one
    narrow projection per document, no Python crossing, no shuffle —
    consumers (``winnow_pairs``, per-corpus stats) pay the only
    exchange.  Boundary treatment: docs with < k words yield the
    empty set; docs with ≥ 1 gram but < w windows yield the global
    minimum (one fingerprint), so every fingerprintable doc gets
    at least one.

    Returns (id_col, fingerprints array<long> sorted ascending).
    Gram hash = top-60-bit md5 (``shingle_key60``), cross-engine
    reproducible for the DuckDB oracle.
    """
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    ng = F.size(words) - F.lit(k - 1)
    grams = F.when(
        ng > 0,
        F.transform(
            F.sequence(F.lit(1), ng),
            lambda i: shingle_key60(F.concat_ws(" ", F.slice(words, i, k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    with_g = df.select(F.col(id_col), grams.alias("_g"))
    m = F.size(F.col("_g"))
    nw = m - F.lit(w - 1)
    fps = (
        F.when(
            nw > 0,
            F.transform(
                F.sequence(F.lit(1), nw),
                lambda j: F.array_min(F.slice(F.col("_g"), j, w)),
            ),
        )
        .when(m > 0, F.array(F.array_min(F.col("_g"))))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return with_g.select(
        id_col, F.array_sort(F.array_distinct(fps)).alias("fingerprints")
    )


def _winnow_fp_rows(fps: DataFrame, id_col: str) -> DataFrame:
    """Explode (id, fingerprints[]) to (id, fp) rows WITHOUT letting
    the optimizer re-derive the array.

    A plain ``explode`` makes InferFiltersFromGenerate add a
    ``size(fingerprints) > 0`` filter that predicate-pushdown then
    inlines BELOW the projections — the filter re-evaluates the whole
    fingerprint expression, and because the window-min transform
    references the gram array per element, inlining turns the
    per-document cost from O(grams + windows) into
    O(windows x grams) md5 re-evaluations (measured ~50 ms/doc —
    a 250 s sf0.1 stage for an 82k-row result).  ``explode_outer``
    generates no such inferred filter; the null rows (empty sets)
    are dropped AFTER the Generate on the produced column, which is
    cheap and cannot be pushed through it.
    """
    return (
        fps.select(F.col(id_col).alias("id"), F.explode_outer("fingerprints").alias("fp"))
        .where(F.col("fp").isNotNull())
    )


def winnow_hot_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    max_df: int = 1000,
) -> DataFrame:
    """Audit twin of ``winnow_pairs``' hot-fingerprint guard: the
    (fp, df) rows candidate generation DROPS under ``max_df`` —
    run alongside a capped pair job so the cap is never silent."""
    fp = _winnow_fp_rows(winnow_fingerprints(df, text_col, id_col, k, w), id_col)
    return (
        fp.groupBy("fp").agg(F.count("*").alias("df")).where(F.col("df") > max_df)
    )


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_df: int = 1000,
) -> DataFrame:
    """(id_a, id_b, shared) for document pairs sharing at least
    ``min_shared`` winnowing fingerprints — the MOSS match step as
    an equi-join on the 8-byte fingerprint (never an O(n²) cross).

    Same skew discipline as ``ngram_jaccard_pairs``: fingerprints
    appearing in more than ``max_df`` docs (boilerplate runs — the
    dominant web-corpus pathology) are dropped from candidate
    generation; the cap is a parameter, the active value is logged,
    and ``winnow_hot_fingerprints(...)`` returns exactly the dropped
    (fp, df) rows for audit.
    """
    from spacetime_crawler4py_spark.operators.ids import (
        ensure_min_partitions,
        scratch_cache,
    )

    fp = scratch_cache(
        _winnow_fp_rows(
            winnow_fingerprints(ensure_min_partitions(df), text_col, id_col, k, w),
            id_col,
        )
    )
    log.info("winnow_pairs: hot-fingerprint cap max_df=%d active", max_df)
    rare = fp.join(
        fp.groupBy("fp").agg(F.count("*").alias("df")).where(F.col("df") <= max_df),
        "fp",
    )
    return (
        rare.alias("a")
        .join(rare.alias("b"), "fp")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
