"""Corpus-quality operators for training-data pipelines: repetition
metrics and benchmark decontamination (engine extension beyond the
reference, like operators/dedup.py; the reference's only quality
gates are the F6/F7 content checks in scraper.py).

Both follow the family's scale shape (per-doc JVM expressions →
bounded-key equi-joins; no cross joins, no driver collects):

- repetition_metrics    Gopher-style repeated-content signals (Rae
                        et al. 2021 §A1.1: duplicate line / word
                        fractions, fraction of characters inside the
                        most frequent word n-gram).  Line/word
                        fractions are pure per-row Column math; the
                        top-n-gram pass is one explode + partial-agg
                        groupBy keyed by (doc, gram) then a per-doc
                        window over the already-aggregated counts —
                        group sizes are bounded by document length,
                        so no key skews beyond the longest doc.
- contamination_flags   benchmark n-gram overlap (the GPT-3 appendix
                        C / PaLM decontamination recipe): a training
                        doc is contaminated when it shares any word
                        n-gram with the evaluation benchmark.  The
                        benchmark's distinct gram-hash set is tiny
                        relative to the corpus (13-grams of eval
                        sets: ~10⁶-10⁷ rows) → broadcast equi-join
                        against the corpus's exploded distinct grams;
                        only (doc_id, hit) pairs reach the shuffle.
- decontaminate         drop flagged docs via left_anti on doc id.

Gram keys are the 60-bit md5-derived ints of operators/dedup.py
(shingle_key60) so the DuckDB oracle twin joins on the SAME key —
parity is exact by construction, and the join shuffles 8-byte longs
instead of 13-word strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.functions.text_quality import tokens_ws
from spacetime_crawler4py_spark.operators.dedup import shingle_key60


def word_ngrams(text: Column, n: int, distinct: bool = False) -> Column:
    """Word n-grams as strings, JVM-side; NON-distinct by default
    (repetition counting needs multiplicity — operators that need
    the set form pass distinct=True, matching dedup.word_shingles).
    Docs with fewer than ``n`` words yield the empty array (the
    k<=0 guard avoids ANSI-mode descending-sequence errors)."""
    words = tokens_ws(text)
    k = F.size(words) - F.lit(n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams) if distinct else grams


def dup_word_frac(text: Column) -> Column:
    """1 - distinct_words/words (0.0 for empty/null docs)."""
    ws = tokens_ws(text)
    return F.when(
        F.size(ws) > 0,
        F.lit(1.0) - F.size(F.array_distinct(ws)) / F.size(ws),
    ).otherwise(F.lit(0.0))


def dup_line_frac(text: Column) -> Column:
    """1 - distinct_lines/lines over non-blank '\\n' lines (Gopher's
    duplicate-line fraction; 0.0 for single-line or empty docs)."""
    ls = F.filter(F.split(text, r"\n"), lambda l: F.trim(l) != "")
    return F.when(
        F.size(ls) > 0,
        F.lit(1.0) - F.size(F.array_distinct(ls)) / F.size(ls),
    ).otherwise(F.lit(0.0))


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """(doc_id, dup_word_frac, dup_line_frac, top_ngram,
    top_ngram_char_frac): per-doc repeated-content signals.

    top_ngram is the doc's most frequent word ``n``-gram (ties break
    to the lexicographically smallest, deterministically — the same
    order the SQL oracle twin encodes); top_ngram_char_frac is the
    fraction of the doc's characters covered by that gram's
    occurrences (count · len(gram) / len(text)), the Gopher
    "fraction of characters in most common n-gram" signal.

    Docs with fewer than ``n`` words report ('' , 0.0).
    """
    from spacetime_crawler4py_spark.operators.ids import ensure_min_partitions

    t = F.col(text_col)
    base = ensure_min_partitions(df).select(
        F.col(id_col).alias("id"),
        F.greatest(F.length(t), F.lit(1)).alias("n_chars"),
        F.round(dup_word_frac(t), 4).alias("dup_word_frac"),
        F.round(dup_line_frac(t), 4).alias("dup_line_frac"),
        word_ngrams(t, n).alias("grams"),
    )
    counts = (
        base.select("id", "n_chars", F.explode("grams").alias("g"))
        .groupBy("id", "n_chars", "g")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("id").orderBy(F.col("cnt").desc(), F.col("g").asc())
    top = (
        counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "id",
            F.col("g").alias("top_ngram"),
            F.round(
                F.col("cnt") * F.length("g") / F.col("n_chars"), 4
            ).alias("top_ngram_char_frac"),
        )
    )
    return (
        base.drop("grams", "n_chars")
        .join(top, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "dup_word_frac",
            "dup_line_frac",
            F.coalesce("top_ngram", F.lit("")).alias("top_ngram"),
            F.coalesce("top_ngram_char_frac", F.lit(0.0)).alias(
                "top_ngram_char_frac"
            ),
        )
    )


def c4_gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 30,
    max_words: int = 100_000,
    mean_word_len_lo: float = 3.0,
    mean_word_len_hi: float = 10.0,
    max_dup_word_frac: float = 0.9,
    max_symbol_ratio: float = 0.1,
    stopword_list: list[str] | None = None,
) -> DataFrame:
    """Per-doc pass/fail for the standard cheap webtext filter rules
    (C4, Raffel et al. 2020 §2.2; Gopher, Rae et al. 2021 §A1.1):

      ok_words      min_words <= word count <= max_words
      ok_word_len   mean word length within [lo, hi]
      ok_symbols    symbol chars ({}#<>[]\\|) / chars <= ratio
      ok_stopwords  contains >= 2 distinct English function words
                    (C4's 'contains at least one of the ...' gate;
                    non-English text fails it by design — run after
                    language routing or override stopword_list)
      ok_repetition duplicate-word fraction below the cap
      keep          AND of all rules

    All rules are pure per-row Column math (one projection, no
    shuffle, whole-stage codegen) — the shape a 100 TB pre-filter
    must have: it runs inside the scan stage and cuts the corpus
    before any expensive operator sees it.
    """
    from spacetime_crawler4py_spark.functions.text_quality import (
        mean_word_len,
    )

    # null-safe: a null text evaluates every rule as if empty (all
    # content rules false, keep false) instead of null-poisoning the
    # AND chain
    t = F.coalesce(F.col(text_col), F.lit(""))
    # Gopher §A1.1's exact function-word gate list
    stops = stopword_list or [
        "the", "be", "to", "of", "and", "that", "have", "with",
    ]
    ws = tokens_ws(t)
    n_words = F.size(ws)
    stop_arr = F.array(*[F.lit(s) for s in stops])
    n_stop_distinct = F.size(
        F.array_intersect(F.array_distinct(ws), stop_arr)
    )
    sym_ratio = F.length(
        F.regexp_replace(t, r"[^{}#<>\[\]\\|]", "")
    ) / F.greatest(F.length(t), F.lit(1))
    flags = df.select(
        F.col(id_col),
        (n_words.between(min_words, max_words)).alias("ok_words"),
        mean_word_len(t).between(mean_word_len_lo, mean_word_len_hi).alias(
            "ok_word_len"
        ),
        (sym_ratio <= max_symbol_ratio).alias("ok_symbols"),
        (n_stop_distinct >= 2).alias("ok_stopwords"),
        (dup_word_frac(t) <= max_dup_word_frac).alias("ok_repetition"),
    )
    keep = (
        F.col("ok_words")
        & F.col("ok_word_len")
        & F.col("ok_symbols")
        & F.col("ok_stopwords")
        & F.col("ok_repetition")
    )
    return flags.withColumn("keep", keep)


def _gram_hashes(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, h): 60-bit hashes of each doc's DISTINCT word n-grams."""
    from spacetime_crawler4py_spark.operators.ids import ensure_min_partitions

    return ensure_min_partitions(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), n, distinct=True)).alias("g"),
    ).select("id", shingle_key60(F.col("g")).alias("h"))


def contamination_flags(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    use_broadcast: bool = True,
) -> DataFrame:
    """(doc_id, n_hits) for every doc sharing ≥1 word ``n``-gram with
    the benchmark corpus — the GPT-3/PaLM n-gram decontamination
    test. n_hits = how many of the doc's DISTINCT grams appear in
    the benchmark (a leakage-severity signal, not just a flag).

    The benchmark side collapses to a distinct 8-byte hash set and is
    broadcast (use_broadcast=False falls back to a shuffled equi-join
    for benchmark sets too large to broadcast — rare: eval suites are
    ≪ the training corpus by construction).  The corpus explode is
    the dominant cost and is embarrassingly parallel; the join output
    (hits only) is what shuffles to the per-doc count.
    """
    bgrams = (
        _gram_hashes(bench, text_col, id_col, n).select("h").distinct()
    )
    if use_broadcast:
        bgrams = F.broadcast(bgrams)
    return (
        _gram_hashes(docs, text_col, id_col, n)
        .join(bgrams, "h")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
        .select(F.col("id").alias(id_col), "n_hits")
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    use_broadcast: bool = True,
) -> DataFrame:
    """Training corpus minus benchmark-contaminated docs (left_anti
    on the flagged ids; schema of ``docs`` preserved)."""
    flagged = contamination_flags(
        docs, bench, text_col, id_col, n, use_broadcast
    ).select(id_col)
    return docs.join(flagged, id_col, "left_anti")


# ---------------------------------------------------------------------
# model-based quality scoring (fasttext-style linear classifier)
# ---------------------------------------------------------------------

_U60 = 1152921504606846976.0  # 2^60, the md5-top-60-bit hash range


def hash_linear_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: DataFrame | None = None,
    bias: float = 0.0,
    salt: str = "qw",
) -> DataFrame:
    """Linear text-classifier score: sigmoid(bias + mean token
    weight) — the fasttext-style model-based quality filter of the
    CCNet/LLaMA pipelines (Joulin et al. 2017 architecture: averaged
    token features into a linear head).

    Two paths, same contract (id, n_tokens, score; score NULL when
    the doc has no tokens):

    - ``weights=None`` (default): per-token pseudo-weights derived
      from the token's md5 hash, w(t) = u60('salt:t')·2−1 ∈ [−1,1).
      No external model ships in this sandbox, so the hash stands in
      for trained weights while keeping every Spark-side piece real —
      and the whole thing is per-row higher-order-function math
      (transform + aggregate over the token array): NO explode, NO
      shuffle, whole-stage codegen, trivially 100 TB-safe.
    - ``weights`` = (word, w) DataFrame: the deployment path for a
      real trained model — explode + equi-join on word (Catalyst
      broadcasts the Zipf-small vocabulary) + per-doc avg;
      out-of-vocabulary tokens score 0 (hashing-trick neutral).
    """
    # null text counts as zero tokens on both paths
    toks = F.coalesce(
        tokens_ws(F.col(text_col)), F.array().cast("array<string>")
    )
    n = F.size(toks)
    if weights is None:
        ws = F.transform(
            toks,
            lambda t: F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(salt), t)), 1, 15
                ),
                16,
                10,
            ).cast("long")
            / F.lit(_U60)
            * F.lit(2.0)
            - F.lit(1.0),
        )
        mean = F.aggregate(
            ws, F.lit(0.0), lambda acc, x: acc + x
        ) / n.cast("double")
        score = F.when(
            n > 0,
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.lit(float(bias)) + mean))),
        )
        return df.select(
            id_col, n.cast("long").alias("n_tokens"), score.alias("score")
        )
    exploded = df.select(
        F.col(id_col).alias("_id"), F.explode(toks).alias("word")
    )
    scored = (
        exploded.join(F.broadcast(weights), "word", "left")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(F.coalesce(F.col("w"), F.lit(0.0))).alias("_mean"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(-(F.lit(float(bias)) + F.col("_mean")))
                )
            ).alias("score"),
        )
    )
    empties = df.select(id_col).where(n <= 0)
    return scored.unionByName(
        empties.select(
            id_col,
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(None).cast("double").alias("score"),
        )
    )


def load_linear_weights(
    spark, path: str, fmt: str = "auto"
) -> tuple[DataFrame, float]:
    """Load a trained linear-model vocabulary from disk for
    ``hash_linear_score(weights=...)`` — the drop-in point for a real
    fasttext-style classifier (the hash-derived defaults stay the
    sandbox/oracle path).  Returns ``(weights_df, bias)`` where
    ``weights_df`` has columns (word string, w double).

    Two formats:

    - ``parquet``: columns (word, w) as written by any Spark job.
    - ``text``: fasttext-dump style — one ``word<ws>weight`` pair per
      line, whitespace-separated; blank lines and ``#`` comments
      skipped; an optional ``__bias__ <float>`` row supplies the
      intercept.  Parsed distributed (spark.read.text + JVM split),
      so a multi-million-row vocabulary never lands on the driver.

    ``fmt="auto"`` picks parquet when the path names a ``.parquet``
    file/directory, text otherwise.
    """
    if fmt == "auto":
        fmt = "parquet" if path.rstrip("/").endswith(".parquet") else "text"
    if fmt == "parquet":
        w = spark.read.parquet(path).select(
            F.col("word").cast("string").alias("word"),
            F.col("w").cast("double").alias("w"),
        )
    elif fmt == "text":
        w = (
            spark.read.text(path)
            .select(
                F.trim(
                    F.regexp_replace(F.col("value"), r"#.*$", "")
                ).alias("v")
            )
            .where(F.length("v") > 0)
            .select(F.split("v", r"\s+").alias("p"))
            .select(
                F.element_at("p", 1).alias("word"),
                F.element_at("p", 2).cast("double").alias("w"),
            )
        )
    else:
        raise ValueError(f"unknown weights format: {fmt!r}")
    bias_rows = w.where(F.col("word") == "__bias__").select("w").collect()
    bias = float(bias_rows[0]["w"]) if bias_rows else 0.0
    return w.where(F.col("word") != "__bias__"), bias


def domain_rollup(
    df: DataFrame,
    key_col: str = "source",
    text_col: str = "text",
    low_q4: int = 6000,
    block_mean_q4: int = 6800,
    score: Column | None = None,
) -> DataFrame:
    """Source/domain-level quality curation (the RefinedWeb /
    C4-style recipe: score documents, aggregate per origin, block
    origins whose aggregate falls below a bar — URL/domain filtering
    is the first gate of every at-scale web pipeline).

    Scores are moved to an INTEGER domain before aggregation
    (q4 = round(4dp-score · 10⁴)): integer sums are order-exact, so
    the rollup replays bit-identically in SQL regardless of either
    engine's float-accumulation order.  One partial-agg groupBy on
    the domain key — the output is one row per domain, which is why
    the blocklist broadcasts into any downstream filter at 100 TB.

    Returns (source, n_docs, sum_q4, min_q4, n_low, mean_q,
    blocked): blocked ⇔ mean q4 < ``block_mean_q4`` (compared as
    sum_q4 < block·n, still integer-exact); n_low counts docs under
    ``low_q4``.
    """
    from spacetime_crawler4py_spark.functions.text_quality import quality_score

    q = score if score is not None else quality_score(F.col(text_col))
    q4 = F.round(F.round(q, 4) * 10000).cast("long")
    g = (
        df.select(F.col(key_col).alias("source"), q4.alias("q4"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("q4").alias("sum_q4"),
            F.min("q4").alias("min_q4"),
            F.sum(F.when(F.col("q4") < low_q4, 1).otherwise(0)).alias("n_low"),
        )
    )
    return g.select(
        "source",
        "n_docs",
        "sum_q4",
        "min_q4",
        "n_low",
        F.round(F.col("sum_q4") / F.col("n_docs") / 10000.0, 4).alias("mean_q"),
        (F.col("sum_q4") < F.lit(block_mean_q4) * F.col("n_docs")).alias(
            "blocked"
        ),
    )


def blocklist_filter(
    df: DataFrame, rollup: DataFrame, key_col: str = "source"
) -> DataFrame:
    """Drop every row whose domain is blocked in ``rollup``: the
    blocked set is O(#domains) rows → broadcast left_anti, no
    shuffle of the corpus."""
    blocked = rollup.where(F.col("blocked")).select(
        F.col("source").alias(key_col)
    )
    return df.join(F.broadcast(blocked), key_col, "left_anti")


def length_quantiles(
    df: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_col: str = "lang",
    len_col: str = "n_chars",
) -> DataFrame:
    """Exact per-group quantiles of an INTEGER measure via its
    histogram — the corpus-profiling summary a filter-threshold
    sweep needs (where do the Gopher length gates bite per
    language?), computed the way 100 TB demands.

    Semantics: lower discrete quantile — the smallest value whose
    cumulative count reaches ceil(q·n).  Exact (no GK/t-digest
    approximation, no collected value lists): the corpus aggregates
    to a (group, value) histogram first — one partial-agg groupBy,
    map-side combinable on hot groups — and the quantile scan is a
    window over DISTINCT values per group, bounded by the value
    domain (doc lengths), never by corpus row count.  Integer counts
    everywhere → bit-identical across engines by construction.

    Returns (group, n, q_<q> …) one row per group.
    """
    cnt = df.groupBy(group_col, len_col).agg(F.count("*").alias("_c"))
    w = Window.partitionBy(group_col).orderBy(len_col)
    w_all = Window.partitionBy(group_col)
    # both windows share one hashpartitioning(group) exchange — the
    # histogram is scanned once, no totals re-join
    j = cnt.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "n", F.sum("_c").over(w_all)
    )
    aggs = [F.max("n").alias("n")]
    for q in qs:
        name = f"q{int(round(q * 100))}"
        aggs.append(
            F.min(
                F.when(
                    F.col("_cum") >= F.ceil(F.lit(float(q)) * F.col("n")),
                    F.col(len_col),
                )
            ).alias(name)
        )
    return j.groupBy(group_col).agg(*aggs)
