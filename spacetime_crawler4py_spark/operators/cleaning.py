"""Corpus-cleaning operators for training-data pipelines: global
line-level dedup, PII redaction, unigram-LM quality scoring, and
cross-document duplicate-span coverage (engine extensions beyond the
reference, like operators/dedup.py and operators/quality.py; the
reference's cleaning surface is only the F6/F7 content gates in
scraper.py:78).

Scale shapes (the family contract: per-doc JVM Column math →
bounded-key equi-joins; no windows over hot keys, no driver
collects):

- line_dedup          C4-style global exact dedup of text lines
                      (Raffel et al. 2020 §2.2 dedup "three-sentence
                      spans"; here the unit is a line).  The first
                      occurrence of each distinct line — in
                      (doc order, line order) — survives; later
                      occurrences are cut and each doc is reassembled
                      from its surviving lines.  First-occurrence is
                      a groupBy(line_key).agg(min(struct(doc,pos)))
                      — partial-aggregatable and therefore safe on
                      the classic hot key (a boilerplate line shared
                      by 10⁸ pages collapses map-side), where a
                      row_number window would funnel the whole key
                      into one task.
- redact_pii          email / IPv4 / phone redaction via chained
                      JVM regexp_replace (RE2-compatible patterns so
                      the DuckDB oracle replays them verbatim); one
                      pass, no Python.
- unigram_logprob     per-doc mean negative log-likelihood under the
                      corpus's own unigram LM — the oracle-able
                      stand-in for the CCNet/KenLM perplexity filter
                      (Wenzek et al. 2020): one token explode, one
                      partial-agg groupBy(word) for the LM, one
                      equi-join back on word (the LM table is
                      Zipf-small relative to the corpus; Catalyst
                      broadcasts it at test scale, and at 100 TB it
                      is built once and reused across scoring runs).
- dup_span_coverage   ExactSubstr-style duplicate-span signal (Lee
                      et al. 2022): the fraction of a doc's token
                      positions covered by some word n-gram that
                      also occurs in ANOTHER document.  Candidate
                      grams come from one posexplode; cross-doc
                      grams from a partial-agg groupBy(gram_key)
                      keeping min/max doc id (cheaper than a
                      count-distinct sketch and exact for the ≥2-docs
                      predicate); coverage is a per-doc distinct
                      count over exploded offsets — every join key is
                      a bounded 8-byte gram hash.

Gram/line keys are the 60-bit md5-derived ints of
operators/dedup.shingle_key60, so DuckDB oracle twins join on the
SAME key and parity is exact by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.operators.dedup import shingle_key60

# ---------------------------------------------------------------------
# line-level global dedup (C4 §2.2)
# ---------------------------------------------------------------------


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    keep_empty_docs: bool = True,
) -> DataFrame:
    """Drop every occurrence of a duplicated line except the first.

    "First" is (min doc id, then min line position within it) —
    deterministic under any partitioning.  Returns one row per input
    doc: (id, text [reassembled from surviving lines, original
    order], n_lines, n_kept).  Docs whose lines are ALL duplicates
    elsewhere keep an empty text (and survive iff keep_empty_docs).

    Empty lines (after the split) are not dedup keys — they are
    dropped from the reassembly like C4 drops too-short sentences.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode_outer(F.split(txt, delim)).alias("_pos", "_line"),
        )
        .where(F.col("_line").isNotNull() & (F.col("_line") != ""))
        .withColumn("_key", shingle_key60(F.col("_line")))
    )
    # first occurrence per line key: min(struct(id, pos)) is
    # map-side combinable — the hot boilerplate key never lands on
    # one task the way a row_number window would
    first = lines.groupBy("_key").agg(
        F.min(F.struct("_id", "_pos")).alias("_first")
    )
    kept = lines.join(first, "_key").where(
        (F.col("_id") == F.col("_first._id"))
        & (F.col("_pos") == F.col("_first._pos"))
    )
    per_doc = kept.groupBy("_id").agg(
        F.array_sort(F.collect_list(F.struct("_pos", "_line"))).alias("_kl")
    )
    n_lines = df.select(
        F.col(id_col).alias("_id"),
        F.size(F.filter(F.split(txt, delim), lambda s: s != "")).alias(
            "n_lines"
        ),
    )
    out = (
        n_lines.join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.concat_ws(
                delim, F.transform(F.coalesce(F.col("_kl"), F.array()), lambda s: s["_line"])
            ).alias(text_col),
            "n_lines",
            F.coalesce(F.size("_kl"), F.lit(0)).alias("n_kept"),
        )
    )
    if not keep_empty_docs:
        out = out.where(F.col("n_kept") > 0)
    return out


# ---------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------

# RE2-safe (no lookaround/backrefs) so Spark (Java regex) and DuckDB
# (RE2) agree byte-for-byte.  Order is load-bearing: emails first so
# the IPv4 pattern can't eat a dotted mail host, phones last.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\(?\d{3}\)?[ -]\d{3}-\d{4}", "<PHONE>"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace emails/IPv4s/phone numbers with typed placeholders.

    Adds ``out_col`` (default: overwrite ``text_col``) plus
    ``n_redactions`` = total matches across all patterns, counted on
    the ORIGINAL text (per-pattern counts compose because each
    pattern is counted before any replacement).  Pure JVM regexp
    Columns — whole-stage codegen, no shuffle.
    """
    out = out_col or text_col
    txt = F.coalesce(F.col(text_col), F.lit(""))
    red = txt
    n = F.lit(0)
    for _, pat, repl in PII_PATTERNS:
        n = n + F.regexp_count(txt, F.lit(pat))
        red = F.regexp_replace(red, pat, repl)
    return df.withColumn("n_redactions", n.cast("long")).withColumn(out, red)


# ---------------------------------------------------------------------
# unigram-LM scoring (CCNet-style quality signal, oracle-able form)
# ---------------------------------------------------------------------


def unigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus unigram LM: (word, cnt, total) with total repeated per
    row (broadcast of the one-row grand total — the only non-equi
    join shape this family permits)."""
    from spacetime_crawler4py_spark.functions.text_quality import tokens_ws

    toks = df.select(F.explode(tokens_ws(F.col(text_col))).alias("word"))
    lm = toks.groupBy("word").agg(F.count("*").alias("cnt"))
    total = lm.agg(F.sum("cnt").alias("total"))
    return lm.crossJoin(F.broadcast(total))


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm: DataFrame | None = None,
) -> DataFrame:
    """Per-doc mean −ln p(word) under the corpus unigram LM.

    Low values ≈ stereotyped/boilerplate text, high values ≈
    rare-token noise — the two tails the CCNet perplexity filter
    cuts.  Docs with no tokens score NULL.  Pass a precomputed
    ``lm`` (from unigram_lm, possibly over a larger corpus) to reuse
    one LM across scoring runs — the 100 TB deployment shape.
    """
    from spacetime_crawler4py_spark.functions.text_quality import tokens_ws

    if lm is None:
        lm = unigram_lm(df, text_col)
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_ws(F.col(text_col))).alias("word"),
    )
    # mean(−ln(cnt/total)) = ln(total) − mean(ln cnt); total is
    # constant per row after the LM join, so one avg + first() does it
    scored = toks.join(lm, "word")
    return (
        scored.groupBy("_id")
        .agg(
            (F.log(F.first("total")) - F.avg(F.log("cnt"))).alias("xent"),
            F.count("*").alias("n_tokens"),
        )
        .select(F.col("_id").alias(id_col), "xent", "n_tokens")
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
    n_shards: int = 8,
    lm: DataFrame | None = None,
    salt: str = "ppl",
) -> DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al.
    2020 §4.3: head/middle/tail by LM perplexity terciles).

    Buckets are SHARD-LOCAL: ntile(n_buckets) within (lang, shard),
    shard = md5-hash of the doc id.  A per-language global ntile
    would sort the dominant language through one task; shard-local
    terciles keep every window partition bounded and converge to the
    global cut points (CCNet itself computes its thresholds on a
    sample).  Ordering is (xent rounded to 4dp, id) — a total order,
    so the assignment is deterministic and engine-exact.

    Returns (id, lang, shard, xent, bucket[, label]) for every doc
    the LM scores (docs with no scoreable tokens are absent);
    bucket 1 = lowest xent.  ``label`` (head/middle/tail) is added
    for the CCNet n_buckets=3 case.
    """
    from pyspark.sql import Window

    scored = unigram_logprob(df, id_col, text_col, lm)
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    j = (
        df.select(id_col, lang_col)
        .join(scored, id_col)
        .select(
            id_col,
            lang_col,
            F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
            F.round("xent", 4).alias("xent"),
        )
    )
    w = Window.partitionBy(lang_col, "shard").orderBy("xent", id_col)
    out = j.withColumn("bucket", F.ntile(n_buckets).over(w))
    if n_buckets == 3:
        out = out.withColumn(
            "label",
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 3, "tail")
            .otherwise("middle"),
        )
    return out


# ---------------------------------------------------------------------
# cross-document duplicate-span coverage (ExactSubstr-lite)
# ---------------------------------------------------------------------


def _word_ngrams_pos(text: Column, n: int) -> Column:
    """Positioned word n-grams: array of (pos, gram), pos 0-based."""
    from spacetime_crawler4py_spark.functions.text_quality import tokens_ws

    words = tokens_ws(text)
    k = F.size(words) - F.lit(n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.struct(
                (i - 1).alias("pos"),
                F.concat_ws(" ", F.slice(words, i, n)).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gram:string>>"))


def dup_span_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-doc fraction of token positions inside a word n-gram that
    also occurs in ANOTHER document (Lee et al. 2022's duplicate-
    substring signal, at n-gram granularity).

    Plan: posexplode grams → partial-agg groupBy(gram_key) keeping
    (min_id, max_id) — ≥2 distinct docs ⟺ min≠max, exact and
    cheaper than count-distinct — → equi-join the cross-doc keys
    back to positions → explode each hit's n offsets → per-doc
    distinct-offset count over token count.  Keys are 8-byte hashes;
    the offset explode is bounded by n× the duplicated-gram hits.
    """
    from spacetime_crawler4py_spark.functions.text_quality import tokens_ws

    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        F.col(id_col).alias("_id"),
        F.size(tokens_ws(txt)).alias("n_tokens"),
        _word_ngrams_pos(txt, n).alias("_grams"),
    )
    occ = base.select(
        "_id", F.explode("_grams").alias("_g")
    ).select(
        "_id",
        F.col("_g.pos").alias("_pos"),
        shingle_key60(F.col("_g.gram")).alias("_key"),
    )
    crossdoc = (
        occ.groupBy("_key")
        .agg(F.min("_id").alias("_lo"), F.max("_id").alias("_hi"))
        .where(F.col("_lo") != F.col("_hi"))
        .select("_key")
    )
    covered = (
        occ.join(crossdoc, "_key")
        .select(
            "_id",
            F.explode(
                F.sequence(F.col("_pos"), F.col("_pos") + F.lit(n - 1))
            ).alias("_off"),
        )
        .groupBy("_id")
        .agg(F.count_distinct("_off").alias("n_dup_tokens"))
    )
    return (
        base.select("_id", "n_tokens")
        .join(covered, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            F.coalesce(F.col("n_dup_tokens"), F.lit(0)).alias("n_dup_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce(F.col("n_dup_tokens"), F.lit(0))
                / F.col("n_tokens"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_span_frac"),
        )
    )


def dup_span_remove(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """ExactSubstr-style duplicate-span REMOVAL (Lee et al. 2022 §4:
    'deduplicate by removing the duplicated substring, keeping one
    copy') — the transformation twin of ``dup_span_coverage``'s
    signal, at word-n-gram granularity.

    Semantics (deterministic, SQL-replayable): a word n-gram that
    occurs in ≥2 distinct documents is a duplicate; every occurrence
    EXCEPT its single global first — min (doc, pos) order, the same
    keep-first contract as ``line_dedup`` — has its n token offsets
    removed.  Each document is reassembled from its surviving tokens
    (single-space joined, tokens already lowercased by the
    whitespace tokenizer).  Overlapping removed spans merge naturally
    (offsets are a set).

    Returns (id, n_tokens, n_removed_tokens, text) with ``text`` the
    deduplicated reassembly.

    Plan shape: one posexplode → one partial-agg groupBy(gram_key)
    carrying (min_id, max_id, min(struct(id,pos))) — all map-side
    combinable, safe on boilerplate hot grams — → equi-join back on
    the 8-byte key → per-doc collect_set of removed offsets (bounded
    by doc length) → one join to the base and a JVM ``filter`` with
    the positional lambda; the reassembly never shuffles token rows.
    The per-token ``array_contains`` probe is O(|removed|); documents
    are bounded (gate F7 upstream), so the quadratic corner is
    doc-local, never cross-doc.
    """
    from spacetime_crawler4py_spark.functions.text_quality import tokens_ws

    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        F.col(id_col).alias("_id"),
        tokens_ws(txt).alias("_ws"),
        _word_ngrams_pos(txt, n).alias("_grams"),
    )
    occ = base.select(
        "_id", F.explode("_grams").alias("_g")
    ).select(
        "_id",
        F.col("_g.pos").alias("_pos"),
        shingle_key60(F.col("_g.gram")).alias("_key"),
    )
    dup = (
        occ.groupBy("_key")
        .agg(
            F.min("_id").alias("_lo"),
            F.max("_id").alias("_hi"),
            F.min(F.struct("_id", "_pos")).alias("_first"),
        )
        .where(F.col("_lo") != F.col("_hi"))
        .select("_key", "_first")
    )
    removed = (
        occ.join(dup, "_key")
        .where(
            ~(
                (F.col("_id") == F.col("_first._id"))
                & (F.col("_pos") == F.col("_first._pos"))
            )
        )
        .select(
            "_id",
            F.explode(
                F.sequence(F.col("_pos"), F.col("_pos") + F.lit(n - 1))
            ).alias("_off"),
        )
        .groupBy("_id")
        .agg(F.collect_set("_off").alias("_drop"))
    )
    return (
        base.join(removed, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.size("_ws").alias("n_tokens"),
            F.coalesce(F.size("_drop"), F.lit(0)).alias("n_removed_tokens"),
            F.array_join(
                F.filter(
                    "_ws",
                    lambda t, i: ~F.coalesce(
                        F.array_contains(F.col("_drop"), i), F.lit(False)
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )


# ---------------------------------------------------------------------
# C4 line-level cleaning (boilerplate strip)
# ---------------------------------------------------------------------


def c4_line_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
) -> DataFrame:
    """C4's line-level cleaning rules (Raffel et al. 2020 §2.2) — the
    boilerplate strip that runs before any other gate: keep a line
    only if it (a) ends in a terminal punctuation mark (. ! ? \"),
    (b) has at least ``min_words`` whitespace words, and (c) does not
    contain the word 'javascript' (case-insensitive); flag the page
    gates alongside ('lorem ipsum' or a curly brace anywhere on the
    page ⇒ page_ok = false — C4 drops those pages outright).

    Returns (id, n_lines, n_kept, page_ok, text) with ``text`` the
    surviving lines re-joined by newline.

    Everything is a JVM Column chain over the split-lines array — no
    shuffle, no Python, no regex whose dialect could diverge (the
    terminal-punct test is a substr compare, not a pattern), so the
    DuckDB oracle replays it verbatim.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(txt, "\n")

    def _keep(l):  # noqa: E741 - l is the conventional line var
        last = l.substr(F.length(l), F.lit(1))
        words = F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
        return (
            last.isin(".", "!", "?", '"')
            & (words >= F.lit(min_words))
            & ~F.contains(F.lower(l), F.lit("javascript"))
        )

    kept = F.filter(lines, _keep)
    return df.select(
        F.col(id_col).alias(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        (
            ~F.contains(F.lower(txt), F.lit("lorem ipsum"))
            & ~F.contains(txt, F.lit("{"))
        ).alias("page_ok"),
        F.array_join(kept, "\n").alias("text"),
    )
