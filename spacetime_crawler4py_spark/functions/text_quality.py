"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All four are pure JVM Column expressions (no Python crossing) with
deliberately simple, deterministic formulas so each has an exact
ANSI-SQL twin for the DuckDB oracle (see __spark_entry__.py).

- token_count     whitespace tokens + a BPE-ish subword estimate
                  (alnum runs + punctuation marks count separately,
                  ~ how byte-pair encoders fragment text)
- language ID     stopword-hit voting over small per-language
                  marker lists (classic n-gram/function-word
                  heuristic; no model)
- quality_score   linear blend of length, stopword ratio, punct
                  density, mean word length — the usual cheap
                  pre-filter features (cf. C4/Gopher-style rules)
- fingerprint     order-sensitive polynomial rolling hash over
                  word hashes (Rabin-Karp shape), for fast
                  order-aware near-exact duplicate detection
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny function-word marker sets (public linguistic knowledge)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "por", "una", "del", "como"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den", "von"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "qui", "pas"],
}


def tokens_ws(text: Column) -> Column:
    """Whitespace tokens, lowered; empty strings filtered."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count_ws(text: Column) -> Column:
    return F.size(tokens_ws(text))


def token_count_bpe_ish(text: Column) -> Column:
    """Subword-ish count: alnum runs + each punctuation char.

    regexp '[A-Za-z0-9]+|[^A-Za-z0-9\\s]' over the text — a crude
    but deterministic proxy for BPE fragment counts.
    """
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def lang_hits(text: Column, lang: str) -> Column:
    """# tokens that are markers of ``lang``."""
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(tokens_ws(text), lambda t: F.array_contains(markers, t)))


def lang_id(text: Column) -> Column:
    """argmax language by marker hits; 'und' when no marker hits.

    Ties resolve in LANG_MARKERS key order (en first) — the same
    deterministic order the SQL oracle twin encodes.
    """
    langs = list(LANG_MARKERS)
    hits = [lang_hits(text, lg) for lg in langs]
    best = F.greatest(*hits)
    out = F.lit("und")
    for lg, h in reversed(list(zip(langs, hits))):
        out = F.when((best > 0) & (h == best), F.lit(lg)).otherwise(out)
    return out


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    from spacetime_crawler4py_spark.functions.stopwords import STOPWORDS

    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = tokens_ws(text)
    return F.size(F.filter(toks, lambda t: F.array_contains(stops, t))) / F.greatest(
        F.size(toks), F.lit(1)
    )


def mean_word_len(text: Column) -> Column:
    toks = tokens_ws(text)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """[0,1]-ish quality blend; higher = more natural-language-like.

    0.25·len_term + 0.25·stop_term + 0.25·punct_term + 0.25·wordlen_term
    with each term clamped to [0,1].  Deterministic, SQL-twinnable.
    """
    n = token_count_ws(text)
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 3.0, F.lit(1.0))
    p = punct_ratio(text)
    punct_term = F.when(p <= 0.1, F.lit(1.0)).otherwise(
        F.greatest(F.lit(0.0), F.lit(1.0) - (p - 0.1) * 5.0)
    )
    mw = mean_word_len(text)
    wl_term = F.when((mw >= 3.0) & (mw <= 8.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_term + stop_term + punct_term + wl_term) / 4.0


def fingerprint(text: Column) -> Column:
    """Order-sensitive 64-bit polynomial hash over word hashes:
    fp_i = (fp_{i-1}·31 + h(w_i)) mod (2^31-1) — Rabin-Karp shape,
    JVM-only, overflow-free under ANSI arithmetic."""
    toks = tokens_ws(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(31).cast("long") + F.pmod(F.xxhash64(t), F.lit(FP_MOD)),
            F.lit(FP_MOD),
        ),
    )


FP_MOD = (1 << 31) - 1  # keeps acc*31 far from long overflow (ANSI mode)
