"""Search over the TF-IDF index (reference run_engine + friends).

Reference behaviors mapped (SURVEY.md §3.3, §2.4 J3-J5):

- query → split on spaces → Porter-stem each word
  (indexerV1.py:541-542)
- per-word candidate postings: top-1000 by score
  (indexerV1.py:488); J5 fuzzy token match: exact by default,
  ``fuzzy=True`` for a fast levenshtein-≤1 JVM approximation, and
  ``fuzzy='difflib'`` for reference-VERBATIM ratio matching
  (difflib.get_close_matches cutoff .95, indexerV1.py:478, falling
  back to .85, indexer.py:719) behind a JVM length prefilter
- multi-word AND: sorted-merge intersection on doc_id
  (indexer.py:435-450) ≡ Spark inner join (J4 — a sort-merge join
  IS that algorithm), scores summed across terms
- top-10 docs → URL lookup via broadcast join against the doc
  index (J3; replaces the reference's per-row file rescans,
  indexer.py:452-471)

The reference's last-word-only scoring bug (indexerV1.py:541-543
overwrites tfidfDict per word) is NOT reproduced by default;
``last_word_only=True`` gets verbatim parity.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.functions.porter import porter_stem


def stem_query(query: str) -> list[str]:
    return [porter_stem(w) for w in query.split(" ") if w]


def _difflib_filter(tfidf: DataFrame, term: str, cutoff: float) -> DataFrame:
    """Verbatim J5 parity: difflib.get_close_matches(term, [token],
    cutoff=c) per index token — the reference's exact call shape
    (indexerV1.py:478 with c=.95; indexer.py:719 with c=.85).

    Scale shape: a JVM length prefilter runs BEFORE the Arrow UDF —
    difflib's own real_quick_ratio bound (2·min(la,lb)/(la+lb) ≥ c)
    is a pure length inequality, so only tokens inside
    [len·c/(2−c), len·(2−c)/c] ever cross into Python.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def close(tokens: pd.Series) -> pd.Series:
        import difflib

        return tokens.map(
            lambda t: bool(difflib.get_close_matches(term, [t], cutoff=cutoff))
        )

    n = len(term)
    lo = int(-(-n * cutoff // (2 - cutoff)))  # ceil
    hi = int(n * (2 - cutoff) / cutoff)
    return tfidf.where(F.length("token").between(lo, hi)).where(
        close(F.col("token"))
    )


def _term_postings(
    tfidf: DataFrame, term: str, per_term_limit: int, fuzzy, score_col: str = "tfidf"
) -> DataFrame:
    """``fuzzy``: False → exact token match; True → levenshtein ≤ 1
    (fast JVM approximation); 'difflib' → reference-verbatim ratio
    matching at cutoff .95, falling back to .85 when .95 matches
    nothing (the indexerV1 → indexer two-tier)."""
    if fuzzy == "difflib":
        cand = _difflib_filter(tfidf, term, 0.95)
        if cand.limit(1).count() == 0:
            cand = _difflib_filter(tfidf, term, 0.85)
    elif fuzzy:
        cand = tfidf.where(
            (F.length("token") >= F.length(F.lit(term)) - 1)
            & (F.length("token") <= F.length(F.lit(term)) + 1)
            & (F.levenshtein(F.col("token"), F.lit(term)) <= 1)
        )
    else:
        cand = tfidf.where(F.col("token") == term)
    return (
        cand.orderBy(F.desc(score_col))
        .limit(per_term_limit)  # TakeOrderedAndProject: the reference's top-1000 cut
        .select("doc_id", F.col(score_col).alias("score"))
    )


def search(
    tfidf: DataFrame,
    docs: DataFrame,
    query: str,
    top_k: int = 10,
    per_term_limit: int = 1000,
    fuzzy: bool | str = False,
    last_word_only: bool = False,
    mode: str = "and",
    ranking: str = "tfidf",
) -> DataFrame:
    """Returns (doc_id, score, url) top_k rows, score desc.

    ``docs`` is the doc index (doc_id, url) — small; broadcast for
    the J3 lookup.  mode='and' intersects terms (J4); mode='or'
    unions with score sum (the indexer.py:495-497 fallback U4).
    ``ranking`` picks the score column of the index DataFrame:
    'tfidf' (reference semantics) or 'bm25' (postings.bm25() output
    — Okapi ranking the reference lacks); every other stage (per-term
    top-N cut, AND/OR combine, J3 lookup) is identical.
    """
    if ranking not in ("tfidf", "bm25"):
        raise ValueError(f"ranking must be 'tfidf' or 'bm25', got {ranking!r}")
    terms = stem_query(query)
    if last_word_only and terms:
        terms = terms[-1:]
    if not terms:
        return docs.select("doc_id", F.lit(0.0).alias("score"), "url").limit(0)

    per_term = [
        _term_postings(tfidf, t, per_term_limit, fuzzy, score_col=ranking)
        .withColumnRenamed("score", f"s{i}")
        for i, t in enumerate(terms)
    ]
    if mode == "and":
        joined = reduce(lambda a, b: a.join(b, "doc_id", "inner"), per_term)
        scored = joined.select(
            "doc_id",
            sum([F.col(f"s{i}") for i in range(len(terms))], F.lit(0.0)).alias(
                "score"
            ),
        )
    else:
        scored = (
            reduce(
                lambda a, b: a.unionByName(b),
                [
                    p.select("doc_id", F.col(f"s{i}").alias("score"))
                    for i, p in enumerate(per_term)
                ],
            )
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
        )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(top_k)
    return top.join(F.broadcast(docs.select("doc_id", "url")), "doc_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )


# ---------------------------------------------------------------------
# phrase search (positional posting intersection)
# ---------------------------------------------------------------------


def phrase_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, ord, token): token-ORDINAL postings over lowered
    whitespace tokens — the positional index phrase queries need
    (the reference's char-offset positions, indexerV1.py:214, can't
    express adjacency; ordinals can).  At deployment this is written
    partitioned by token prefix so per-term scans prune."""
    from spacetime_crawler4py_spark.functions.text_quality import tokens_ws

    txt = F.coalesce(F.col(text_col), F.lit(""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_ws(txt)).alias("ord", "token"),
    )


def phrase_count(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "index",
) -> DataFrame:
    """Per-doc count of exact phrase occurrences (consecutive
    whitespace tokens, lowered).  Two bit-identical paths:

    - ``method='index'`` — the classic IR positional intersection:
      each phrase term's postings are shifted to a common start
      ordinal (ord − i) and chained through equi-joins on
      (doc_id, start); every surviving row is one occurrence.  Term
      postings are filtered by token BEFORE any join, so the joins
      see only matching-term rows — selective terms prune early, and
      at 10^10 docs each join is an equi-join on a compound key with
      posting-list-bounded sides.
    - ``method='scan'`` — a narrow JVM re-scan: count window starts
      where slice(tokens, i, n) equals the phrase array.  No index,
      no shuffle; right when the query set is known at scan time.

    Returns (doc_id, n_matches) for docs with ≥1 match.
    """
    toks = [w for w in phrase.lower().split() if w]
    if not toks:
        raise ValueError("empty phrase")
    if method == "scan":
        from spacetime_crawler4py_spark.functions.text_quality import tokens_ws

        txt = F.coalesce(F.col(text_col), F.lit(""))
        ws = tokens_ws(txt)
        n = len(toks)
        lit = F.array(*[F.lit(t) for t in toks])
        # NB: sequence(1, 0) DESCENDS in Spark — gate short docs out
        # before building the window-start sequence
        cnt = F.when(
            F.size(ws) >= n,
            F.size(
                F.filter(
                    F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1)),
                    lambda i: F.slice(ws, i, n) == lit,
                )
            ),
        ).otherwise(F.lit(0))
        return (
            docs.select(F.col(id_col).alias("doc_id"), cnt.alias("n_matches"))
            .where(F.col("n_matches") > 0)
        )
    if method != "index":
        raise ValueError(f"method must be 'index' or 'scan', got {method!r}")
    p = phrase_postings(docs, id_col, text_col)
    parts = [
        p.where(F.col("token") == t).select(
            "doc_id", (F.col("ord") - F.lit(i)).alias("start")
        )
        for i, t in enumerate(toks)
    ]
    joined = reduce(
        lambda a, b: a.join(b, ["doc_id", "start"], "inner"), parts
    )
    return joined.groupBy("doc_id").agg(F.count("*").alias("n_matches"))
