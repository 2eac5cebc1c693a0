"""End-to-end search-engine smoke over the crawled corpus, modeled
on the reference's manual query list (TEST.txt: multi-word queries,
punctuation, misspellings, nonsense terms must not error)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.indexing import postings as P
from spacetime_crawler4py_spark.indexing.search import search

QUERIES = [
    "research data spark",                      # multi-word (TEST.txt 1-8 class)
    "Research",                                 # single common word
    "machine learning",
    "last name, first name",                    # comma case (TEST.txt 9)
    "jayaywfajsuwgvq",                          # nonsense (TEST.txt good-10 class)
    "wonderful! amazing?",
    "",                                         # empty query
]


@pytest.fixture(scope="module")
def index(spark, corpus80):
    corpus_dir, _ = corpus80
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    docs = (
        pages.select("url", "text")
        .withColumn(
            "doc_id",
            F.row_number().over(Window.orderBy("url")).cast("long") - 1,
        )
    )
    posts = P.build_postings(docs)
    n = docs.count()
    scores = P.tfidf(posts, doc_count=n).cache()
    scores.count()
    return scores, docs.select("doc_id", "url")


@pytest.mark.parametrize("q", QUERIES)
def test_query_never_errors(index, q):
    scores, docs = index
    res = search(scores, docs, q, top_k=10, mode="or").collect()
    assert isinstance(res, list) and len(res) <= 10
    # results sorted by score desc
    ss = [r["score"] for r in res]
    assert ss == sorted(ss, reverse=True)


def test_common_word_finds_documents(index):
    scores, docs = index
    res = search(scores, docs, "research", top_k=10, mode="or").collect()
    assert len(res) > 0


def test_and_narrower_than_or(index):
    scores, docs = index
    res_and = search(scores, docs, "research data", mode="and", top_k=1000).collect()
    res_or = search(scores, docs, "research data", mode="or", top_k=1000).collect()
    assert len(res_and) <= len(res_or)


# ---------------------------------------------------- J5 difflib parity


def test_difflib_fuzzy_matches_reference_call_shape(index):
    """fuzzy='difflib' must admit EXACTLY the tokens the reference's
    per-token call difflib.get_close_matches(term, [token], cutoff=c)
    admits (indexerV1.py:478 c=.95; indexer.py:719 c=.85) — i.e. the
    JVM length prefilter must never drop a difflib-accepted token."""
    import difflib

    from spacetime_crawler4py_spark.indexing.search import _difflib_filter

    scores, _ = index
    tokens = [r["token"] for r in scores.select("token").distinct().collect()]
    for term, cutoff in [
        ("research", 0.95),
        ("research", 0.85),
        ("resaerch", 0.85),  # transposition misspelling
        ("data", 0.85),
        ("xq", 0.95),        # matches nothing
    ]:
        expected = {
            t
            for t in tokens
            if difflib.get_close_matches(term, [t], cutoff=cutoff)
        }
        got = {
            r["token"]
            for r in _difflib_filter(scores, term, cutoff)
            .select("token")
            .distinct()
            .collect()
        }
        assert got == expected, (term, cutoff)


def test_difflib_two_tier_fallback(index):
    """The .95→.85 two-tier: a stemmed term absent at .95 must fall
    back to .85 candidates inside search(), like indexer.py's looser
    pass; and fuzzy='difflib' must never error on nonsense."""
    import difflib

    from spacetime_crawler4py_spark.indexing.search import stem_query

    scores, docs = index
    tokens = [r["token"] for r in scores.select("token").distinct().collect()]
    # find a real corpus-driven misspelling: a stem matching at .85 not .95
    term = None
    for cand in ("reserch", "machin", "learing", "spak", "dat"):
        s = stem_query(cand)[0]
        hit95 = any(
            difflib.get_close_matches(s, [t], cutoff=0.95) for t in tokens
        )
        hit85 = any(
            difflib.get_close_matches(s, [t], cutoff=0.85) for t in tokens
        )
        if not hit95 and hit85:
            term = cand
            break
    assert term is not None, "fixture corpus lost all near-miss terms"
    res = search(scores, docs, term, top_k=10, fuzzy="difflib", mode="or").collect()
    assert len(res) > 0
    # nonsense must return empty, not raise
    assert (
        search(scores, docs, "jayaywfajsuwgvq", fuzzy="difflib", mode="or").count()
        == 0
    )


# ---------------------------------------------------- BM25 ranking


def test_bm25_ranking(index, spark, corpus80):
    """search(ranking='bm25') runs the identical pipeline over a
    bm25-scored index: results non-empty on a common word, sorted by
    score desc, and scores are BM25 (bounded by idf*(k1+1) — unlike
    tf-idf they saturate in term frequency)."""
    corpus_dir, _ = corpus80
    from pyspark.sql import Window

    _, docs = index
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    d = pages.select("url", "text").withColumn(
        "doc_id", F.row_number().over(Window.orderBy("url")).cast("long") - 1
    )
    posts = P.build_postings(d)
    idx = P.bm25(posts, doc_count=d.count())
    res = search(idx, docs, "research", top_k=10, mode="or", ranking="bm25").collect()
    assert len(res) > 0
    ss = [r["score"] for r in res]
    assert ss == sorted(ss, reverse=True)
    # multi-word AND intersection works under bm25 too
    res_and = search(idx, docs, "research data", mode="and", ranking="bm25").collect()
    assert all(r["score"] > 0 for r in res_and)


def test_bad_ranking_raises(index):
    scores, docs = index
    with pytest.raises(ValueError):
        search(scores, docs, "research", ranking="pagerank")
