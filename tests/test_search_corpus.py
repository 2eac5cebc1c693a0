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
