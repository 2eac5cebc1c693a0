"""Indexer: postings, tf-idf, simhash dedup, search — vs a tiny
pure-Python recomputation oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.functions.porter import porter_stem
from spacetime_crawler4py_spark.functions.simhash import py_hamming64, py_simhash64
from spacetime_crawler4py_spark.functions.tokenizers import py_tokenize_indexer
from spacetime_crawler4py_spark.indexing import postings as P
from spacetime_crawler4py_spark.indexing.search import search

DOCS = [
    (0, "https://a.ics.uci.edu/x", "Machine learning research at UCI drives learning systems"),
    (1, "https://a.ics.uci.edu/x#frag", "duplicate url fragment variant"),
    (2, "https://b.ics.uci.edu/y", "Databases and distributed systems research"),
    (3, "https://c.ics.uci.edu/z", "Completely unrelated cooking recipes and food"),
    (4, "https://d.ics.uci.edu/w", "machine learning applications in research labs"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, url string, text string")


def _py_postings(rows):
    out = []
    for doc_id, _, text in rows:
        for tok, pos in py_tokenize_indexer(text):
            s = porter_stem(tok)
            if len(s) > 1:
                out.append((s, doc_id, pos))
    return out


def test_url_dedup(docs_df):
    kept = P.dedup_by_url(docs_df).select("doc_id").orderBy("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [0, 2, 3, 4]  # doc 1 is a #frag dup


def test_postings_match_python(docs_df):
    got = {
        (r["token"], r["doc_id"], r["position"])
        for r in P.build_postings(docs_df).collect()
    }
    assert got == set(_py_postings(DOCS))


def test_tfidf_values(docs_df):
    posts = P.build_postings(docs_df)
    n_docs = 5
    scores = {
        (r["token"], r["doc_id"]): r["tfidf"]
        for r in P.tfidf(posts, doc_count=n_docs).collect()
    }
    # 'learn' (stem of learning) appears 2x in doc0, 1x in doc4 → df=2
    tf_doc0 = 1 + math.log10(2)
    idf = math.log(n_docs / 2)
    assert scores[("learn", 0)] == pytest.approx(tf_doc0 * idf)
    assert scores[("learn", 4)] == pytest.approx(1.0 * idf)


def test_grouped_index_sorted(docs_df):
    posts = P.build_postings(docs_df)
    g = {r["token"]: r["postings"] for r in P.grouped_index(posts).collect()}
    learn = [(p["doc_id"], p["position"]) for p in g["learn"]]
    assert learn == sorted(learn)


def test_simhash_dedup_keeps_first(spark):
    base = "the quick brown fox jumps over the lazy dog " * 30
    rows = [
        (0, base + "alpha"),
        (1, base + "alphb"),   # near-dup of 0 → dropped (later id)
        (2, "entirely different content about query engines " * 25),
    ]
    assert py_hamming64(py_simhash64(rows[0][1]), py_simhash64(rows[1][1])) <= 3
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"] for r in P.simhash_dedup(df).select("doc_id").collect()
    )
    assert kept == [0, 2]


def test_search_and_or(spark, docs_df):
    posts = P.build_postings(docs_df)
    scores = P.tfidf(posts, doc_count=5)
    docs = docs_df.select("doc_id", "url")

    res_and = search(scores, docs, "machine learning", mode="and").collect()
    assert {r["doc_id"] for r in res_and} == {0, 4}  # both terms required
    assert res_and[0]["score"] >= res_and[-1]["score"]

    res_or = search(scores, docs, "machine cooking", mode="or").collect()
    assert {r["doc_id"] for r in res_or} == {0, 3, 4}

    # reference's last-word-only bug mode (indexerV1.py:541-543)
    res_last = search(scores, docs, "cooking machine", last_word_only=True).collect()
    assert {r["doc_id"] for r in res_last} == {0, 4}

    # fuzzy: one edit away ('machin' stem typo'd)
    res_fuzzy = search(scores, docs, "machne", fuzzy=True, mode="or").collect()
    assert {r["doc_id"] for r in res_fuzzy} == {0, 4}


def test_bm25_formula(spark):
    """bm25() vs a hand-rolled numpy computation on a tiny corpus."""
    import math

    from spacetime_crawler4py_spark.indexing.postings import bm25

    docs = [
        (0, ["a", "a", "b"]),
        (1, ["a", "c", "c", "c"]),
        (2, ["b", "b", "d"]),
    ]
    posts = spark.createDataFrame(
        [(d, t) for d, toks in docs for t in toks], ["doc_id", "token"]
    )
    got = {
        (r["token"], r["doc_id"]): r["bm25"]
        for r in bm25(posts, doc_count=3, k1=1.2, b=0.75).collect()
    }
    lens = {d: len(t) for d, t in docs}
    avgdl = sum(lens.values()) / 3
    dfs = {"a": 2, "b": 2, "c": 1, "d": 1}
    for (tok, d), score in got.items():
        n = docs[d][1].count(tok)
        idf = math.log((3 - dfs[tok] + 0.5) / (dfs[tok] + 0.5) + 1.0)
        exp = idf * n * 2.2 / (n + 1.2 * (0.25 + 0.75 * lens[d] / avgdl))
        assert abs(score - exp) < 1e-9, (tok, d)
    assert len(got) == 6  # one row per (token, doc) pair


def test_incremental_index_equals_full_rebuild(spark, tmp_path):
    """Append three doc batches incrementally; derived tf-idf must
    equal a from-scratch build over the union, and a crashed append
    (data without marker) must stay invisible."""
    import os

    from spacetime_crawler4py_spark.indexing import incremental as I
    from spacetime_crawler4py_spark.indexing.postings import build_postings, tfidf

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "idx")
    cuts = [(0, 20), (20, 35), (35, 10**9)]
    for bid, (lo, hi) in enumerate(cuts):
        n = I.append_batch(
            spark, idx, docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
        assert n > 0
    assert sum(I.committed_batches(idx).values()) == docs.count()

    inc = {
        (r["token"], r["doc_id"]): round(r["tfidf"], 9)
        for r in I.current_scores(spark, idx).collect()
    }
    full = {
        (r["token"], r["doc_id"]): round(r["tfidf"], 9)
        for r in tfidf(build_postings(docs), doc_count=docs.count()).collect()
    }
    assert inc == full

    # crash: postings written under batch 99 with NO marker → invisible
    build_postings(docs.limit(3)).withColumn(
        "batch_id", F.lit(99).cast("long")
    ).write.mode("append").partitionBy("batch_id").parquet(
        os.path.join(idx, "postings")
    )
    assert 99 not in I.committed_batches(idx)
    after = {
        (r["token"], r["doc_id"]): round(r["tfidf"], 9)
        for r in I.current_scores(spark, idx).collect()
    }
    assert after == full


def test_phrase_count_index_equals_scan(spark):
    """phrase_count: the positional-intersection index path and the
    narrow scan path count identical windows — incl. overlapping
    occurrences, repeated phrase words, odd whitespace/case, and
    null/short docs (which produce no row)."""
    from spacetime_crawler4py_spark.indexing.search import phrase_count

    docs = [
        (0, "the hash join beats the sort merge join here"),
        (1, "hash join hash join hash join"),
        (2, "join hash no phrase"),
        (3, "HASH   JOIN with odd spacing and case"),
        (4, None),
        (5, ""),
        (6, "hash"),
        (7, "a a a a"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for phrase, expect in [
        ("hash join", {0: 1, 1: 3, 3: 1}),
        ("a a", {7: 3}),  # overlapping windows all count
        ("hash join hash", {1: 2}),
    ]:
        idx = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_count(df, phrase, method="index").collect()
        }
        scan = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_count(df, phrase, method="scan").collect()
        }
        assert idx == scan == expect, (phrase, idx, scan)
