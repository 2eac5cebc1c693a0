"""Incremental index maintenance: append new document batches to a
partitioned postings store without re-tokenizing the corpus.

The reference rebuilds its index from scratch per run
(indexer.py:the whole main); at 100 TB the tokenize/stem pass is
the dominant cost and must be paid once per document, not once per
rebuild.  Layout:

    index_dir/postings/batch_id=N/*.parquet   (append-only)
    index_dir/_meta/N.json                    (commit marker:
                                               batch doc count)

Same marker-after-data protocol as the FrontierStore (crash safety:
readers only see batches with markers).  SCORES are derived state:
tf is per-(token,doc) — never changes once written; idf/bm25 depend
on global N and df, so score recomputation is an aggregation over
the stored postings (cheap: counts, not text), NOT a re-tokenize.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.indexing.postings import (
    build_postings,
    tfidf,
)


def _meta_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "_meta")


def append_batch(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Tokenize ONLY ``new_docs`` and append their postings under
    ``batch_id``; write the commit marker last.  Returns the number
    of docs appended.  Document ids must be new (caller dedups —
    e.g. exact_dedup / url dedup upstream)."""
    posts = build_postings(
        new_docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
    )
    n_docs = new_docs.select(id_col).distinct().count()
    (
        posts.withColumn("batch_id", F.lit(batch_id).cast("long"))
        .write.mode("append")
        .partitionBy("batch_id")
        .parquet(os.path.join(index_dir, "postings"))
    )
    os.makedirs(_meta_dir(index_dir), exist_ok=True)
    tmp = os.path.join(_meta_dir(index_dir), f".{batch_id}.tmp")
    with open(tmp, "w") as f:
        json.dump({"batch_id": batch_id, "n_docs": n_docs}, f)
    os.replace(tmp, os.path.join(_meta_dir(index_dir), f"{batch_id}.json"))
    return n_docs


def committed_batches(index_dir: str) -> dict[int, int]:
    """{batch_id: n_docs} for batches whose marker exists."""
    md = _meta_dir(index_dir)
    out: dict[int, int] = {}
    if not os.path.isdir(md):
        return out
    for name in os.listdir(md):
        if name.endswith(".json"):
            with open(os.path.join(md, name)) as f:
                m = json.load(f)
            out[int(m["batch_id"])] = int(m["n_docs"])
    return out


def read_postings(spark: SparkSession, index_dir: str) -> DataFrame:
    """All committed postings (crash leftovers without markers are
    filtered by batch_id, mirroring FrontierStore._read)."""
    committed = sorted(committed_batches(index_dir))
    df = spark.read.parquet(os.path.join(index_dir, "postings"))
    return df.where(F.col("batch_id").isin(committed))


def current_scores(spark: SparkSession, index_dir: str) -> DataFrame:
    """tf-idf over every committed batch — recomputed from stored
    postings COUNTS (one groupBy pair + a join), never from text.
    Equal to a from-scratch build over the same documents
    (pinned by test_incremental_index_equals_full_rebuild)."""
    doc_count = sum(committed_batches(index_dir).values())
    posts = read_postings(spark, index_dir)
    return tfidf(posts.drop("batch_id"), doc_count=doc_count)
