"""Reference-format index sinks (S10-S12).

The reference persists its index as text files: one
``token doc,pos,tag|doc,pos,tag|…`` line per token plus a
``token:byte_offset`` index-of-index side file (indexerV1.py:249-287),
a ``docId;filename;url`` doc-index (indexerV1.py:227-229), and a
``token doc,score|…`` TF-IDF file with offsets (indexerV1.py:425-449).

On Spark these materialize from the postings/tfidf DataFrames.  The
parquet form (``write_parquet_index``) is the scale path — column
stats + predicate pushdown replace the byte-offset side file
entirely (SURVEY §4).  The text form reproduces the reference's
exact on-disk format for golden/diff purposes; it collapses to the
driver (these report-style files are only meaningful small).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet_index(postings: DataFrame, out_dir: str) -> None:
    """Scale path: postings sorted within files by token so parquet
    min/max stats prune point lookups (the index-of-index,
    for free)."""
    (
        postings.repartition("token")
        .sortWithinPartitions("token", "doc_id", "position")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "postings.parquet"))
    )


def write_text_index(grouped: DataFrame, out_dir: str) -> None:
    """Reference merged-index format + index-of-index
    (indexerV1.py:268-281): ``token doc,pos,tag|…`` sorted by token."""
    os.makedirs(out_dir, exist_ok=True)
    rows = grouped.orderBy("token").collect()
    index_path = os.path.join(out_dir, "mergeIndexFile.txt")
    offsets_path = os.path.join(out_dir, "mergeIndexIndexFile.txt")
    pos = 0
    with open(index_path, "w", encoding="utf-8") as f, open(
        offsets_path, "w", encoding="utf-8"
    ) as fo:
        for r in rows:
            posting_str = "|".join(
                f"{p['doc_id']},{p['position']},{p['tag'] or ''}" for p in r["postings"]
            )
            line = f"{r['token']} {posting_str}\n"
            fo.write(f"{r['token']}:{pos}\n")
            f.write(line)
            pos += len(line)


def write_doc_index(docs: DataFrame, out_dir: str) -> None:
    """``docId;filename;url`` lines (indexerV1.py:227-229)."""
    os.makedirs(out_dir, exist_ok=True)
    rows = docs.orderBy("doc_id").collect()
    with open(os.path.join(out_dir, "docIndexFile.txt"), "w", encoding="utf-8") as f:
        for r in rows:
            fname = r["filename"] if "filename" in r.__fields__ else f"doc{r['doc_id']}"
            f.write(f"{r['doc_id']};{fname};{r['url']}\n")


def write_tfidf_file(tfidf: DataFrame, out_dir: str) -> None:
    """``token doc,score|…`` per line, scores desc (indexerV1.py:425-449)."""
    os.makedirs(out_dir, exist_ok=True)
    grouped = (
        tfidf.groupBy("token")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("tfidf"), F.col("doc_id"))), asc=False
            ).alias("scored")
        )
        .orderBy("token")
        .collect()
    )
    path = os.path.join(out_dir, "tfidfFile.txt")
    offsets = os.path.join(out_dir, "tfidfIndexFile.txt")
    pos = 0
    with open(path, "w", encoding="utf-8") as f, open(
        offsets, "w", encoding="utf-8"
    ) as fo:
        for r in grouped:
            body = "|".join(f"{s['doc_id']},{s['tfidf']}" for s in r["scored"])
            line = f"{r['token']} {body}\n"
            fo.write(f"{r['token']}:{pos}\n")
            f.write(line)
            pos += len(line)
