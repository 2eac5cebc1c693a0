"""Deterministic sequence packing for LLM training (engine
extension; the reference has no training surface).

Training consumes fixed-length token sequences, not documents; the
standard GPT-style prep lays documents end-to-end and cuts the
stream every ``seq_len`` tokens ("concat-and-chunk").  A naive
global layout is a single total order — one sort, one task, one
writer.  The scale shape used here (and by real corpus pipelines)
is SHARD-PARALLEL packing:

  - each doc lands in a shard by the sampling-family md5 hash of
    its id (pure Column math — deterministic under repartitioning,
    retry, and AQE, and stable when new docs are appended: an old
    doc never changes shard);
  - within a shard, docs are ordered by (hash, id) — the hash
    doubles as a deterministic global shuffle, the mixing training
    wants, with the id as total-order tie-break;
  - the token stream is cut per shard; sequences never cross
    shards, so shards pack embarrassingly parallel and a sequence
    is addressed by (shard, seq).

Cost: one shuffle on the shard key + one in-shard sort + a running
SUM window — the window partitions on shard, so its state is
bounded by docs-per-shard.  Size ``n_shards`` ~ corpus_tokens /
(10⁸..10⁹) so a shard's doc list fits one task comfortably; the
last, partially-filled sequence of each shard is the only padding
waste (n_shards sequences corpus-wide, negligible).

Zero-token docs are dropped (they occupy no stream positions);
callers wanting them accounted should filter beforehand.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash60(id_col: Column, salt: str) -> Column:
    """Top 60 md5 bits of 'salt:id' — the operators/sampling idiom,
    so DuckDB oracles replay it as
    ('0x' || substr(md5(salt || ':' || id), 1, 15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), id_col)), 1, 15),
        16,
        10,
    ).cast("long")


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Returns one row per non-empty doc:
      (id_col, shard, n_tokens, tok_start, first_seq, last_seq)
    where ``tok_start`` is the doc's offset in its shard's token
    stream and ``first_seq``/``last_seq`` are the shard-local
    sequence indices the doc's tokens fall into (a doc longer than
    ``seq_len`` spans several).  All-integer output — exact across
    engines.
    """
    from spacetime_crawler4py_spark.functions.text_quality import (
        token_count_ws,
    )

    h = _hash60(F.col(id_col), salt)
    toks = df.select(
        F.col(id_col),
        h.alias("_h"),
        token_count_ws(F.col(text_col)).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    shard = F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = toks.withColumn("shard", shard).select(
        id_col,
        "shard",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("tok_start"),
    )
    return placed.select(
        id_col,
        "shard",
        "n_tokens",
        "tok_start",
        F.floor(F.col("tok_start") / seq_len).cast("long").alias("first_seq"),
        F.floor(
            (F.col("tok_start") + F.col("n_tokens") - 1) / seq_len
        ).cast("long").alias("last_seq"),
    )


def packing_stats(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Per-shard packing summary:
    (shard, n_docs, n_tokens, n_seqs, tail_fill) — ``n_seqs`` full
    or partial sequences the shard cuts into, ``tail_fill`` the
    fill fraction of its final partial sequence (the padding waste).
    One partial agg over pack_sequences' output."""
    placed = pack_sequences(df, seq_len, id_col, text_col, n_shards, salt)
    return (
        placed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            F.ceil(F.col("n_tokens") / seq_len).cast("long").alias("n_seqs"),
            F.round(
                (F.col("n_tokens") % seq_len) / F.lit(float(seq_len)), 4
            ).alias("tail_fill"),
        )
    )
