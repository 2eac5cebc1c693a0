"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side architecture here is real and tested — schemas,
partition-preserving batch flow, UDF signatures, batch shapes.  The
codec layer is STUBBED (image/audio libraries are not in this
container): ``decode_image``/``decode_audio`` raise
NotImplementedError unless ``fake=True``, which substitutes a
deterministic content-hash-derived feature vector so the
distributed plumbing is exercisable end-to-end.

Design for 100 TB of media:
- media rows are (id, kind, media binary, meta struct) — the binary
  never crosses a shuffle: featurize FIRST (mapInPandas, narrow),
  then join/aggregate on the small feature output.
- ``maxRecordsPerBatch`` bounds Arrow batch memory (a 10k-row batch
  of 1 MB blobs is 10 GB — callers repartition by size and lower
  the batch cap; ``featurize`` takes ``target_batch_bytes``).
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def decode_image(raw: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image to HxWx3 uint8.  STUB: real decode needs an
    image codec library not present in this container."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic stand-in"
        )
    h = hashlib.sha256(raw).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def decode_audio(raw: bytes, fake: bool = False) -> np.ndarray:
    """Decode audio to a float32 waveform.  STUB (see decode_image)."""
    if not fake:
        raise NotImplementedError(
            "audio codecs unavailable in this environment; pass fake=True"
        )
    h = hashlib.sha256(raw).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.standard_normal(256).astype(np.float32)


def _fake_features(raw: bytes, dim: int) -> list[float]:
    """Deterministic unit-norm feature vector from content hash —
    the stand-in for a real image/audio embedding model."""
    h = hashlib.sha256(raw).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    v = rng.standard_normal(dim)
    v /= np.linalg.norm(v)
    return [float(x) for x in v]


def featurize(
    media: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    dim: int = 16,
    fake: bool = True,
    target_batch_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """(id, kind, features array<float>, n_bytes) via mapInPandas.

    The binary column is consumed inside the UDF and NOT emitted —
    downstream joins/aggregations only move the small feature rows.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("kind", StringType()),
            StructField("features", ArrayType(FloatType())),
            StructField("n_bytes", LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws = pdf[media_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "kind": pdf["kind"],
                    "features": [
                        _fake_features(bytes(r), dim) if fake else None for r in raws
                    ],
                    "n_bytes": [len(r) for r in raws],
                }
            )

    return media.select(id_col, "kind", media_col).mapInPandas(gen, out_schema)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Explode a video row into (media_id, frame_ts_ms) sampling
    points from metadata ONLY — no decode; the decode happens later,
    per frame-partition, in featurize.  JVM-side sequence/explode."""
    return media.where(F.col("kind") == "video").select(
        id_col,
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests/bench."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        raw = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        meta = (
            "application/octet-stream",
            rng.randint(16, 64),
            rng.randint(16, 64),
            rng.randint(1000, 10000) if kind == "video" else 0,
            len(raw),
        )
        rows.append((i, kind, bytearray(raw), meta))
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("media", BinaryType()),
            StructField("meta", MEDIA_META_SCHEMA),
        ]
    )
    return spark.createDataFrame(rows, schema)
