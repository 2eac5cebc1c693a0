"""Broadcast Bloom filter over the URL-seen set.

Replaces the shelve membership probe (crawler/frontier.py:59
``urlhash not in self.save``) as the FAST PATH of frontier dedup.
Semantics contract (SURVEY.md F8): the bloom is a prefilter only —
"definitely new" candidates skip the exact anti-join entirely;
"possibly seen" candidates fall through to the exact left-anti join,
so the final URL-seen set is EXACTLY the reference's (no false
negatives by construction, false positives only cost a join probe).

Build is fully distributed: each partition folds its url_hashes into
a local bitmap (numpy, vectorized), partial bitmaps OR-reduce on the
driver (``treeAggregate``-shaped), and the result broadcasts.  For a
10^10-URL frontier at 1% fpp the bitmap is ~11 GiB — too big for one
broadcast, so at that scale the filter shards by ``host_bucket``
(the frontier's write partition key) and each executor holds only
the shards for the buckets it schedules; here a single bitmap
suffices and the sharding is exercised with N_HOST_BUCKETS small.

Hashing: k indexes per key by double hashing (Kirsch-Mitzenmacher)
over the two 64-bit halves of the already-sha256'd url_hash — the
key IS a cryptographic hash, no further mixing needed.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


class BloomFilter:
    def __init__(self, n_bits: int, k: int, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    @staticmethod
    def sized_for(n_items: int, fpp: float = 0.01) -> "BloomFilter":
        n_items = max(n_items, 1024)
        m = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
        k = max(1, round(m / n_items * math.log(2)))
        return BloomFilter(m, k)

    def _indexes(self, hex_hashes: pd.Series) -> np.ndarray:
        """(len, k) bit indexes from sha256-hex keys, vectorized."""
        h1 = hex_hashes.str.slice(0, 15).apply(int, base=16).to_numpy(dtype=np.uint64)
        h2 = hex_hashes.str.slice(15, 30).apply(int, base=16).to_numpy(dtype=np.uint64)
        ks = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.n_bits)

    def add_series(self, hex_hashes: pd.Series) -> None:
        idx = self._indexes(hex_hashes).ravel()
        np.bitwise_or.at(self.bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))

    def contains_series(self, hex_hashes: pd.Series) -> np.ndarray:
        if len(hex_hashes) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indexes(hex_hashes)
        got = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return got.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        return BloomFilter(self.n_bits, self.k, np.bitwise_or(self.bits, other.bits))


def build_bloom(seen: DataFrame, hash_col: str = "url_hash", fpp: float = 0.01) -> BloomFilter:
    """Distributed build: per-partition bitmaps, OR-reduced."""
    n = seen.count()
    proto = BloomFilter.sized_for(n, fpp)
    n_bits, k = proto.n_bits, proto.k

    def partial(it):
        bf = BloomFilter(n_bits, k)
        for pdf in it:
            bf.add_series(pdf[hash_col].astype(str))
        yield pd.DataFrame({"bits": [bf.bits.tobytes()]})

    parts = (
        seen.select(hash_col)
        .mapInPandas(partial, "bits binary")
        .collect()
    )
    out = BloomFilter(n_bits, k)
    for row in parts:
        out.bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return out


def with_might_contain(
    df: DataFrame, seen_filter, spark, hash_col: str = "url_hash",
    out_col: str = "might_be_seen",
) -> DataFrame:
    """Add the membership-probe column via a broadcast filter +
    Arrow-batched pandas UDF.

    ``seen_filter`` is any object with a vectorized
    ``contains_series(pd.Series) -> np.ndarray`` — the BloomFilter
    here or frontier.cuckoo.CuckooFilter (both are
    numpy-array-backed and broadcast-picklable)."""
    b = spark.sparkContext.broadcast(seen_filter)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BooleanType())
    def probe(hashes: pd.Series) -> pd.Series:
        return pd.Series(b.value.contains_series(hashes.astype(str)))

    return df.withColumn(out_col, probe(F.col(hash_col)))
