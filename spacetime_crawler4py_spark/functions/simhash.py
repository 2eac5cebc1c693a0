"""64-bit SimHash fingerprinting (Charikar 2002) + LSH banding.

The reference near-dup-drops documents whose simhash is within
Hamming distance 3 of an already-indexed doc (indexerV1.py:149,
203-208, via the public `simhash` PyPI package).  This is a
from-scratch implementation of the same published scheme:

- features: 4-char sliding shingles over the lowercase text with
  non-word chars removed (the conventional text featurization used
  by that package), weighted by occurrence count;
- fingerprint: per-bit weighted vote over 64-bit md5-derived feature
  hashes.

Scale path: Hamming-≤3 near-dup search uses pigeonhole banding —
split the 64-bit fingerprint into 4 × 16-bit bands; any pair within
distance 3 shares at least one exact band (4 bands, ≤3 differing
bits ⇒ some band untouched).  The self-join is then an equi-join on
(band_idx, band_value) — shuffle on a 16-bit-bounded key — followed
by an exact popcount filter.  No O(n²) comparison anywhere.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

_FEATURE_RE = re.compile(r"[\w一-鿌]+", re.UNICODE)
_WIDTH = 4
_MASK64 = (1 << 64) - 1


def _features(text: str) -> list[str]:
    s = "".join(_FEATURE_RE.findall(text.lower()))
    if len(s) <= _WIDTH:
        return [s] if s else []
    return [s[i : i + _WIDTH] for i in range(len(s) - _WIDTH + 1)]


def _hash64(token: str) -> int:
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


def py_simhash64(text: str) -> int:
    """64-bit simhash of text; returned as a SIGNED 64-bit int so it
    round-trips through Spark LongType."""
    votes = [0] * 64
    counts: dict[str, int] = {}
    for f in _features(text):
        counts[f] = counts.get(f, 0) + 1
    for f, w in counts.items():
        h = _hash64(f)
        for b in range(64):
            votes[b] += w if (h >> b) & 1 else -w
    v = 0
    for b in range(64):
        if votes[b] > 0:
            v |= 1 << b
    return v - (1 << 64) if v >= (1 << 63) else v


def py_hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK64).count("1")


@pandas_udf(LongType())
def pdf_simhash64(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: py_simhash64(t) if t is not None else None)


# --------------------------------------------------------- Spark side

N_BANDS = 4
BAND_BITS = 64 // N_BANDS


def col_band(sim: Column, band_idx: int) -> Column:
    """The band_idx-th 16-bit band of a signed-64 simhash, JVM-side."""
    return F.shiftrightunsigned(sim, band_idx * BAND_BITS).bitwiseAND(
        F.lit((1 << BAND_BITS) - 1)
    )


def col_hamming64(a: Column, b: Column) -> Column:
    """popcount(a XOR b) via bit_count (JVM built-in, codegen'd)."""
    return F.bit_count(a.bitwiseXOR(b))
