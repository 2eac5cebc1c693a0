"""Deterministic distributed sketches: Count-Min and HLL-style
distinct registers (Cormode & Muthukrishnan 2005; Flajolet et al.
2007 — public papers).

Both are built from an md5-derived 60-bit integer hash (the same
base-hash trick as the MinHash oracle): deterministic given the
input, reproducible bit-for-bit in DuckDB SQL — so the DRIVER GATE
hash-verifies the sketch CONTENTS, not just an estimate's rough
magnitude.

Scale shape:
- CMS build: one groupBy on (row, bucket) — d·w cells regardless of
  input size; partial aggregation does the heavy lifting map-side.
  Merging sketches from partitions/streams is the same groupBy-sum
  (the sketch is a linear operator).
- HLL registers: one groupBy on bucket (m cells), max-combine —
  the classic mergeable register layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h60(col: Column) -> Column:
    """md5-derived 60-bit non-negative int hash (JVM, DuckDB-twin:
    ('0x' || substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def cms_build(
    df: DataFrame,
    col: str,
    w: int = 256,
    d: int = 4,
) -> DataFrame:
    """Count-Min sketch of the multiset in ``col``: (row, bucket,
    cnt) cells, row i using hash_i(x) = h60(i || ':' || x) mod w.

    d·w cells total; build is one partial-agg groupBy.
    """
    rows = [
        df.select(
            F.lit(i).alias("row"),
            F.pmod(
                _h60(F.concat(F.lit(f"{i}:"), F.col(col))), F.lit(w)
            ).alias("bucket"),
        )
        for i in range(d)
    ]
    from functools import reduce

    cells = reduce(lambda a, b: a.unionByName(b), rows)
    return cells.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    col: str,
    w: int = 256,
    d: int = 4,
) -> DataFrame:
    """(item, est): CMS point query — min over the d cells the item
    hashes to.  ``items`` is small (a probe list) and broadcast; the
    sketch itself is d·w rows, also broadcastable.  est ≥ true count
    always (one-sided error w.p. 1)."""
    from functools import reduce

    probes = reduce(
        lambda a, b: a.unionByName(b),
        [
            items.select(
                F.col(col).alias("item"),
                F.lit(i).alias("row"),
                F.pmod(
                    _h60(F.concat(F.lit(f"{i}:"), F.col(col))), F.lit(w)
                ).alias("bucket"),
            )
            for i in range(d)
        ],
    )
    joined = probes.join(F.broadcast(cms), ["row", "bucket"], "left").na.fill(
        {"cnt": 0}
    )
    return joined.groupBy("item").agg(F.min("cnt").alias("est"))


def hll_registers(
    df: DataFrame,
    col: str,
    b: int = 8,
) -> DataFrame:
    """HLL register table over distinct values of ``col``: m = 2^b
    rows (bucket, r) where r = max over values of
    (1 + trailing-zero count of h60(x) >> b), the rank statistic of
    the classic HLL register (trailing instead of leading zeros —
    same geometric distribution, simpler exact SQL via x & -x).

    Mergeable by groupBy(bucket).max — partitions, streams, shards.
    """
    m = 1 << b
    h = _h60(F.col(col))
    # integer shift, NOT division: h/m would round-trip through
    # double and corrupt bits past 2^53
    q = F.shiftright(h, b)
    low = q.bitwiseAND(-q)
    rank = F.when(q == 0, F.lit(61 - b)).otherwise(
        (F.log2(low.cast("double")) + 1).cast("int")
    )
    return (
        df.select(F.pmod(h, F.lit(m)).alias("bucket"), rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("r"))
    )


def hll_estimate(registers: DataFrame, b: int = 8) -> float:
    """Driver-side harmonic-mean estimate from the (tiny) register
    table — alpha_m * m^2 / sum(2^-r), with the small-range
    linear-counting correction.  m scalars cross the driver."""
    import math

    m = 1 << b
    rows = {r["bucket"]: r["r"] for r in registers.collect()}
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -rows.get(i, 0) for i in range(m))
    est = alpha * m * m / s
    zeros = sum(1 for i in range(m) if i not in rows)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


def _mg_summarize(items, k: int) -> dict:
    """Classic Misra-Gries: ≤ k-1 counters; any item with frequency
    > n/k survives with count ≥ true - n/k."""
    counters: dict = {}
    for x in items:
        if x in counters:
            counters[x] += 1
        elif len(counters) < k - 1:
            counters[x] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


def heavy_hitters(
    df: DataFrame,
    col: str,
    phi: float = 0.01,
) -> DataFrame:
    """(item, cnt) for every item with frequency > phi·N — EXACT
    output via the classic two-pass shape (Misra-Gries 1982):

    1. candidate pass: per-PARTITION MG summaries with k = ⌈1/phi⌉
       counters (mapInPandas; O(k) state per partition, no shuffle
       of the raw stream).  Pigeonhole: an item above phi·N globally
       is above phi·N_p in at least one partition, so the union of
       partition summaries is a SUPERSET of the true heavy hitters —
       and it is at most P·k rows, the only thing shuffled.
    2. exact pass: semi-join the stream on the (broadcast) candidate
       set, count, filter > phi·N.

    Deterministic (the MG pass only affects WHICH candidates are
    double-checked, never the output) — hence SQL-oracle-able even
    though the sketch itself is order-dependent.
    """
    import math

    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    k = max(int(math.ceil(1.0 / phi)), 2)
    out_schema = StructType(
        [StructField("item", StringType()), StructField("c", LongType())]
    )

    def gen(batches):
        from itertools import chain

        counters = _mg_summarize(
            chain.from_iterable(pdf[col] for pdf in batches), k
        )
        yield pd.DataFrame(
            {"item": list(counters), "c": list(counters.values())}
        )

    # nulls are excluded from both the stream and N: a null key
    # can never survive the semi-join (SQL null-equality), so
    # counting null rows in N while silently dropping a null heavy
    # hitter would both misreport and diverge from any GROUP BY
    # oracle that emits the NULL group
    vals = df.select(F.col(col).cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )
    cand = (
        vals.withColumnRenamed("item", col)
        .mapInPandas(gen, out_schema)
        .select("item")
        .distinct()
    )
    n = vals.count()
    # integer threshold: counts are integers, so `cnt > phi*n` is
    # exactly `cnt > floor(phi*n)` — comparing against the float
    # directly risks admitting a boundary count when phi arrives as
    # min_count/n and phi*n rounds to 74.999…, diverging from an
    # integer `HAVING COUNT(*) > k` oracle
    threshold = int(math.floor(phi * n + 1e-9))
    return (
        vals.join(F.broadcast(cand), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > F.lit(threshold))
    )
