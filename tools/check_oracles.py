"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at the
given SF, compare row count, column names, and an order-insensitive
value hash (floats normalized via repr of round-tripped values).

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    # Type-surfaced normalization: an integral float ("1000.0") must NOT
    # collapse into an int ("1000") — the driver's gate hashes the raw
    # string surface, so DuckDB HUGEINT->pandas-float64 leaks (e.g. an
    # uncast SUM(BIGINT) output) have to fail HERE, not only at the
    # driver.  bool checked first (bool is Integral).
    import numbers

    if v is None:
        return "None"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, numbers.Integral):
        return f"int:{v}"
    if isinstance(v, numbers.Real):
        return f"float:{float(v):.6g}"
    return str(v)


def df_key(rows, cols):
    return sorted(",".join(norm_cell(r[c]) for c in cols) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from spacetime_crawler4py_spark.session import get_spark
    from spacetime_crawler4py_spark.queries import QUERIES, ORACLES

    spark = get_spark(app_name="check-oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    # explicit generous limit: DuckDB's auto-detected cap can land
    # low under cgroup/ambient-load conditions and the unrolled-fit
    # oracles are planner-heavy.  Overridable (SPARK_GRAFT_DUCKDB_MEM,
    # e.g. '8GB'); default = 40% of detected physical RAM so smaller
    # boxes spill instead of OOM-killing.
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
    if not mem:
        try:
            pages = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
            mem = f"{max(1, int(pages * 0.4 / 2**30))}GB"
        except (ValueError, OSError):
            mem = "4GB"
    con.execute(f"SET memory_limit='{mem}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_noracle = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"NOORC {name}: rows={len(srows)} (rows-only check)")
            n_noracle += 1
            continue
        try:
            od = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ocols = sorted(od.columns)
        orows = od.to_dict("records")
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} vs {ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rows {len(srows)} vs {len(orows)}")
            n_fail += 1
            continue
        sk = df_key([r.asDict() for r in srows], scols)
        ok = df_key(orows, ocols)
        if sk != ok:
            diff = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            n_fail += 1
            continue
        print(f"PASS  {name}: rows={len(srows)}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
