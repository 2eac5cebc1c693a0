"""Driver-contract smoke: entry() + queries()/oracle_sql() shape."""

from __future__ import annotations

import __spark_entry__ as E


def test_entry_runs(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["host", "n_pending"]


def test_queries_registry(spark):
    qs = E.queries()
    osql = E.oracle_sql()
    assert len(qs) >= 25
    assert set(osql) <= set(qs)
    # most queries must carry an oracle (the correctness gate)
    assert len(osql) >= 0.8 * len(qs) - 3
    # a representative query runs at sf0.001
    df = qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
