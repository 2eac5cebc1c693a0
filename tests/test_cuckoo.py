"""Cuckoo filter: no false negatives, deletion, capacity, vectorized probe."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spacetime_crawler4py_spark.frontier.cuckoo import CuckooFilter


def _hexes(keys):
    return pd.Series([hashlib.sha256(k.encode()).hexdigest() for k in keys])


@given(st.lists(st.text(min_size=3, max_size=40), min_size=1, max_size=400, unique=True))
@settings(max_examples=25)
def test_no_false_negatives(keys):
    cf = CuckooFilter.sized_for(len(keys))
    h = _hexes(keys)
    cf.add_series(h)
    assert cf.contains_series(h).all()


def test_delete_then_absent():
    keys = [f"url-{i}" for i in range(500)]
    cf = CuckooFilter.sized_for(len(keys))
    h = _hexes(keys)
    cf.add_series(h)
    victims = h.iloc[:100]
    assert cf.delete_series(victims) == 100
    assert not cf.contains_series(victims).any()
    assert cf.contains_series(h.iloc[100:]).all()


def test_low_false_positive_rate():
    keys = [f"seen-{i}" for i in range(5000)]
    cf = CuckooFilter.sized_for(len(keys))
    cf.add_series(_hexes(keys))
    probe = _hexes([f"unseen-{i}" for i in range(5000)])
    fpr = cf.contains_series(probe).mean()
    assert fpr < 0.01  # 16-bit fingerprints → ~2^-13 per bucket pair


def test_overfull_raises():
    cf = CuckooFilter(8)  # 8 buckets x 4 slots = 32 capacity
    with pytest.raises(RuntimeError):
        cf.add_series(_hexes([f"k{i}" for i in range(200)]))


def test_idempotent_add():
    keys = ["a", "b", "c"]
    cf = CuckooFilter.sized_for(16)
    cf.add_series(_hexes(keys))
    cf.add_series(_hexes(keys))  # re-add is a no-op
    assert cf.contains_series(_hexes(keys)).all()
    assert cf.delete_series(_hexes(["a"])) == 1


def test_crawl_with_cuckoo_seen_filter(spark, corpus80, oracle80, tmp_path):
    """Engine with the cuckoo seen-set produces the exact oracle
    URL-seen set (same contract as the bloom path)."""
    from spacetime_crawler4py_spark.crawl.loop import CrawlEngine
    from spacetime_crawler4py_spark.datagen.pages import SEED_URLS

    corpus_dir, _ = corpus80
    eng = CrawlEngine(
        spark,
        state_dir=str(tmp_path / "state"),
        pages_path=f"{corpus_dir}/pages.parquet",
        status_path=f"{corpus_dir}/fetch_status.parquet",
        seeds=SEED_URLS,
        seen_filter="cuckoo",
        bloom_refresh_batches=2,  # force a mid-crawl rebuild too
    )
    eng.run()
    assert eng.seen_set() == set(oracle80.seen.keys())


def test_crawl_with_sharded_bloom(spark, corpus80, oracle80, tmp_path):
    """host_bucket-sharded bloom (the 10^10-scale layout) preserves
    the exact oracle seen-set, including mid-crawl rebuild + the
    incremental per-shard sync path."""
    from spacetime_crawler4py_spark.crawl.loop import CrawlEngine
    from spacetime_crawler4py_spark.datagen.pages import SEED_URLS

    corpus_dir, _ = corpus80
    eng = CrawlEngine(
        spark,
        state_dir=str(tmp_path / "state"),
        pages_path=f"{corpus_dir}/pages.parquet",
        status_path=f"{corpus_dir}/fetch_status.parquet",
        seeds=SEED_URLS,
        seen_filter="bloom_sharded",
        bloom_refresh_batches=2,
    )
    eng.run()
    assert eng.seen_set() == set(oracle80.seen.keys())


def test_sharded_build_and_delta_match_flat(spark):
    """build_sharded_cuckoo + worker-side delta inserts must answer
    membership exactly like per-shard flat filters: no false
    negatives for any inserted key, deletes routed to the right
    shard, and the live filter untouched when a delta reports a
    load-ceiling failure."""
    import pandas as pd
    from spacetime_crawler4py_spark.frontier.cuckoo import (
        build_sharded_cuckoo,
        merge_sharded_cuckoo_delta,
    )

    def hexes(keys):
        import hashlib

        return pd.Series([hashlib.sha256(k.encode()).hexdigest() for k in keys])

    base = [(hexes([f"k{i}"])[0], i % 4) for i in range(200)]
    seen = spark.createDataFrame(base, "url_hash string, host_bucket int")
    sc = build_sharded_cuckoo(seen)
    assert sc.contains_pairs(
        hexes([f"k{i}" for i in range(200)]),
        pd.Series([i % 4 for i in range(200)]),
    ).all()
    # delta into existing shards + a brand-new bucket
    delta_rows = [(hexes([f"d{i}"])[0], i % 5) for i in range(50)]
    delta = spark.createDataFrame(delta_rows, "url_hash string, host_bucket int")
    assert merge_sharded_cuckoo_delta(sc, delta, spark)
    assert sc.contains_pairs(
        hexes([f"d{i}" for i in range(50)]),
        pd.Series([i % 5 for i in range(50)]),
    ).all()
    # delete from a shard
    assert sc.delete_pairs(hexes(["d0"]), pd.Series([0])) == 1
    # overfull delta: tiny shard + huge delta → False, live filter intact
    from spacetime_crawler4py_spark.frontier.cuckoo import CuckooFilter, ShardedCuckoo

    tiny = CuckooFilter(8)
    tiny.add_series(hexes(["t0"]))
    sc2 = ShardedCuckoo({0: tiny})
    big = spark.createDataFrame(
        [(hexes([f"z{i}"])[0], 0) for i in range(4000)],
        "url_hash string, host_bucket int",
    )
    assert not merge_sharded_cuckoo_delta(sc2, big, spark)
    assert sc2.shards[0] is tiny  # untouched on failure
    assert sc2.contains_pairs(hexes(["t0"]), pd.Series([0])).all()
