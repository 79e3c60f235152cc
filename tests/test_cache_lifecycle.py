"""Internal persist lifecycle: operators that persist intermediates
(LSH signatures, positional-id frames) register them in a bounded FIFO
registry (plans/cache.py) so long pipelines don't accumulate cached
data for the life of the session."""

import pytest

from datar_polars_spark import (
    bind_cols,
    f,
    internal_cache_count,
    release_internal_caches,
    tibble,
)
from datar_polars_spark.scale import minhash_pairs

TEXTS = [
    "the quick brown fox jumps over the lazy dog once",
    "pack my box with five dozen liquor jugs today",
    "sphinx of black quartz judge my vow tonight",
]


def _jvm_cached_count(spark) -> int:
    # getRDDStorageInfo lists RDDs with materialized cached blocks —
    # DataFrame.persist goes through the CacheManager, which
    # getPersistentRDDs does NOT see
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_long_pipeline_bounds_cached_frames(spark):
    release_internal_caches()
    docs = tibble(spark, doc_id=[1, 2, 3], text=TEXTS)
    # 20 signature-persisting ops: the registry cap (default 8) must
    # bound both its own entries and the JVM's persistent-RDD census
    for _ in range(20):
        minhash_pairs(docs, f.text, f.doc_id, num_perm=8, bands=4).df.count()
    assert internal_cache_count() <= 8
    assert _jvm_cached_count(spark) <= 8 + 2  # +2 headroom for fixtures


def test_release_internal_caches_empties_registry(spark):
    docs = tibble(spark, doc_id=[1, 2, 3], text=TEXTS)
    minhash_pairs(docs, f.text, f.doc_id, num_perm=8, bands=4).df.count()
    assert internal_cache_count() >= 1
    released = release_internal_caches()
    assert released >= 1
    assert internal_cache_count() == 0


def test_positional_frames_survive_fifo_eviction(spark):
    # bind_cols persists a positional-id frame whose recompute is
    # nondeterministic -> registered non-evictable: churning 10 safe
    # caches past the cap must NOT unpersist it, and the zip-join
    # result must stay positionally correct
    release_internal_caches()
    a = tibble(spark, x=[1, 2, 3, 4])
    b = tibble(spark, y=[10, 20, 30, 40])
    out = bind_cols(a, b)
    docs = tibble(spark, doc_id=[1, 2, 3], text=TEXTS)
    for _ in range(10):
        minhash_pairs(docs, f.text, f.doc_id, num_perm=8, bands=4).df.count()
    got = out.collect()
    assert got["x"].tolist() == [1, 2, 3, 4]
    assert got["y"].tolist() == [10, 20, 30, 40]
    release_internal_caches()


def test_nonevictable_frames_do_not_consume_the_cap(spark):
    # cap counts ONLY evictable entries: if non-evictable positional-id
    # frames filled the budget, every later evictable frame — including
    # the one being registered — would be unpersisted in the same call,
    # silently defeating the LSH persists
    import os

    from datar_polars_spark.plans.cache import register_internal_cache

    release_internal_caches()
    os.environ["DATAR_MAX_INTERNAL_CACHES"] = "2"
    try:
        pinned = [spark.range(i, i + 5).persist() for i in range(3)]
        for df in pinned:
            register_internal_cache(df, safe_to_evict=False)
            df.count()
        fresh = spark.range(100, 200).persist()
        register_internal_cache(fresh)
        fresh.count()
        # the just-registered evictable frame must still be cached
        assert fresh.storageLevel.useMemory or fresh.storageLevel.useDisk
        # and the pinned non-evictable frames were never touched
        for df in pinned:
            assert df.storageLevel.useMemory or df.storageLevel.useDisk
        # churning more evictable frames still bounds the evictable set
        extra = [spark.range(300 + i, 320 + i).persist() for i in range(4)]
        for df in extra:
            register_internal_cache(df)
            df.count()
        evictable_cached = [
            df for df in [fresh, *extra]
            if df.storageLevel.useMemory or df.storageLevel.useDisk
        ]
        assert len(evictable_cached) <= 2
    finally:
        del os.environ["DATAR_MAX_INTERNAL_CACHES"]
        release_internal_caches()


def test_eviction_is_recompute_safe(spark):
    # a result whose cached signature frame was evicted still collects
    # correctly (Spark recomputes the deterministic plan)
    import os

    release_internal_caches()
    docs = tibble(
        spark, doc_id=[1, 2], text=[TEXTS[0], TEXTS[0] + " again"]
    )
    pairs = minhash_pairs(docs, f.text, f.doc_id, num_perm=16, bands=8,
                          threshold=0.3)
    n_before = pairs.df.count()
    os.environ["DATAR_MAX_INTERNAL_CACHES"] = "1"
    try:
        other = tibble(spark, doc_id=[5, 6], text=TEXTS[:2])
        for _ in range(3):
            minhash_pairs(other, f.text, f.doc_id, num_perm=8, bands=4).df.count()
        assert pairs.df.count() == n_before  # evicted -> recomputed, same answer
    finally:
        del os.environ["DATAR_MAX_INTERNAL_CACHES"]
        release_internal_caches()
