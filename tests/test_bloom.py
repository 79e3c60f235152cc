"""Bloom-filter semi-join reduction: zero false negatives (exact
superset of semi_join), observed fpp near theory, fully JVM-side
probe (no Python UDF, no fact-side shuffle), null/empty edge cases.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datar_polars_spark.scale.bloom import Bloom, build_bloom, bloom_semi_reduce
from datar_polars_spark.tibble import ensure_tibble


@pytest.fixture(scope="module")
def frames(spark):
    dim = spark.range(0, 2000).select((F.col("id") * 3).alias("k"))
    fact = spark.range(0, 100000).select(
        F.col("id"), F.pmod(F.col("id") * 7 + 1, 30000).alias("k")
    )
    return fact, dim


def test_superset_of_semi_join_no_false_negatives(spark, frames):
    fact, dim = frames
    red = bloom_semi_reduce(ensure_tibble(fact), dim, on="k").df
    true_semi = fact.join(dim, "k", "left_semi")
    # every true match survives
    assert true_semi.join(red, ["id", "k"], "left_anti").count() == 0
    # and the reduction is a subset of the fact
    assert red.join(fact, ["id", "k"], "left_anti").count() == 0


def test_observed_fpp_near_theory(spark, frames):
    fact, dim = frames
    bloom = build_bloom(dim, "k", fpp=0.01)
    red = bloom_semi_reduce(ensure_tibble(fact), dim, on=("k", bloom)).df
    n_true = fact.join(dim, "k", "left_semi").count()
    n_fact = fact.count()
    fp_rate = (red.count() - n_true) / (n_fact - n_true)
    # generous 3x bound: binomial noise at this size is < 0.3 pp
    assert fp_rate < 0.03
    assert bloom.effective_fpp == pytest.approx(0.01, abs=0.003)


def test_sizing_optima(spark, frames):
    _, dim = frames
    bloom = build_bloom(dim, "k", fpp=0.01)
    # classic optima: ~9.59 bits/item, k ~ 7 at 1% fpp
    assert bloom.n_items == 2000
    assert 9 * bloom.n_items <= bloom.m <= 11 * bloom.n_items
    assert bloom.k in (6, 7, 8)
    assert bloom.m % 64 == 0


def test_bloom_reuse_and_pair_on(spark, frames):
    fact, dim = frames
    bloom = build_bloom(dim, "k", fpp=0.01)
    a = bloom_semi_reduce(ensure_tibble(fact), dim, on=("k", bloom)).df.count()
    b = bloom_semi_reduce(ensure_tibble(fact), dim, on=("k", bloom)).df.count()
    assert a == b  # deterministic, reusable


def test_string_keys(spark):
    dim = spark.createDataFrame([("a",), ("b",), ("zebra",)], "s string")
    fact = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["a", "b", "c", "zebra", "quux", "a"])],
        "id int, s string",
    )
    red = bloom_semi_reduce(ensure_tibble(fact), dim, on="s").df
    got = {r["id"] for r in red.collect()}
    assert {0, 1, 3, 5} <= got  # all true matches, maybe fp 2/4


def test_null_keys_dropped(spark):
    dim = spark.createDataFrame([(1,), (None,)], "k int")
    fact = spark.createDataFrame([(1, 1), (2, None), (3, 9)], "id int, k int")
    red = bloom_semi_reduce(ensure_tibble(fact), dim, on="k").df
    ids = {r["id"] for r in red.collect()}
    assert 1 in ids and 2 not in ids  # null fact key cannot equi-join


def test_empty_key_side(spark):
    dim = spark.createDataFrame([], "k bigint")
    fact = spark.range(10).select(F.col("id").alias("k"))
    red = bloom_semi_reduce(ensure_tibble(fact), dim, on="k").df
    # empty key set: nothing can truly match; the filter may keep ~fpp
    # rows (m floors at one word) but must not error
    assert red.count() <= 10


def test_max_bits_cap_degrades_not_breaks(spark, frames):
    fact, dim = frames
    bloom = build_bloom(dim, "k", fpp=0.001, max_bits=1024)
    assert bloom.m == 1024
    assert bloom.effective_fpp > 0.001  # degraded, reported honestly
    red = bloom_semi_reduce(ensure_tibble(fact), dim, on=("k", bloom)).df
    true_semi = fact.join(dim, "k", "left_semi")
    assert true_semi.join(red, ["id", "k"], "left_anti").count() == 0


def test_plan_no_fact_shuffle_no_python(spark, frames):
    fact, dim = frames
    red = bloom_semi_reduce(ensure_tibble(fact), dim, on="k").df
    plan = red._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the fact side must not hash-exchange and the probe must stay JVM
    assert "hashpartitioning" not in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_explicit_expected_items_skips_count(spark, frames):
    _, dim = frames
    bloom = build_bloom(dim, "k", fpp=0.01, expected_items=2000)
    assert isinstance(bloom, Bloom)
    assert bloom.n_items == 2000


def test_cross_width_integral_keys_keep_all_matches(spark):
    # F.hash is type-sensitive: without canonicalization an int fact
    # probed against a bigint-built filter loses EVERY true match.
    dim = spark.range(0, 500).select(F.col("id").alias("k"))  # bigint
    fact = spark.createDataFrame(
        [(i, i % 1000) for i in range(4000)], "id int, k int"  # int
    )
    red = bloom_semi_reduce(ensure_tibble(fact), dim, on="k").df
    true_semi = fact.join(dim, "k", "left_semi")
    assert true_semi.count() == 2000
    assert true_semi.join(red, ["id", "k"], "left_anti").count() == 0


def test_cross_width_float_double_keys(spark):
    dim = spark.createDataFrame([(0.5,), (1.25,)], "k double")
    fact = spark.createDataFrame(
        [(1, 0.5), (2, 1.25), (3, 9.75)], "id int, k float"
    )
    red = bloom_semi_reduce(ensure_tibble(fact), dim, on="k").df
    ids = {r["id"] for r in red.collect()}
    assert {1, 2} <= ids


def test_decimal_scale_variants_keep_matches(spark):
    dim = spark.createDataFrame([("5.00",)], "k string").select(
        F.col("k").cast("decimal(10,2)").alias("k")
    )
    fact = spark.createDataFrame([(1, "5.0000"), (2, "7.0000")], "id int, k string").select(
        "id", F.col("k").cast("decimal(20,4)").alias("k")
    )
    red = bloom_semi_reduce(ensure_tibble(fact), dim, on="k").df
    ids = {r["id"] for r in red.collect()}
    assert 1 in ids


def test_incompatible_probe_dtype_raises(spark):
    dim = spark.range(0, 10).select(F.col("id").alias("k"))  # bigint
    fact = spark.createDataFrame([(1, "5")], "id int, k string")
    bloom = build_bloom(dim, "k")
    with pytest.raises(TypeError, match="type-sensitive"):
        bloom_semi_reduce(ensure_tibble(fact), dim, on=("k", bloom))


def test_wide_decimal_keys_raise_instead_of_dropping(spark):
    # decimal(38,18) holds 20 integer digits; a wider source decimal
    # would overflow the canonicalizing cast to NULL and the build side
    # would silently drop the key while the probe keeps the fact row —
    # a broken zero-false-negative contract. Refuse loudly instead.
    dim = spark.createDataFrame(
        [("123456789012345678901234567890",)], "k string"
    ).select(F.col("k").cast("decimal(38,0)").alias("k"))
    with pytest.raises(TypeError, match="integer digits"):
        build_bloom(dim, "k")
    fact = spark.createDataFrame([(1, "5")], "id int, k string").select(
        "id", F.col("k").cast("decimal(30,2)").alias("k")
    )
    dim2 = spark.range(3).select(F.col("id").alias("k"))
    bloom = build_bloom(dim2, "k")
    with pytest.raises(TypeError, match="integer digits"):
        bloom_semi_reduce(ensure_tibble(fact), dim2, on=("k", bloom))


def test_might_contain_without_dtype_uses_filter_hash_type(spark):
    # The documented custom-pipeline entry point: dtype omitted must
    # default the probe to the FILTER's canonical hash type — an int
    # probe against a bigint-built filter would otherwise silently
    # miss every true match.
    dim = spark.range(0, 100).select(F.col("id").alias("k"))  # bigint
    bloom = build_bloom(dim, "k")
    fact = spark.createDataFrame(
        [(i, i) for i in range(100)], "id int, k int"  # narrower int
    )
    kept = (
        fact.crossJoin(F.broadcast(bloom.bits_df))
        .where(bloom.might_contain("k"))  # no dtype
        .count()
    )
    assert kept == 100  # zero false negatives
