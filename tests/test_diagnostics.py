"""Skew/partition diagnostics (scale/diagnostics.py)."""

import re

from datar_polars_spark import f, read_parquet, tibble
from datar_polars_spark.scale import key_skew, skew_report, partition_sizes

SF = "/root/testdata/sf0.001"


def test_key_skew_top_n(spark):
    td = tibble(spark, k=["a"] * 7 + ["b"] * 2 + ["c"])
    out = key_skew(td, f.k, n=2).collect()
    assert list(out["k"]) == ["a", "b"]
    assert list(out["n"]) == [7, 2]
    assert abs(out["fraction"][0] - 0.7) < 1e-9


def test_key_skew_no_global_sort_funnel(spark):
    """Top-n must compile to TakeOrderedAndProject, not a global sort."""
    td = read_parquet(spark, f"{SF}/lineitem.parquet")
    plan = key_skew(td, f.l_suppkey, n=5).df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert not re.search(r"Sort .*SinglePartition", plan)


def test_skew_report_broadcast_recommendation(spark):
    """Tiny key space -> 'broadcast' and consistent summary stats."""
    td = read_parquet(spark, f"{SF}/lineitem.parquet")
    rep = skew_report(td, f.l_returnflag)
    assert rep["recommendation"] == "broadcast"
    assert rep["distinct_keys"] == 3
    assert rep["rows"] == td.df.count()
    assert rep["max_key_rows"] >= rep["p50_key_rows"]
    assert rep["skew_ratio"] >= 1.0


def test_skew_report_salt_and_aqe_recommendations(spark):
    """Past the broadcast cutoff the ratio rule decides: a mega-hot key
    -> salted_join with a clamped salt ~ max/p50; near-uniform keys ->
    leave it to AQE."""
    # 200 distinct keys, one holding ~half the rows
    ks = ["hot"] * 1000 + [f"k{i}" for i in range(199)] * 5
    skewed = skew_report(tibble(spark, k=ks), f.k, broadcast_max_keys=10)
    assert skewed["recommendation"] == "salted_join"
    assert skewed["skew_ratio"] > 8
    assert 8 <= skewed["suggested_salt"] <= 64
    assert skewed["hot_keys"] >= 1

    uniform = skew_report(
        tibble(spark, k=[f"k{i}" for i in range(100)] * 10), f.k,
        broadcast_max_keys=10,
    )
    assert uniform["recommendation"] == "aqe"
    assert uniform["suggested_salt"] is None


def test_partition_sizes_sums_to_total(spark):
    td = read_parquet(spark, f"{SF}/orders.parquet")
    out = partition_sizes(td).collect()
    assert out["n"].sum() == td.df.count()
    assert (out["n"] > 0).all()
