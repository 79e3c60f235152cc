"""Port of reference tests/dplyr/test_count.py core cases and
tests/dplyr/test_coalesce.py (exact names; starwars cases omitted —
that dataset isn't bundled)."""

from __future__ import annotations

import pytest

from datar_polars_spark import add_tally, count, f, group_by, tally, tibble
from datar_polars_spark.functions import coalesce


def test_count_ungrouped(spark):
    td = tibble(spark, x=[1, 2, 2, 3])
    out = (td >> count()).collect()
    assert len(out) == 1 and out["n"].tolist() == [4]


def test_count_by_column(spark):
    td = tibble(spark, x=[1, 2, 2, 3])
    out = (td >> count(f.x)).collect().sort_values("x")
    assert out["x"].tolist() == [1, 2, 3]
    assert out["n"].tolist() == [1, 2, 1]


def test_count_with_new_column(spark):
    td = tibble(spark, x=[1, 2, 2, 3])
    out = (td >> count(count=f.x)).collect().sort_values("x")
    assert out["x"].tolist() == [1, 2, 3]
    assert out["count"].tolist() == [1, 2, 1]


def test_count_sorted(spark):
    td = tibble(spark, x=[2, 2, 1, 3, 1])
    vals = (td >> count(f.x, sort=True)).collect()["n"].tolist()
    assert vals == sorted(vals, reverse=True)


def test_count_with_weight(spark):
    td = tibble(spark, x=[1, 2, 2], w=[0.5, 1.0, 2.0])
    out = (td >> count(f.x, wt=f.w)).collect().sort_values("x")
    assert out["n"].tolist() == [0.5, 3.0]


def test_tally_ungrouped(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = (td >> tally()).collect()
    assert len(out) == 1 and out["n"].tolist() == [3]


def test_tally_grouped(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3]) >> group_by(f.g)
    out = (td >> tally()).collect().sort_values("g")
    assert out["n"].tolist() == [2, 1]


def test_tally_weighted(spark):
    td = tibble(spark, x=[1, 2, 3], w=[0.5, 1.0, 1.5])
    assert (td >> tally(wt=f.w)).collect()["n"].tolist() == [3.0]


def test_add_tally_ungrouped(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = (td >> add_tally()).collect()
    assert out["n"].tolist() == [3, 3, 3]


def test_add_tally_grouped(spark):
    td = tibble(spark, g=["a", "a", "b"]) >> group_by(f.g)
    out = (td >> add_tally()).collect()
    assert sorted(out["n"].tolist()) == [1, 2, 2]


def test_missing_replaced():
    assert coalesce([None, 1], 1) == [1, 1]


def test_common_type():
    assert coalesce(None, 1) == 1


def test_multiple_replaces():
    assert coalesce([1, None, None], [None, 2, None], [None, None, 3]) == [1, 2, 3]


def test_no_rep():
    assert coalesce([1, 2, None, None, 5]) == [1, 2, None, None, 5]
