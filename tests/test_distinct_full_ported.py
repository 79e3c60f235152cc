"""Port of reference tests/dplyr/test_distinct.py (exact names)."""

from __future__ import annotations

import pytest

from datar_polars_spark import distinct, f, group_by, group_vars, tibble


def _gvars(td):
    return list(group_vars(td))


def test_distinct_no_args_deduplicates_all(spark):
    td = tibble(spark, x=[1, 1, 2, 2], y=[1, 2, 1, 2])
    out = td >> distinct()
    assert out.nrow() == 4 and out.columns == ["x", "y"]


def test_distinct_duplicate_rows_removed(spark):
    td = tibble(spark, x=[1, 1, 2], y=[1, 1, 3])
    got = (td >> distinct()).collect()
    assert got["x"].tolist() == [1, 2]
    assert got["y"].tolist() == [1, 3]


def test_distinct_all_unique_already(spark):
    td = tibble(spark, x=[1, 2, 3], y=[4, 5, 6])
    got = (td >> distinct()).collect()
    assert got["x"].tolist() == [1, 2, 3]
    assert got["y"].tolist() == [4, 5, 6]


def test_distinct_preserves_order(spark):
    td = tibble(spark, x=[2, 1, 3, 1], y=[4, 5, 6, 5])
    assert (td >> distinct()).collect()["x"].tolist() == [2, 1, 3]


def test_distinct_by_single_col(spark):
    td = tibble(spark, x=[1, 1, 2], y=[3, 4, 5])
    out = td >> distinct(f.x)
    assert out.columns == ["x"]
    assert sorted(out.collect()["x"].tolist()) == [1, 2]


def test_distinct_by_multiple_cols(spark):
    td = tibble(spark, x=[1, 1, 2, 2], y=[1, 2, 1, 2])
    assert (td >> distinct(f.x, f.y)).nrow() == 4


def test_distinct_by_col_string(spark):
    td = tibble(spark, x=[1, 1, 2], y=[3, 4, 5])
    out = td >> distinct("x")
    assert out.columns == ["x"]
    assert sorted(out.collect()["x"].tolist()) == [1, 2]


def test_distinct_doesnt_duplicate_cols(spark):
    td = tibble(spark, a=[1, 2, 3], b=[4, 5, 6])
    assert (td >> distinct(f.a, f.a)).columns == ["a"]


def test_distinct_by_expr(spark):
    td = tibble(spark, x=[1, 1, 2, 2], y=[1, 2, 3, 4])
    out = td >> distinct(diff=f.x - f.y)
    assert out.columns == ["diff"]
    assert out.collect()["diff"].tolist() == [0, -1, -2]


def test_distinct_keep_all_true(spark):
    td = tibble(spark, x=[1, 1, 1], y=[3, 2, 1])
    out = td >> distinct(f.x, _keep_all=True)
    got = out.collect()
    assert out.columns == ["x", "y"]
    assert got["x"].tolist() == [1]
    assert got["y"].tolist() == [3]


def test_distinct_keep_all_default_false(spark):
    td = tibble(spark, x=[1, 1], y=[3, 4])
    assert (td >> distinct(f.x)).columns == ["x"]


def test_distinct_grouping_cols_always_included(spark):
    td = tibble(spark, g=[1, 2, 2], x=[1, 2, 3]) >> group_by(f.g)
    out = td >> distinct(f.x)
    assert "g" in out.columns and "x" in out.columns


def test_distinct_preserves_grouping(spark):
    td = tibble(spark, g=[1, 1, 2, 2], x=[1, 2, 3, 4]) >> group_by(f.g)
    assert _gvars(td >> distinct()) == ["g"]


def test_distinct_grouped_vs_ungrouped_equivalent(spark):
    td = tibble(spark, g=[1, 2], x=[1, 2])
    out1 = td >> distinct() >> group_by(f.g)
    out2 = td >> group_by(f.g) >> distinct()
    assert sorted(out1.collect()["g"]) == sorted(out2.collect()["g"])


def test_distinct_empty_df(spark):
    td = tibble(spark, x=[], y=[])
    out = td >> distinct()
    assert out.nrow() == 0 and out.columns == ["x", "y"]


def test_distinct_empty_df_with_cols(spark):
    td = tibble(spark, x=[], y=[])
    out = td >> distinct(f.x)
    assert out.nrow() == 0 and out.columns == ["x"]
