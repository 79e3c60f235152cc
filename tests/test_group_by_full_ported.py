"""Port of reference tests/dplyr/test_group_by.py (exact names)."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, group_by, group_vars, rowwise, tibble, ungroup


def _gvars(td):
    return list(group_vars(td))


def test_group_by_single(spark):
    td = tibble(spark, x=[1, 2, 3], y=[4, 5, 6])
    assert _gvars(td >> group_by(f.x)) == ["x"]


def test_group_by_string(spark):
    td = tibble(spark, x=[1, 2, 3])
    assert _gvars(td >> group_by("x")) == ["x"]


def test_group_by_preserves_data(spark):
    td = tibble(spark, x=[1, 2, 3], y=[4, 5, 6])
    out = td >> group_by(f.x)
    assert out.nrow() == 3 and out.columns == ["x", "y"]


def test_does_not_affect_input_data(spark):
    td = tibble(spark, x=[1, 2, 3])
    _ = td >> group_by(f.x)
    assert td.collect()["x"].tolist() == [1, 2, 3]
    assert _gvars(td) == []


def test_group_by_multiple(spark):
    td = tibble(spark, x=[1, 2, 3], y=[4, 5, 6], z=[7, 8, 9])
    assert _gvars(td >> group_by(f.x, f.y)) == ["x", "y"]


def test_group_by_multiple_strings(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4])
    assert _gvars(td >> group_by("x", "y")) == ["x", "y"]


def test_group_by_add_appends(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4], z=[5, 6]) >> group_by(f.x)
    assert _gvars(td >> group_by(f.y, _add=True)) == ["x", "y"]


def test_group_by_add_no_duplicates(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4]) >> group_by(f.x)
    assert _gvars(td >> group_by(f.x, _add=True)) == ["x"]


def test_group_by_no_add_replaces(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4]) >> group_by(f.x)
    assert _gvars(td >> group_by(f.y)) == ["y"]


def test_group_vars_returns_correct(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4]) >> group_by(f.y)
    assert _gvars(td) == ["y"]


def test_group_vars_ungrouped_returns_empty(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4])
    assert _gvars(td) == []


def test_ungroup_string_col(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4]) >> group_by(f.x)
    assert _gvars(td >> ungroup("x")) == []


def test_ungroup_nonexistent_col_error(spark):
    td = tibble(spark, x=[1, 2]) >> group_by(f.x)
    with pytest.raises(KeyError):
        td >> ungroup(f.z)


def test_rowwise_sets_flag(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = td >> rowwise()
    assert out.rowwise is True or out.rowwise
    assert _gvars(out) == []


def test_rowwise_with_cols_sets_groups(spark):
    td = tibble(spark, x=[1, 2, 3], y=[4, 5, 6])
    out = td >> rowwise(f.x)
    assert out.rowwise
    assert _gvars(out) == ["x"]


def test_rowwise_over_grouped_df(spark):
    td = tibble(spark, g=[1, 2], x=[1, 2]) >> group_by(f.g)
    out = td >> rowwise()
    assert out.rowwise


def test_group_by_after_rowwise_replaces(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4]) >> rowwise(f.x)
    out = td >> group_by(f.y)
    assert _gvars(out) == ["y"] and not out.rowwise
