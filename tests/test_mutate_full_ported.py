"""Port of reference tests/dplyr/test_mutate.py (exact test names;
polars frames replaced with Spark tibbles)."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    c_,
    f,
    group_by,
    group_vars,
    mutate,
    tibble,
    transmute,
    where,
)
from datar_polars_spark.functions import across, is_double, round_


def _gvars(td):
    return list(group_vars(td))


def test_empty_mutate_returns_input_ungrouped(spark):
    td = tibble(spark, x=[1])
    out = td >> mutate()
    assert out.nrow() == 1 and out.columns == ["x"]


def test_empty_mutate_returns_input_grouped(spark):
    td = tibble(spark, x=[1, 2], g=[1, 1]) >> group_by(f.g)
    out = td >> mutate()
    assert out.nrow() == 2 and _gvars(out) == ["g"]


def test_mutate_with_across(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4])
    out = (td >> mutate(across(c_[f.a:], lambda x: x + 1))).collect()
    assert out["a"].tolist() == [2, 3]
    assert out["b"].tolist() == [4, 5]


def test_mutate_with_across_and_c(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4])
    out = (td >> mutate(across(c_[f.a:], lambda x: x + 1))).collect()
    assert out["a"].tolist() == [2, 3]
    assert out["b"].tolist() == [4, 5]


def test_mutate_with_across_and_c2(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4])
    out = (td >> mutate(across(c_[:f.b], round_))).collect()
    assert out["a"].tolist() == [1, 2]
    assert out["b"].tolist() == [3, 4]


def test_mutate_with_across_and_c3(spark):
    td = tibble(spark, a=[1.0, 2.0], b=[3.0, 4.0])
    out = (td >> mutate(across(where(is_double), round_))).collect()
    assert out["a"].tolist() == [1, 2]
    assert out["b"].tolist() == [3, 4]


def test_mutate_with_rowwise(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4])
    out = (td >> mutate(c=f.a + f.b)).collect()
    assert out["c"].tolist() == [4, 6]


def test_mutate_with_group_rowwise(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4]) >> group_by(f.a)
    out = (td >> mutate(c=f.a + f.b)).collect()
    assert sorted(out["c"].tolist()) == [4, 6]


def test_chained_references(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = (td >> mutate(y=f.x + 1, z=f.y + 1)).collect()
    assert out["x"].tolist() == [1, 2, 3]
    assert out["y"].tolist() == [2, 3, 4]
    assert out["z"].tolist() == [3, 4, 5]


def test_overwrite_column_uses_new_value(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = (td >> mutate(x=2, y=f.x)).collect()
    assert out["x"].tolist() == [2, 2, 2]
    assert out["y"].tolist() == [2, 2, 2]


def test_overwrite_then_reference(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = (td >> mutate(y=f.x + 1, x=f.y + 1)).collect()
    assert out["y"].tolist() == [2, 3, 4]
    assert out["x"].tolist() == [3, 4, 5]


def test_scalar_broadcast(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    out = (td >> mutate(y=1)).collect()
    assert out["y"].tolist() == [1, 1, 1, 1]


def test_mismatched_length_raises(spark):
    td = tibble(spark, x=[1, 2, 3])
    with pytest.raises(ValueError):
        td >> mutate(y=[1, 2])


def test_none_removes_existing_column(spark):
    td = tibble(spark, x=[1, 2, 3], y=[4, 5, 6])
    out = td >> mutate(y=None)
    assert out.columns == ["x"]


def test_none_for_nonexistent_column_noop(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = td >> mutate(z=None)
    assert out.columns == ["x"] and out.nrow() == 3


def test_none_removes_from_grouped(spark):
    td = tibble(spark, x=[1, 2, 3], y=[4, 5, 6]) >> group_by(f.x)
    out = td >> mutate(y=None)
    assert out.columns == ["x"]


def test_column_names_preserved(spark):
    td = tibble(spark, a=[1, 2, 3])
    out = td >> mutate(b=f.a * 2)
    assert out.columns == ["a", "b"]


def test_keep_all_is_default(spark):
    td = tibble(spark, x=[1], y=[2])
    out = td >> mutate(z=f.x + f.y)
    assert set(out.columns) == {"x", "y", "z"}


def test_keep_unused(spark):
    td = tibble(spark, x=[1], y=[2])
    out = td >> mutate(x1=f.x + 1, y=f.y, _keep="unused")
    assert "x1" in out.columns


def test_keep_used(spark):
    td = tibble(spark, a=[1], b=[2], c=[3], x=[1], y=[2])
    out = td >> mutate(xy=f.x + f.y, _keep="used")
    assert set(out.columns) == {"x", "y", "xy"}


def test_keep_none_only_new_and_group_vars(spark):
    td = tibble(spark, x=[1], y=[2]) >> group_by(f.x)
    out = td >> mutate(z=1, _keep="none")
    assert set(out.columns) == {"x", "z"}


def test_keep_none_ungrouped(spark):
    td = tibble(spark, x=[1], y=[2])
    out = td >> mutate(z=1, _keep="none")
    assert set(out.columns) == {"z"}


def test_keep_always_retains_grouping_vars(spark):
    td = tibble(spark, x=[1], y=[2], z=[3]) >> group_by(f.z)
    out = td >> mutate(a=f.x + 1, _keep="none")
    assert set(out.columns) == {"z", "a"}
    assert _gvars(out) == ["z"]


def test_default_appends(spark):
    td = tibble(spark, x=[1], y=[2])
    assert (td >> mutate(z=1)).columns == ["x", "y", "z"]


def test_before_int(spark):
    td = tibble(spark, x=[1], y=[2])
    assert (td >> mutate(z=1, _before=1)).columns == ["x", "z", "y"]


def test_after_int(spark):
    td = tibble(spark, x=[1], y=[2])
    assert (td >> mutate(z=1, _after=0)).columns == ["x", "z", "y"]


def test_before_string(spark):
    td = tibble(spark, x=[1], y=[2])
    assert (td >> mutate(z=1, _before="y")).columns == ["x", "z", "y"]


def test_after_string(spark):
    td = tibble(spark, x=[1], y=[2])
    assert (td >> mutate(z=1, _after="x")).columns == ["x", "z", "y"]


def test_after_column(spark):
    td = tibble(spark, x=[1], y=[2])
    assert (td >> mutate(z=1, _after=f.x)).columns == ["x", "z", "y"]


def test_group_vars_preserved_after_mutate(spark):
    td = tibble(spark, x=[1, 2], y=[2, 3]) >> group_by(f.x)
    assert _gvars(td >> mutate(z=1)) == ["x"]


def test_group_vars_preserved_when_overwriting_group_col(spark):
    td = tibble(spark, x=[1, 2], y=[2, 3]) >> group_by(f.x)
    assert _gvars(td >> mutate(x=1)) == ["x"]


def test_mutate_with_none_as_positional(spark):
    td = tibble(spark, x=[1], y=[2])
    out = td >> mutate(None)
    assert out.nrow() == 1 and out.columns == ["x", "y"]


def test_empty_df(spark):
    td = tibble(spark, x=[])
    out = td >> mutate()
    assert out.nrow() == 0 and out.columns == ["x"]


def test_dup_keyword_args(spark):
    td = tibble(spark, a=[1])
    out = (td >> mutate(_b=f.a + 1, b=f._b * 2)).collect()
    assert out["a"].tolist() == [1]
    assert out["b"].tolist() == [4]


def test_complex_expression(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = (td >> mutate(y=f.x * f.x + 1)).collect()
    assert out["y"].tolist() == [2, 5, 10]


def test_wrong_size(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    with pytest.raises(ValueError):
        td >> mutate(y=[1, 2])


def test_transmute_only_keeps_new_cols_and_group_vars(spark):
    td = tibble(spark, x=[1], y=[2])
    assert (td >> transmute(z=f.x + f.y)).columns == ["z"]


def test_transmute_preserves_grouping(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4]) >> group_by(f.x)
    assert _gvars(td >> transmute(z=1)) == ["x"]


def test_transmute_without_args_grouped(spark):
    td = tibble(spark, x=[1], y=[2]) >> group_by(f.x)
    assert (td >> transmute()).columns == ["x"]
