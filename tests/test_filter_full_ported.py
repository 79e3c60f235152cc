"""Port of reference tests/dplyr/test_filter.py (exact names)."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, filter_, group_by, group_vars, tibble, ungroup
from datar_polars_spark.functions import row_number


def test_filters_by_bool_column(spark):
    td = tibble(spark, x=[1, 2, 3, 4], test=[True, False, True, False])
    assert (td >> filter_(f.test)).collect()["x"].tolist() == [1, 3]


def test_filters_by_expression(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    assert (td >> filter_(f.x > 2)).collect()["x"].tolist() == [3, 4]


def test_multiple_conditions(spark):
    td = tibble(spark, x=[1, 2, 3, 4], y=[4, 3, 2, 1])
    assert (td >> filter_(f.x > 1, f.y > 1)).collect()["x"].tolist() == [2, 3]


def test_chained_conditions(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    assert (td >> filter_(f.x > 1, f.x < 4)).collect()["x"].tolist() == [2, 3]


def test_bitwise_and_condition(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    assert (td >> filter_((f.x > 1) & (f.x < 4))).collect()["x"].tolist() == [2, 3]


def test_returns_input_unchanged(spark):
    td = tibble(spark, x=[1, 2, 3])
    assert (td >> filter_()).collect()["x"].tolist() == [1, 2, 3]


def test_empty_df_no_args(spark):
    td = tibble(spark, x=[])
    out = td >> filter_()
    assert out.nrow() == 0 and out.columns == ["x"]


def test_na_values_dropped_by_condition(spark):
    td = tibble(spark, x=[1, 2, None, 4])
    assert (td >> filter_(f.x > 2)).collect()["x"].tolist() == [4]


def test_null_values_dropped(spark):
    td = tibble(spark, x=[None, None, 3, 4])
    assert (td >> filter_(f.x > 2)).collect()["x"].tolist() == [3, 4]


def test_row_number_empty_result(spark):
    td = tibble(spark, a=[1, 2, 3])
    assert (td >> filter_(row_number() == 4)).nrow() == 0


def test_row_number_first(spark):
    td = tibble(spark, a=[1, 2, 3])
    out = (td >> filter_(row_number() == 1)).collect()
    assert out["a"].tolist() == [1]


def test_both_true_returns_all(spark):
    td = tibble(spark, x=[1, 2, 3, 4, 5])
    assert (td >> filter_(True, True)).nrow() == 5


def test_true_scalar(spark):
    td = tibble(spark, x=[1, 2, 3])
    assert (td >> filter_(True)).collect()["x"].tolist() == [1, 2, 3]


def test_grouped_filter_chained(spark):
    td = tibble(spark, g=[1, 1, 1, 2, 2], x=[1, 2, 3, 4, 5])
    out = td >> group_by(f.g) >> filter_(f.x > 2) >> ungroup()
    assert list(group_vars(out)) == []
    assert all(v > 2 for v in out.collect()["x"].tolist())


def test_named_args_raises(spark):
    td = tibble(spark, x=[1, 2])
    with pytest.raises(TypeError):
        td >> filter_(x=1)
