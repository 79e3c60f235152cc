"""Behavior parity tests ported from the reference's tidyverse-derived
suites (tests/dplyr/test_mutate.py, test_summarise.py, test_select.py,
test_filter.py, test_arrange.py — behavioral spec only, re-written for
this engine)."""

import pytest

from datar_polars_spark import (
    f,
    tibble,
    select,
    rename,
    mutate,
    transmute,
    filter_,
    group_by,
    ungroup,
    summarise,
    arrange,
    desc,
    starts_with,
    everything,
    inner_join,
    left_join,
)
from datar_polars_spark.functions import (
    sum_,
    mean,
    sd,
    n,
    quantile,
    across,
    row_number,
    if_else,
)

from conftest import assert_frame_equal, assert_iterable_equal


# ---- mutate (reference test_mutate.py) ------------------------------------

def test_chained_references(spark):
    td = tibble(spark, x=[1, 2, 3]) >> mutate(y=f.x + 1, z=f.y + 1)
    got = td.collect()
    assert got["y"].tolist() == [2, 3, 4]
    assert got["z"].tolist() == [3, 4, 5]


def test_overwrite_column_uses_new_value(spark):
    td = tibble(spark, x=[1, 2, 3]) >> mutate(x=2, y=f.x)
    got = td.collect()
    assert got["x"].tolist() == [2, 2, 2]
    assert got["y"].tolist() == [2, 2, 2]


def test_overwrite_then_reference(spark):
    td = tibble(spark, x=[1, 2, 3]) >> mutate(y=f.x + 1, x=f.y + 1)
    got = td.collect()
    assert got["y"].tolist() == [2, 3, 4]
    assert got["x"].tolist() == [3, 4, 5]


def test_scalar_broadcast(spark):
    td = tibble(spark, x=[1, 2, 3, 4]) >> mutate(y=1)
    assert td.collect()["y"].tolist() == [1, 1, 1, 1]


def test_none_removes_column(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4]) >> mutate(y=None)
    assert td.columns == ["x"]
    # nonexistent -> noop
    td2 = tibble(spark, x=[1, 2]) >> mutate(z=None)
    assert td2.columns == ["x"]


def test_new_columns_append_in_order(spark):
    td = tibble(spark, a=[1]) >> mutate(b=f.a * 2, c=f.b + 1)
    assert td.columns == ["a", "b", "c"]


def test_mutate_with_across(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4]) >> mutate(
        across([f.x, f.y], lambda c: c * 10)
    )
    got = td.collect()
    assert got["x"].tolist() == [10, 20]
    assert got["y"].tolist() == [30, 40]


def test_grouped_mutate_agg_broadcasts(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1.0, 3.0, 10.0])
    out = td >> group_by(f.g) >> mutate(m=mean(f.x, na_rm=True))
    assert out.collect()["m"].tolist() == [2.0, 2.0, 10.0]


# ---- summarise (reference test_summarise.py) ------------------------------

def test_summarise_single_row_ungrouped(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = td >> summarise(s=sum_(f.x, na_rm=True))
    assert out.collect()["s"].tolist() == [6]


def test_summarise_literal_value(spark):
    td = tibble(spark, x=[1, 2]) >> group_by(f.x) >> summarise(z=1)
    got = td.collect()
    assert got["z"].tolist() == [1, 1]


def test_summarise_peels_one_grouping_layer(spark):
    td = tibble(spark, x=[1, 2, 3, 4], y=[1, 1, 2, 2])
    out = td >> group_by(f.x, f.y) >> summarise(s=sum_(f.y, na_rm=True))
    assert list(out.group_vars) == ["x"]
    out_keep = td >> group_by(f.x, f.y) >> summarise(z=1, _groups="keep")
    assert list(out_keep.group_vars) == ["x", "y"]
    out_drop = td >> group_by(f.x, f.y) >> summarise(z=1, _groups="drop")
    assert list(out_drop.group_vars) == []


def test_summarise_quantile_with_prob_column(spark):
    td = tibble(spark, g=["a"] * 4 + ["b"] * 4,
                x=[1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0])
    out = td >> group_by(f.g) >> summarise(
        qs=quantile(f.x, probs=[0.25, 0.75]), prob=[0.25, 0.75]
    )
    got = out.collect()
    assert list(got.columns) == ["g", "qs", "prob"]
    assert len(got) == 4
    assert set(got["prob"]) == {0.25, 0.75}


def test_summarise_underscore_temp_vars(spark):
    td = tibble(spark, g=["a", "b"], x=[2.0, 4.0])
    out = td >> group_by(f.g) >> summarise(_m=mean(f.x, na_rm=True), m2=f._m * 2)
    got = out.collect()
    assert list(got.columns) == ["g", "m2"]
    assert sorted(got["m2"].tolist()) == [4.0, 8.0]


def test_summarise_empty_frame(spark):
    td = tibble(spark, x=[1]) >> filter_(f.x > 5)
    out = td >> summarise(c=n())
    assert out.collect()["c"].tolist() == [0]


# ---- select / rename (reference test_select.py) ---------------------------

def test_select_negation_and_helpers(spark):
    td = tibble(spark, x1=[1], x2=[2], y=[3])
    assert (td >> select(~f.y)).columns == ["x1", "x2"]
    assert (td >> select(starts_with("x"))).columns == ["x1", "x2"]
    assert (td >> select(everything())).columns == ["x1", "x2", "y"]


def test_select_rename_kwargs(spark):
    td = tibble(spark, x=[1], y=[2])
    out = td >> select(z=f.x)
    assert out.columns == ["z"]


def test_select_retains_group_vars(spark):
    td = tibble(spark, g=[1], x=[2]) >> group_by(f.g)
    out = td >> select(f.x)
    assert out.columns == ["g", "x"]


def test_rename_only_changes_names(spark):
    td = tibble(spark, x=[1], y=[2]) >> rename(a=f.x)
    assert td.columns == ["a", "y"]


# ---- filter (reference test_filter.py) ------------------------------------

def test_filter_multiple_conditions_and(spark):
    td = tibble(spark, x=[1, 2, 3, 4], y=[1, 1, 2, 2])
    out = td >> filter_(f.x > 1, f.y == 2)
    assert out.collect()["x"].tolist() == [3, 4]


def test_grouped_filter_window_condition(spark):
    td = tibble(spark, g=["a", "a", "b", "b"], x=[1.0, 5.0, 10.0, 20.0])
    out = td >> group_by(f.g) >> filter_(f.x > mean(f.x, na_rm=True))
    assert out.collect()["x"].tolist() == [5.0, 20.0]


# ---- arrange (reference test_arrange.py) ----------------------------------

def test_arrange_by_expression_key(spark):
    td = tibble(spark, x=[-3, 1, -2])
    out = td >> arrange(f.x * f.x)
    assert out.collect()["x"].tolist() == [1, -2, -3]


def test_arrange_desc_nulls_last(spark):
    td = tibble(spark, x=[2.0, None, 1.0])
    out = td >> arrange(desc(f.x))
    assert_iterable_equal(out.collect()["x"].tolist(), [2.0, 1.0, None])
    out2 = td >> arrange(f.x)
    assert_iterable_equal(out2.collect()["x"].tolist(), [1.0, 2.0, None])


def test_arrange_by_group_flag(spark):
    td = tibble(spark, g=["b", "a", "b", "a"], x=[2, 4, 1, 3]) >> group_by(f.g)
    out = td >> arrange(f.x, _by_group=True)
    got = out.collect()
    assert got["g"].tolist() == ["a", "a", "b", "b"]
    assert got["x"].tolist() == [3, 4, 1, 2]


# ---- joins (reference test_join.py) ---------------------------------------

def test_natural_join_on_common_columns(spark):
    a = tibble(spark, k=[1, 2], x=["a", "b"])
    b = tibble(spark, k=[2, 3], y=["B", "C"])
    out = a >> inner_join(b)
    got = out.collect()
    assert got["k"].tolist() == [2]
    assert got["x"].tolist() == ["b"]
    assert got["y"].tolist() == ["B"]


def test_join_suffix_on_clash(spark):
    a = tibble(spark, k=[1], v=[10])
    b = tibble(spark, k=[1], v=[20])
    out = a >> left_join(b, by="k")
    assert set(out.columns) == {"k", "v_x", "v_y"}


def test_across_dict_and_list_functions(spark):
    td = tibble(spark, a=[1.0, 2.0, 3.0], b=[4.0, 5.0, 6.0])
    o1 = td >> summarise(across([f.a, f.b], {"sum": sum_, "mean": mean}))
    assert list(o1.columns) == ["a_sum", "a_mean", "b_sum", "b_mean"]
    assert o1.rows() == [(6.0, 2.0, 15.0, 5.0)]
    o2 = td >> summarise(across(f.a, [sum_, mean]))
    assert list(o2.columns) == ["a_sum", "a_mean"]


def test_across_grouped_summarise(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1.0, 2.0, 3.0])
    out = td >> group_by(f.g) >> summarise(across(f.x, sum_))
    assert sorted(out.rows()) == [("a", 3.0), ("b", 3.0)]


def test_slice_negative_drops(spark):
    from datar_polars_spark import slice_, c_

    td = tibble(spark, x=[10, 20, 30, 40])
    assert (td >> slice_(-1)).collect()["x"].tolist() == [20, 30, 40]
    assert (td >> slice_(c_(1, 3))).collect()["x"].tolist() == [10, 30]


def test_tidyselect_num_range_and_where(spark):
    from datar_polars_spark import num_range, where, is_numeric

    td = tibble(spark, x1=[1], x2=[2], y=["a"])
    assert (td >> select(num_range("x", range(1, 3)))).columns == ["x1", "x2"]
    assert (td >> select(where(is_numeric))).columns == ["x1", "x2"]


def test_add_count_name_collision_repair(spark):
    from datar_polars_spark import count, add_count

    td = tibble(spark, g=["a", "a", "b"], n=[1, 2, 3])
    # count drops non-grouped cols, so the count can keep the name "n"
    assert (td >> count(f.g)).columns == ["g", "n"]
    # add_count keeps all cols -> collision repaired to "nn"
    out = td >> add_count(f.g)
    assert out.columns == ["g", "n", "nn"]
    assert out.collect()["nn"].tolist() == [2, 2, 1]
