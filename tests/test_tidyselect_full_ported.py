"""Port of reference tests/dplyr/test_tidyselect.py (exact names)."""

from __future__ import annotations

from datar_polars_spark import (
    all_of,
    any_of,
    contains,
    ends_with,
    everything,
    f,
    last_col,
    matches,
    num_range,
    select,
    starts_with,
    tibble,
)


def test_starts_with_in_select(spark):
    td = tibble(spark, x1=[1], x2=[2], y1=[3])
    assert (td >> select(starts_with("x"))).columns == ["x1", "x2"]


def test_starts_with_case_insensitive(spark):
    td = tibble(spark, Abc=[1], abd=[2], xyz=[3])
    assert (td >> select(starts_with("ab"))).columns == ["Abc", "abd"]


def test_ends_with_in_select(spark):
    td = tibble(spark, name_x=[1], name_y=[2], other=[3])
    assert (td >> select(ends_with("_x"))).columns == ["name_x"]


def test_contains_in_select(spark):
    td = tibble(spark, col_a=[1], col_b=[2], other=[3])
    assert (td >> select(contains("col_"))).columns == ["col_a", "col_b"]


def test_matches_in_select(spark):
    td = tibble(spark, x1=[1], x2=[2], y1=[3], y2=[4])
    assert (td >> select(matches(r"^x\d$"))).columns == ["x1", "x2"]


def test_all_of_in_select(spark):
    td = tibble(spark, a=[1], b=[2], c=[3])
    assert (td >> select(all_of(["a", "c"]))).columns == ["a", "c"]


def test_any_of_in_select(spark):
    td = tibble(spark, a=[1], b=[2])
    assert (td >> select(any_of(["a", "c"]))).columns == ["a"]


def test_any_of_no_match(spark):
    td = tibble(spark, a=[1])
    assert (td >> select(any_of(["z"]))).columns == []


def test_num_range_basic():
    assert list(num_range("x", 3)) == ["x0", "x1", "x2"]


def test_everything_in_select(spark):
    td = tibble(spark, a=[1], b=[2], c=[3])
    assert (td >> select(everything())).columns == ["a", "b", "c"]


def test_last_col_in_select(spark):
    td = tibble(spark, a=[1], b=[2], c=[3])
    assert (td >> select(last_col())).columns == ["c"]
