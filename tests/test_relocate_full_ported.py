"""Port of reference tests/dplyr/test_relocate.py (exact names)."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, group_by, relocate, tibble


def test_relocate_move_column_to_front(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4], c=[5, 6])
    assert (td >> relocate(f.c)).columns == ["c", "a", "b"]


def test_relocate_before(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4], c=[5, 6])
    assert (td >> relocate(f.a, _before="c")).columns == ["b", "a", "c"]


def test_relocate_after(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4], c=[5, 6])
    assert (td >> relocate(f.b, _after="a")).columns == ["a", "b", "c"]


def test_relocate_multiple_columns(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4], c=[5, 6], d=[7, 8])
    assert (td >> relocate(f[f.b:f.c], _after="d")).columns == ["a", "d", "b", "c"]


def test_relocate_before_and_after_error(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4])
    with pytest.raises(ValueError, match="only one"):
        td >> relocate(f.a, _before="b", _after="b")


def test_relocate_no_move_args_noop(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4])
    out = td >> relocate()
    assert out.columns == ["a", "b"]
    assert out.collect()["a"].tolist() == [1, 2]


def test_relocate_with_rename(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4])
    out = td >> relocate(new_x=f.x)
    assert "new_x" in out.columns and "x" not in out.columns


def test_relocate_preserves_group_vars_order(spark):
    td = tibble(spark, g=["a", "a"], x=[1, 2], y=[3, 4]) >> group_by(f.g)
    cols = (td >> relocate(f.y)).columns
    assert "g" in cols and "y" in cols
