"""Ported from the reference's tests/dplyr/test_distinct.py,
test_bind.py, test_rename.py, test_lazy.py and the selection corners of
tests/core/test_utils.py (vector/metadata tests there are Polars
internals; the behavioral surface is ported here)."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    Tibble,
    bind_cols,
    bind_rows,
    collect_,
    distinct,
    f,
    filter_,
    group_by,
    lazy_,
    mutate,
    rename,
    rename_with,
    select,
    tibble,
)
from datar_polars_spark.plans.selection import resolve_selection


def col(t, name):
    return list(t.collect()[name])


# -- distinct (reference test_distinct.py) ----------------------------------

class TestDistinctBasic:
    def test_no_args_deduplicates_all(self, spark):
        df = tibble(spark, x=[1, 1, 2, 2], y=[1, 2, 1, 2])
        out = df >> distinct()
        assert out.collect().shape == (4, 2)

    def test_duplicate_rows_removed(self, spark):
        df = tibble(spark, x=[1, 1, 2], y=[1, 1, 3])
        out = df >> distinct()
        pdf = out.collect()
        assert pdf.shape == (2, 2)
        assert list(pdf["x"]) == [1, 2]
        assert list(pdf["y"]) == [1, 3]

    def test_all_unique_already(self, spark):
        df = tibble(spark, x=[1, 2, 3], y=[4, 5, 6])
        pdf = (df >> distinct()).collect()
        assert list(pdf["x"]) == [1, 2, 3]
        assert list(pdf["y"]) == [4, 5, 6]

    def test_preserves_order(self, spark):
        df = tibble(spark, x=[2, 1, 3, 1], y=[4, 5, 6, 5])
        out = df >> distinct()
        assert col(out, "x") == [2, 1, 3]


class TestDistinctSpecificColumns:
    def test_by_single_col(self, spark):
        df = tibble(spark, x=[1, 1, 2], y=[3, 4, 5])
        out = df >> distinct(f.x)
        assert out.columns == ["x"]
        assert sorted(col(out, "x")) == [1, 2]

    def test_by_multiple_cols(self, spark):
        df = tibble(spark, x=[1, 1, 2, 2], y=[1, 2, 1, 2])
        out = df >> distinct(f.x, f.y)
        assert out.collect().shape == (4, 2)

    def test_by_col_string(self, spark):
        df = tibble(spark, x=[1, 1, 2], y=[3, 4, 5])
        out = df >> distinct("x")
        assert out.columns == ["x"]
        assert sorted(col(out, "x")) == [1, 2]

    def test_doesnt_duplicate_cols(self, spark):
        df = tibble(spark, a=[1, 2, 3], b=[4, 5, 6])
        out = df >> distinct(f.a, f.a)
        assert out.columns == ["a"]

    def test_by_expr(self, spark):
        df = tibble(spark, x=[1, 1, 2, 2], y=[1, 2, 3, 4])
        out = df >> distinct(diff=f.x - f.y)
        assert out.columns == ["diff"]
        assert col(out, "diff") == [0, -1, -2]


class TestDistinctKeepAll:
    def test_keep_all_true(self, spark):
        df = tibble(spark, x=[1, 1, 1], y=[3, 2, 1])
        out = df >> distinct(f.x, _keep_all=True)
        pdf = out.collect()
        assert list(pdf.columns) == ["x", "y"]
        assert list(pdf["x"]) == [1]
        assert list(pdf["y"]) == [3]  # first matching row

    def test_keep_all_default_false(self, spark):
        df = tibble(spark, x=[1, 1], y=[3, 4])
        out = df >> distinct(f.x)
        assert out.columns == ["x"]


class TestDistinctGrouped:
    def test_grouping_cols_always_included(self, spark):
        df = tibble(spark, g=[1, 2, 2], x=[1, 2, 3])
        out = df >> group_by(f.g) >> distinct(f.x)
        assert "g" in out.columns and "x" in out.columns

    def test_preserves_grouping(self, spark):
        df = tibble(spark, g=[1, 1, 2, 2], x=[1, 2, 3, 4])
        out = df >> group_by(f.g) >> distinct()
        assert list(out.group_vars) == ["g"]

    def test_grouped_vs_ungrouped_equivalent(self, spark):
        df = tibble(spark, g=[1, 2], x=[1, 2])
        out1 = (df >> distinct() >> group_by(f.g)).collect()
        out2 = (df >> group_by(f.g) >> distinct()).collect()
        assert out1.equals(out2)

    def test_empty_df(self, spark):
        df = tibble(spark, x=[1]) >> filter_(f.x > 5)
        out = df >> distinct()
        assert out.nrow() == 0

    def test_nonexistent_col(self, spark):
        df = tibble(spark, x=[1])
        with pytest.raises((KeyError, Exception)):
            (df >> distinct(f.nope)).collect()


# -- bind (reference test_bind.py) ------------------------------------------

class TestBind:
    def test_bind_rows_two_frames(self, spark):
        a = tibble(spark, x=[1, 2])
        b = tibble(spark, x=[3, 4])
        out = bind_rows(a, b)
        assert col(out, "x") == [1, 2, 3, 4]

    def test_bind_rows_with_id(self, spark):
        a = tibble(spark, x=[1])
        b = tibble(spark, x=[2])
        out = bind_rows(a, b, _id="src")
        pdf = out.collect()
        assert list(pdf["src"]) == [0, 1]


    def test_bind_rows_with_id_named(self, spark):
        a = tibble(spark, x=[1])
        b = tibble(spark, x=[2])
        out = bind_rows(a=a, b=b, _id="src")
        pdf = out.collect()
        assert list(pdf["src"]) == ["a", "b"]

    def test_bind_rows_single_frame(self, spark):
        # reference resolves bare bind_rows(df) via pipda AST fallback;
        # here the single-frame form is the pipe spelling
        a = tibble(spark, x=[1, 2])
        assert col(a >> bind_rows(), "x") == [1, 2]

    def test_bind_cols_two_frames(self, spark):
        a = tibble(spark, x=[1, 2])
        b = tibble(spark, y=[3, 4])
        out = bind_cols(a, b)
        pdf = out.collect()
        assert list(pdf["x"]) == [1, 2] and list(pdf["y"]) == [3, 4]

    def test_bind_cols_duplicate_names(self, spark):
        a = tibble(spark, x=[1])
        b = tibble(spark, x=[2])
        out = bind_cols(a, b)
        assert len(out.columns) == 2  # second x renamed

    def test_bind_cols_with_dict(self, spark):
        a = tibble(spark, x=[1, 2])
        out = bind_cols(a, {"y": [3, 4]})
        pdf = out.collect()
        assert list(pdf["y"]) == [3, 4]


# -- rename (reference test_rename.py) --------------------------------------

class TestRename:
    def test_single_column(self, spark):
        df = tibble(spark, a=[1], b=[2])
        out = df >> rename(A=f.a)
        assert out.columns == ["A", "b"]

    def test_multiple_columns(self, spark):
        df = tibble(spark, a=[1], b=[2])
        out = df >> rename(A=f.a, B=f.b)
        assert out.columns == ["A", "B"]

    def test_no_change(self, spark):
        df = tibble(spark, a=[1])
        out = df >> rename()
        assert out.columns == ["a"]

    def test_rename_with_uppercase(self, spark):
        df = tibble(spark, a=[1], b=[2])
        out = df >> rename_with(str.upper)
        assert out.columns == ["A", "B"]

    def test_rename_with_specific_columns(self, spark):
        df = tibble(spark, a=[1], b=[2])
        out = df >> rename_with(str.upper, f.a)
        assert out.columns == ["A", "b"]

    def test_rename_with_prefix(self, spark):
        df = tibble(spark, a=[1], b=[2])
        out = df >> rename_with(lambda c: "pre_" + c)
        assert out.columns == ["pre_a", "pre_b"]


# -- lazy / collect surface (reference test_lazy.py; Spark is always lazy) --

class TestLazyCollect:
    def test_lazy_is_noop(self, spark):
        df = tibble(spark, x=[1, 2])
        out = df >> lazy_()
        assert isinstance(out, Tibble)

    def test_lazy_in_pipeline_with_filter(self, spark):
        df = tibble(spark, x=[1, 2, 3])
        out = df >> lazy_() >> filter_(f.x > 1)
        assert col(out, "x") == [2, 3]

    def test_collect_in_pipeline(self, spark):
        df = tibble(spark, x=[1, 2])
        pdf = df >> mutate(y=f.x + 1) >> collect_()
        assert list(pdf["y"]) == [2, 3]


# -- selection algebra corners (reference core/test_utils.py vars_select) ---

class TestSelectionAlgebra:
    COLS = ["a", "b", "c", "d"]

    def _sel(self, *args):
        return resolve_selection(list(args), self.COLS, {c: "bigint" for c in self.COLS})

    def test_select_by_string(self):
        assert self._sel("a", "c") == ["a", "c"]

    def test_select_by_reference(self):
        assert self._sel(f.a, f.c) == ["a", "c"]

    def test_select_missing_raises(self):
        with pytest.raises((KeyError, Exception)):
            self._sel("z")

    def test_select_none_skipped(self):
        assert self._sel(None, "b") == ["b"]

    def test_negation(self, spark):
        df = tibble(spark, a=[1], b=[2], c=[3])
        out = df >> select(~f.b)
        assert out.columns == ["a", "c"]
