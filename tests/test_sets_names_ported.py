"""Residual exact-name ports from reference tests/base/test_sets.py
(round 3, VERDICT item 3): intersect/union/setdiff/setequal in their
scalar-list, series (plain vector here) and in-mutate array forms."""

from __future__ import annotations

from datar_polars_spark import f, mutate, tibble
from datar_polars_spark.functions.rbase import intersect, setdiff, setequal, union


def _arr_df(spark):
    return tibble(
        spark, a=[[1, 2, 3], [4, 5, 6]], b=[[3, 4, 5], [4, 6, 7]]
    )


class TestIntersect:
    def test_intersect_scalar_lists(self):
        assert intersect([1, 2, 3], [3, 4]) == [3]

    def test_intersect_scalar_no_overlap(self):
        assert intersect([1, 2, 3], [4, 5]) == []

    def test_intersect_series(self):
        assert intersect([1, 2, 3, 2], [3, 4, 5]) == [3]

    def test_intersect_mutate(self, spark):
        out = (_arr_df(spark) >> mutate(c=intersect(f.a, f.b))).collect()
        assert [list(v) for v in out["c"]] == [[3], [4, 6]]


class TestUnion:
    def test_union_scalar_lists(self):
        assert union([1, 2, 3], [3, 4]) == [1, 2, 3, 4]

    def test_union_scalar_duplicates(self):
        assert union([1, 1, 2], [2, 3]) == [1, 2, 3]

    def test_union_series(self):
        assert union([1, 2, 3], [3, 4, 5]) == [1, 2, 3, 4, 5]

    def test_union_mutate(self, spark):
        out = (_arr_df(spark) >> mutate(c=union(f.a, f.b))).collect()
        assert [list(v) for v in out["c"]] == [[1, 2, 3, 4, 5], [4, 5, 6, 7]]


class TestSetdiff:
    def test_setdiff_scalar_lists(self):
        assert setdiff([1, 2, 3], [3, 4]) == [1, 2]

    def test_setdiff_scalar_no_overlap(self):
        assert setdiff([1, 2], [3, 4]) == [1, 2]

    def test_setdiff_series(self):
        assert setdiff([1, 2, 3], [3, 4]) == [1, 2]

    def test_setdiff_mutate(self, spark):
        out = (_arr_df(spark) >> mutate(c=setdiff(f.a, f.b))).collect()
        assert [list(v) for v in out["c"]] == [[1, 2], [5]]


class TestSetequal:
    def test_setequal_scalar_true(self):
        assert setequal([1, 2, 3], [3, 2, 1]) is True

    def test_setequal_scalar_false(self):
        assert setequal([1, 2], [1, 2, 3]) is False

    def test_setequal_series_true(self):
        assert setequal([1, 2, 3], [3, 1, 2]) is True

    def test_setequal_series_false(self):
        assert setequal([1, 2, 3], [3, 4, 5]) is False

    def test_setequal_mutate(self, spark):
        td = tibble(spark, a=[[1, 2, 3], [4, 5, 6]], b=[[3, 2, 1], [6, 4, 5]])
        out = (td >> mutate(c=setequal(f.a, f.b))).collect()
        assert out["c"].tolist() == [True, True]
