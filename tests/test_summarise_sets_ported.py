"""Ported reference cases: tests/dplyr/test_summarise.py (temp-var
kwargs, reused column names, empty frames, bare summarise, reframe with
vector set ops) — plus the dual-mode vector set ops: a scalar-element
column is "the vector" (collected sorted-distinct value set, exploded
by summarise/reframe), while array columns keep element-wise semantics.
"""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    f,
    group_by,
    mutate,
    reframe,
    summarise,
    tibble,
)
from datar_polars_spark.functions import intersect, mean, sd, setdiff, union


class TestSummariseCorners:
    def test_temp_underscore_vars_hidden(self, spark):
        out = (
            tibble(spark, g=[1, 1, 2], x=[1.0, 2.0, 3.0])
            >> group_by(f.g)
            >> summarise(_m=mean(f.x), m2=f._m * 2)
        )
        assert list(out.columns) == ["g", "m2"]
        got = out.collect().sort_values("g")
        assert got["m2"].tolist() == [3.0, 6.0]

    def test_reuse_original_column_name(self, spark):
        out = (
            tibble(spark, g=[1, 1, 2], x=[1.0, 2.0, 3.0])
            >> group_by(f.g)
            >> summarise(x=mean(f.x), s=sd(f.x))
        )
        assert list(out.columns) == ["g", "x", "s"]
        assert out.collect().shape == (2, 3)

    def test_bare_summarise_one_row_no_cols(self, spark):
        out = (tibble(spark, x=[1, 2]) >> summarise()).collect()
        assert out.shape == (1, 0)

    def test_bare_summarise_grouped_keys_only(self, spark):
        out = (
            tibble(spark, g=[1, 1, 2], x=[1, 2, 3]) >> group_by(f.g) >> summarise()
        ).collect()
        assert out.shape == (2, 1)
        assert sorted(out["g"]) == [1, 2]

    def test_summarise_empty_frame_literal(self, spark):
        out = (tibble(spark, x=[]) >> summarise(y=1)).collect()
        assert out.shape == (1, 1)
        assert out["y"].tolist() == [1]

    def test_summarise_empty_grouped(self, spark):
        out = (
            tibble(spark, g=[], x=[]) >> group_by(f.g) >> summarise(y=1)
        ).collect()
        assert out.shape == (0, 2)


class TestVectorSetOps:
    def test_reframe_intersect_ungrouped(self, spark):
        td = tibble(spark, g=[1, 1, 1, 2, 2, 2, 2], x=list("eabcfda"))
        out = (td >> reframe(x=intersect(f.x, ["a", "b", "d", "f"]))).collect()
        assert out["x"].tolist() == ["a", "b", "d", "f"]

    def test_reframe_intersect_grouped(self, spark):
        td = tibble(spark, g=[1, 1, 1, 2, 2, 2, 2], x=list("eabcfda"))
        out = (
            td
            >> group_by(f.g)
            >> reframe(x=intersect(f.x, ["a", "b", "d", "f"]))
        ).collect()
        got = sorted(zip(out["g"], out["x"]))
        assert got == [(1, "a"), (1, "b"), (2, "a"), (2, "d"), (2, "f")]

    def test_reframe_setdiff_column(self, spark):
        td = tibble(spark, x=[1, 2, 2, 3, 4])
        out = (td >> reframe(x=setdiff(f.x, [2, 4]))).collect()
        assert out["x"].tolist() == [1, 3]

    def test_reframe_union_column(self, spark):
        td = tibble(spark, x=[3, 1, 2, 1])
        out = (td >> reframe(x=union(f.x, [5]))).collect()
        assert out["x"].tolist() == [1, 2, 3, 5]

    def test_array_columns_stay_elementwise(self, spark):
        td = tibble(spark, a=[[1, 2], [3, 4]])
        out = (td >> mutate(i=intersect(f.a, [2, 3]))).collect()
        assert out["i"].tolist() == [[2], [3]]

    def test_eager_lists_unchanged(self):
        assert setdiff([1, 2, 2, 3], [2]) == [1, 3]
        assert union([3, 1], [1, 5]) == [3, 1, 5]
        assert intersect([3, 1, 2], [1, 2]) == [1, 2]
