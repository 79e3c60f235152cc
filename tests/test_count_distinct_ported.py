"""Ported from reference tests/dplyr/test_count.py and
test_distinct.py — the cases not already in test_core_verbs /
test_reference_parity.
"""

from datar_polars_spark import (
    add_count,
    count,
    distinct,
    f,
    group_by,
    tibble,
)
from datar_polars_spark.operators.core import tally
from datar_polars_spark.functions import round_


class TestCount:
    def test_count_ungrouped(self, spark):
        td = tibble(spark, x=[1, 2, 2, 3])
        out = (td >> count()).collect()
        assert out.shape == (1, 1)
        assert out["n"].tolist() == [4]

    def test_count_with_ref_kwarg_names_count_column(self, spark):
        # reference count.py: count(count=f.x) groups by x, counts in "count"
        td = tibble(spark, x=[1, 2, 2, 3])
        out = (td >> count(count=f.x)).collect().sort_values("x")
        assert out["x"].tolist() == [1, 2, 3]
        assert out["count"].tolist() == [1, 2, 1]

    def test_count_with_derived_kwarg(self, spark):
        td = tibble(spark, birth_year=[22.0, 24.0, 111.0, 33.0])
        out = (td >> count(birth_decade=round_(f.birth_year, -1))).collect()
        got = dict(zip(out["birth_decade"], out["n"]))
        assert got == {20.0: 2, 110.0: 1, 30.0: 1}

    def test_count_sorted(self, spark):
        td = tibble(spark, x=[2, 2, 1, 3, 1])
        out = (td >> count(f.x, sort=True)).collect()
        vals = out["n"].tolist()
        assert vals == sorted(vals, reverse=True)

    def test_count_with_weight(self, spark):
        td = tibble(spark, x=[1, 2, 2], w=[0.5, 1.0, 2.0])
        out = (td >> count(f.x, wt=f.w)).collect().sort_values("x")
        assert out["n"].tolist() == [0.5, 3.0]


class TestTally:
    def test_tally_ungrouped(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = (td >> tally()).collect()
        assert out.shape == (1, 1)
        assert out["n"].tolist() == [3]

    def test_tally_grouped(self, spark):
        td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3])
        out = (td >> group_by(f.g) >> tally()).collect().sort_values("g")
        assert out["n"].tolist() == [2, 1]

    def test_tally_weighted(self, spark):
        td = tibble(spark, x=[1, 2, 3], w=[0.5, 1.0, 1.5])
        out = (td >> tally(wt=f.w)).collect()
        assert out["n"].tolist() == [3.0]


class TestAddCount:
    def test_add_count_ungrouped(self, spark):
        td = tibble(spark, x=[1, 2, 2])
        out = (td >> add_count()).collect()
        assert out["n"].tolist() == [3, 3, 3]

    def test_add_count_by_column(self, spark):
        td = tibble(spark, x=[1, 2, 2, 3])
        out = (td >> add_count(f.x)).collect().sort_values("x")
        assert out["n"].tolist() == [1, 2, 2, 1]


class TestDistinct:
    def test_distinct_no_args_preserves_order(self, spark):
        td = tibble(spark, x=[2, 1, 3, 1], y=[4, 5, 6, 5])
        out = (td >> distinct()).collect()
        assert out["x"].tolist() == [2, 1, 3]

    def test_distinct_by_single_col_keeps_only_it(self, spark):
        td = tibble(spark, x=[1, 1, 2], y=[3, 4, 5])
        out = td >> distinct(f.x)
        assert out.columns == ["x"]
        assert sorted(out.collect()["x"].tolist()) == [1, 2]

    def test_distinct_doesnt_duplicate_cols(self, spark):
        td = tibble(spark, a=[1, 2, 3], b=[4, 5, 6])
        out = td >> distinct(f.a, f.a)
        assert out.columns == ["a"]

    def test_distinct_by_expr_kwarg(self, spark):
        td = tibble(spark, x=[1, 1, 2, 2], y=[1, 2, 3, 4])
        out = td >> distinct(diff=f.x - f.y)
        assert out.columns == ["diff"]
        assert out.collect()["diff"].tolist() == [0, -1, -2]

    def test_distinct_keep_all_true(self, spark):
        td = tibble(spark, x=[1, 1, 1], y=[3, 2, 1])
        out = td >> distinct(f.x, _keep_all=True)
        assert out.columns == ["x", "y"]
        got = out.collect()
        assert got["x"].tolist() == [1] and len(got) == 1

    def test_distinct_grouping_cols_always_included(self, spark):
        td = tibble(spark, g=[1, 2, 2], x=[1, 2, 3]) >> group_by(f.g)
        out = td >> distinct(f.x)
        assert set(out.columns) == {"g", "x"}
