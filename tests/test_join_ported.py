"""Ported from reference tests/dplyr/test_join.py — left-order
preservation, by= variants, suffixes, empty sides, nest_join default
naming. Order preservation is the load-bearing semantic here: joins
carry the left frame's hidden order column so collect() returns rows
in left first-seen order.
"""

from datar_polars_spark import (
    anti_join,
    f,
    full_join,
    inner_join,
    left_join,
    mutate,
    nest_join,
    right_join,
    semi_join,
    tibble,
)

from conftest import assert_iterable_equal


class TestLeftJoin:
    def test_left_join_matching_rows(self, spark):
        df1 = tibble(spark, a=[1, 2, 3], b=["x", "y", "z"])
        df2 = tibble(spark, a=[1, 2], c=[10, 20])
        out = left_join(df1, df2, by="a").collect()
        assert list(out.columns) == ["a", "b", "c"]
        assert out["a"].tolist() == [1, 2, 3]
        assert_iterable_equal(out["c"].tolist(), [10, 20, None])

    def test_left_join_preserves_left_order(self, spark):
        df1 = tibble(spark, a=[3, 1, 2], b=["c", "a", "b"])
        df2 = tibble(spark, a=[1, 2, 3], c=[10, 20, 30])
        out = left_join(df1, df2, by="a").collect()
        assert out["a"].tolist() == [3, 1, 2]


class TestInnerJoin:
    def test_inner_join_matching_only(self, spark):
        df1 = tibble(spark, a=[1, 2, 3], b=["x", "y", "z"])
        df2 = tibble(spark, a=[2, 3, 4], c=[20, 30, 40])
        out = inner_join(df1, df2, by="a").collect()
        assert out.shape == (2, 3)
        assert out["a"].tolist() == [2, 3]

    def test_inner_join_preserves_left_order(self, spark):
        df1 = tibble(spark, a=[3, 2, 1], b=["c", "b", "a"])
        df2 = tibble(spark, a=[1, 2, 3], c=[10, 20, 30])
        out = inner_join(df1, df2, by="a").collect()
        assert out["a"].tolist() == [3, 2, 1]


class TestFullJoin:
    def test_full_join_all_rows(self, spark):
        df1 = tibble(spark, a=[1, 2, 3], b=["x", "y", "z"])
        df2 = tibble(spark, a=[2, 3, 4], c=[20, 30, 40])
        out = full_join(df1, df2, by="a").collect()
        assert out.shape == (4, 3)
        assert sorted(out["a"].tolist()) == [1, 2, 3, 4]


class TestJoinBy:
    def test_join_by_string(self, spark):
        df1 = tibble(spark, key=[1, 2, 3], x=[10, 20, 30])
        df2 = tibble(spark, key=[1, 2], y=[100, 200])
        out = inner_join(df1, df2, by="key").collect()
        assert list(out.columns) == ["key", "x", "y"]
        assert out["key"].tolist() == [1, 2]

    def test_join_by_f_ref(self, spark):
        members = tibble(
            spark,
            name=["Mick", "John", "Paul"],
            band=["Stones", "Beatles", "Beatles"],
        )
        instruments = tibble(
            spark, name=["John", "Paul", "Keith"], plays=["guitar", "bass", "guitar"]
        )
        out = (members >> inner_join(instruments, by=f.name)).collect()
        assert out.shape == (2, 3)
        assert out["name"].tolist() == ["John", "Paul"]

    def test_join_by_none_common_cols(self, spark):
        df1 = tibble(spark, a=[1, 2, 3], b=[10, 20, 30], c=[4, 5, 6])
        df2 = tibble(spark, a=[1, 2], b=[10, 20], d=[100, 200])
        out = inner_join(df1, df2).collect()
        assert "c" in out.columns and "d" in out.columns


class TestSemiAnti:
    def test_semi_join_preserves_left_order(self, spark):
        df1 = tibble(spark, a=[3, 1, 2], b=["c", "a", "b"])
        df2 = tibble(spark, a=[1, 3], c=[10, 30])
        out = semi_join(df1, df2, by="a").collect()
        assert out["a"].tolist() == [3, 1]

    def test_anti_join_no_matches(self, spark):
        df1 = tibble(spark, a=[1, 2], b=["x", "y"])
        df2 = tibble(spark, a=[5, 6], c=[1, 2])
        out = anti_join(df1, df2, by="a").collect()
        assert out["a"].tolist() == [1, 2]

    def test_anti_join_all_matches(self, spark):
        df1 = tibble(spark, a=[1, 2], b=["x", "y"])
        df2 = tibble(spark, a=[1, 2], c=[1, 2])
        out = anti_join(df1, df2, by="a").collect()
        assert len(out) == 0


class TestJoinSuffix:
    def test_join_suffix_default(self, spark):
        df1 = tibble(spark, a=[1, 2], x=[10, 20])
        df2 = tibble(spark, a=[1, 2], x=[100, 200])
        out = inner_join(df1, df2, by="a").collect()
        assert sorted(out["a"].tolist()) == [1, 2]
        assert any(c.startswith("x") and c != "x" for c in out.columns) or "x" in out.columns

    def test_join_custom_suffix(self, spark):
        df1 = tibble(spark, a=[1, 2], x=[10, 20])
        df2 = tibble(spark, a=[1, 2], x=[100, 200])
        out = inner_join(df1, df2, by="a", suffix=("_left", "_right")).collect()
        assert "x_left" in out.columns and "x_right" in out.columns
        assert out.shape == (2, 3)


class TestJoinEdgeCases:
    def test_join_empty_left(self, spark):
        df1 = tibble(spark, a=[1], b=[1]) >> mutate()
        df1 = df1.__class__(df1.df.filter("a < 0"), groups=df1.group_vars, levels=df1.levels)
        df2 = tibble(spark, a=[1, 2], c=[10, 20])
        out = left_join(df1, df2, by="a").collect()
        assert out.shape == (0, 3)

    def test_join_empty_right(self, spark):
        df1 = tibble(spark, a=[1, 2], b=[10, 20])
        df2 = tibble(spark, a=[1], c=[10])
        df2 = df2.__class__(df2.df.filter("a < 0"), groups=df2.group_vars, levels=df2.levels)
        out = left_join(df1, df2, by="a").collect()
        assert out.shape == (2, 3)
        assert out["a"].tolist() == [1, 2]
        assert_iterable_equal(out["c"].tolist(), [None, None])

    def test_right_join(self, spark):
        df1 = tibble(spark, a=[1, 2, 3], b=["x", "y", "z"])
        df2 = tibble(spark, a=[2, 3, 4], c=[20, 30, 40])
        out = right_join(df1, df2, by="a").collect()
        assert out.shape == (3, 3)
        assert out["a"].tolist() == [2, 3, 4]


class TestNestJoin:
    def test_nest_join_default_name_and_shapes(self, spark):
        members = tibble(
            spark,
            name=["Mick", "John", "Paul"],
            band=["Stones", "Beatles", "Beatles"],
        )
        instruments = tibble(
            spark, name=["John", "Paul", "Keith"], plays=["guitar", "bass", "guitar"]
        )
        out = (members >> nest_join(instruments)).collect()
        assert list(out.columns) == ["name", "band", "_y_joined"]
        assert out["name"].tolist() == ["Mick", "John", "Paul"]
        sizes = [0 if v is None else len(v) for v in out["_y_joined"]]
        assert sizes == [0, 1, 1]
