"""Ported reference cases: tests/dplyr/test_mutate.py (list-value
recycling/positional assignment, across + c[] / where() selections,
None handling, _keep corners, transmute guards) and the empty-frame
tibble constructor (tests/tibble/test_tibble.py empty cases).

List values take the reference's positional semantics: length 1
recycles, length == nrow (or == every group's size when grouped)
assigns by row position, anything else raises — implemented as a
broadcast positional join, not a collect."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    arrange,
    f,
    group_by,
    mutate,
    tibble,
    transmute,
)
from datar_polars_spark.functions import if_else, is_double, round_
from datar_polars_spark.functions import across
from datar_polars_spark.plans.selection import where


class TestListValues:
    def test_full_length_assigns_positionally(self, spark):
        out = (tibble(spark, x=[1, 2, 3]) >> mutate(y=[10, 20, 30])).collect()
        assert out["y"].tolist() == [10, 20, 30]

    def test_position_follows_frame_order(self, spark):
        out = (
            tibble(spark, x=[5, 1, 3])
            >> mutate(y=["a", "b", "c"])
            >> arrange(f.x)
        ).collect()
        assert out["x"].tolist() == [1, 3, 5]
        assert out["y"].tolist() == ["b", "c", "a"]

    def test_length_one_recycles(self, spark):
        out = (tibble(spark, x=[1, 2, 3]) >> mutate(y=[7])).collect()
        assert out["y"].tolist() == [7, 7, 7]

    def test_wrong_size_raises(self, spark):
        with pytest.raises(ValueError, match="incompatible"):
            tibble(spark, x=[1, 2, 3]) >> mutate(y=[1, 2])

    def test_grouped_assigns_per_group(self, spark):
        out = (
            tibble(spark, x=[1, 2, 3, 4], g=[1, 1, 2, 2])
            >> group_by(f.g)
            >> mutate(y=[10, 20])
        ).collect()
        assert out["y"].tolist() == [10, 20, 10, 20]

    def test_grouped_wrong_size_raises(self, spark):
        gf = tibble(spark, x=[1, 2, 3, 4], g=[1, 1, 2, 2]) >> group_by(f.g)
        with pytest.raises(ValueError, match="group size"):
            gf >> mutate(y=[1, 2, 3])

    def test_list_column_referencable_downstream(self, spark):
        out = (
            tibble(spark, x=[1, 2, 3])
            >> mutate(y=[10, 20, 30], z=f.y + f.x)
        ).collect()
        assert out["z"].tolist() == [11, 22, 33]


class TestAcrossSelections:
    def test_across_ref_slice(self, spark):
        out = (
            tibble(spark, a=[1, 2], b=[3, 4])
            >> mutate(across(f[f.a:], lambda x: x + 1))
        ).collect()
        assert out["a"].tolist() == [2, 3]
        assert out["b"].tolist() == [4, 5]

    def test_across_where_is_double(self, spark):
        # non-round inputs prove the selection actually matched
        out = (
            tibble(spark, a=[1.4, 2.6], b=[3.5, 4.4], s=["x", "y"])
            >> mutate(across(where(is_double), round_))
        ).collect()
        assert out["a"].tolist() == [1.0, 3.0]
        assert out["b"].tolist() == [4.0, 4.0]
        assert out["s"].tolist() == ["x", "y"]


class TestNoneAndKeep:
    def test_none_positional_noop(self, spark):
        out = tibble(spark, x=[1], y=[2]) >> mutate(None)
        assert out.collect().shape == (1, 2)

    def test_keep_unused(self, spark):
        out = tibble(spark, x=[1], y=[2]) >> mutate(x1=f.x + 1, _keep="unused")
        assert list(out.columns) == ["y", "x1"]

    def test_overwriting_group_col_keeps_grouping(self, spark):
        out = (
            tibble(spark, x=[1, 2], y=[2, 3]) >> group_by(f.x) >> mutate(x=1)
        )
        assert tuple(out.group_vars) == ("x",)

    def test_dup_underscore_names(self, spark):
        out = (tibble(spark, a=[1]) >> mutate(_b=f.a + 1, b=f._b * 2)).collect()
        assert out["b"].tolist() == [4]

    def test_mutate_with_if_else(self, spark):
        out = (
            tibble(spark, x=[1, 2, 3])
            >> mutate(y=if_else(f.x > 2, "big", "small"))
        ).collect()
        assert out["y"].tolist() == ["small", "small", "big"]


class TestTransmuteGuards:
    def test_bare_transmute_drops_all(self, spark):
        out = (tibble(spark, x=[1, 2], y=[3, 4]) >> transmute()).collect()
        assert out.shape == (2, 0)

    def test_bare_transmute_grouped_keeps_keys(self, spark):
        out = tibble(spark, x=[1], y=[2]) >> group_by(f.x) >> transmute()
        assert list(out.columns) == ["x"]

    def test_transmute_rejects_keep(self, spark):
        with pytest.raises(TypeError):
            tibble(spark, x=[1]) >> transmute(z=f.x, _keep="all")


class TestEmptyTibble:
    def test_empty_list_builds_zero_rows(self, spark):
        td = tibble(spark, x=[])
        assert td.collect().shape == (0, 1)
        assert td.dtypes == [("x", "double")]

    def test_scalar_recycles_to_zero(self, spark):
        assert tibble(spark, x=[], y=1).collect().shape == (0, 2)

    def test_mutate_on_empty(self, spark):
        out = tibble(spark, x=[]) >> mutate(y=f.x + 1)
        assert out.collect().shape == (0, 2)

    def test_empty_list_value_on_empty_frame(self, spark):
        out = tibble(spark, x=[]) >> mutate(y=[])
        assert out.collect().shape == (0, 2)

    def test_incompatible_lengths_raise(self, spark):
        with pytest.raises(ValueError, match="incompatible"):
            tibble(spark, x=[], y=[1, 2])


class TestVerbConventionSweep:
    """dplyr conventions: arrange(across()), count/group_by on computed
    expressions, where() with the datar type-predicate builders."""

    def test_arrange_across(self, spark):
        from datar_polars_spark.functions import across

        td = tibble(spark, g=["a", "a", "b"], x=[3, 1, 2])
        out = (td >> arrange(across(f[f.x:]))).collect()
        assert out["x"].tolist() == [1, 2, 3]

    def test_count_expression(self, spark):
        from datar_polars_spark import count

        td = tibble(spark, x=[3, 1, 2])
        out = (td >> count(f.x > 1)).collect()
        assert dict(zip(out["(x > 1)"], out["n"])) == {True: 2, False: 1}

    def test_group_by_expression_positional(self, spark):
        from datar_polars_spark import summarise
        from datar_polars_spark.functions import n

        td = tibble(spark, x=[3, 1, 2])
        out = (td >> group_by(f.x % 2) >> summarise(n=n())).collect()
        assert dict(zip(out["(x % 2)"], out["n"])) == {1: 2, 0: 1}

    def test_where_with_builder_predicates(self, spark):
        from datar_polars_spark import summarise
        from datar_polars_spark.functions import across, is_character, is_numeric
        from datar_polars_spark.plans.selection import where

        td = tibble(spark, g=["a", "a", "b"], x=[3.0, 1.0, 2.0])
        out = (td >> summarise(across(where(is_numeric), "mean"))).collect()
        assert out["x"].tolist() == [2.0]
        out2 = (td >> summarise(across(where(is_character), "n_distinct"))).collect()
        assert out2["g"].tolist() == [2]


class TestSliceExpressions:
    """Reference slice_(n()-1) (0-based) -> our 1-based fork: slice_(n())
    keeps each group's last row; expressions evaluate per group."""

    def test_slice_n_last_row(self, spark):
        from datar_polars_spark.functions import n
        from datar_polars_spark.operators.core import slice_

        td = tibble(spark, x=[3, 1, 2])
        assert (td >> slice_(n())).collect()["x"].tolist() == [2]

    def test_grouped_slice_n(self, spark):
        from datar_polars_spark.functions import n
        from datar_polars_spark.operators.core import slice_

        td = tibble(spark, g=["a", "a", "b"], x=[3, 1, 2])
        got = (td >> group_by(f.g) >> slice_(n())).collect()["x"].tolist()
        assert sorted(got) == [1, 2]

    def test_mixed_int_and_expr(self, spark):
        from datar_polars_spark.functions import n
        from datar_polars_spark.operators.core import slice_

        td = tibble(spark, x=[3, 1, 2])
        assert (td >> slice_(1, n())).collect()["x"].tolist() == [3, 2]
