"""across / pick / if_any / if_all / context functions — ported from
the reference's tests/dplyr/test_across.py and test_context.py.
Also exercises the f[f.a:f.b] inclusive range selection idiom.
"""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    f,
    tibble,
    mutate,
    transmute,
    summarise,
    group_by,
    filter_,
    select,
    arrange,
    pick,
)
from datar_polars_spark.functions import (
    across,
    if_any,
    if_all,
    c_across,
    sum_,
    mean,
    n,
    n_distinct,
    consecutive_id,
    cur_group_id,
)

from conftest import assert_iterable_equal


# -- across (reference test_across.py:31-127) -------------------------------


class TestAcross:
    def test_across_single_function(self, spark):
        td = tibble(spark, a=[1, 2, 3], b=[4, 5, 6])
        out = (td >> summarise(across(f[f.a : f.b], sum_))).collect()
        assert out["a"].tolist() == [6]
        assert out["b"].tolist() == [15]

    def test_across_named_functions(self, spark):
        td = tibble(spark, a=[1, 2, 3], b=[4, 5, 6])
        out = (td >> summarise(across(f[f.a : f.b], {"sum": sum_, "mean": mean}))).collect()
        assert "a_sum" in out.columns
        assert "b_mean" in out.columns
        assert out["a_sum"].tolist() == [6]
        assert out["b_mean"].tolist() == [5.0]

    def test_across_list_functions(self, spark):
        td = tibble(spark, a=[1, 2, 3])
        out = (td >> summarise(across(f.a, [sum_, mean]))).collect()
        assert out.shape[1] >= 2

    def test_across_single_col_single_fn(self, spark):
        td = tibble(spark, a=[1, 2, 3])
        out = (td >> mutate(across(f.a, lambda x: x * 2))).collect()
        assert out["a"].tolist() == [2, 4, 6]

    def test_across_grouped(self, spark):
        td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3])
        out = (
            td >> group_by(f.g) >> summarise(across(f.x, sum_)) >> arrange(f.g)
        ).collect()
        assert out["x"].tolist() == [3, 3]

    def test_across_select_specific_columns(self, spark):
        td = tibble(spark, a=[1, 2], b=[3, 4], c=[5, 6])
        out = (td >> mutate(across(f[f.a : f.b], lambda x: x * 10))).collect()
        assert out["a"].tolist() == [10, 20]
        assert out["b"].tolist() == [30, 40]
        assert out["c"].tolist() == [5, 6]

    def test_across_excludes_group_cols(self, spark):
        td = tibble(spark, g=["a", "b"], x=[1, 2])
        out = (td >> group_by(f.g) >> mutate(across(None, lambda x: x + 1))).collect()
        assert sorted(out["g"].tolist()) == ["a", "b"]  # untouched
        assert sorted(out["x"].tolist()) == [2, 3]


# -- range selection --------------------------------------------------------


class TestRangeSelection:
    def test_select_range(self, spark):
        td = tibble(spark, a=[1], b=[2], c=[3], d=[4])
        out = td >> select(f[f.b : f.d])
        assert out.columns == ["b", "c", "d"]

    def test_select_range_unknown_endpoint(self, spark):
        td = tibble(spark, a=[1], b=[2])
        with pytest.raises(KeyError):
            td >> select(f[f.a : f.zz])


# -- pick (reference test_across.py:131-142) --------------------------------


class TestPick:
    def test_pick_selects_columns(self, spark):
        td = tibble(spark, x=[1, 2], y=[3, 4])
        out = td >> pick(f.x)
        assert out.columns == ["x"]

    def test_pick_retains_group_vars(self, spark):
        td = tibble(spark, g=["a", "b"], x=[1, 2], y=[3, 4])
        out = td >> group_by(f.g) >> pick(f.x)
        assert out.columns == ["g", "x"]


# -- if_any / if_all (reference test_across.py:148-198) ---------------------


class TestIfAnyAll:
    def test_if_any_true_for_any_match(self, spark):
        td = tibble(spark, a=[1, 10, 0], b=[0, 0, 0])
        out = (td >> filter_(if_any(f[f.a : f.b], lambda x: x > 5))).collect()
        assert out.shape[0] == 1
        assert out["a"].tolist() == [10]

    def test_if_all_true_when_all_match(self, spark):
        td = tibble(spark, a=[3, 10, 6], b=[4, 20, 5])
        out = (td >> filter_(if_all(f[f.a : f.b], lambda x: x > 5))).collect()
        assert out.shape[0] == 1
        assert out["a"].tolist() == [10]

    def test_if_any_no_predicate_uses_col_as_bool(self, spark):
        td = tibble(spark, a=[0, 1, 0], b=[0, 0, 1])
        out = (td >> filter_(if_any(f[f.a : f.b]))).collect()
        assert out.shape[0] == 2

    def test_if_all_no_predicate_uses_col_as_bool(self, spark):
        td = tibble(spark, a=[1, 1, 0], b=[1, 0, 0])
        out = (td >> filter_(if_all(f[f.a : f.b]))).collect()
        assert out.shape[0] == 1


# -- c_across (reference test_across.py:203-213) ----------------------------


class TestCAcross:
    def test_c_across_rowwise_sum(self, spark):
        from datar_polars_spark import rowwise
        from datar_polars_spark.functions import sum_ as s

        td = tibble(spark, a=[1.0, 2.0], b=[3.0, 4.0])
        out = (td >> rowwise() >> mutate(t=s(c_across(f[f.a : f.b])))).collect()
        assert out["t"].tolist() == [4.0, 6.0]


# -- context fns (reference test_context.py:35-53,112-133,200-212) ----------


class TestContext:
    def test_n_ungrouped(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = (td >> summarise(count=n())).collect()
        assert out["count"].tolist() == [3]

    def test_n_grouped(self, spark):
        td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3])
        out = (td >> group_by(f.g) >> summarise(count=n())).collect()
        assert sorted(out["count"].tolist()) == [1, 2]

    def test_cur_group_id_grouped_mutate(self, spark):
        td = tibble(spark, g=["b", "a", "b"])
        out = (td >> group_by(f.g) >> mutate(gid=cur_group_id())).collect()
        gids = out["gid"].tolist()
        # same group -> same id, two distinct ids
        assert gids[0] == gids[2]
        assert len(set(gids)) == 2

    def test_consecutive_id_simple(self, spark):
        td = tibble(spark, x=[1, 1, 2, 1, 2])
        out = (td >> mutate(cid=consecutive_id(f.x))).collect()
        ids = out["cid"].tolist()
        # normalize to first-seen order starting at first value
        base = ids[0]
        assert [i - base for i in ids] == [0, 0, 1, 2, 3]

    def test_consecutive_id_multi(self, spark):
        td = tibble(spark, x=[1, 1, 2], y=[10, 10, 20])
        out = (td >> mutate(cid=consecutive_id(f.x, f.y))).collect()
        ids = out["cid"].tolist()
        base = ids[0]
        assert [i - base for i in ids] == [0, 0, 1]

    def test_n_distinct_in_summarise(self, spark):
        td = tibble(spark, g=["a", "a", "b"], x=[1, 1, 3])
        out = (td >> group_by(f.g) >> summarise(nd=n_distinct(f.x)) >> arrange(f.g)).collect()
        assert out["nd"].tolist() == [1, 1]


class TestAcrossExtraArgs:
    """Reference across(.cols, .fns, *args, **kwargs) forwards the
    function's own arguments (tests/dplyr/test_across.py)."""

    def test_positional_args_forwarded(self, spark):
        from datar_polars_spark import f, mutate, tibble
        from datar_polars_spark.functions import across, round_

        out = (
            tibble(spark, a=[1.234]) >> mutate(across(f[f.a:], round_, 1))
        ).collect()
        assert out["a"].tolist() == [1.2]

    def test_kwargs_forwarded(self, spark):
        from datar_polars_spark import f, mutate, tibble
        from datar_polars_spark.functions import across, round_

        out = (
            tibble(spark, a=[1.234]) >> mutate(across(f[f.a:], round_, digits=2))
        ).collect()
        assert out["a"].tolist() == [1.23]


class TestFctReorderConventions:
    def test_fun_spelling_and_callable(self, spark):
        from datar_polars_spark import f, tibble
        from datar_polars_spark.functions import max_
        from datar_polars_spark.operators.factor import factor_, fct_reorder

        ft = tibble(spark, x=["lo", "hi", "mid"], v=[1.0, 3.0, 2.0]) >> factor_(f.x)
        assert (ft >> fct_reorder(f.x, f.v, _fun="max")).levels["x"] == [
            "lo", "mid", "hi",
        ]
        assert (ft >> fct_reorder(f.x, f.v, fn=max_, _desc=True)).levels["x"] == [
            "hi", "mid", "lo",
        ]
