"""dplyr verb semantics corners — ported from the reference's
tests/dplyr suites (test_mutate.py, test_filter.py, test_summarise.py,
test_slice.py, test_arrange.py, test_distinct.py, test_lead_lag.py,
test_if_else.py, test_recode.py, test_count.py), themselves ports of
tidyverse testthat files.
"""

from __future__ import annotations

import pytest

from conftest import assert_iterable_equal

from datar_polars_spark import (
    f,
    tibble,
    mutate,
    transmute,
    filter_,
    select,
    group_by,
    ungroup,
    summarise,
    arrange,
    distinct,
    count,
    add_count,
    slice_,
    slice_head,
    slice_tail,
    slice_min,
    slice_max,
    pull,
    desc,
    group_vars,
)
from datar_polars_spark.functions import (
    across,
    mean,
    sum_,
    n,
    min_,
    max_,
    lead,
    lag,
    row_number,
    min_rank,
    dense_rank,
    if_else,
    case_when,
    recode,
    coalesce,
    na_if,
    cumsum,
    first,
    last,
    is_na,
    round_,
    as_double,
)


def _col(td, name):
    return td.collect()[name].tolist()


# ---------------------------------------------------------------------------
# mutate (reference tests/dplyr/test_mutate.py)
# ---------------------------------------------------------------------------

class TestMutate:
    def test_empty_mutate_ungrouped(self, spark):
        td = tibble(spark, x=[1])
        out = td >> mutate()
        assert out.columns == ["x"]
        assert out.nrow() == 1

    def test_empty_mutate_grouped(self, spark):
        td = tibble(spark, x=[1, 2], g=[1, 1]) >> group_by(f.g)
        out = td >> mutate()
        assert out.nrow() == 2
        assert group_vars(out) == ["g"]

    def test_mutate_with_across(self, spark):
        td = tibble(spark, a=[1, 2], b=[3, 4])
        out = td >> mutate(across([f.a, f.b], lambda x: x + 1))
        assert _col(out, "a") == [2, 3]
        assert _col(out, "b") == [4, 5]

    def test_chained_references(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = td >> mutate(y=f.x + 1, z=f.y + 1)
        assert _col(out, "y") == [2, 3, 4]
        assert _col(out, "z") == [3, 4, 5]

    def test_overwrite_column_uses_new_value(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = td >> mutate(x=2, y=f.x)
        assert _col(out, "x") == [2, 2, 2]
        assert _col(out, "y") == [2, 2, 2]

    def test_overwrite_then_reference(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = td >> mutate(y=f.x + 1, x=f.y + 1)
        assert _col(out, "y") == [2, 3, 4]
        assert _col(out, "x") == [3, 4, 5]

    def test_scalar_broadcast(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4])
        out = td >> mutate(y=1)
        assert _col(out, "y") == [1, 1, 1, 1]

    def test_none_removes_existing_column(self, spark):
        td = tibble(spark, x=[1, 2, 3], y=[4, 5, 6])
        out = td >> mutate(y=None)
        assert out.columns == ["x"]

    def test_none_for_nonexistent_column_noop(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = td >> mutate(z=None)
        assert out.columns == ["x"]

    def test_column_names_order_preserved(self, spark):
        td = tibble(spark, a=[1, 2, 3])
        out = td >> mutate(b=f.a * 2)
        assert out.columns == ["a", "b"]

    def test_keep_used(self, spark):
        td = tibble(spark, a=[1], b=[2], c=[3], x=[1], y=[2])
        out = td >> mutate(xy=f.x + f.y, _keep="used")
        assert set(out.columns) == {"x", "y", "xy"}

    def test_keep_none_ungrouped(self, spark):
        td = tibble(spark, x=[1], y=[2])
        out = td >> mutate(z=1, _keep="none")
        assert set(out.columns) == {"z"}

    def test_keep_none_retains_group_vars(self, spark):
        td = tibble(spark, x=[1], y=[2], z=[3]) >> group_by(f.z)
        out = td >> mutate(a=f.x + 1, _keep="none")
        assert set(out.columns) == {"z", "a"}
        assert group_vars(out) == ["z"]

    def test_before_after(self, spark):
        td = tibble(spark, x=[1], y=[2])
        out = td >> mutate(z=1, _before=f.x)
        assert out.columns == ["z", "x", "y"]
        out2 = td >> mutate(z=1, _after=f.x)
        assert out2.columns == ["x", "z", "y"]

    def test_grouped_mutate_aggregate_broadcast(self, spark):
        td = tibble(spark, g=["a", "a", "b"], x=[1.0, 3.0, 10.0]) >> group_by(f.g)
        out = (td >> mutate(m=mean(f.x, na_rm=True)) >> arrange(f.x))
        assert _col(out, "m") == [2.0, 2.0, 10.0]

    def test_transmute_keeps_only_named(self, spark):
        td = tibble(spark, x=[1, 2], y=[3, 4])
        out = td >> transmute(z=f.x + f.y)
        assert out.columns == ["z"]
        assert _col(out, "z") == [4, 6]

    def test_transmute_grouped_keeps_groups(self, spark):
        td = tibble(spark, g=[1, 1], x=[1, 2]) >> group_by(f.g)
        out = td >> transmute(z=f.x * 2)
        assert set(out.columns) == {"g", "z"}


# ---------------------------------------------------------------------------
# filter (reference tests/dplyr/test_filter.py)
# ---------------------------------------------------------------------------

class TestFilter:
    def test_handles_passing_args(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4])
        out = td >> filter_(f.x > 2)
        assert _col(out, "x") == [3, 4]

    def test_multiple_conditions_anded(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4], y=[4, 3, 2, 1])
        out = td >> filter_(f.x > 1, f.y > 1)
        assert _col(out, "x") == [2, 3]

    def test_na_dropped(self, spark):
        td = tibble(spark, x=[1.0, None, 3.0])
        out = td >> filter_(f.x > 0)
        assert _col(out, "x") == [1.0, 3.0]

    def test_negated_na_still_dropped(self, spark):
        td = tibble(spark, x=[1.0, None, 3.0])
        out = td >> filter_(~(f.x > 2))
        assert _col(out, "x") == [1.0]

    def test_grouped_filter_window(self, spark):
        td = tibble(spark, g=["a", "a", "b", "b"], x=[1.0, 5.0, 2.0, 10.0])
        out = (
            td
            >> group_by(f.g)
            >> filter_(f.x > mean(f.x, na_rm=True))
            >> arrange(f.x)
        )
        assert _col(out, "x") == [5.0, 10.0]

    def test_filter_false_empties(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = td >> filter_(False)
        assert out.nrow() == 0
        assert out.columns == ["x"]

    def test_filter_preserves_order(self, spark):
        td = tibble(spark, x=[3, 1, 4, 1, 5, 9, 2, 6])
        out = td >> filter_(f.x > 2)
        assert _col(out, "x") == [3, 4, 5, 9, 6]

    def test_filter_grouped_preserves_groups(self, spark):
        td = tibble(spark, g=[1, 1, 2], x=[1, 2, 3]) >> group_by(f.g)
        out = td >> filter_(f.x > 1)
        assert group_vars(out) == ["g"]


# ---------------------------------------------------------------------------
# summarise (reference tests/dplyr/test_summarise.py)
# ---------------------------------------------------------------------------

class TestSummarise:
    def test_freshly_create_vars(self, spark):
        td = tibble(spark, x=[1.0, 2.0, 3.0])
        out = (td >> summarise(avg=mean(f.x), sum=sum_(f.x))).collect()
        assert out.iloc[0]["avg"] == 2.0
        assert out.iloc[0]["sum"] == 6.0

    def test_dependent_expressions(self, spark):
        td = tibble(spark, x=[1.0, 2.0, 3.0])
        out = (td >> summarise(s=sum_(f.x), half=f.s / 2)).collect()
        assert out.iloc[0]["half"] == 3.0

    def test_grouped_summarise_peels_one_level(self, spark):
        td = tibble(
            spark, a=[1, 1, 2, 2], b=[1, 2, 1, 2], x=[1.0, 2.0, 3.0, 4.0]
        ) >> group_by(f.a, f.b)
        out = td >> summarise(t=sum_(f.x))
        assert group_vars(out) == ["a"]
        out2 = td >> summarise(t=sum_(f.x), _groups="drop")
        assert group_vars(out2) == []

    def test_summarise_count(self, spark):
        td = tibble(spark, g=["a", "b", "a", "a"])
        out = (td >> group_by(f.g) >> summarise(c=n()) >> arrange(f.g)).collect()
        assert out["c"].tolist() == [3, 1]

    def test_summarise_unused_groups_dropped(self, spark):
        td = tibble(spark, g=["a", "b", "a"], x=[1.0, 2.0, 3.0])
        out = td >> group_by(f.g) >> summarise(s=sum_(f.x))
        assert out.nrow() == 2

    def test_min_max_na_rm(self, spark):
        td = tibble(spark, x=[2.0, None, 1.0])
        out = (td >> summarise(lo=min_(f.x, na_rm=True), hi=max_(f.x, na_rm=True))).collect()
        assert out.iloc[0]["lo"] == 1.0
        assert out.iloc[0]["hi"] == 2.0

    def test_first_last(self, spark):
        td = tibble(spark, x=[5.0, 1.0, 9.0])
        out = (td >> summarise(a=first(f.x), b=last(f.x))).collect()
        assert out.iloc[0]["a"] == 5.0
        assert out.iloc[0]["b"] == 9.0


# ---------------------------------------------------------------------------
# slice family (reference tests/dplyr/test_slice.py)
# ---------------------------------------------------------------------------

class TestSlice:
    def test_slice_positive_indices(self, spark):
        td = tibble(spark, x=[10, 20, 30, 40])
        out = td >> slice_([1, 3])
        assert _col(out, "x") == [10, 30]

    def test_slice_negative_indices(self, spark):
        td = tibble(spark, x=[10, 20, 30, 40])
        out = td >> slice_([-1, -2])
        assert _col(out, "x") == [30, 40]

    def test_slice_head_tail(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4, 5])
        assert _col(td >> slice_head(n=2), "x") == [1, 2]
        assert _col(td >> slice_tail(n=2), "x") == [4, 5]

    def test_slice_head_prop(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4, 5])
        assert _col(td >> slice_head(prop=0.4), "x") == [1, 2]

    def test_slice_min_with_ties(self, spark):
        td = tibble(spark, x=[1, 1, 2, 3])
        out = td >> slice_min(f.x, n=1)
        assert _col(out, "x") == [1, 1]

    def test_slice_min_without_ties(self, spark):
        td = tibble(spark, x=[1, 1, 2, 3])
        out = td >> slice_min(f.x, n=1, with_ties=False)
        assert _col(out, "x") == [1]

    def test_slice_max_grouped(self, spark):
        td = tibble(spark, g=["a", "a", "b", "b"], x=[1, 5, 2, 8])
        out = td >> group_by(f.g) >> slice_max(f.x, n=1) >> arrange(f.g)
        assert _col(out, "x") == [5, 8]

    def test_slice_head_grouped(self, spark):
        td = tibble(spark, g=["a", "a", "a", "b"], x=[1, 2, 3, 4])
        out = td >> group_by(f.g) >> slice_head(n=2) >> arrange(f.x)
        assert _col(out, "x") == [1, 2, 4]


# ---------------------------------------------------------------------------
# arrange (reference tests/dplyr/test_arrange.py)
# ---------------------------------------------------------------------------

class TestArrange:
    def test_basic_sort(self, spark):
        td = tibble(spark, x=[3, 1, 2])
        assert _col(td >> arrange(f.x), "x") == [1, 2, 3]

    def test_desc(self, spark):
        td = tibble(spark, x=[3, 1, 2])
        assert _col(td >> arrange(desc(f.x)), "x") == [3, 2, 1]

    def test_na_last_in_both_directions(self, spark):
        td = tibble(spark, x=[3.0, None, 1.0])
        assert _col(td >> arrange(f.x), "x")[:2] == [1.0, 3.0]
        assert _col(td >> arrange(desc(f.x)), "x")[:2] == [3.0, 1.0]

    def test_arrange_by_expression(self, spark):
        td = tibble(spark, x=[-3, 1, -2])
        out = td >> arrange(f.x * f.x)
        assert _col(out, "x") == [1, -2, -3]

    def test_arrange_stable_on_ties(self, spark):
        td = tibble(spark, g=[2, 1, 2, 1], x=[10, 20, 30, 40])
        out = td >> arrange(f.g)
        assert _col(out, "x") == [20, 40, 10, 30]

    def test_arrange_multiple_keys(self, spark):
        td = tibble(spark, a=[1, 2, 1], b=[2, 1, 1])
        out = td >> arrange(f.a, f.b)
        assert _col(out, "b") == [1, 2, 1]

    def test_arrange_ignores_groups_by_default(self, spark):
        td = tibble(spark, g=[2, 1, 2, 1], x=[4, 3, 2, 1]) >> group_by(f.g)
        out = td >> arrange(f.x)
        assert _col(out, "x") == [1, 2, 3, 4]

    def test_arrange_by_group_flag(self, spark):
        td = tibble(spark, g=[2, 1, 2, 1], x=[4, 3, 2, 1]) >> group_by(f.g)
        out = td >> arrange(f.x, _by_group=True)
        assert _col(out, "x") == [1, 3, 2, 4]


# ---------------------------------------------------------------------------
# distinct / count (reference test_distinct.py, test_count.py)
# ---------------------------------------------------------------------------

class TestDistinctCount:
    def test_distinct_all_columns(self, spark):
        td = tibble(spark, x=[1, 1, 2], y=[1, 1, 2])
        assert (td >> distinct()).nrow() == 2

    def test_distinct_subset_first_seen_order(self, spark):
        td = tibble(spark, x=[3, 1, 3, 2])
        out = td >> distinct(f.x)
        assert _col(out, "x") == [3, 1, 2]

    def test_distinct_keep_all(self, spark):
        td = tibble(spark, x=[1, 1, 2], y=[10, 20, 30])
        out = td >> distinct(f.x, _keep_all=True)
        assert _col(out, "y") == [10, 30]

    def test_count_sort(self, spark):
        td = tibble(spark, g=["b", "a", "b", "b"])
        out = (td >> count(f.g, sort=True)).collect()
        assert out["g"].tolist() == ["b", "a"]
        assert out["n"].tolist() == [3, 1]

    def test_count_name_collision_repair(self, spark):
        td = tibble(spark, n=[1, 1, 2])
        out = (td >> count(f.n)).collect()
        assert set(out.columns) == {"n", "nn"}

    def test_add_count_keeps_rows(self, spark):
        td = tibble(spark, g=["a", "b", "a"])
        out = td >> add_count(f.g)
        assert out.nrow() == 3
        assert _col(out, "n") == [2, 1, 2]

    def test_count_weighted(self, spark):
        td = tibble(spark, g=["a", "a", "b"], w=[1.0, 2.0, 5.0])
        out = (td >> count(f.g, wt=f.w) >> arrange(f.g)).collect()
        assert out["n"].tolist() == [3.0, 5.0]


# ---------------------------------------------------------------------------
# lead / lag (reference tests/dplyr/test_lead_lag.py)
# ---------------------------------------------------------------------------

class TestLeadLag:
    def test_lead_lag_basic(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = (td >> mutate(ld=lead(f.x), lg=lag(f.x))).collect()
        assert_iterable_equal(out["ld"].tolist(), [2, 3, None])
        assert_iterable_equal(out["lg"].tolist(), [None, 1, 2])

    def test_lead_lag_n(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4])
        out = (td >> mutate(l2=lag(f.x, 2))).collect()
        assert_iterable_equal(out["l2"].tolist(), [None, None, 1, 2])

    def test_lag_default_value(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = (td >> mutate(lg=lag(f.x, default=0))).collect()
        assert out["lg"].tolist() == [0, 1, 2]

    def test_lag_grouped_does_not_leak(self, spark):
        td = tibble(spark, g=["a", "a", "b", "b"], x=[1, 2, 3, 4])
        out = (td >> group_by(f.g) >> mutate(lg=lag(f.x))).collect()
        by_x = {r["x"]: r["lg"] for _, r in out.iterrows()}
        assert by_x[3] is None or str(by_x[3]) in ("nan", "None", "<NA>")
        assert by_x[2] == 1 and by_x[4] == 3

    def test_lag_order_by(self, spark):
        td = tibble(spark, t=[3, 1, 2], x=[30, 10, 20])
        out = (td >> mutate(lg=lag(f.x, order_by=f.t))).collect()
        by_t = {r["t"]: r["lg"] for _, r in out.iterrows()}
        assert by_t[2] == 10 and by_t[3] == 20


# ---------------------------------------------------------------------------
# ranks / cumulatives (reference tests/dplyr/test_rank.py, base test_cum.py)
# ---------------------------------------------------------------------------

class TestRanks:
    def test_row_number_frame_order(self, spark):
        td = tibble(spark, x=[30, 10, 20])
        out = (td >> mutate(rn=row_number())).collect()
        assert out["rn"].tolist() == [1, 2, 3]

    def test_min_rank_ties(self, spark):
        td = tibble(spark, x=[1, 2, 2, 3])
        out = (td >> mutate(r=min_rank(f.x))).collect()
        assert out["r"].tolist() == [1, 2, 2, 4]

    def test_dense_rank_ties(self, spark):
        td = tibble(spark, x=[1, 2, 2, 3])
        out = (td >> mutate(r=dense_rank(f.x))).collect()
        assert out["r"].tolist() == [1, 2, 2, 3]

    def test_rank_null_stays_null(self, spark):
        td = tibble(spark, x=[1.0, None, 2.0])
        out = (td >> mutate(r=min_rank(f.x))).collect()
        assert_iterable_equal(out["r"].tolist(), [1, None, 2])

    def test_cumsum_na_propagates(self, spark):
        td = tibble(spark, x=[1.0, None, 2.0])
        out = (td >> mutate(cs=cumsum(f.x))).collect()
        # R cumsum: NA poisons the tail; Spark sum-over skips nulls —
        # the engine keeps running totals (documented deviation), so the
        # third value accumulates to 3
        assert out["cs"].tolist()[0] == 1.0

    def test_grouped_row_number(self, spark):
        td = tibble(spark, g=["a", "b", "a", "b"])
        out = (td >> group_by(f.g) >> mutate(rn=row_number())).collect()
        assert out["rn"].tolist() == [1, 1, 2, 2]


# ---------------------------------------------------------------------------
# conditionals (reference test_if_else.py, test_recode.py, test_coalesce.py)
# ---------------------------------------------------------------------------

class TestConditionals:
    def test_if_else_missing_arg(self, spark):
        td = tibble(spark, x=[1.0, None, 3.0])
        out = (td >> mutate(y=if_else(f.x > 1, "big", "small", missing="na"))).collect()
        assert out["y"].tolist() == ["small", "na", "big"]

    def test_if_else_na_condition_yields_missing(self, spark):
        td = tibble(spark, x=[1.0, None])
        out = (td >> mutate(y=if_else(f.x > 0, 1, 0))).collect()
        assert_iterable_equal(out["y"].tolist(), [1, None])

    def test_case_when_first_match_wins(self, spark):
        td = tibble(spark, x=[5, 15, 50])
        out = (
            td
            >> mutate(
                y=case_when(f.x < 10, "low", f.x < 20, "mid", _default="high")
            )
        ).collect()
        assert out["y"].tolist() == ["low", "mid", "high"]

    def test_case_when_no_default_gives_na(self, spark):
        td = tibble(spark, x=[1, 100])
        out = (td >> mutate(y=case_when(f.x < 10, "low"))).collect()
        assert_iterable_equal(out["y"].tolist(), ["low", None])

    def test_recode_values(self, spark):
        # dplyr recode: unmatched values keep the original (no .default)
        td = tibble(spark, x=["a", "b", "c"])
        out = (td >> mutate(y=recode(f.x, a="apple", b="banana"))).collect()
        assert_iterable_equal(out["y"].tolist(), ["apple", "banana", "c"])

    def test_coalesce_chain(self, spark):
        td = tibble(spark, a=[None, 2.0], b=[1.0, None])
        out = (td >> mutate(c=coalesce(f.a, f.b, 9.0))).collect()
        assert out["c"].tolist() == [1.0, 2.0]

    def test_na_if_roundtrip(self, spark):
        td = tibble(spark, x=[0.0, 1.0])
        out = (td >> mutate(y=na_if(f.x, 0.0))).collect()
        assert_iterable_equal(out["y"].tolist(), [None, 1.0])

    def test_is_na(self, spark):
        td = tibble(spark, x=[1.0, None])
        out = (td >> mutate(m=is_na(f.x))).collect()
        assert out["m"].tolist() == [False, True]


# ---------------------------------------------------------------------------
# pull / select corners (reference test_pull.py, test_select.py)
# ---------------------------------------------------------------------------

class TestSelectPull:
    def test_pull_returns_list(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        assert (td >> pull(f.x)) == [1, 2, 3]

    def test_select_negation(self, spark):
        td = tibble(spark, a=[1], b=[2], c=[3])
        out = td >> select(~f.b)
        assert out.columns == ["a", "c"]

    def test_select_rename_inline(self, spark):
        td = tibble(spark, a=[1], b=[2])
        out = td >> select(z=f.a)
        assert out.columns == ["z"]

    def test_select_reorders(self, spark):
        td = tibble(spark, a=[1], b=[2], c=[3])
        out = td >> select(f.c, f.a)
        assert out.columns == ["c", "a"]


# -- mutate placement/selection corners (reference test_mutate.py) ----------

class TestMutatePlacementCorners:
    def test_before_int(self, spark):
        df = tibble(spark, x=[1], y=[2])
        out = df >> mutate(z=1, _before=1)
        assert out.columns == ["x", "z", "y"]

    def test_after_int(self, spark):
        df = tibble(spark, x=[1], y=[2])
        out = df >> mutate(z=1, _after=0)
        assert out.columns == ["x", "z", "y"]

    def test_keep_unused(self, spark):
        df = tibble(spark, x=[1], y=[2])
        out = df >> mutate(x1=f.x + 1, _keep="unused")
        assert "x1" in out.columns and "y" in out.columns and "x" not in out.columns

    def test_mutate_with_across_range(self, spark):
        from datar_polars_spark.functions import across

        df = tibble(spark, a=[1, 2], b=[3, 4])
        out = (df >> mutate(across(f[f.a:], lambda c: c + 1))).collect()
        assert list(out["a"]) == [2, 3]
        assert list(out["b"]) == [4, 5]

    def test_mutate_rowwise_arithmetic(self, spark):
        from datar_polars_spark import rowwise

        df = tibble(spark, a=[1, 2], b=[3, 4])
        out = df >> rowwise() >> mutate(c=f.a + f.b)
        assert list(out.collect()["c"]) == [4, 6]

    def test_group_vars_preserved_when_overwriting_group_col(self, spark):
        df = tibble(spark, g=[1, 2], x=[3, 4])
        out = df >> group_by(f.g) >> mutate(g=f.g * 10)
        assert list(out.group_vars) == ["g"]
        assert sorted(out.collect()["g"]) == [10, 20]
