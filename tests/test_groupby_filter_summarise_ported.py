"""Compact port of the reference's tests/dplyr/test_group_by.py,
test_filter.py, test_summarise.py (incl. reframe) basic cases."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    f,
    filter_,
    group_by,
    group_vars,
    mutate,
    reframe,
    rowwise,
    summarise,
    tibble,
    ungroup,
)
from datar_polars_spark.functions import mean, n, quantile, row_number, sum_


def col(t, name):
    return list(t.collect()[name])


class TestGroupBy:
    def test_single(self, spark):
        t = tibble(spark, g=[1, 2], x=[3, 4]) >> group_by(f.g)
        assert list(t.group_vars) == ["g"]

    def test_string(self, spark):
        t = tibble(spark, g=[1], x=[2]) >> group_by("g")
        assert list(t.group_vars) == ["g"]

    def test_multiple(self, spark):
        t = tibble(spark, a=[1], b=[2], x=[3]) >> group_by(f.a, f.b)
        assert list(t.group_vars) == ["a", "b"]

    def test_multiple_strings(self, spark):
        t = tibble(spark, a=[1], b=[2]) >> group_by("a", "b")
        assert list(t.group_vars) == ["a", "b"]

    def test_preserves_data(self, spark):
        t = tibble(spark, g=[1, 2], x=[3, 4])
        g = t >> group_by(f.g)
        assert sorted(col(g, "x")) == [3, 4]

    def test_add_appends(self, spark):
        t = tibble(spark, a=[1], b=[2]) >> group_by(f.a) >> group_by(f.b, _add=True)
        assert list(t.group_vars) == ["a", "b"]

    def test_add_no_duplicates(self, spark):
        t = tibble(spark, a=[1]) >> group_by(f.a) >> group_by(f.a, _add=True)
        assert list(t.group_vars) == ["a"]

    def test_no_add_replaces(self, spark):
        t = tibble(spark, a=[1], b=[2]) >> group_by(f.a) >> group_by(f.b)
        assert list(t.group_vars) == ["b"]

    def test_group_vars_verb(self, spark):
        t = tibble(spark, g=[1]) >> group_by(f.g)
        assert (t >> group_vars()) == ["g"]

    def test_group_vars_ungrouped_empty(self, spark):
        t = tibble(spark, g=[1])
        assert (t >> group_vars()) == []

    def test_ungroup_clears_all(self, spark):
        t = tibble(spark, a=[1], b=[2]) >> group_by(f.a, f.b) >> ungroup()
        assert list(t.group_vars) == []

    def test_rowwise(self, spark):
        t = tibble(spark, x=[1, 2]) >> rowwise()
        assert t.rowwise is True

    def test_group_vars_after_filter(self, spark):
        t = tibble(spark, g=[1, 2], x=[3, 4]) >> group_by(f.g) >> filter_(f.x > 3)
        assert list(t.group_vars) == ["g"]


class TestFilter:
    def test_by_expression(self, spark):
        t = tibble(spark, x=[1, 2, 3])
        assert col(t >> filter_(f.x > 1), "x") == [2, 3]

    def test_by_bool_column(self, spark):
        t = tibble(spark, x=[1, 2], keep=[True, False])
        assert col(t >> filter_(f.keep), "x") == [1]

    def test_multiple_comma_conditions_anded(self, spark):
        t = tibble(spark, x=[1, 2, 3], y=[3, 2, 1])
        assert col(t >> filter_(f.x > 1, f.y > 1), "x") == [2]

    def test_bitwise_and_condition(self, spark):
        t = tibble(spark, x=[1, 2, 3])
        assert col(t >> filter_((f.x > 1) & (f.x < 3)), "x") == [2]

    def test_chained_conditions(self, spark):
        t = tibble(spark, x=[1, 2, 3])
        assert col(t >> filter_(f.x > 1) >> filter_(f.x < 3), "x") == [2]

    def test_na_values_dropped_by_condition(self, spark):
        t = tibble(spark, x=[1.0, None, 3.0])
        assert col(t >> filter_(f.x > 0), "x") == [1.0, 3.0]

    def test_negated_na_still_dropped(self, spark):
        t = tibble(spark, x=[1.0, None, 3.0])
        assert col(t >> filter_(~(f.x > 2)), "x") == [1.0]

    def test_true_scalar_returns_all(self, spark):
        t = tibble(spark, x=[1, 2])
        assert col(t >> filter_(True), "x") == [1, 2]

    def test_false_scalar_empty(self, spark):
        t = tibble(spark, x=[1, 2])
        assert (t >> filter_(False)).nrow() == 0

    def test_empty_df_filter(self, spark):
        t = tibble(spark, x=[1]) >> filter_(f.x > 5)
        assert (t >> filter_(f.x > 0)).nrow() == 0

    def test_filter_within_group(self, spark):
        t = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3])
        out = t >> group_by(f.g) >> filter_(f.x == f.x)  # no-op keeps groups
        assert list(out.group_vars) == ["g"]

    def test_filter_max_within_group(self, spark):
        from datar_polars_spark.functions import max_

        t = tibble(spark, g=["a", "a", "b", "b"], x=[1, 2, 3, 4])
        out = t >> group_by(f.g) >> filter_(f.x == max_(f.x))
        assert sorted(col(out, "x")) == [2, 4]

    def test_filter_then_mutate_keeps_grouping(self, spark):
        t = tibble(spark, g=[1, 2], x=[3, 4])
        out = t >> group_by(f.g) >> filter_(f.x > 0) >> mutate(y=f.x + 1)
        assert list(out.group_vars) == ["g"]

    def test_row_number_first(self, spark):
        t = tibble(spark, x=[10, 20, 30])
        out = t >> filter_(row_number() == 1)
        assert col(out, "x") == [10]

    def test_row_number_empty_result(self, spark):
        t = tibble(spark, x=[10])
        assert (t >> filter_(row_number() == 99)).nrow() == 0


class TestSummarise:
    def test_with_sum(self, spark):
        t = tibble(spark, x=[1, 2, 3])
        assert col(t >> summarise(s=sum_(f.x)), "s") == [6]

    def test_with_mean(self, spark):
        t = tibble(spark, x=[2.0, 4.0])
        assert col(t >> summarise(m=mean(f.x)), "m") == [3.0]

    def test_with_quantile(self, spark):
        t = tibble(spark, x=[1.0, 2.0, 3.0])
        out = col(t >> summarise(q=quantile(f.x, 0.5)), "q")
        assert out == pytest.approx([2.0])

    def test_literal_value(self, spark):
        t = tibble(spark, x=[1, 2])
        assert col(t >> summarise(k=1), "k") == [1]

    def test_grouped_literal(self, spark):
        t = tibble(spark, g=["a", "b"], x=[1, 2])
        out = (t >> group_by(f.g) >> summarise(k=1)).collect()
        assert list(out["k"]) == [1, 1]

    def test_multi_expression(self, spark):
        t = tibble(spark, x=[1, 2, 3])
        out = (t >> summarise(s=sum_(f.x), n_=n())).collect()
        assert out["s"][0] == 6 and out["n_"][0] == 3

    def test_one_per_group(self, spark):
        t = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3])
        out = t >> group_by(f.g) >> summarise(s=sum_(f.x))
        assert out.nrow() == 2

    def test_peels_grouping_layer(self, spark):
        t = tibble(spark, a=[1], b=[2], x=[3])
        out = t >> group_by(f.a, f.b) >> summarise(s=sum_(f.x))
        assert list(out.group_vars) == ["a"]

    def test_groups_keep(self, spark):
        t = tibble(spark, a=[1], b=[2], x=[3])
        out = t >> group_by(f.a, f.b) >> summarise(s=sum_(f.x), _groups="keep")
        assert list(out.group_vars) == ["a", "b"]

    def test_groups_drop(self, spark):
        t = tibble(spark, a=[1], x=[3])
        out = t >> group_by(f.a) >> summarise(s=sum_(f.x), _groups="drop")
        assert list(out.group_vars) == []

    def test_reuses_kwargs(self, spark):
        t = tibble(spark, x=[1, 2])
        out = (t >> summarise(s=sum_(f.x), d=f.s * 2)).collect()
        assert out["d"][0] == 6

    def test_reuses_original_column_name(self, spark):
        t = tibble(spark, x=[1, 2])
        out = (t >> summarise(x=sum_(f.x), y=f.x + 1)).collect()
        assert out["y"][0] == 4

    def test_empty_df(self, spark):
        t = tibble(spark, x=[1]) >> filter_(f.x > 5)
        out = t >> summarise(n_=n())
        assert col(out, "n_") == [0]

    def test_empty_grouped(self, spark):
        t = tibble(spark, g=["a"], x=[1]) >> filter_(f.x > 5)
        out = t >> group_by(f.g) >> summarise(n_=n())
        assert out.nrow() == 0

    def test_nonexistent_column_raises(self, spark):
        t = tibble(spark, x=[1])
        with pytest.raises(Exception):
            (t >> summarise(s=sum_(f.nope))).collect()


class TestReframe:
    def test_ungrouped(self, spark):
        t = tibble(spark, x=[1.0, 2.0, 3.0, 4.0])
        out = t >> reframe(q=quantile(f.x, [0.25, 0.75]))
        assert out.nrow() == 2

    def test_grouped(self, spark):
        t = tibble(spark, g=["a"] * 4 + ["b"] * 4, x=[1.0, 2.0, 3.0, 4.0] * 2)
        out = t >> reframe(q=quantile(f.x, [0.25, 0.75]))
        # grouped reframe returns multiple rows per group
        assert out.nrow() in (2, 4)

    def test_grouped_literal(self, spark):
        t = tibble(spark, g=["a", "b"], x=[1, 2])
        out = t >> group_by(f.g) >> reframe(k=1)
        assert out.nrow() == 2


# -- slice / join remaining corners (reference test_slice.py, test_join.py) --

class TestSliceCorners:
    def test_slice_head_default_n1(self, spark):
        from datar_polars_spark import slice_head

        t = tibble(spark, x=[1, 2, 3])
        assert col(t >> slice_head(), "x") == [1]

    def test_slice_tail_default_n1(self, spark):
        from datar_polars_spark import slice_tail

        t = tibble(spark, x=[1, 2, 3])
        assert col(t >> slice_tail(), "x") == [3]

    def test_slice_tail_prop(self, spark):
        from datar_polars_spark import slice_tail

        t = tibble(spark, x=[1, 2, 3, 4])
        assert col(t >> slice_tail(prop=0.5), "x") == [3, 4]

    def test_slice_negative_drops_r_convention(self, spark):
        # this engine keeps R's 1-based slice with drop-negatives
        # (documented in operators/core.py); the reference forked to
        # polars 0-based indices — the R behavior is asserted here
        from datar_polars_spark import slice_

        t = tibble(spark, x=[1, 2, 3])
        assert col(t >> slice_(-1), "x") == [2, 3]

    def test_slice_no_rows_returns_empty(self, spark):
        from datar_polars_spark import slice_head

        t = tibble(spark, x=[1]) >> filter_(f.x > 5)
        assert (t >> slice_head(n=3)).nrow() == 0

    def test_slice_min_string_column(self, spark):
        from datar_polars_spark import slice_min

        t = tibble(spark, s=["b", "a", "c"])
        assert col(t >> slice_min(f.s), "s") == ["a"]

    def test_slice_max_string_column(self, spark):
        from datar_polars_spark import slice_max

        t = tibble(spark, s=["b", "a", "c"])
        assert col(t >> slice_max(f.s), "s") == ["c"]

    def test_slice_min_n2(self, spark):
        from datar_polars_spark import slice_min

        t = tibble(spark, x=[5, 1, 3, 2])
        assert sorted(col(t >> slice_min(f.x, n=2), "x")) == [1, 2]

    def test_slice_sample_n1_and_prop(self, spark):
        from datar_polars_spark import slice_sample

        t = tibble(spark, x=list(range(10)))
        assert (t >> slice_sample(n=1)).nrow() == 1
        got = (t >> slice_sample(prop=0.5)).nrow()
        assert 0 <= got <= 10


class TestJoinCorners:
    def test_join_by_dict(self, spark):
        from datar_polars_spark import inner_join

        a = tibble(spark, k1=[1, 2], v=[10, 20])
        b = tibble(spark, k2=[2, 3], w=[200, 300])
        out = inner_join(a, b, by={"k1": "k2"})
        pdf = out.collect()
        assert list(pdf["v"]) == [20] and list(pdf["w"]) == [200]

    def test_semi_join_keeps_left_rows(self, spark):
        from datar_polars_spark import semi_join

        a = tibble(spark, k=[1, 2, 3])
        b = tibble(spark, k=[2, 3, 4])
        assert sorted(col(semi_join(a, b, by="k"), "k")) == [2, 3]

    def test_anti_join_drops_matching_rows(self, spark):
        from datar_polars_spark import anti_join

        a = tibble(spark, k=[1, 2, 3])
        b = tibble(spark, k=[2])
        assert sorted(col(anti_join(a, b, by="k"), "k")) == [1, 3]

    def test_cross_join(self, spark):
        from datar_polars_spark import cross_join

        a = tibble(spark, x=[1, 2])
        b = tibble(spark, y=["a", "b"])
        assert cross_join(a, b).nrow() == 4

    def test_nested_joins(self, spark):
        from datar_polars_spark import inner_join, left_join

        a = tibble(spark, k=[1, 2], v=[10, 20])
        b = tibble(spark, k=[1, 2], w=[100, 200])
        c = tibble(spark, k=[1], z=[1000])
        out = left_join(inner_join(a, b, by="k"), c, by="k")
        pdf = out.collect().sort_values("k")
        assert list(pdf["v"]) == [10, 20]
        vals = [None if v != v else v for v in pdf["z"]]
        assert vals == [1000, None]
