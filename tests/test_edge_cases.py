"""Edge cases modeled on the reference's dedicated suites
(tests/dplyr/test_empty_groups.py, NA suites): empty frames, empty
filter results, all-NA columns, single-row groups."""

import math

import pytest

from datar_polars_spark import (
    f,
    tibble,
    mutate,
    filter_,
    group_by,
    summarise,
    arrange,
    count,
    distinct,
    slice_head,
    bind_rows,
    left_join,
    select,
)
from datar_polars_spark.functions import (
    sum_,
    mean,
    n,
    lag,
    cumsum,
    min_rank,
    if_else,
    coalesce,
)

from conftest import assert_iterable_equal


def test_empty_filter_result_keeps_schema(spark):
    td = tibble(spark, x=[1, 2], g=["a", "b"])
    out = td >> filter_(f.x > 100)
    assert out.nrow() == 0
    assert out.columns == ["x", "g"]
    # verbs still run on the empty frame
    out2 = out >> mutate(y=f.x * 2) >> arrange(f.y)
    assert out2.nrow() == 0
    assert out2.columns == ["x", "g", "y"]


def test_filter_false_literal(spark):
    td = tibble(spark, x=[1, 2])
    out = td >> filter_(False)
    assert out.nrow() == 0


def test_summarise_on_empty_group_frame(spark):
    td = tibble(spark, g=["a"], x=[1]) >> filter_(f.x > 10) >> group_by(f.g)
    out = td >> summarise(s=sum_(f.x, na_rm=True), c=n())
    assert out.nrow() == 0


def test_ungrouped_summarise_on_empty_frame_yields_one_row(spark):
    td = tibble(spark, x=[1]) >> filter_(f.x > 10)
    out = td >> summarise(c=n())
    assert out.collect()["c"].tolist() == [0]


def test_all_na_column_aggregates(spark):
    td = tibble(spark, x=[None, None], g=["a", "a"])
    out = td >> group_by(f.g) >> summarise(
        s=sum_(f.x, na_rm=True), m=mean(f.x, na_rm=True), c=n()
    )
    got = out.collect()
    # R: sum(NA, na.rm=TRUE) == 0; mean is NaN/NA; n counts rows
    assert got["c"].tolist() == [2]
    assert got["m"].isna().all()


def test_na_poisoning_default(spark):
    td = tibble(spark, x=[1.0, None, 3.0])
    out = td >> summarise(s=sum_(f.x), sn=sum_(f.x, na_rm=True))
    got = out.collect()
    assert got["s"].isna().all()
    assert got["sn"].tolist() == [4.0]


def test_single_row_group_windows(spark):
    td = tibble(spark, g=["a", "b"], x=[1, 2]) >> group_by(f.g)
    out = td >> mutate(l=lag(f.x), cs=cumsum(f.x), r=min_rank(f.x))
    got = out.collect()
    assert_iterable_equal(got["l"].tolist(), [None, None])
    assert got["cs"].tolist() == [1, 2]
    assert got["r"].tolist() == [1, 1]


def test_rank_with_nulls_masked(spark):
    td = tibble(spark, x=[3.0, None, 1.0])
    out = td >> mutate(r=min_rank(f.x))
    assert_iterable_equal(out.collect()["r"].tolist(), [2, None, 1])


def test_count_on_empty(spark):
    td = tibble(spark, g=["a"]) >> filter_(f.g == "zz")
    out = td >> count(f.g)
    assert out.nrow() == 0


def test_distinct_all_duplicate(spark):
    td = tibble(spark, x=[7, 7, 7])
    assert (td >> distinct()).nrow() == 1


def test_slice_head_more_than_rows(spark):
    td = tibble(spark, x=[1, 2])
    assert (td >> slice_head(n=10)).collect()["x"].tolist() == [1, 2]


def test_bind_rows_mismatched_columns(spark):
    a = tibble(spark, x=[1], y=["p"])
    b = tibble(spark, x=[2], z=[9.5])
    out = bind_rows(a, b)
    got = out.collect()
    assert list(got.columns) == ["x", "y", "z"]
    assert got["x"].tolist() == [1, 2]
    assert_iterable_equal(got["y"].tolist(), ["p", None])
    assert_iterable_equal(got["z"].tolist(), [None, 9.5])


def test_left_join_no_matches(spark):
    a = tibble(spark, k=[1, 2], x=["a", "b"])
    b = tibble(spark, k=[99], y=["z"])
    out = a >> left_join(b, by="k")
    got = out.collect()
    assert got["x"].tolist() == ["a", "b"]
    assert_iterable_equal(got["y"].tolist(), [None, None])


def test_if_else_null_condition_goes_false_branch(spark):
    td = tibble(spark, x=[None, 5])
    out = td >> mutate(y=if_else(f.x > 3, "big", "small"))
    # dplyr: NA condition -> NA result (missing not given)
    assert_iterable_equal(out.collect()["y"].tolist(), [None, "big"])


def test_coalesce_chain(spark):
    td = tibble(spark, a=[None, 1.0], b=[2.0, None])
    out = td >> mutate(c=coalesce(f.a, f.b, 0.0))
    assert out.collect()["c"].tolist() == [2.0, 1.0]


def test_which_min_max_ignore_na(spark):
    from datar_polars_spark import which_min_, which_max_

    td = tibble(spark, x=[2.0, None, 1.0, 2.0])
    assert which_min_(td, f.x) == 3
    assert which_max_(td, f.x) == 1  # first max, NA ignored
    all_na = tibble(spark, x=[None, None])
    assert which_min_(all_na, f.x) is None


def test_add_row_multiple_rows_in_order(spark):
    from datar_polars_spark import add_row

    td = tibble(spark, x=[1], y=["a"])
    out = td >> add_row(x=[2, 3, 4], y=["b", "c", "d"])
    got = out.collect()
    assert got["x"].tolist() == [1, 2, 3, 4]
    assert got["y"].tolist() == ["a", "b", "c", "d"]


def test_factor_verbs_preserve_group_drop(spark):
    from datar_polars_spark import factor_, fct_expand, group_by, count

    td = (
        tibble(spark, x=["a", "b"])
        >> group_by(f.x, _drop=False)
        >> fct_expand(f.x, "c")
    )
    out = (td >> count()).collect().sort_values("x")
    assert out.values.tolist() == [["a", 1], ["b", 1], ["c", 0]]


def test_count_regroup_preserves_drop_false(spark):
    from datar_polars_spark import factor_, fct_expand, group_by, count

    td = (
        tibble(spark, x=["a", "b"], y=[1, 1])
        >> factor_(f.x)
        >> fct_expand(f.x, "c")
        >> group_by(f.x, _drop=False)
    )
    out = (td >> count()).collect()
    assert sorted(out["x"].tolist()) == ["a", "b", "c"]


def test_fct_count_keeps_na_row(spark):
    from datar_polars_spark import factor_, fct_count

    td = tibble(spark, x=["a", None, "a"]) >> factor_(f.x)
    got = fct_count(td, f.x).collect()
    assert len(got) == 2
    na_row = got[got["f"].isna()]
    assert na_row["n"].tolist() == [1]


def test_rowwise_median_all_na(spark):
    from datar_polars_spark import rowwise
    from datar_polars_spark.functions import median, c_across

    td = tibble(spark, a=[None, 1.0], b=[None, 3.0])
    out = td >> rowwise() >> mutate(m=median(c_across([f.a, f.b]), na_rm=True))
    got = out.collect()
    assert got["m"].isna().tolist() == [True, False]
    assert got["m"][1] == 1.0


def test_salted_join_rejects_right_full(spark):
    from datar_polars_spark.operators.join import salted_join

    a = tibble(spark, k=[1], x=[1])
    b = tibble(spark, k=[1], y=[2])
    with pytest.raises(ValueError):
        salted_join(a, b, by="k", how="full")
