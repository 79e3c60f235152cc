"""Core verb behavior (modeled on the reference's tidyverse-ported
suites: tests/dplyr/test_mutate.py, test_summarise.py, test_filter.py)."""

import pytest

from datar_polars_spark import (
    f,
    tibble,
    select,
    rename,
    relocate,
    mutate,
    transmute,
    filter_,
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
    starts_with,
    ends_with,
    everything,
)
from datar_polars_spark.functions import (
    sum_,
    mean,
    n,
    n_distinct,
    row_number,
    min_rank,
    lead,
    lag,
    cumsum,
    if_else,
    case_when,
    coalesce,
    paste0,
    across,
)

from conftest import assert_frame_equal, assert_iterable_equal


@pytest.fixture()
def df(spark):
    return tibble(
        spark,
        g=["a", "b", "a", "c", "b", "a"],
        x=[1, 2, 3, 4, 5, 6],
        y=[1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    )


def test_select(df):
    out = df >> select(f.g, f.x)
    assert out.columns == ["g", "x"]
    out = df >> select(~f.g)
    assert out.columns == ["x", "y"]
    out = df >> select(starts_with("g"))
    assert out.columns == ["g"]
    out = df >> select(everything())
    assert out.columns == ["g", "x", "y"]


def test_select_rename(df):
    out = df >> select(f.g, new_x=f.x)
    assert out.columns == ["g", "new_x"]


def test_rename(df):
    out = df >> rename(gg=f.g)
    assert out.columns == ["gg", "x", "y"]


def test_relocate(df):
    out = df >> relocate(f.y, _before=f.g)
    assert out.columns == ["y", "g", "x"]
    out = df >> relocate(f.g, _after=f.x)
    assert out.columns == ["x", "g", "y"]


def test_mutate_basic(df):
    out = (df >> mutate(z=f.x * 2)).collect()
    assert_frame_equal(
        out,
        {
            "g": ["a", "b", "a", "c", "b", "a"],
            "x": [1, 2, 3, 4, 5, 6],
            "y": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
            "z": [2, 4, 6, 8, 10, 12],
        },
    )


def test_mutate_sequential_refs(df):
    out = (df >> mutate(z=f.x * 2, w=f.z + 1)).collect()
    assert_iterable_equal(out["w"].tolist(), [3, 5, 7, 9, 11, 13])


def test_mutate_grouped_window(df):
    out = (df >> group_by(f.g) >> mutate(gm=mean(f.x, na_rm=True))).collect()
    assert_iterable_equal(
        out["gm"].tolist(), [10 / 3, 3.5, 10 / 3, 4.0, 3.5, 10 / 3], approx=True
    )


def test_transmute(df):
    out = df >> transmute(z=f.x + 1)
    assert out.columns == ["z"]


def test_filter(df):
    out = (df >> filter_(f.x > 3)).collect()
    assert_iterable_equal(out["x"].tolist(), [4, 5, 6])


def test_filter_grouped_agg(df):
    out = (df >> group_by(f.g) >> filter_(f.x == f.x.max())).collect()
    assert_iterable_equal(sorted(out["x"].tolist()), [4, 5, 6])


def test_summarise(df):
    out = (df >> group_by(f.g) >> summarise(total=sum_(f.x, na_rm=True), cnt=n())).collect()
    assert_frame_equal(
        out, {"g": ["a", "b", "c"], "total": [10, 7, 4], "cnt": [3, 2, 1]}
    )


def test_summarise_ungrouped(df):
    out = (df >> summarise(total=sum_(f.x, na_rm=True))).collect()
    assert_iterable_equal(out["total"].tolist(), [21])


def test_summarise_dependent_expr(df):
    out = (df >> group_by(f.g) >> summarise(s=sum_(f.x, na_rm=True), s2=f.s * 2)).collect()
    assert_iterable_equal(out["s2"].tolist(), [20, 14, 8])


def test_summarise_na_poisoning(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1.0, None, 3.0])
    out = (td >> group_by(f.g) >> summarise(s=sum_(f.x))).collect()
    assert_iterable_equal(out["s"].tolist(), [None, 3.0])
    out = (td >> group_by(f.g) >> summarise(s=sum_(f.x, na_rm=True))).collect()
    assert_iterable_equal(out["s"].tolist(), [1.0, 3.0])


def test_arrange(df):
    out = (df >> arrange(desc(f.x))).collect()
    assert_iterable_equal(out["x"].tolist(), [6, 5, 4, 3, 2, 1])
    out = (df >> arrange(f.g, desc(f.x))).collect()
    assert_iterable_equal(out["x"].tolist(), [6, 3, 1, 5, 2, 4])


def test_arrange_stable(spark):
    td = tibble(spark, k=[1, 1, 1, 1], v=[10, 20, 30, 40])
    out = (td >> arrange(f.k)).collect()
    assert_iterable_equal(out["v"].tolist(), [10, 20, 30, 40])


def test_distinct(df):
    out = (df >> distinct(f.g)).collect()
    assert_iterable_equal(out["g"].tolist(), ["a", "b", "c"])


def test_distinct_keep_all(df):
    out = (df >> distinct(f.g, _keep_all=True)).collect()
    assert_iterable_equal(out["x"].tolist(), [1, 2, 4])


def test_count(df):
    out = (df >> count(f.g)).collect()
    assert_frame_equal(out, {"g": ["a", "b", "c"], "n": [3, 2, 1]})
    out = (df >> count(f.g, sort=True)).collect()
    assert_iterable_equal(out["n"].tolist(), [3, 2, 1])
    out = (df >> count(f.g, wt=f.x)).collect()
    assert_iterable_equal(out["n"].tolist(), [10, 7, 4])


def test_add_count(df):
    out = (df >> add_count(f.g)).collect()
    assert_iterable_equal(out["n"].tolist(), [3, 2, 3, 1, 2, 3])


def test_slice(df):
    out = (df >> slice_(1, 3)).collect()
    assert_iterable_equal(out["x"].tolist(), [1, 3])
    out = (df >> slice_(-1,)).collect()
    assert_iterable_equal(out["x"].tolist(), [2, 3, 4, 5, 6])


def test_slice_head_tail(df):
    assert_iterable_equal((df >> slice_head(n=2)).collect()["x"].tolist(), [1, 2])
    assert_iterable_equal((df >> slice_tail(n=2)).collect()["x"].tolist(), [5, 6])
    out = (df >> group_by(f.g) >> slice_head(n=1)).collect()
    assert_iterable_equal(sorted(out["x"].tolist()), [1, 2, 4])


def test_slice_min_max(df):
    out = (df >> group_by(f.g) >> slice_max(f.x, n=1)).collect()
    assert_iterable_equal(sorted(out["x"].tolist()), [4, 5, 6])
    out = (df >> slice_min(f.x, n=2)).collect()
    assert_iterable_equal(out["x"].tolist(), [1, 2])


def test_pull(df):
    assert pull(df, f.x) == [1, 2, 3, 4, 5, 6]


def test_window_functions(spark):
    td = tibble(spark, g=["a", "a", "b", "b"], v=[3.0, 1.0, 4.0, 2.0])
    out = (td >> group_by(f.g) >> mutate(
        rn=row_number(),
        rk=min_rank(f.v),
        nxt=lead(f.v),
        prv=lag(f.v),
        cs=cumsum(f.v),
    )).collect()
    assert_iterable_equal(out["rn"].tolist(), [1, 2, 1, 2])
    assert_iterable_equal(out["rk"].tolist(), [2, 1, 2, 1])
    assert_iterable_equal(out["nxt"].tolist(), [1.0, None, 2.0, None])
    assert_iterable_equal(out["prv"].tolist(), [None, 3.0, None, 4.0])
    assert_iterable_equal(out["cs"].tolist(), [3.0, 4.0, 4.0, 6.0])


def test_if_else_case_when(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    out = (td >> mutate(
        a=if_else(f.x > 2, "hi", "lo"),
        b=case_when(f.x <= 1, "one", f.x <= 3, "some", _default="many"),
    )).collect()
    assert_iterable_equal(out["a"].tolist(), ["lo", "lo", "hi", "hi"])
    assert_iterable_equal(out["b"].tolist(), ["one", "some", "some", "many"])


def test_across(df):
    out = (df >> group_by(f.g) >> summarise(
        across([f.x, f.y], {"s": sum_, "m": mean}, na_rm=True)
    )).collect()
    assert list(out.columns) == ["g", "x_s", "x_m", "y_s", "y_m"]
    assert_iterable_equal(out["x_s"].tolist(), [10, 7, 4])


def test_n_distinct(df):
    out = (df >> summarise(nd=n_distinct(f.g))).collect()
    assert_iterable_equal(out["nd"].tolist(), [3])


def test_paste(spark):
    td = tibble(spark, a=["x", "y"], b=["1", "2"])
    out = (td >> mutate(c=paste0(f.a, f.b))).collect()
    assert_iterable_equal(out["c"].tolist(), ["x1", "y2"])
