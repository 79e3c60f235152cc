"""Rowwise aggregation over c_across + second wave of forcats verbs."""

import pytest

from datar_polars_spark import (
    f,
    tibble,
    mutate,
    rowwise,
    factor_,
    fct_relabel,
    fct_reorder2,
    fct_lump_lowfreq,
    fct_match,
    lvls_reorder,
    lvls_revalue,
    lvls_expand,
    set_levels,
    levels_,
)
from datar_polars_spark.functions import sum_, mean, min_, max_, sd, c_across

from conftest import assert_iterable_equal


def test_rowwise_c_across(spark):
    td = tibble(spark, a=[1.0, 4.0], b=[2.0, None], c=[3.0, 6.0])
    out = (
        td
        >> rowwise()
        >> mutate(
            s=sum_(c_across([f.a, f.b, f.c])),
            sn=sum_(c_across([f.a, f.b, f.c]), na_rm=True),
            m=mean(c_across([f.a, f.b, f.c]), na_rm=True),
            lo=min_(c_across([f.a, f.b, f.c]), na_rm=True),
            hi=max_(c_across([f.a, f.b, f.c]), na_rm=True),
        )
    )
    got = out.collect()
    assert_iterable_equal(got["s"].tolist(), [6.0, None])
    assert_iterable_equal(got["sn"].tolist(), [6.0, 10.0])
    assert got["m"].tolist() == pytest.approx([2.0, 5.0])
    assert got["lo"].tolist() == [1.0, 4.0]
    assert got["hi"].tolist() == [3.0, 6.0]


def test_rowwise_sd(spark):
    td = tibble(spark, a=[1.0], b=[2.0], c=[3.0])
    out = td >> rowwise() >> mutate(s=sd(c_across([f.a, f.b, f.c])))
    assert out.collect()["s"].tolist() == pytest.approx([1.0])


def test_lvls_reorder_revalue_expand(spark):
    td = tibble(spark, x=["a", "b", "c"]) >> factor_(f.x)
    td2 = lvls_reorder(td, f.x, [2, 0, 1])
    assert levels_(td2, f.x) == ["c", "a", "b"]
    td3 = lvls_revalue(td, f.x, ["A", "B", "B2"])
    assert levels_(td3, f.x) == ["A", "B", "B2"]
    assert sorted(td3.collect()["x"].tolist()) == ["A", "B", "B2"]
    td4 = lvls_expand(td, f.x, ["a", "b", "c", "d"])
    assert levels_(td4, f.x) == ["a", "b", "c", "d"]


def test_fct_relabel(spark):
    td = tibble(spark, x=["lo", "hi"]) >> factor_(f.x)
    assert levels_(td, f.x) == ["hi", "lo"]  # default levels are sorted
    out = fct_relabel(td, f.x, str.upper)
    assert levels_(out, f.x) == ["HI", "LO"]
    assert sorted(out.collect()["x"].tolist()) == ["HI", "LO"]


def test_fct_reorder2(spark):
    # level whose y at max x is larger comes first
    td = tibble(
        spark,
        g=["a", "a", "b", "b"],
        x=[1, 2, 1, 2],
        y=[10.0, 1.0, 5.0, 99.0],
    ) >> factor_(f.g)
    out = fct_reorder2(td, f.g, f.x, f.y)
    assert levels_(out, f.g) == ["b", "a"]


def test_fct_lump_lowfreq(spark):
    # counts desc [10, 5, 1, 1]: forcats cutoff keeps levels until one
    # exceeds the remaining tail sum — 10 > 5+1+1 -> keep 'a', lump rest
    td = tibble(spark, x=["a"] * 10 + ["b"] * 5 + ["c"] * 1 + ["d"] * 1)
    out = fct_lump_lowfreq(td, f.x)
    vals = out.collect()["x"].tolist()
    assert vals.count("Other") == 7
    assert set(vals) == {"a", "Other"}


def test_fct_match_and_set_levels(spark):
    td = tibble(spark, x=["a", "b", "c"]) >> factor_(f.x)
    out = fct_match(td, f.x, ["a", "c"])
    assert out.collect()["__fct_match__"].tolist() == [True, False, True]
    with pytest.raises(ValueError):
        fct_match(td, f.x, ["z"])
    td2 = set_levels(td, f.x, ["c", "b", "a"])
    assert levels_(td2, f.x) == ["c", "b", "a"]


def test_group_by_drop_false_keeps_unused_levels(spark):
    from datar_polars_spark import fct_expand, group_by, count, summarise
    from datar_polars_spark.functions import sum_

    td = (
        tibble(spark, x=["a", "a", "b"], v=[1.0, 2.0, 3.0])
        >> factor_(f.x)
        >> fct_expand(f.x, "c")
    )
    out = (td >> group_by(f.x, _drop=False) >> count()).collect().sort_values("x")
    assert out.values.tolist() == [["a", 2], ["b", 1], ["c", 0]]
    s = (td >> group_by(f.x, _drop=False) >> summarise(s=sum_(f.v, na_rm=True)))
    got = s.collect().sort_values("x")
    assert got["x"].tolist() == ["a", "b", "c"]
    assert got["s"].isna().tolist() == [False, False, True]
    # default drops unused levels
    d = (td >> group_by(f.x) >> count()).collect()
    assert sorted(d["x"].tolist()) == ["a", "b"]


def test_fct_c_and_unify(spark):
    from datar_polars_spark.operators.factor import fct_c, fct_unify

    a = tibble(spark, x=["a", "b"]) >> factor_(f.x)
    b = tibble(spark, x=["b", "c"]) >> factor_(f.x)
    out = fct_c([a, b], f.x)
    assert levels_(out, f.x) == ["a", "b", "c"]
    assert sorted(out.collect()["x"].tolist()) == ["a", "b", "b", "c"]
    ua, ub = fct_unify([a, b], f.x)
    assert levels_(ua, f.x) == levels_(ub, f.x) == ["a", "b", "c"]


def test_bind_rows_merges_factor_levels(spark):
    from datar_polars_spark import bind_rows, fct_relevel

    a = tibble(spark, x=["lo", "hi"]) >> factor_(f.x) >> fct_relevel(f.x, "hi")
    c = tibble(spark, x=["mid"]) >> factor_(f.x)
    out = bind_rows(a, c)
    assert out.levels["x"] == ["hi", "lo", "mid"]
