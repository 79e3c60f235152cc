"""Port of reference tests/dplyr/test_funs.py (exact names; starwars
cases omitted — dataset not bundled)."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, filter_, group_by, mutate, pull, summarise, tibble
from datar_polars_spark.functions import between, coalesce, if_else, n, na_if, rnorm


def test_n_in_summarise(spark):
    td = tibble(spark, x=[1, 2, 3])
    assert (td >> summarise(cnt=n())).collect()["cnt"].tolist() == [3]


def test_n_in_mutate(spark):
    td = tibble(spark, x=[1, 2, 3])
    assert (td >> mutate(cnt=n())).collect()["cnt"].tolist() == [3, 3, 3]


def test_n_grouped(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3]) >> group_by(f.g)
    out = (td >> summarise(cnt=n())).collect().sort_values("g")
    assert out["cnt"].tolist() == [2, 1]


def test_between_in_filter(spark):
    td = tibble(spark, x=[1, 2, 3, 4, 5])
    assert (td >> filter_(between(f.x, 2, 4))).collect()["x"].tolist() == [2, 3, 4]


def test_between_scalar():
    assert between(3, 1, 5) is True
    assert between(0, 1, 5) is False


def test_between_range():
    assert between(range(1, 13), 7, 9) == [False] * 6 + [True] * 3 + [False] * 3


def test_between_rnorm():
    x = rnorm(100)
    mask = between(x, -1, 1)
    result = [v for v, m in zip(x, mask) if m]
    assert all(-1 <= v <= 1 for v in result)
    assert len(result) < 100


def test_coalesce_in_mutate(spark):
    td = tibble(spark, a=[1, None, 3], b=[4, 5, None])
    assert (td >> mutate(y=coalesce(f.a, f.b))).collect()["y"].tolist() == [1, 5, 3]


def test_coalesce_in_mutate2(spark):
    td = tibble(spark, x=[5, 4, 3, None, 2, None, 1, None])
    out = td >> mutate(y=coalesce(f.x, 0)) >> pull(f.y)
    assert list(out) == [5, 4, 3, 0, 2, 0, 1, 0]


def test_na_if_in_mutate(spark):
    import math

    td = tibble(spark, x=[1, 2, 3, 2])
    vals = (td >> mutate(y=na_if(f.x, 2))).collect()["y"].tolist()
    assert vals[0] == 1 and vals[2] == 3
    assert all(v is None or math.isnan(v) for v in (vals[1], vals[3]))


def test_na_if_with_range():
    assert na_if(range(5), list(range(4, -1, -1))) == [0, 1, None, 3, 4]


def test_if_else_chain(spark):
    td = tibble(spark, x=[-2, 0, 5])
    out = (
        td
        >> mutate(y=if_else(f.x < 0, "neg", if_else(f.x == 0, "zero", "pos")))
    ).collect()
    assert out["y"].tolist() == ["neg", "zero", "pos"]
