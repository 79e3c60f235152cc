"""Vector-level (eager) dispatch parity, ported from the reference's
tests/dplyr/test_recode.py, test_n_distinct.py, test_coalesce.py,
test_mutate_windowed.py, test_order_by.py, test_pick.py and
test_glimpse.py. The reference registers every function for both
pl.Expr and plain objects; these cover the plain-object paths plus the
windowed-mutate corners."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    f,
    group_by,
    mutate,
    pick,
    pull,
    starts_with,
    summarise,
    tibble,
    glimpse,
)
from datar_polars_spark.functions import (
    builder,
    coalesce,
    cummax,
    cummin,
    cumsum,
    lag,
    min_rank,
    n_distinct,
    recode,
    sum_,
    with_order,
    order_by,
)
from datar_polars_spark import desc

from conftest import assert_iterable_equal


# -- recode (reference test_recode.py) --------------------------------------

def test_recode_dict():
    assert recode([1, 2, 3], {1: "one", 2: "two"}) == ["one", "two", "3"]


def test_recode_pair():
    assert recode([1, 2, 3], 1, "a") == ["a", "2", "3"]


def test_recode_missing():
    assert recode([1, None, 3], 1, "a", _missing="NA_val") == ["a", "NA_val", "3"]


def test_recode_kwargs():
    assert recode(["x", "y", "z"], x="X", y="Y") == ["X", "Y", "z"]


def test_recode_default():
    assert recode([1, 2, 3], {1: "a"}, _default="other") == ["a", "other", "other"]


def test_recode_no_replacements_error():
    with pytest.raises(ValueError):
        recode([1, 2, 3])


# -- n_distinct (reference test_n_distinct.py) ------------------------------

def test_n_distinct_gives_correct_results():
    assert n_distinct([1, 2, 2, 3]) == 3
    assert n_distinct([1, 2, 3, 4]) == 4


def test_n_distinct_treats_na_correctly():
    assert n_distinct([1.0, None, None], na_rm=False) == 2
    assert n_distinct([1.0, None, None], na_rm=True) == 1


def test_n_distinct_scalar():
    assert n_distinct(4) == 1
    assert n_distinct(None, na_rm=True) == 0


def test_n_distinct_in_summarise(spark):
    d = tibble(spark, x=[1, 2, 3, 4])
    res = d >> summarise(y=sum_(f.x), n5=n_distinct(f.x))
    assert list(res.collect()["n5"]) == [4]


def test_n_distinct_with_groups(spark):
    res = (
        tibble(spark, g=[1, 1, 1, 1, 2, 2], x=[1, 2, 3, 1, 1, 2])
        >> group_by(f.g)
        >> summarise(y=sum_(f.x), n5=n_distinct(f.x))
    )
    pdf = res.collect().sort_values("g")
    assert list(pdf["n5"]) == [3, 2]


# -- coalesce (reference test_coalesce.py) ----------------------------------

def test_coalesce_missing_replaced():
    assert coalesce([None, 1], 1) == [1, 1]


def test_coalesce_common_type():
    assert coalesce(None, 1) == 1


def test_coalesce_multiple_replaces():
    x1 = [1, None, None]
    x2 = [None, 2, None]
    x3 = [None, None, 3]
    assert coalesce(x1, x2, x3) == [1, 2, 3]


def test_coalesce_no_rep():
    x = [1, 2, None, None, 5]
    assert coalesce(x) == x


# -- windowed mutate corners (reference test_mutate_windowed.py) ------------

def test_desc_correctly_handled_by_window_functions(spark):
    df = tibble(spark, x=list(range(1, 11)), y=list(range(1, 11)))
    out = df >> mutate(rank=min_rank(desc(f.x))) >> pull(f.rank)
    assert list(out) == list(range(10, 0, -1))


def test_cum_sum_min_max_works(spark):
    df = tibble(spark, x=[3, 1, 2])
    out = (
        df >> mutate(csumx=cumsum(f.x), cminx=cummin(f.x), cmaxx=cummax(f.x))
    ).collect()
    assert list(out["csumx"]) == [3, 4, 6]
    assert list(out["cminx"]) == [3, 1, 1]
    assert list(out["cmaxx"]) == [3, 3, 3]


def test_lag_handles_default_argument_in_mutate(spark):
    blah = tibble(spark, x1=[5, 10, 20, 27, 35, 58, 5, 6])
    out = (blah >> mutate(x2=f.x1 - lag(f.x1, n=1, default=0))).collect()
    assert list(out["x2"]) == [5, 5, 10, 7, 8, 23, -53, 1]


def test_min_rank_handles_columns_full_of_nas(spark):
    test = tibble(
        spark, Name=list("abcde"), ID=[1] * 5, expression=[None] * 5
    )
    data = (test >> group_by(f.ID) >> mutate(rank=min_rank(f.expression))).collect()
    assert_iterable_equal(data["rank"], [None] * 5)


# -- order_by / with_order (reference test_order_by.py) ---------------------

def test_order_by(spark):
    df = tibble(spark, x=list(range(1, 6)))
    out = df >> mutate(y=order_by(list(range(5, 0, -1)), cumsum(f.x)))
    assert_iterable_equal(out.collect()["y"], [15, 14, 12, 9, 5])


def test_with_order(spark):
    df = tibble(spark, x=[1, 2, 3, 4, 5])
    out = df >> mutate(y=with_order(list(range(5, 0, -1)), cumsum, f.x))
    assert_iterable_equal(out.collect()["y"], [15, 14, 12, 9, 5])


# -- pick (reference test_pick.py) ------------------------------------------

def test_pick_columns_from_data(spark):
    df = tibble(spark, x1=[1], y=[2], x2=[3], z=[4])
    out = df >> mutate(sel=pick(f.z, starts_with("x")))
    collected = out.collect()
    row = collected["sel"][0]
    assert "z" in row and "x1" in row and "x2" in row


def test_pick_must_supply_one_selector(spark):
    df = tibble(spark, x=[2, 3, 4])
    with pytest.raises((ValueError, TypeError)):
        (df >> mutate(y=pick())).collect()


# -- glimpse (reference test_glimpse.py) ------------------------------------

def test_glimpse_returns_object(spark):
    df = tibble(spark, x=list(range(10)), y=[str(i) for i in range(10)])
    g = df >> glimpse()
    assert len(str(g)) > 0


# -- casts / cumulative / pairwise eager dispatch (reference
# test_asis.py, test_cum.py, arithm pmin/pmax object forms) -----------------

class TestEagerCasts:
    def test_as_character(self):
        from datar_polars_spark.functions import as_character

        assert as_character([1, None, 2.5]) == ["1", None, "2.5"]

    def test_as_double_integer(self):
        from datar_polars_spark.functions import as_double, as_integer

        assert as_double("2.5") == 2.5
        assert as_integer("3") == 3
        assert as_integer(2.9) == 2

    def test_as_logical(self):
        from datar_polars_spark.functions import as_logical

        assert as_logical(["TRUE", "F", 1, 0]) == [True, False, True, False]


class TestEagerCumulative:
    def test_cumsum_prod(self):
        assert cumsum([1, 2, 3]) == [1, 3, 6]
        from datar_polars_spark.functions import cumprod

        assert cumprod([1, 2, 3]) == [1, 2, 6]

    def test_cummax_min_none(self):
        assert cummax([1, 3, 2]) == [1, 3, 3]
        assert cummin([3, 1, 2]) == [3, 1, 1]
        assert cumsum([1, None, 2]) == [1, None, 3]

    def test_cummean(self):
        from datar_polars_spark.functions import cummean

        assert cummean([2, 4, 6]) == [2.0, 3.0, 4.0]

    def test_cumall_cumany(self):
        from datar_polars_spark.functions import cumall, cumany

        assert cumall([True, True, False, True]) == [True, True, False, False]
        assert cumany([False, True, False]) == [False, True, True]


class TestEagerPairwise:
    def test_pmin_pmax(self):
        from datar_polars_spark.functions import pmax, pmin

        assert pmin([1, 5], [3, 2]) == [1, 2]
        assert pmax([1, 5], 3) == [3, 5]

    def test_match_is_element(self):
        from datar_polars_spark.functions import builder, is_element

        match = builder("match")
        assert match(["b", "z"], ["a", "b"]) == [2, None]
        assert is_element(["a", "z"], ["a", "b"]) == [True, False]

    def test_duplicated_lengths(self):
        from datar_polars_spark.functions import duplicated, lengths

        assert duplicated([1, 1, 2, 2, 3]) == [False, True, False, True, False]
        assert lengths([[1, 2], "abc", 5]) == [2, 3, 1]

    def test_all_any_na(self):
        from datar_polars_spark.functions import all_, any_

        assert all_([True, True]) is True
        assert all_([True, None]) is None
        assert all_([True, None], na_rm=True) is True
        assert any_([False, True]) is True
