"""Ported from reference tests/base/test_funs.py and
tests/dplyr/test_funs.py — scalar dispatch of the conditional and
positional functions plus the mutate/summarise/filter forms not
already covered elsewhere.
"""

from datar_polars_spark import f, filter_, mutate, pull, summarise, tibble
from datar_polars_spark.functions import (
    between,
    coalesce,
    first,
    if_else,
    last,
    n,
    na_if,
    nth,
)

from conftest import assert_iterable_equal


class TestIfElse:
    def test_if_else_in_mutate(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4])
        out = (td >> mutate(y=if_else(f.x > 2, "high", "low"))).collect()
        assert out["y"].tolist() == ["low", "low", "high", "high"]

    def test_if_else_scalar(self):
        assert if_else(True, 1, 2) == 1
        assert if_else(False, 1, 2) == 2

    def test_if_else_with_missing(self, spark):
        td = tibble(spark, x=[1.0, None, 3.0])
        out = (td >> mutate(y=if_else(f.x > 1, f.x, 0, missing=99))).collect()
        assert out["y"].tolist() == [0.0, 99.0, 3.0]


class TestCoalesce:
    def test_coalesce_scalar(self):
        assert coalesce(None, None, 42) == 42
        assert coalesce(None, None) is None

    def test_coalesce_with_literal_default(self, spark):
        td = tibble(spark, x=[5.0, 4.0, 3.0, None, 2.0, None, 1.0, None])
        out = td >> mutate(y=coalesce(f.x, 0)) >> pull(f.y)
        assert list(out) == [5, 4, 3, 0, 2, 0, 1, 0]


class TestNaIf:
    def test_na_if_scalar(self):
        assert na_if(5, 5) is None
        assert na_if(5, 3) == 5

    def test_na_if_elementwise_lists(self):
        out = na_if(range(5), list(range(4, -1, -1)))
        assert out == [0, 1, None, 3, 4]


class TestNth:
    def test_nth_in_summarise(self, spark):
        td = tibble(spark, x=[10, 20, 30])
        out = (td >> summarise(y=nth(f.x, 1))).collect()
        assert out["y"].tolist() == [20]

    def test_nth_scalar(self):
        assert nth([10, 20, 30], 0) == 10
        assert nth([10, 20, 30], 2) == 30

    def test_nth_out_of_bounds(self):
        assert nth([10, 20], 10, default=999) == 999


class TestFirstLast:
    def test_first_in_summarise(self, spark):
        td = tibble(spark, x=[10, 20, 30])
        out = (td >> summarise(y=first(f.x))).collect()
        assert out["y"].tolist() == [10]

    def test_first_scalar(self):
        assert first([10, 20, 30]) == 10
        assert first([], default=999) == 999

    def test_last_in_summarise(self, spark):
        td = tibble(spark, x=[10, 20, 30])
        out = (td >> summarise(y=last(f.x))).collect()
        assert out["y"].tolist() == [30]

    def test_last_scalar(self):
        assert last([10, 20, 30]) == 30
        assert last([], default=999) == 999

    def test_last_with_order_by(self):
        # reference TestLast::test_last_with_2 — last of x ordered by y
        assert last(range(10), range(9, -1, -1)) == 0


class TestBetween:
    def test_between_in_filter(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4, 5])
        out = (td >> filter_(between(f.x, 2, 4))).collect()
        assert out["x"].tolist() == [2, 3, 4]

    def test_between_scalar(self):
        assert between(3, 1, 5) is True
        assert between(0, 1, 5) is False

    def test_between_range(self):
        assert between(range(1, 13), 7, 9) == [False] * 6 + [True] * 3 + [False] * 3

    def test_between_exclusive(self):
        assert between(1, 1, 5, inclusive="right") is False
        assert between(1, 1, 5, inclusive="neither") is False

    def test_between_exclusive_in_mutate(self, spark):
        td = tibble(spark, x=[1, 3, 5])
        out = (
            td >> mutate(y=between(f.x, 1, 5, inclusive="neither"))
        ).collect()
        assert out["y"].tolist() == [False, True, False]


class TestN:
    def test_n_in_summarise(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = (td >> summarise(c=n())).collect()
        assert out["c"].tolist() == [3]
