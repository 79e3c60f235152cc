"""Port of reference tests/base/test_which.py (exact names). The
in-mutate cases use the table-level which_/which_min_/which_max_ verb
forms (deferred columns can't be eagerly enumerated mid-plan)."""

from __future__ import annotations

from datar_polars_spark import f, tibble
from datar_polars_spark.functions import which, which_max, which_min
from datar_polars_spark.operators.misc import which_, which_max_, which_min_


def test_which_series_bool():
    assert which([True, False, True, False]) == [1, 3]


def test_which_series_numeric():
    assert which([0, 1, 0, 2, 0]) == [2, 4]


def test_which_series_empty():
    assert which([False, False, False]) == []


def test_which_list():
    assert which([True, False, True]) == [1, 3]


def test_which_in_mutate(spark):
    td = tibble(spark, x=[3, 1, 6, 2, 5])
    assert which_(td, f.x > 3) == [3, 5]


def test_which_min_series():
    assert which_min([3, 1, 5, 1, 2]) == 2


def test_which_min_series_unique():
    assert which_min([5, 3, 1, 4, 2]) == 3


def test_which_min_list():
    assert which_min([5, 3, 1, 4, 2]) == 3


def test_which_min_in_mutate(spark):
    td = tibble(spark, x=[3, 1, 5])
    assert which_min_(td, f.x) == 2


def test_which_max_series():
    assert which_max([3, 5, 1, 5, 2]) == 2


def test_which_max_series_unique():
    assert which_max([5, 3, 1, 4, 2]) == 1


def test_which_max_list():
    assert which_max([1, 5, 3]) == 2


def test_which_max_in_mutate(spark):
    td = tibble(spark, x=[3, 1, 5])
    assert which_max_(td, f.x) == 3
