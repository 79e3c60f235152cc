"""Port of reference tests/base/test_cum.py and
tests/dplyr/test_lead_lag.py (exact names)."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, mutate, tibble
from datar_polars_spark.functions import (
    cummax,
    cummin,
    cumprod,
    cumsum,
    lag,
    lead,
)


def test_cumsum_series():
    assert cumsum([1, 2, 3, 4, 5]) == [1, 3, 6, 10, 15]


def test_cumsum_list():
    assert cumsum([1, 2, 3]) == [1, 3, 6]


def test_cumsum_in_mutate(spark):
    td = tibble(spark, x=[1, 2, 3, 4, 5])
    assert (td >> mutate(y=cumsum(f.x))).collect()["y"].tolist() == [1, 3, 6, 10, 15]


def test_cumsum_empty():
    assert cumsum([]) == []


def test_cumsum_with_nulls():
    assert cumsum([1, None, 3, None, 5])[:1] == [1]


def test_cummax_series():
    assert cummax([1, 3, 2, 5, 4]) == [1, 3, 3, 5, 5]


def test_cummax_list():
    assert cummax([3, 1, 4, 1, 5]) == [3, 3, 4, 4, 5]


def test_cummax_in_mutate(spark):
    td = tibble(spark, x=[3, 1, 4, 1, 5])
    assert (td >> mutate(y=cummax(f.x))).collect()["y"].tolist() == [3, 3, 4, 4, 5]


def test_cummin_series():
    assert cummin([3, 1, 4, 1, 5]) == [3, 1, 1, 1, 1]


def test_cummin_list():
    assert cummin([3, 1, 4, 1, 5]) == [3, 1, 1, 1, 1]


def test_cummin_in_mutate(spark):
    td = tibble(spark, x=[3, 1, 4, 1, 5])
    assert (td >> mutate(y=cummin(f.x))).collect()["y"].tolist() == [3, 1, 1, 1, 1]


def test_cumprod_series():
    assert cumprod([1, 2, 3, 4]) == [1, 2, 6, 24]


def test_cumprod_list():
    assert cumprod([2, 3, 4]) == [2, 6, 24]


def test_cumprod_in_mutate(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    assert (td >> mutate(y=cumprod(f.x))).collect()["y"].tolist() == [1, 2, 6, 24]


def test_lead_basic():
    x = [1, 2, 3]
    assert lead(x) == [2, 3, None]
    assert lead(x, n=2) == [3, None, None]
    assert lead(x, default=0) == [2, 3, 0]


def test_lag_basic():
    x = [1, 2, 3]
    assert lag(x) == [None, 1, 2]
    assert lag(x, n=2) == [None, None, 1]
    assert lag(x, default=0) == [0, 1, 2]


def test_lead_series():
    assert lead([1, 2, 3]) == [2, 3, None]


def test_lag_series():
    assert lag([1, 2, 3]) == [None, 1, 2]


def test_lead_scalar():
    assert lead(1) == [None]


def test_lag_scalar():
    assert lag(1) == [None]


def test_lead_with_default():
    assert lead([1, 2, 3], default=99) == [2, 3, 99]


def test_lag_with_default():
    assert lag([1, 2, 3], default=99) == [99, 1, 2]


def test_lead_errors():
    with pytest.raises(ValueError, match="integer"):
        lead([1, 2], n="a")
