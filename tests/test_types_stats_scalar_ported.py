"""Scalar/series dispatch cases ported from the reference's
tests/base/test_types.py and test_stats.py: casts, type predicates,
cov/quantile/scale/weighted_mean/diff on plain vectors, plus in-mutate
cross-checks."""

from __future__ import annotations

import math

import pytest

from datar_polars_spark import f, mutate, summarise, tibble
from datar_polars_spark.functions import (
    as_character,
    as_double,
    as_integer,
    as_logical,
    as_numeric,
    builder,
    cov,
    diff,
    is_character,
    is_double,
    is_element,
    is_false,
    is_integer,
    is_logical,
    is_true,
    quantile,
    scale,
    weighted_mean,
)

is_atomic = builder("is_atomic")


class TestCastsScalar:
    def test_as_character_scalar(self):
        assert as_character(5) == "5"

    def test_as_character_series(self):
        assert as_character([1, 2]) == ["1", "2"]

    def test_as_double_scalar(self):
        assert as_double("3.5") == 3.5

    def test_as_integer_scalar(self):
        assert as_integer("7") == 7

    def test_as_integer_list(self):
        assert as_integer([1.9, 2.1]) == [1, 2]

    def test_as_logical_scalar(self):
        assert as_logical("TRUE") is True
        assert as_logical(0) is False

    def test_as_numeric_scalar(self):
        assert as_numeric("2") == 2.0

    def test_as_numeric_str_series(self):
        assert as_numeric(["1", "2.5"]) == [1.0, 2.5]


class TestPredicatesScalar:
    def test_is_character(self):
        assert is_character("x") is True
        assert is_character(["a", "b"]) is True
        assert is_character([1]) is False

    def test_is_double(self):
        assert is_double(1.5) is True
        assert is_double(1) is False

    def test_is_integer(self):
        assert is_integer(1) is True
        assert is_integer(1.5) is False

    def test_is_logical(self):
        assert is_logical(True) is True
        assert is_logical(1) is False

    def test_is_true_false(self):
        assert is_true(True) is True
        assert is_true("TRUE") is False  # strictly boolean True
        assert is_false(False) is True
        assert is_false("FALSE") is False

    def test_is_atomic(self):
        assert is_atomic(1) is True
        assert is_atomic("x") is True
        assert is_atomic([1, 2]) is False

    def test_is_element(self):
        assert is_element(2, [1, 2]) is True
        assert is_element(9, [1, 2]) is False


class TestStatsScalar:
    def test_cov_two_vectors(self):
        assert cov([1.0, 2.0, 3.0], [2.0, 4.0, 6.0]) == pytest.approx(2.0)

    def test_quantile_single(self):
        assert quantile([1.0, 2.0, 3.0], 0.5) == pytest.approx(2.0)

    def test_quantile_multiple(self):
        out = quantile([1.0, 2.0, 3.0, 4.0], [0.25, 0.75])
        assert out == pytest.approx([1.75, 3.25])

    def test_scale_default(self):
        out = scale([1.0, 2.0, 3.0])
        assert out[1] == pytest.approx(0.0)
        assert out[0] == pytest.approx(-1.0)

    def test_scale_center_only(self):
        out = scale([1.0, 2.0, 3.0], scale_=False)
        assert out == pytest.approx([-1.0, 0.0, 1.0])

    def test_scale_noop(self):
        out = scale([1.0, 2.0], center=False, scale_=False)
        assert out == pytest.approx([1.0, 2.0])

    def test_weighted_mean(self):
        assert weighted_mean([1.0, 3.0], [1.0, 1.0]) == pytest.approx(2.0)

    def test_weighted_mean_unequal_weights(self):
        assert weighted_mean([1.0, 3.0], [3.0, 1.0]) == pytest.approx(1.5)

    def test_diff_list(self):
        # reference keeps length with leading None (test_stats.py:76-78)
        assert diff([1, 4, 9, 16]) == [None, 3, 5, 7]

    def test_diff_lag2(self):
        assert diff([1, 3, 6, 10, 15], lag=2) == [None, None, 5, 7, 9]

    def test_diff_differences2(self):
        assert diff([1, 3, 6, 10, 15], differences=2) == [None, None, 1, 1, 1]


class TestStatsInMutate:
    def test_cov_in_summarise(self, spark):
        t = tibble(spark, x=[1.0, 2.0, 3.0], y=[2.0, 4.0, 6.0])
        out = (t >> summarise(c=cov(f.x, f.y))).collect()
        assert out["c"][0] == pytest.approx(2.0)

    def test_quantile_in_summarise(self, spark):
        t = tibble(spark, x=[1.0, 2.0, 3.0])
        out = (t >> summarise(q=quantile(f.x, 0.5))).collect()
        assert out["q"][0] == pytest.approx(2.0)

    def test_weighted_mean_in_summarise(self, spark):
        t = tibble(spark, x=[1.0, 3.0], w=[3.0, 1.0])
        out = (t >> summarise(m=weighted_mean(f.x, f.w))).collect()
        assert out["m"][0] == pytest.approx(1.5)
