"""Scalar/series dispatch cases ported from the reference's
tests/base/test_arithm.py (mod/pmin/pmax/sign/signif/trunc) and
tests/base/test_seq.py (rep/rev/length/sample) — plus the in-mutate
forms cross-checked against the eager results."""

from __future__ import annotations

import math

import pytest

from datar_polars_spark import f, mutate, tibble
from datar_polars_spark.functions import (
    builder,
    length,
    pmax,
    pmin,
    rep,
    rev_list,
    sample_list,
    sign,
    signif,
    trunc,
)

mod = builder("mod")


class TestMod:
    def test_mod_positive_scalar(self):
        assert mod(7, 3) == 1

    def test_mod_negative_scalar(self):
        # R %% is floored division: -7 %% 3 == 2
        assert mod(-7, 3) == 2

    def test_mod_float(self):
        assert mod(7.5, 2) == pytest.approx(1.5)

    def test_mod_series(self):
        assert mod([7, 8, 9], 3) == [1, 2, 0]

    def test_mod_in_mutate(self, spark):
        t = tibble(spark, x=[7, -7])
        out = (t >> mutate(m=mod(f.x, 3))).collect()
        assert list(out["m"]) == [1, 2]


class TestPminPmax:
    def test_pmin_scalars(self):
        assert pmin(3, 5) == 3

    def test_pmax_scalars(self):
        assert pmax(3, 5) == 5

    def test_pmin_series(self):
        assert pmin([1, 5, 3], [2, 2, 2]) == [1, 2, 2]

    def test_pmax_three_series(self):
        assert pmax([1, 2], [3, 1], [2, 2]) == [3, 2]

    def test_pmin_in_mutate(self, spark):
        t = tibble(spark, x=[1.0, 5.0])
        out = (t >> mutate(m=pmin(f.x, 3.0))).collect()
        assert list(out["m"]) == [1.0, 3.0]

    def test_pmax_in_mutate(self, spark):
        t = tibble(spark, x=[1.0, 5.0])
        out = (t >> mutate(m=pmax(f.x, 3.0))).collect()
        assert list(out["m"]) == [3.0, 5.0]


class TestSignSignifTrunc:
    def test_sign_scalars(self):
        assert sign(5) == 1.0
        assert sign(-5) == -1.0
        assert sign(0) == 0.0

    def test_sign_series(self):
        assert sign([-2, 0, 3]) == [-1.0, 0.0, 1.0]

    def test_signif_digits(self):
        assert signif(123456.0, 2) == pytest.approx(120000.0)
        assert signif(123456.0, 3) == pytest.approx(123000.0)
        assert signif(0.0012345, 2) == pytest.approx(0.0012)

    def test_signif_zero(self):
        assert signif(0.0, 3) == 0.0

    def test_trunc_scalars(self):
        assert trunc(2.7) == 2.0
        assert trunc(-2.7) == -2.0
        assert trunc(0.0) == 0.0

    def test_trunc_series(self):
        assert trunc([1.9, -1.9]) == [1.0, -1.0]


class TestSeqHelpers:
    def test_rep_times(self):
        assert rep([1, 2], times=2) == [1, 2, 1, 2]

    def test_rep_each(self):
        assert rep([1, 2], each=2) == [1, 1, 2, 2]

    def test_rep_length(self):
        assert rep([1, 2], length=5) == [1, 2, 1, 2, 1]

    def test_rev_list(self):
        assert rev_list([1, 2, 3]) == [3, 2, 1]
        assert rev_list([]) == []

    def test_length_forms(self):
        assert length([1, 2, 3]) == 3
        assert length([]) == 0
        assert length(5) == 1

    def test_sample_no_replace_is_permutation(self):
        out = sample_list([1, 2, 3], seed=42)
        assert sorted(out) == [1, 2, 3]

    def test_sample_size(self):
        out = sample_list(list(range(10)), size=3, seed=1)
        assert len(out) == 3
