"""Ported reference suite: tests/base/test_trig.py (66 cases across 21
functions — log/log2/log10/exp/log1p, sin/cos/tan + inverse + hyperbolic
+ inverse-hyperbolic, atan2, cospi/sinpi/tanpi).

The reference exercises each function in scalar, Series, and mutate
form; this API is column-deferred-only, so each ported test pins the
same expected values through ``mutate`` (the three reference forms
assert identical numbers).
"""

from __future__ import annotations

import math

import pytest

from datar_polars_spark import f, tibble, mutate
from datar_polars_spark.functions import (
    log,
    log2,
    log10,
    exp,
    log1p,
    acos,
    acosh,
    asin,
    asinh,
    atan,
    atanh,
    atan2,
    cos,
    cosh,
    cospi,
    sin,
    sinh,
    sinpi,
    tan,
    tanh,
    tanpi,
)


def _vals(spark, xs, expr):
    td = tibble(spark, x=[float(v) for v in xs])
    return (td >> mutate(y=expr)).collect()["y"].tolist()


class TestLogFamily:
    def test_log_natural(self, spark):
        assert _vals(spark, [1.0, math.e, math.e**2], log(f.x)) == pytest.approx(
            [0.0, 1.0, 2.0]
        )

    def test_log_base2(self, spark):
        assert _vals(spark, [8.0], log(f.x, base=2)) == pytest.approx([3.0])

    def test_log_base10(self, spark):
        assert _vals(spark, [100.0], log(f.x, base=10)) == pytest.approx([2.0])

    def test_log2(self, spark):
        assert _vals(spark, [1.0, 2.0, 4.0, 8.0], log2(f.x)) == pytest.approx(
            [0.0, 1.0, 2.0, 3.0]
        )

    def test_log10(self, spark):
        assert _vals(spark, [1.0, 10.0, 100.0], log10(f.x)) == pytest.approx(
            [0.0, 1.0, 2.0]
        )

    def test_exp(self, spark):
        assert _vals(spark, [0.0, 1.0, 2.0], exp(f.x)) == pytest.approx(
            [1.0, math.e, math.e**2]
        )

    def test_log1p(self, spark):
        assert _vals(spark, [0.0, math.e - 1], log1p(f.x)) == pytest.approx(
            [0.0, 1.0]
        )


class TestCircular:
    def test_cos(self, spark):
        assert _vals(spark, [0.0, math.pi], cos(f.x)) == pytest.approx([1.0, -1.0])

    def test_sin(self, spark):
        assert _vals(spark, [0.0, math.pi / 2], sin(f.x)) == pytest.approx([0.0, 1.0])

    def test_tan(self, spark):
        assert _vals(spark, [0.0, math.pi / 4], tan(f.x)) == pytest.approx([0.0, 1.0])

    def test_acos(self, spark):
        assert _vals(spark, [1.0, 0.0], acos(f.x)) == pytest.approx(
            [0.0, math.pi / 2]
        )

    def test_asin(self, spark):
        assert _vals(spark, [0.0, 1.0], asin(f.x)) == pytest.approx(
            [0.0, math.pi / 2]
        )

    def test_atan(self, spark):
        assert _vals(spark, [0.0, 1.0], atan(f.x)) == pytest.approx(
            [0.0, math.pi / 4]
        )

    def test_atan2(self, spark):
        td = tibble(spark, y=[0.0, 1.0, 1.0], x=[1.0, 1.0, math.sqrt(3)])
        got = (td >> mutate(z=atan2(f.y, f.x))).collect()["z"].tolist()
        assert got == pytest.approx([0.0, math.pi / 4, math.pi / 6])


class TestHyperbolic:
    def test_cosh(self, spark):
        assert _vals(spark, [0.0, 1.0], cosh(f.x)) == pytest.approx(
            [1.0, math.cosh(1.0)]
        )

    def test_sinh(self, spark):
        assert _vals(spark, [0.0, 1.0], sinh(f.x)) == pytest.approx(
            [0.0, math.sinh(1.0)]
        )

    def test_tanh(self, spark):
        assert _vals(spark, [0.0, 1.0], tanh(f.x)) == pytest.approx(
            [0.0, math.tanh(1.0)]
        )

    def test_acosh(self, spark):
        assert _vals(spark, [1.0, 2.0], acosh(f.x)) == pytest.approx(
            [0.0, math.acosh(2.0)]
        )

    def test_asinh(self, spark):
        assert _vals(spark, [0.0, 1.0], asinh(f.x)) == pytest.approx(
            [0.0, math.asinh(1.0)]
        )

    def test_atanh(self, spark):
        assert _vals(spark, [0.0, 0.5], atanh(f.x)) == pytest.approx(
            [0.0, math.atanh(0.5)]
        )


class TestPiVariants:
    def test_cospi(self, spark):
        got = _vals(spark, [0.0, 0.5, 1.0], cospi(f.x))
        assert got == pytest.approx([1.0, 0.0, -1.0])
        # R returns EXACT 0 at half-integers (not ~6e-17)
        assert got[1] == 0.0

    def test_sinpi(self, spark):
        got = _vals(spark, [0.0, 0.5, 1.0], sinpi(f.x))
        assert got == pytest.approx([0.0, 1.0, 0.0], abs=1e-8)
        # exact zeros at integers
        assert got[0] == 0.0 and got[2] == 0.0

    def test_tanpi(self, spark):
        got = _vals(spark, [0.0, 1.0], tanpi(f.x))
        assert got == [0.0, 0.0]

    def test_tanpi_pole_is_na(self, spark):
        # R: tanpi(0.5) is NaN (pole); we map it to NULL/NA
        td = tibble(spark, x=[0.5])
        got = (td >> mutate(y=tanpi(f.x))).collect()
        assert got["y"].isna().all()

    def test_negative_inputs(self, spark):
        got = _vals(spark, [-0.5, -1.0, -1.5], cospi(f.x))
        assert got == pytest.approx([0.0, -1.0, 0.0])
        assert got[0] == 0.0 and got[2] == 0.0
        got = _vals(spark, [-1.0, -2.0], sinpi(f.x))
        assert got == [0.0, 0.0]


class TestDomainEdges:
    """R semantics: out-of-domain inverse trig yields NaN (NA here)."""

    def test_acos_out_of_domain(self, spark):
        td = tibble(spark, x=[2.0])
        assert (td >> mutate(y=acos(f.x))).collect()["y"].isna().all()

    def test_atanh_out_of_domain(self, spark):
        td = tibble(spark, x=[2.0])
        assert (td >> mutate(y=atanh(f.x))).collect()["y"].isna().all()

    def test_null_propagates(self, spark):
        td = tibble(spark, x=[None, 1.0])
        got = (td >> mutate(a=sin(f.x), b=acosh(f.x), c=cospi(f.x))).collect()
        assert got["a"].isna().tolist() == [True, False]
        assert got["b"].isna().tolist() == [True, False]
        assert got["c"].isna().tolist() == [True, False]


# -- scalar / list dispatch (reference test_trig.py *_scalar/*_series
# forms; exercises functions/eager.py rather than the column compilers) ----

class TestTrigScalarDispatch:
    def test_log_scalar_default(self):
        assert log(math.e) == pytest.approx(1.0)

    def test_log_scalar_base2(self):
        assert log(8, 2) == pytest.approx(3.0)

    def test_log_scalar_base10(self):
        assert log(1000, 10) == pytest.approx(3.0)

    def test_log2_scalar(self):
        assert log2(8) == pytest.approx(3.0)

    def test_log10_scalar(self):
        assert log10(100) == pytest.approx(2.0)

    def test_exp_scalar(self):
        assert exp(1.0) == pytest.approx(math.e)
        assert exp(0.0) == pytest.approx(1.0)

    def test_log1p_scalar(self):
        assert log1p(0.0) == pytest.approx(0.0)
        assert log1p(math.e - 1) == pytest.approx(1.0)

    def test_cos_scalar(self):
        assert cos(0.0) == pytest.approx(1.0)
        assert cos(math.pi) == pytest.approx(-1.0)

    def test_sin_scalar(self):
        assert sin(0.0) == pytest.approx(0.0)
        assert sin(math.pi / 2) == pytest.approx(1.0)

    def test_tan_scalar(self):
        assert tan(0.0) == pytest.approx(0.0)
        assert tan(math.pi / 4) == pytest.approx(1.0)

    def test_cosh_sinh_tanh_scalar(self):
        assert cosh(0.0) == pytest.approx(1.0)
        assert sinh(0.0) == pytest.approx(0.0)
        assert tanh(0.0) == pytest.approx(0.0)

    def test_acos_asin_atan_scalar(self):
        assert acos(1.0) == pytest.approx(0.0)
        assert asin(1.0) == pytest.approx(math.pi / 2)
        assert atan(1.0) == pytest.approx(math.pi / 4)

    def test_acos_out_of_domain_nan(self):
        assert math.isnan(acos(2.0))
        assert math.isnan(asin(-2.0))

    def test_acosh_asinh_atanh_scalar(self):
        assert acosh(1.0) == pytest.approx(0.0)
        assert asinh(0.0) == pytest.approx(0.0)
        assert atanh(0.0) == pytest.approx(0.0)
        assert math.isnan(acosh(0.5))

    def test_atan2_scalar(self):
        assert atan2(1.0, 1.0) == pytest.approx(math.pi / 4)
        assert atan2(0.0, 1.0) == pytest.approx(0.0)

    def test_pi_variants_scalar(self):
        assert cospi(1.0) == pytest.approx(-1.0)
        assert sinpi(0.5) == pytest.approx(1.0)
        assert tanpi(0.25) == pytest.approx(1.0)

    def test_series_forms(self):
        assert sin([0.0, math.pi / 2]) == pytest.approx([0.0, 1.0])
        assert cos([0.0, math.pi]) == pytest.approx([1.0, -1.0])
        assert log([1.0, math.e]) == pytest.approx([0.0, 1.0])
        assert exp([0.0, 1.0]) == pytest.approx([1.0, math.e])

    def test_series_none_propagates(self):
        out = sin([0.0, None])
        assert out[0] == pytest.approx(0.0) and out[1] is None
