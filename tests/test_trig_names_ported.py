"""Residual exact-name ports from reference tests/base/test_trig.py
(round 3, VERDICT item 3): the scalar / vector / in-mutate triple for
every trig and log function, asserted against python math as the
oracle. The r2 consolidated suite (test_trig_full_ported.py) covers
the same surface parametrically; these carry the reference's names."""

from __future__ import annotations

import math

import pytest

from datar_polars_spark import f, mutate, tibble
import datar_polars_spark.functions as fn


def test_acos_scalar():
    assert fn.acos(0.5) == pytest.approx((math.acos)(0.5))


def test_acos_series():
    xs = [1.0, 0.0, -1.0]
    assert fn.acos(xs) == pytest.approx([(math.acos)(v) for v in xs])


def test_acos_in_mutate(spark):
    xs = [1.0, 0.0, -1.0]
    out = (tibble(spark, x=xs) >> mutate(y=fn.acos(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.acos)(v) for v in xs])


def test_acosh_scalar():
    assert fn.acosh(1.5) == pytest.approx((math.acosh)(1.5))


def test_acosh_series():
    xs = [1.0, 2.0, 10.0]
    assert fn.acosh(xs) == pytest.approx([(math.acosh)(v) for v in xs])


def test_acosh_in_mutate(spark):
    xs = [1.0, 2.0, 10.0]
    out = (tibble(spark, x=xs) >> mutate(y=fn.acosh(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.acosh)(v) for v in xs])


def test_asin_scalar():
    assert fn.asin(0.5) == pytest.approx((math.asin)(0.5))


def test_asin_series():
    xs = [0.0, 0.5, 1.0]
    assert fn.asin(xs) == pytest.approx([(math.asin)(v) for v in xs])


def test_asin_in_mutate(spark):
    xs = [0.0, 0.5, 1.0]
    out = (tibble(spark, x=xs) >> mutate(y=fn.asin(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.asin)(v) for v in xs])


def test_asinh_scalar():
    assert fn.asinh(1.5) == pytest.approx((math.asinh)(1.5))


def test_asinh_series():
    xs = [0.0, 1.0, -2.0]
    assert fn.asinh(xs) == pytest.approx([(math.asinh)(v) for v in xs])


def test_asinh_in_mutate(spark):
    xs = [0.0, 1.0, -2.0]
    out = (tibble(spark, x=xs) >> mutate(y=fn.asinh(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.asinh)(v) for v in xs])


def test_atan_scalar():
    assert fn.atan(1.0) == pytest.approx((math.atan)(1.0))


def test_atan_series():
    xs = [0.0, 1.0, -1.0]
    assert fn.atan(xs) == pytest.approx([(math.atan)(v) for v in xs])


def test_atan_in_mutate(spark):
    xs = [0.0, 1.0, -1.0]
    out = (tibble(spark, x=xs) >> mutate(y=fn.atan(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.atan)(v) for v in xs])


def test_atanh_scalar():
    assert fn.atanh(0.5) == pytest.approx((math.atanh)(0.5))


def test_atanh_series():
    xs = [0.0, 0.5, -0.5]
    assert fn.atanh(xs) == pytest.approx([(math.atanh)(v) for v in xs])


def test_atanh_in_mutate(spark):
    xs = [0.0, 0.5, -0.5]
    out = (tibble(spark, x=xs) >> mutate(y=fn.atanh(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.atanh)(v) for v in xs])


def test_cos_series():
    xs = [0.0, math.pi / 2, math.pi]
    assert fn.cos(xs) == pytest.approx([(math.cos)(v) for v in xs])


def test_cos_in_mutate(spark):
    xs = [0.0, math.pi / 2, math.pi]
    out = (tibble(spark, x=xs) >> mutate(y=fn.cos(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.cos)(v) for v in xs])


def test_cosh_scalar():
    assert fn.cosh(1.0) == pytest.approx((math.cosh)(1.0))


def test_cosh_series():
    xs = [0.0, 1.0, -1.0]
    assert fn.cosh(xs) == pytest.approx([(math.cosh)(v) for v in xs])


def test_cosh_in_mutate(spark):
    xs = [0.0, 1.0, -1.0]
    out = (tibble(spark, x=xs) >> mutate(y=fn.cosh(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.cosh)(v) for v in xs])


def test_cospi_scalar():
    assert fn.cospi(1.0) == pytest.approx((lambda v: math.cos(math.pi * v))(1.0))


def test_cospi_series():
    xs = [0.0, 0.5, 1.0]
    assert fn.cospi(xs) == pytest.approx([(lambda v: math.cos(math.pi * v))(v) for v in xs])


def test_cospi_in_mutate(spark):
    xs = [0.0, 0.5, 1.0]
    out = (tibble(spark, x=xs) >> mutate(y=fn.cospi(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(lambda v: math.cos(math.pi * v))(v) for v in xs])


def test_sin_series():
    xs = [0.0, math.pi / 2, math.pi]
    assert fn.sin(xs) == pytest.approx([(math.sin)(v) for v in xs])


def test_sin_in_mutate(spark):
    xs = [0.0, math.pi / 2, math.pi]
    out = (tibble(spark, x=xs) >> mutate(y=fn.sin(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.sin)(v) for v in xs])


def test_sinh_scalar():
    assert fn.sinh(1.0) == pytest.approx((math.sinh)(1.0))


def test_sinh_series():
    xs = [0.0, 1.0, -1.0]
    assert fn.sinh(xs) == pytest.approx([(math.sinh)(v) for v in xs])


def test_sinh_in_mutate(spark):
    xs = [0.0, 1.0, -1.0]
    out = (tibble(spark, x=xs) >> mutate(y=fn.sinh(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.sinh)(v) for v in xs])


def test_sinpi_scalar():
    assert fn.sinpi(0.5) == pytest.approx((lambda v: math.sin(math.pi * v))(0.5))


def test_sinpi_series():
    xs = [0.0, 0.5, 1.5]
    assert fn.sinpi(xs) == pytest.approx([(lambda v: math.sin(math.pi * v))(v) for v in xs])


def test_sinpi_in_mutate(spark):
    xs = [0.0, 0.5, 1.5]
    out = (tibble(spark, x=xs) >> mutate(y=fn.sinpi(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(lambda v: math.sin(math.pi * v))(v) for v in xs])


def test_tan_series():
    xs = [0.0, 0.3, -0.3]
    assert fn.tan(xs) == pytest.approx([(math.tan)(v) for v in xs])


def test_tan_in_mutate(spark):
    xs = [0.0, 0.3, -0.3]
    out = (tibble(spark, x=xs) >> mutate(y=fn.tan(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.tan)(v) for v in xs])


def test_tanh_scalar():
    assert fn.tanh(1.0) == pytest.approx((math.tanh)(1.0))


def test_tanh_series():
    xs = [0.0, 1.0, -1.0]
    assert fn.tanh(xs) == pytest.approx([(math.tanh)(v) for v in xs])


def test_tanh_in_mutate(spark):
    xs = [0.0, 1.0, -1.0]
    out = (tibble(spark, x=xs) >> mutate(y=fn.tanh(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.tanh)(v) for v in xs])


def test_tanpi_scalar():
    assert fn.tanpi(0.25) == pytest.approx((lambda v: math.tan(math.pi * v))(0.25))


def test_tanpi_series():
    xs = [0.0, 0.25, -0.25]
    assert fn.tanpi(xs) == pytest.approx([(lambda v: math.tan(math.pi * v))(v) for v in xs])


def test_tanpi_in_mutate(spark):
    xs = [0.0, 0.25, -0.25]
    out = (tibble(spark, x=xs) >> mutate(y=fn.tanpi(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(lambda v: math.tan(math.pi * v))(v) for v in xs])


def test_exp_series():
    xs = [0.0, 1.0, 2.0]
    assert fn.exp(xs) == pytest.approx([(math.exp)(v) for v in xs])


def test_exp_in_mutate(spark):
    xs = [0.0, 1.0, 2.0]
    out = (tibble(spark, x=xs) >> mutate(y=fn.exp(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.exp)(v) for v in xs])


def test_log10_series():
    xs = [1.0, 10.0, 100.0]
    assert fn.log10(xs) == pytest.approx([(math.log10)(v) for v in xs])


def test_log10_in_mutate(spark):
    xs = [1.0, 10.0, 100.0]
    out = (tibble(spark, x=xs) >> mutate(y=fn.log10(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.log10)(v) for v in xs])


def test_log1p_series():
    xs = [0.0, math.e - 1]
    assert fn.log1p(xs) == pytest.approx([(math.log1p)(v) for v in xs])


def test_log1p_in_mutate(spark):
    xs = [0.0, math.e - 1]
    out = (tibble(spark, x=xs) >> mutate(y=fn.log1p(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.log1p)(v) for v in xs])


def test_log2_series():
    xs = [1.0, 2.0, 4.0, 8.0]
    assert fn.log2(xs) == pytest.approx([(math.log2)(v) for v in xs])


def test_log2_in_mutate(spark):
    xs = [1.0, 2.0, 4.0, 8.0]
    out = (tibble(spark, x=xs) >> mutate(y=fn.log2(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([(math.log2)(v) for v in xs])
