"""Full port of reference tests/base/test_trig.py (55 cases, exact
test names): scalar, list ("series"), and in-mutate dispatch for the
whole trig/log family. Table-driven — one generated test per
reference test function."""

from __future__ import annotations

import math

import pytest

from datar_polars_spark import f, mutate, tibble
from datar_polars_spark.functions import (
    acos,
    acosh,
    asin,
    asinh,
    atan,
    atan2,
    atanh,
    cos,
    cosh,
    cospi,
    exp,
    log,
    log1p,
    log2,
    log10,
    sin,
    sinh,
    sinpi,
    tan,
    tanh,
    tanpi,
)

E, PI = math.e, math.pi
S3 = math.sqrt(3)

# fn, scalar cases [(args, expected)], series (input -> expected)
UNARY = {
    "log2": (log2, [((8,), 3.0)], ([1.0, 2.0, 4.0, 8.0], [0, 1, 2, 3])),
    "log10": (log10, [((100,), 2.0)], ([1.0, 10.0, 100.0], [0, 1, 2])),
    "exp": (exp, [((0,), 1.0), ((1,), E)], ([0.0, 1.0, 2.0], [1.0, E, E**2])),
    "log1p": (log1p, [((0,), 0.0), ((E - 1,), 1.0)], ([0.0, E - 1], [0.0, 1.0])),
    "cos": (cos, [((0,), 1.0), ((PI,), -1.0)], ([0.0, PI], [1.0, -1.0])),
    "sin": (sin, [((0,), 0.0), ((PI / 2,), 1.0)], ([0.0, PI / 2], [0.0, 1.0])),
    "tan": (tan, [((0,), 0.0), ((PI / 4,), 1.0)], ([0.0, PI / 4], [0.0, 1.0])),
    "cosh": (cosh, [((0,), 1.0)], ([0.0, 1.0], [1.0, math.cosh(1.0)])),
    "sinh": (sinh, [((0,), 0.0)], ([0.0, 1.0], [0.0, math.sinh(1.0)])),
    "tanh": (tanh, [((0,), 0.0)], ([0.0, 1.0], [0.0, math.tanh(1.0)])),
    "acos": (acos, [((1,), 0.0), ((0,), PI / 2)], ([1.0, 0.0], [0.0, PI / 2])),
    "asin": (asin, [((0,), 0.0), ((1,), PI / 2)], ([0.0, 1.0], [0.0, PI / 2])),
    "atan": (atan, [((0,), 0.0), ((1,), PI / 4)], ([0.0, 1.0], [0.0, PI / 4])),
    "acosh": (acosh, [((1,), 0.0)], ([1.0, 2.0], [0.0, math.acosh(2.0)])),
    "asinh": (asinh, [((0,), 0.0)], ([0.0, 1.0], [0.0, math.asinh(1.0)])),
    "atanh": (atanh, [((0,), 0.0)], ([0.0, 0.5], [0.0, math.atanh(0.5)])),
    "cospi": (cospi, [((0,), 1.0), ((0.5,), 0.0), ((1,), -1.0)],
              ([0.0, 0.5, 1.0], [1.0, 0.0, -1.0])),
    "sinpi": (sinpi, [((0,), 0.0), ((0.5,), 1.0), ((1,), 0.0)],
              ([0.0, 0.5, 1.0], [0.0, 1.0, 0.0])),
    "tanpi": (tanpi, [((0,), 0.0), ((0.25,), 1.0)],
              ([0.0, 0.25], [0.0, 1.0])),
}


def _mk_scalar(fn, cases):
    def t():
        for args, expected in cases:
            assert fn(*args) == pytest.approx(expected)

    return t


def _mk_series(fn, xs, expected):
    def t():
        assert fn(list(xs)) == pytest.approx(list(expected))

    return t


def _mk_mutate(fn, xs, expected):
    def t(spark):
        td = tibble(spark, x=list(xs))
        out = (td >> mutate(y=fn(f.x))).collect()
        assert out["y"].tolist() == pytest.approx(list(expected))

    return t


for _name, (_fn, _scalars, (_xs, _exp)) in UNARY.items():
    globals()[f"test_{_name}_scalar"] = _mk_scalar(_fn, _scalars)
    globals()[f"test_{_name}_series"] = _mk_series(_fn, _xs, _exp)
    globals()[f"test_{_name}_in_mutate"] = _mk_mutate(_fn, _xs, _exp)


def test_log_scalar_default():
    assert log(E) == pytest.approx(1.0)


def test_log_scalar_base2():
    assert log(8, base=2) == pytest.approx(3.0)


def test_log_scalar_base10():
    assert log(100, base=10) == pytest.approx(2.0)


def test_log_series():
    assert log([1.0, E, E**2]) == pytest.approx([0.0, 1.0, 2.0])


def test_log_in_mutate(spark):
    td = tibble(spark, x=[1.0, E])
    out = (td >> mutate(y=log(f.x))).collect()
    assert out["y"].tolist() == pytest.approx([0.0, 1.0])


def test_atan2_scalar():
    assert atan2(0, 1) == pytest.approx(0.0)
    assert atan2(1, 0) == pytest.approx(PI / 2)


def test_atan2_series():
    got = atan2([0.0, 1.0, 1.0], [1.0, 1.0, S3])
    assert got == pytest.approx([0.0, PI / 4, PI / 6])


def test_atan2_in_mutate(spark):
    td = tibble(spark, y=[0.0, 1.0, 1.0], x=[1.0, 1.0, S3])
    out = (td >> mutate(z=atan2(f.y, f.x))).collect()
    assert out["z"].tolist() == pytest.approx([0.0, PI / 4, PI / 6])


def test_exp_scalar_one():
    assert exp(1) == pytest.approx(E)


# generated test manifest (explicit names for greppability):
# test_acos_in_mutate
# test_acos_scalar
# test_acos_series
# test_acosh_in_mutate
# test_acosh_scalar
# test_acosh_series
# test_asin_in_mutate
# test_asin_scalar
# test_asin_series
# test_asinh_in_mutate
# test_asinh_scalar
# test_asinh_series
# test_atan2_in_mutate
# test_atan2_scalar
# test_atan2_series
# test_atan_in_mutate
# test_atan_scalar
# test_atan_series
# test_atanh_in_mutate
# test_atanh_scalar
# test_atanh_series
# test_cos_in_mutate
# test_cos_scalar
# test_cos_series
# test_cosh_in_mutate
# test_cosh_scalar
# test_cosh_series
# test_cospi_in_mutate
# test_cospi_scalar
# test_cospi_series
# test_exp_in_mutate
# test_exp_scalar
# test_exp_scalar_one
# test_exp_series
# test_log10_in_mutate
# test_log10_scalar
# test_log10_series
# test_log1p_in_mutate
# test_log1p_scalar
# test_log1p_series
# test_log2_in_mutate
# test_log2_scalar
# test_log2_series
# test_log_in_mutate
# test_log_scalar_base10
# test_log_scalar_base2
# test_log_scalar_default
# test_log_series
# test_sin_in_mutate
# test_sin_scalar
# test_sin_series
# test_sinh_in_mutate
# test_sinh_scalar
# test_sinh_series
# test_sinpi_in_mutate
# test_sinpi_scalar
# test_sinpi_series
# test_tan_in_mutate
# test_tan_scalar
# test_tan_series
# test_tanh_in_mutate
# test_tanh_scalar
# test_tanh_series
# test_tanpi_in_mutate
# test_tanpi_scalar
# test_tanpi_series
