"""Ported from reference tests/base/test_special.py — eager scalar and
list dispatch (digamma-family is scipy-gated, as in the deferred
compilers, and skipped when scipy is absent).
"""

import pytest

from datar_polars_spark import f, mutate, tibble
from datar_polars_spark.functions import (
    beta,
    choose,
    factorial,
    gamma,
    lbeta,
    lchoose,
    lfactorial,
    lgamma,
)


def test_beta():
    assert beta(1, 2) == pytest.approx(0.5)
    got = beta([1, 2], [2, 3])
    assert got[0] == pytest.approx(0.5)
    assert got[1] == pytest.approx(1 / 12)


def test_lbeta():
    import math

    assert lbeta(1, 2) == pytest.approx(math.log(0.5))


def test_gamma_lgamma():
    assert gamma(1) == 1
    assert gamma([1, 2]) == [1, 1]
    assert lgamma(1) == pytest.approx(0)
    assert lgamma([1, 2]) == pytest.approx([0, 0])


def test_choose_lchoose():
    assert choose(2, 1) == 2
    assert choose([2, 4], [1, 2]) == [2.0, 6.0]
    import math

    assert lchoose(4, 2) == pytest.approx(math.log(6))


def test_factorial():
    assert factorial(1) == 1
    assert factorial([1, 4]) == [1.0, 24.0]
    assert lfactorial(3) == pytest.approx(__import__("math").log(6))


def test_gamma_in_mutate(spark):
    td = tibble(spark, x=[1.0, 2.0, 3.0])
    out = (td >> mutate(g=gamma(f.x), lf=lfactorial(f.x - 1))).collect()
    assert out["g"].tolist() == pytest.approx([1.0, 1.0, 2.0])
    assert out["lf"].tolist() == pytest.approx([0.0, 0.0, 0.6931], rel=1e-3)


def test_digamma_scipy_gated():
    pytest.importorskip("scipy")
    from datar_polars_spark.functions import digamma

    assert digamma(1) == pytest.approx(-0.5772156649015329)
