"""Ported reference suite: tests/base/test_complex.py (arg/conj/mod/
re_/im over scalar, list, and Series inputs) plus Spark-column tests
for the struct<re,im> representation (reference api/base/complex.py).

The reference maps Python cmath per element; here complex columns are
``struct<re: double, im: double>`` and every op is a built-in JVM
expression, so the column tests also pin the struct round-trip.
"""

from __future__ import annotations

import math

import pytest

from datar_polars_spark import f, tibble, mutate
from datar_polars_spark.functions import (
    arg,
    as_complex,
    complex_,
    conj,
    im,
    is_complex,
    mod,
    re_,
)

HALF_PI = 1.5707963267948966


class TestEagerScalars:
    """Reference test_complex.py parametrized cases, scalar + list."""

    @pytest.mark.parametrize(
        "fn, x, expected",
        [
            (arg, 1j, HALF_PI),
            (conj, 1j, -1j),
            (mod, 1j, 1.0),
            (re_, 1j, 0.0),
            (im, 1j, 1.0),
        ],
    )
    def test_scalar(self, fn, x, expected):
        assert fn(x) == pytest.approx(expected)

    @pytest.mark.parametrize(
        "fn, x, expected",
        [
            (arg, [1j, 2j], [HALF_PI, HALF_PI]),
            (conj, [1j, 2j], [-1j, -2j]),
            (mod, [1j, 2j], [1.0, 2.0]),
            (re_, [1j, 2j], [0.0, 0.0]),
            (im, [1j, 2j], [1.0, 2.0]),
        ],
    )
    def test_list(self, fn, x, expected):
        assert fn(x) == pytest.approx(expected)

    def test_mod_two_arg_remainder_unchanged(self):
        assert mod(7, 3) == 1
        assert mod([7, 8, 9], 3) == [1, 2, 0]

    def test_mod_one_arg_real_abs(self):
        assert mod(-3.5) == 3.5
        assert mod([3, -4]) == [3, 4]

    def test_mod_complex_magnitude(self):
        assert mod(3 + 4j) == pytest.approx(5.0)

    def test_arg_real_axis(self):
        assert arg(1.0) == pytest.approx(0.0)
        assert arg(-1.0) == pytest.approx(math.pi)

    def test_as_complex(self):
        assert as_complex(2) == complex(2.0)
        assert as_complex([1, 2]) == [complex(1.0), complex(2.0)]
        assert as_complex("nope") is None

    def test_is_complex(self):
        assert is_complex(1j) is True
        assert is_complex(1.0) is False
        assert is_complex("a") is False


class TestComplexColumns:
    """struct<re,im> columns: ops compile to JVM expressions."""

    def _ctab(self, spark):
        td = tibble(spark, re=[3.0, 0.0, -1.0], imv=[4.0, 1.0, 0.0])
        return td >> mutate(z=complex_(real=f.re, imaginary=f.imv))

    def test_as_complex_promotes_numeric(self, spark):
        td = tibble(spark, x=[1.0, 2.0, None])
        out = (td >> mutate(z=as_complex(f.x))).collect()
        zs = out["z"].tolist()
        assert (zs[0]["re"], zs[0]["im"]) == (1.0, 0.0)
        assert (zs[1]["re"], zs[1]["im"]) == (2.0, 0.0)

    def test_re_im_roundtrip(self, spark):
        out = (
            self._ctab(spark)
            >> mutate(r=re_(f.z), i=im(f.z))
        ).collect()
        assert out["r"].tolist() == [3.0, 0.0, -1.0]
        assert out["i"].tolist() == [4.0, 1.0, 0.0]

    def test_mod_is_magnitude(self, spark):
        out = (self._ctab(spark) >> mutate(m=mod(f.z))).collect()
        assert out["m"].tolist() == pytest.approx([5.0, 1.0, 1.0])

    def test_arg_quadrants(self, spark):
        out = (self._ctab(spark) >> mutate(a=arg(f.z))).collect()
        assert out["a"].tolist() == pytest.approx(
            [math.atan2(4.0, 3.0), HALF_PI, math.pi]
        )

    def test_conj_negates_im(self, spark):
        out = (self._ctab(spark) >> mutate(c=conj(f.z))).collect()
        assert [c["im"] for c in out["c"]] == [-4.0, -1.0, 0.0]
        assert [c["re"] for c in out["c"]] == [3.0, 0.0, -1.0]

    def test_conj_on_real_column_is_identity(self, spark):
        td = tibble(spark, x=[1.5, -2.5])
        out = (td >> mutate(c=conj(f.x))).collect()
        assert out["c"].tolist() == [1.5, -2.5]

    def test_mod_two_arg_on_columns(self, spark):
        td = tibble(spark, x=[7, 8, 9])
        out = (td >> mutate(m=mod(f.x, 3))).collect()
        assert out["m"].tolist() == [1, 2, 0]

    def test_is_complex_on_columns(self, spark):
        td = tibble(spark, x=[1.0]) >> mutate(z=as_complex(f.x))
        out = (td >> mutate(xc=is_complex(f.x), zc=is_complex(f.z))).collect()
        assert out["xc"].tolist() == [False]
        assert out["zc"].tolist() == [True]

    def test_arg_real_column(self, spark):
        td = tibble(spark, x=[2.0, -2.0])
        out = (td >> mutate(a=arg(f.x))).collect()
        assert out["a"].tolist() == pytest.approx([0.0, math.pi])
