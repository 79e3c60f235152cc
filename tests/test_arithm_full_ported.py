"""Port of reference tests/base/test_arithm.py (exact names):
pmin, pmax, mod, sign, signif, trunc."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, mutate, tibble
from datar_polars_spark.functions import mod, pmax, pmin, sign, signif, trunc


def test_pmin_scalars():
    assert pmin(3, 1, 2) == 1
    assert pmin(-5, 0, 5) == -5


def test_pmin_series():
    assert pmin([3, 1, 5], [2, 4, 0]) == [2, 1, 0]


def test_pmin_three_series():
    assert pmin([3, 1, 5], [2, 4, 0], [1, 2, 3]) == [1, 1, 0]


def test_pmin_empty():
    assert pmin() is None


def test_pmin_lists():
    assert pmin([3, 1, 5], [2, 4, 0]) == [2, 1, 0]


def test_pmin_in_mutate(spark):
    td = tibble(spark, x=[3, 1, 5], y=[2, 4, 0])
    assert (td >> mutate(z=pmin(f.x, f.y))).collect()["z"].tolist() == [2, 1, 0]


def test_pmax_scalars():
    assert pmax(3, 1, 2) == 3
    assert pmax(-5, 0, 5) == 5


def test_pmax_series():
    assert pmax([3, 1, 5], [2, 4, 0]) == [3, 4, 5]


def test_pmax_three_series():
    assert pmax([3, 1, 5], [2, 4, 0], [1, 2, 3]) == [3, 4, 5]


def test_pmax_empty():
    assert pmax() is None


def test_pmax_in_mutate(spark):
    td = tibble(spark, x=[3, 1, 5], y=[2, 4, 0])
    assert (td >> mutate(z=pmax(f.x, f.y))).collect()["z"].tolist() == [3, 4, 5]


def test_mod_positive_scalar():
    assert mod(5) == 5


def test_mod_negative_scalar():
    assert mod(-5) == 5


def test_mod_zero():
    assert mod(0) == 0


def test_mod_float():
    assert mod(-3.14) == pytest.approx(3.14)


def test_mod_complex():
    assert mod(3 + 4j) == 5.0


def test_mod_series():
    assert mod([-3, 0, 4, -1]) == [3, 0, 4, 1]


def test_mod_in_mutate(spark):
    td = tibble(spark, x=[-3, 0, 4, -1])
    assert (td >> mutate(y=mod(f.x))).collect()["y"].tolist() == [3, 0, 4, 1]


def test_sign_positive_scalar():
    assert sign(42) == 1


def test_sign_negative_scalar():
    assert sign(-7) == -1


def test_sign_zero_scalar():
    assert sign(0) == 0


def test_sign_series():
    assert sign([3, -1, 0, 4, -2]) == [1, -1, 0, 1, -1]


def test_sign_in_mutate(spark):
    td = tibble(spark, x=[3, -1, 0, 4, -2])
    assert (td >> mutate(y=sign(f.x))).collect()["y"].tolist() == [1, -1, 0, 1, -1]


def test_signif_default_digits():
    assert signif(123.456) == pytest.approx(123.456)


def test_signif_three_digits():
    assert signif(123.456, digits=3) == pytest.approx(123.0)


def test_signif_two_digits():
    assert signif(0.0012345, digits=2) == pytest.approx(0.0012)


def test_signif_zero():
    assert signif(0, digits=4) == 0


def test_signif_series():
    assert signif([123.456, 0.0012345, 0.0], digits=3) == pytest.approx(
        [123.0, 0.00123, 0.0]
    )


def test_signif_in_mutate(spark):
    td = tibble(spark, x=[123.456, 78.9])
    got = (td >> mutate(y=signif(f.x, digits=2))).collect()
    assert got["y"].tolist() == pytest.approx([120.0, 79.0])


def test_trunc_positive_scalar():
    assert trunc(3.7) == 3


def test_trunc_negative_scalar():
    assert trunc(-3.7) == -3


def test_trunc_zero():
    assert trunc(0.0) == 0


def test_trunc_series():
    assert trunc([3.7, -3.7, 0.5, -0.5, 2.0]) == [3, -3, 0, 0, 2]


def test_trunc_in_mutate(spark):
    td = tibble(spark, x=[3.7, -3.7, 0.5])
    assert (td >> mutate(y=trunc(f.x))).collect()["y"].tolist() == [3, -3, 0]
