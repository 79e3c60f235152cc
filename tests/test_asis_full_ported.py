"""Port of reference tests/base/test_asis.py (exact names)."""

from __future__ import annotations

from datar_polars_spark import f, filter_, mutate, tibble
from datar_polars_spark.functions import (
    is_character,
    is_finite,
    is_infinite,
    is_integer,
    is_na,
    is_null,
    is_numeric,
)


def test_is_na_in_filter(spark):
    td = tibble(spark, x=[1, None, 3, None])
    out = (td >> filter_(is_na(f.x))).collect()
    assert out["x"].isna().all() and len(out) == 2


def test_is_na_in_mutate(spark):
    td = tibble(spark, x=[1, None, 3])
    out = (td >> mutate(y=is_na(f.x))).collect()
    assert out["y"].tolist() == [False, True, False]


def test_is_na_scalar():
    assert is_na(None)
    assert not is_na(5)


def test_is_finite_in_mutate(spark):
    td = tibble(spark, x=[1.0, float("inf"), 3.0])
    out = (td >> mutate(y=is_finite(f.x))).collect()
    assert out["y"].tolist() == [True, False, True]


def test_is_finite_scalar():
    assert is_finite(3.0)
    assert not is_finite(float("inf"))


def test_is_infinite_in_mutate(spark):
    td = tibble(spark, x=[1.0, float("inf"), 3.0])
    out = (td >> mutate(y=is_infinite(f.x))).collect()
    assert out["y"].tolist() == [False, True, False]


def test_is_infinite_scalar():
    assert not is_infinite(3.0)
    assert is_infinite(float("inf"))


def test_is_null_in_filter(spark):
    td = tibble(spark, x=[1, None, 3])
    out = (td >> filter_(is_na(f.x))).collect()
    assert len(out) == 1 and out["x"].isna().all()


def test_is_null_scalar_true():
    assert is_null(None)


def test_is_null_scalar_false():
    assert not is_null(42)
    assert not is_null("hello")


def test_is_numeric_series():
    assert is_numeric([1, 2, 3])


def test_is_numeric_string_series():
    assert not is_numeric(["a", "b"])


def test_is_numeric_scalar():
    assert is_numeric(5)
    assert is_numeric(3.14)
    assert not is_numeric("hello")


def test_is_numeric_sequence():
    assert is_numeric([1, 2, 3])
    assert not is_numeric([1, "a", 3])


def test_is_integer_series():
    assert is_integer([1, 2, 3])


def test_is_integer_float_series():
    assert not is_integer([1.0, 2.0])


def test_is_integer_sequence():
    assert is_integer([1, 2, 3])
    assert not is_integer([1, 2.5, 3])


def test_is_character_series():
    assert is_character(["a", "b"])


def test_is_character_numeric_series():
    assert not is_character([1, 2, 3])


def test_is_character_sequence():
    assert is_character(["a", "b", "c"])
    assert not is_character([1, "a", 3])
