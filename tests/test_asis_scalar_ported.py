"""Ported from reference tests/base/test_asis.py — the SCALAR and
sequence dispatch of the type predicates (mutate forms live in
test_conditionals_ported.py).
"""

from datar_polars_spark.functions import (
    is_character,
    is_double,
    is_finite,
    is_infinite,
    is_integer,
    is_logical,
    is_na,
    is_null,
    is_numeric,
)


def test_is_na_scalar():
    assert is_na(None)
    assert not is_na(5)
    assert is_na(float("nan"))


def test_is_finite_scalar():
    assert is_finite(3.0)
    assert not is_finite(float("inf"))


def test_is_infinite_scalar():
    assert is_infinite(float("inf"))
    assert not is_infinite(3.0)


def test_is_null_scalar():
    assert is_null(None)
    assert not is_null(0)


def test_is_numeric():
    assert is_numeric(5)
    assert is_numeric(3.14)
    assert not is_numeric("hello")
    assert is_numeric([1, 2, 3])
    assert not is_numeric([1, "a", 3])


def test_is_integer():
    assert is_integer(5)
    assert not is_integer(3.14)
    assert not is_integer(True)  # bool is not integer in R semantics
    assert is_integer([1, 2, 3])
    assert not is_integer([1, 2.5, 3])


def test_is_double():
    assert is_double(1.5)
    assert not is_double(1)
    assert is_double([1.0, 2.0])


def test_is_character():
    assert is_character("hello")
    assert not is_character(42)
    assert is_character(["a", "b", "c"])
    assert not is_character([1, "a", 3])


def test_is_logical():
    assert is_logical(True)
    assert not is_logical(1)
    assert is_logical([True, False])
