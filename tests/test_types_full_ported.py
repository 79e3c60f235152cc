"""Port of reference tests/base/test_types.py (exact test names,
polars Series replaced by list dispatch, dtype asserts by Spark
dtypes)."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, mutate, tibble
from datar_polars_spark.functions import (
    as_character,
    as_double,
    as_integer,
    as_logical,
    as_numeric,
    is_atomic,
    is_character,
    is_double,
    is_element,
    is_false,
    is_integer,
    is_logical,
    is_true,
)


def _dtype(td, col):
    return dict(td.df.dtypes)[col]


def test_as_character_expr(spark):
    td = tibble(spark, x=[1, 2, 3]) >> mutate(y=as_character(f.x))
    assert _dtype(td, "y") == "string"
    assert td.collect()["y"].tolist() == ["1", "2", "3"]


def test_as_character_series():
    assert as_character([1, 2, 3]) == ["1", "2", "3"]


def test_as_character_scalar():
    assert as_character(42) == "42"
    assert as_character(3.14) == "3.14"
    assert as_character(True) == "True"


def test_as_double_expr(spark):
    td = tibble(spark, x=[1, 2, 3]) >> mutate(y=as_double(f.x))
    assert _dtype(td, "y") == "double"
    assert td.collect()["y"].tolist() == [1.0, 2.0, 3.0]


def test_as_double_scalar():
    assert as_double(5) == 5.0
    assert as_double("3.14") == 3.14


def test_as_integer_expr(spark):
    td = tibble(spark, x=[1.5, 2.7, 3.9]) >> mutate(y=as_integer(f.x))
    assert _dtype(td, "y") in ("bigint", "int")


def test_as_integer_scalar():
    assert as_integer(3.7) == 3
    assert as_integer("42") == 42


def test_as_integer_list():
    assert as_integer([1.5, 2.7, 3.9]) == [1, 2, 3]


def test_as_logical_expr(spark):
    td = tibble(spark, x=[0, 1, 2]) >> mutate(y=as_logical(f.x))
    assert _dtype(td, "y") == "boolean"
    assert td.collect()["y"].tolist() == [False, True, True]


def test_as_logical_scalar():
    assert as_logical(1) is True
    assert as_logical(0) is False
    # DELIBERATE deviation from the reference, which applies python
    # truthiness (bool("") -> False). R's as.logical("") is NA, and this
    # engine follows R string-coercion rules ("TRUE"/"T"/"FALSE"/"F",
    # anything else NA) — so "" maps to None here.
    assert as_logical("") is None


def test_as_numeric_expr(spark):
    td = tibble(spark, x=[1, 2, 3]) >> mutate(y=as_numeric(f.x))
    assert _dtype(td, "y") == "double"


def test_as_numeric_scalar():
    assert as_numeric(5) == 5.0
    assert as_numeric("3.14") == 3.14


def test_as_numeric_str_series():
    assert as_numeric(["1.5", "2.7", "3.9"]) == [1.5, 2.7, 3.9]


def test_is_atomic_scalar_types():
    assert is_atomic(5)
    assert is_atomic(3.14)
    assert is_atomic("hello")
    assert is_atomic(True)
    assert is_atomic(1 + 2j)


def test_is_atomic_list_false():
    assert not is_atomic([1, 2, 3])


def test_is_character_utf8_series():
    assert is_character(["a", "b"])


def test_is_character_numeric_series_false():
    assert not is_character([1, 2, 3])


def test_is_character_scalar():
    assert is_character("hello")
    assert not is_character(42)


def test_is_double_float64_series():
    assert is_double([1.0, 2.0])


def test_is_double_int_series_false():
    assert not is_double([1, 2])


def test_is_double_scalar():
    assert is_double(3.14)
    assert not is_double(42)


def test_is_element_expr(spark):
    td = tibble(spark, x=[1, 5, 3]) >> mutate(y=is_element(f.x, [1, 2, 3]))
    assert td.collect()["y"].tolist() == [True, False, True]


def test_is_element_scalar_true():
    assert is_element(3, [1, 2, 3])


def test_is_element_scalar_false():
    assert not is_element(99, [1, 2, 3])


def test_is_element_series_check():
    assert is_element([1, 5, 3], [1, 2, 3]) == [True, False, True]


def test_is_false_scalar():
    assert is_false(False)
    assert not is_false(0)
    assert not is_false(True)
    assert not is_false(1)


def test_is_false_string():
    assert not is_false("hello")


def test_is_integer_int64_series():
    assert is_integer([1, 2, 3])


def test_is_integer_float_series_false():
    assert not is_integer([1.0, 2.0])


def test_is_integer_scalar():
    assert is_integer(5)
    assert not is_integer(3.14)
    assert not is_integer(True)


def test_is_logical_bool_series():
    assert is_logical([True, False, True])


def test_is_logical_int_series_false():
    assert not is_logical([1, 0, 1])


def test_is_logical_scalar():
    assert is_logical(True)
    assert is_logical(False)
    assert not is_logical(1)


def test_is_true_scalar():
    assert is_true(True)
    assert not is_true(1)
    assert not is_true(3.14)
    assert not is_true(-1)
    assert not is_true(False)
