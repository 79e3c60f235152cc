"""Port of reference tests/base/test_string.py (exact names)."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, filter_, mutate, tibble
from datar_polars_spark.functions import (
    nchar,
    nzchar,
    paste,
    paste0,
    tolower,
    toupper,
)


def test_toupper_in_mutate(spark):
    td = tibble(spark, x=["hello", "world"])
    assert (td >> mutate(y=toupper(f.x))).collect()["y"].tolist() == [
        "HELLO",
        "WORLD",
    ]


def test_toupper_scalar():
    assert toupper("hello") == "HELLO"


def test_tolower_in_mutate(spark):
    td = tibble(spark, x=["HELLO", "WORLD"])
    assert (td >> mutate(y=tolower(f.x))).collect()["y"].tolist() == [
        "hello",
        "world",
    ]


def test_tolower_scalar():
    assert tolower("HELLO") == "hello"


def test_nchar_in_mutate(spark):
    td = tibble(spark, x=["hi", "hello", "a"])
    assert (td >> mutate(y=nchar(f.x))).collect()["y"].tolist() == [2, 5, 1]


def test_nchar_scalar():
    assert nchar("hello") == 5
    assert nchar("") == 0


def test_nchar_zero_byte():
    assert nchar("a\0b") == 2
    assert nchar("\0b") == 1
    with pytest.raises(ValueError, match="invalid zero-byte character"):
        nchar("\0")
    with pytest.raises(ValueError, match="invalid zero-byte character"):
        nchar("a\0")


def test_nzchar_in_filter(spark):
    td = tibble(spark, x=["", "hello", "", "world"])
    assert (td >> filter_(nzchar(f.x))).collect()["x"].tolist() == [
        "hello",
        "world",
    ]


def test_nzchar_in_mutate(spark):
    td = tibble(spark, x=["", "hi"])
    assert (td >> mutate(y=nzchar(f.x))).collect()["y"].tolist() == [False, True]


def test_nzchar_scalar():
    assert not nzchar("")
    assert nzchar("hello")


def test_nzchar_list():
    assert nzchar(["", "hello", ""]) == [False, True, False]


def test_paste_in_mutate_two_columns(spark):
    td = tibble(spark, a=["x", "y"], b=["1", "2"])
    assert (td >> mutate(c=paste(f.a, f.b))).collect()["c"].tolist() == [
        "x 1",
        "y 2",
    ]


def test_paste_custom_sep(spark):
    td = tibble(spark, a=["x", "y"], b=["1", "2"])
    assert (td >> mutate(c=paste(f.a, f.b, sep="-"))).collect()["c"].tolist() == [
        "x-1",
        "y-2",
    ]


def test_paste_literal(spark):
    td = tibble(spark, a=["x", "y"])
    assert (td >> mutate(c=paste(f.a, "suffix"))).collect()["c"].tolist() == [
        "x suffix",
        "y suffix",
    ]


def test_paste_scalar(spark):
    assert paste("a", "b") == "a b"
    td = tibble(spark, dummy=[1])
    assert (td >> mutate(c=paste("a", "b", sep="-"))).collect()["c"].tolist() == [
        "a-b"
    ]


def test_paste_list():
    assert paste(["a", "b"], sep=".") == ["a", "b"]
    assert paste(["a", "b"], ["c", "d"], sep=".") == ["a.c", "b.d"]


def test_paste0_in_mutate(spark):
    td = tibble(spark, a=["x", "y"], b=["1", "2"])
    assert (td >> mutate(c=paste0(f.a, f.b))).collect()["c"].tolist() == [
        "x1",
        "y2",
    ]


def test_paste0_literal(spark):
    td = tibble(spark, a=["x", "y"])
    assert (td >> mutate(c=paste0(f.a, "_suffix"))).collect()["c"].tolist() == [
        "x_suffix",
        "y_suffix",
    ]


def test_paste0_scalar(spark):
    td = tibble(spark, dummy=[1])
    assert (td >> mutate(c=paste0("hello", "world"))).collect()["c"].tolist() == [
        "helloworld"
    ]


def test_paste0_list():
    assert paste0(["a", "c"], ["b", "d"], collapse="; ") == "ab; cd"
