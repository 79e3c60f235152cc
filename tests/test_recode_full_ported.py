"""Port of reference tests/dplyr/test_recode.py eager-vector cases
(exact names; factor-typed vector cases are covered at frame level in
test_forcats_ported.py — eager factors are frame metadata here)."""

from __future__ import annotations

import pytest

from datar_polars_spark.functions import recode


def test_recode_simple_pair():
    assert recode([1, 2, 3], 1, "a") == ["a", "2", "3"]


def test_recode_dict():
    assert recode([1, 2, 3], {1: "one", 2: "two"}) == ["one", "two", "3"]


def test_recode_default():
    assert recode([1, 2, 3], "a", _default="other") == ["other", "other", "other"]


def test_recode_missing():
    assert recode([1, None, 3], 1, "a", _missing="NA_val") == ["a", "NA_val", "3"]


def test_recode_kwargs():
    assert recode(["x", "y", "z"], x="X", y="Y") == ["X", "Y", "z"]


def test_recode_no_replacements_error():
    with pytest.raises(ValueError):
        recode([1, 2, 3])


def test_recode_int_to_str():
    assert recode([1, 2, 3], None, "one", "two", "three") == ["one", "two", "three"]
