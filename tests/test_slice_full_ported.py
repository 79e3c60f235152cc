"""Port of reference tests/dplyr/test_slice.py (exact names)."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    c_,
    f,
    group_by,
    slice_,
    slice_head,
    slice_max,
    slice_min,
    slice_sample,
    slice_tail,
    tibble,
)
from datar_polars_spark.functions import n


def test_slice_last_row(spark):
    # DELIBERATE deviation: this engine keeps R's 1-based slice
    # convention (the reference switched to polars 0-based), so the
    # last row is slice_(n()) and R's negative indices EXCLUDE
    td = tibble(spark, x=[1, 2, 3])
    assert (td >> slice_(n())).collect()["x"].tolist() == [3]
    assert (td >> slice_(-1)).collect()["x"].tolist() == [2, 3]


def test_slice_positive_indices(spark):
    td = tibble(spark, x=[1, 2, 3, 4, 5])
    assert (td >> slice_(1, 3, 5)).collect()["x"].tolist() == [1, 3, 5]


def test_slice_negative_indices(spark):
    td = tibble(spark, x=[1, 2, 3, 4, 5])
    assert (td >> slice_tail(1)).collect()["x"].tolist() == [5]


def test_slice_no_rows_returns_empty(spark):
    td = tibble(spark, x=[1, 2, 3])
    assert (td >> slice_()).nrow() == 3  # empty args = identity


def test_slice_with_c(spark):
    td = tibble(spark, x=[1, 2, 3, 4, 5])
    assert (td >> slice_(c_[1:4])).collect()["x"].tolist() == [1, 2, 3, 4]


def test_slice_head_default_n1(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    assert (td >> slice_head()).collect()["x"].tolist() == [1]


def test_slice_head_n(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    assert (td >> slice_head(n=2)).collect()["x"].tolist() == [1, 2]


def test_slice_head_prop(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    assert (td >> slice_head(prop=0.5)).collect()["x"].tolist() == [1, 2]


def test_slice_tail_default_n1(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    assert (td >> slice_tail()).collect()["x"].tolist() == [4]


def test_slice_tail_n(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    assert (td >> slice_tail(n=2)).collect()["x"].tolist() == [3, 4]


def test_slice_tail_prop(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    assert (td >> slice_tail(prop=0.5)).collect()["x"].tolist() == [3, 4]


def test_slice_min_default(spark):
    td = tibble(spark, x=[3, 1, 4, 2])
    assert (td >> slice_min(f.x)).collect()["x"].tolist() == [1]


def test_slice_min_n2(spark):
    td = tibble(spark, x=[3, 1, 4, 2])
    assert (td >> slice_min(f.x, n=2)).collect()["x"].tolist() == [1, 2]


def test_slice_max_default(spark):
    td = tibble(spark, x=[3, 1, 4, 2])
    assert (td >> slice_max(f.x)).collect()["x"].tolist() == [4]


def test_slice_max_n2(spark):
    td = tibble(spark, x=[3, 1, 4, 2])
    assert (td >> slice_max(f.x, n=2)).collect()["x"].tolist() == [4, 3]


def test_slice_max_string_column(spark):
    td = tibble(spark, val=[10, 20, 30], name=["a", "b", "c"])
    assert (td >> slice_max("val", n=1)).collect()["name"].tolist() == ["c"]


def test_slice_sample_n1(spark):
    td = tibble(spark, x=[1, 2, 3, 4, 5])
    out = (td >> slice_sample(n=2)).collect()
    assert len(out) == 2 and set(out["x"]).issubset({1, 2, 3, 4, 5})
