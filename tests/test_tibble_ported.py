"""tibble construction semantics — ported from the reference's
tests/tibble/test_tibble.py (polars Series there; python vectors +
deferred expressions here)."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, tibble, mutate, select
from datar_polars_spark.operators.tibble_verbs import (
    tribble,
    tibble_row,
    enframe,
    deframe,
    add_row,
    add_column,
)

from conftest import assert_iterable_equal


class TestTibbleConstruction:
    def test_from_kwargs(self, spark):
        td = tibble(spark, x=[1, 2, 3], y=["a", "b", "c"])
        pdf = td.collect()
        assert pdf.shape == (3, 2)
        assert list(pdf.columns) == ["x", "y"]

    def test_empty(self, spark):
        td = tibble(spark)
        pdf = td.collect()
        assert pdf.shape == (0, 0)

    def test_empty_with_rows(self, spark):
        td = tibble(spark, _rows=5)
        pdf = td.collect()
        assert pdf.shape == (5, 0)

    def test_scalar_recycling(self, spark):
        td = tibble(spark, x=list(range(1, 11)), y=1)
        pdf = td.collect()
        assert pdf.shape == (10, 2)
        assert pdf["y"].tolist() == [1] * 10

    def test_scalar_recycling_length_mismatch(self, spark):
        with pytest.raises(ValueError):
            tibble(spark, x=list(range(1, 11)), y=[1, 2, 3])

    def test_length_one_vector_recycles(self, spark):
        td = tibble(spark, x=[1, 2, 3], y=[9])
        assert td.collect()["y"].tolist() == [9, 9, 9]

    def test_none_value_creates_null_column(self, spark):
        td = tibble(spark, a=None)
        pdf = td.collect()
        assert list(pdf.columns) == ["a"]
        assert_iterable_equal(pdf["a"].tolist(), [None])

    def test_deferred_expression(self, spark):
        td = tibble(spark, a=list(range(5)), b=f.a * 2, c=1)
        pdf = td.collect()
        assert list(pdf.columns) == ["a", "b", "c"]
        assert pdf["b"].tolist() == [0, 2, 4, 6, 8]
        assert pdf["c"].tolist() == [1] * 5

    def test_deferred_expression_chain(self, spark):
        td = tibble(spark, a=[1, 2], b=f.a + 1, c=f.b * 10)
        pdf = td.collect()
        assert pdf["c"].tolist() == [20, 30]


class TestTribble:
    def test_basic(self, spark):
        td = tribble(f.x, f.y, 1, "a", 2, "b")
        pdf = td.collect()
        assert list(pdf.columns) == ["x", "y"]
        assert pdf["x"].tolist() == [1, 2]
        assert pdf["y"].tolist() == ["a", "b"]

    def test_tibble_row(self, spark):
        td = tibble_row(x=1, y="a")
        pdf = td.collect()
        assert pdf.shape == (1, 2)


class TestEnframeDeframe:
    def test_enframe_basic(self, spark):
        td = enframe([10, 20, 30])
        pdf = td.collect()
        assert list(pdf.columns) == ["name", "value"]
        assert pdf["name"].tolist() == [1, 2, 3]
        assert pdf["value"].tolist() == [10, 20, 30]

    def test_enframe_dict(self, spark):
        td = enframe({"a": 1, "b": 2})
        pdf = td.collect()
        assert pdf["name"].tolist() == ["a", "b"]
        assert pdf["value"].tolist() == [1, 2]

    def test_deframe_roundtrip(self, spark):
        td = enframe({"a": 1, "b": 2})
        assert deframe(td) == {"a": 1, "b": 2}


class TestAddRowColumn:
    def test_add_row_appends(self, spark):
        td = tibble(spark, x=[1, 2], y=["a", "b"])
        out = (td >> add_row(x=3, y="c")).collect()
        assert out["x"].tolist() == [1, 2, 3]

    def test_add_row_missing_col_is_na(self, spark):
        td = tibble(spark, x=[1], y=["a"])
        out = (td >> add_row(x=2)).collect()
        assert_iterable_equal(out["y"].tolist(), ["a", None])

    def test_add_column(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = (td >> add_column(y=[9, 8, 7])).collect()
        assert out["y"].tolist() == [9, 8, 7]

    def test_add_column_shorter_vector_null_fills(self, spark):
        # r3: aligned with the reference — a mismatched vector length
        # ERRORS (add_column vectors are driver-side by definition, so
        # the nrow check is one count on a small frame)
        td = tibble(spark, x=[1, 2, 3])
        with pytest.raises(ValueError):
            td >> add_column(y=[1, 2])
