"""Port of reference tests/dplyr/test_rows.py (exact names)."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, tibble
from datar_polars_spark.operators.bind import (
    rows_append,
    rows_delete,
    rows_insert,
    rows_patch,
    rows_update,
    rows_upsert,
)


def test_rows_append_simple(spark):
    x = tibble(spark, a=[1, 2], b=[3, 4])
    y = tibble(spark, a=[5, 6], b=[7, 8])
    out = rows_append(x, y).collect()
    assert len(out) == 4
    assert out["a"].tolist() == [1, 2, 5, 6]


def test_rows_append_column_mismatch_error(spark):
    x = tibble(spark, a=[1])
    y = tibble(spark, b=[2])
    with pytest.raises(ValueError, match="column"):
        rows_append(x, y)


def test_rows_insert_new_rows(spark):
    x = tibble(spark, id=[1, 2], val=["a", "b"])
    y = tibble(spark, id=[2, 3], val=["b2", "c"])
    out = rows_insert(x, y, by="id", conflict="ignore").collect()
    assert len(out) == 3 and 3 in out["id"].tolist()


def test_rows_insert_conflict_error(spark):
    x = tibble(spark, id=[1, 2], val=["a", "b"])
    y = tibble(spark, id=[2, 3], val=["b2", "c"])
    with pytest.raises(ValueError):
        rows_insert(x, y, by="id").collect()


def test_rows_insert_conflict_ignore(spark):
    x = tibble(spark, id=[1, 2], val=["a", "b"])
    y = tibble(spark, id=[2, 3], val=["b2", "c"])
    out = rows_insert(x, y, by="id", conflict="ignore").collect()
    assert sorted(out["id"].tolist()) == [1, 2, 3]


def test_rows_update_existing(spark):
    x = tibble(spark, id=[1, 2], val=["a", "b"])
    y = tibble(spark, id=[2], val=["updated"])
    vals = rows_update(x, y, by="id").collect().sort_values("id")["val"].tolist()
    assert "updated" in vals and "a" in vals


def test_rows_update_unmatched_error(spark):
    x = tibble(spark, id=[1, 2], val=["a", "b"])
    y = tibble(spark, id=[3], val=["c"])
    with pytest.raises(ValueError):
        rows_update(x, y, by="id").collect()


def test_rows_delete_matching(spark):
    x = tibble(spark, id=[1, 2, 3], val=["a", "b", "c"])
    y = tibble(spark, id=[2])
    out = rows_delete(x, y, by="id").collect()
    assert len(out) == 2 and 2 not in out["id"].tolist()


def test_rows_delete_unmatched_error(spark):
    x = tibble(spark, id=[1, 2])
    y = tibble(spark, id=[3])
    with pytest.raises(ValueError):
        rows_delete(x, y, by="id").collect()


def test_rows_upsert_insert_and_update(spark):
    x = tibble(spark, id=[1, 2], val=["a", "b"])
    y = tibble(spark, id=[2, 3], val=["b2", "c"])
    out = rows_upsert(x, y, by="id").collect().sort_values("id")
    assert len(out) == 3
    assert out["val"].tolist() == ["a", "b2", "c"]


def test_rows_patch_fills_nas(spark):
    x = tibble(spark, id=[1, 2], val=[None, "b"])
    y = tibble(spark, id=[1], val=["patched"])
    out = rows_patch(x, y, by="id").collect().sort_values("id")
    assert out["val"].tolist() == ["patched", "b"]
