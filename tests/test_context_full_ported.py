"""Port of reference tests/dplyr/test_context.py (exact names).
cur_data/cur_data_all return struct arrays here (Spark has no nested
frame type); the asserts unpack dict rows accordingly."""

from __future__ import annotations

from datar_polars_spark import f, group_by, mutate, summarise, tibble
from datar_polars_spark.functions import (
    cur_column,
    cur_data,
    cur_data_all,
    cur_group,
    cur_group_id,
    cur_group_rows,
    n,
)


def test_n_ungrouped(spark):
    td = tibble(spark, x=[1, 2, 3])
    assert (td >> summarise(count=n())).collect()["count"].tolist() == [3]


def test_n_grouped(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3]) >> group_by(f.g)
    counts = (td >> summarise(count=n())).collect()["count"].tolist()
    assert sorted(counts) == [1, 2]


def test_cur_data_ungrouped(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4])
    result = (td >> summarise(n=cur_data())).collect()["n"].tolist()
    assert len(result) == 1
    assert [r["x"] for r in result[0]] == [1, 2]
    assert [r["y"] for r in result[0]] == [3, 4]


def test_cur_data_grouped(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3]) >> group_by(f.g)
    out = (td >> summarise(result=cur_data())).collect().sort_values("g")
    vals = out["result"].tolist()
    assert len(vals) == 2
    assert [r["x"] for r in vals[0]] == [1, 2]
    assert [r["x"] for r in vals[1]] == [3]
    # group vars excluded from cur_data payload
    assert "g" not in vals[0][0].asDict() if hasattr(vals[0][0], "asDict") else True


def test_cur_data_all_ungrouped(spark):
    td = tibble(spark, x=[1, 2, 3])
    result = (td >> summarise(result=cur_data_all())).collect()["result"].tolist()
    assert len(result) == 1
    assert [r["x"] for r in result[0]] == [1, 2, 3]


def test_cur_data_all_grouped(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3]) >> group_by(f.g)
    out = (td >> summarise(result=cur_data_all())).collect().sort_values("g")
    vals = out["result"].tolist()
    assert [r["g"] for r in vals[0]] == ["a", "a"]
    assert [r["x"] for r in vals[0]] == [1, 2]
    assert [r["g"] for r in vals[1]] == ["b"]


def test_cur_group_id_ungrouped(spark):
    # DELIBERATE deviation: dplyr's cur_group_id() is 1-based (the
    # reference's polars port used 0-based appearance order)
    td = tibble(spark, x=[1, 2])
    assert (td >> summarise(gid=cur_group_id())).collect()["gid"].tolist() == [1]


def test_cur_group_id_grouped(spark):
    # dplyr: ids follow sorted group-key order, 1-based -> a=1, b=2
    td = tibble(spark, g=["b", "a", "b"]) >> group_by(f.g)
    gids = (td >> summarise(gid=cur_group_id())).collect()["gid"].tolist()
    assert len(gids) == 2
    out = (td >> mutate(gid=cur_group_id())).collect()
    assert out["gid"].tolist() == [2, 1, 2]


def test_cur_group_ungrouped(spark):
    td = tibble(spark, x=[1, 2])
    assert len((td >> summarise(key=cur_group())).collect()) == 1


def test_cur_group_grouped(spark):
    td = tibble(spark, g=["b", "a", "b"]) >> group_by(f.g)
    out = (td >> summarise(key=cur_group())).collect()
    assert len(out) == 2


def test_cur_group_rows_ungrouped(spark):
    td = tibble(spark, x=[1, 2, 3])
    rows = (td >> summarise(rows=cur_group_rows())).collect()["rows"].tolist()
    assert [sorted(r) for r in rows] == [[0, 1, 2]]


def test_cur_group_rows_grouped(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3]) >> group_by(f.g)
    out = (td >> summarise(rows=cur_group_rows())).collect().sort_values("g")
    assert [sorted(r) for r in out["rows"]] == [[0, 1], [2]]


def test_cur_column_returns_marker():
    marker = cur_column()
    assert marker is not None
