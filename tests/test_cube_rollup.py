"""cube / rollup multi-dimensional aggregates (Spark-native extension;
the reference has no equivalent — verified against DuckDB GROUP BY
CUBE/ROLLUP on the same data)."""

from __future__ import annotations

import duckdb
import pytest

from datar_polars_spark import (
    f,
    tibble,
    group_by_cube,
    group_by_rollup,
    summarise,
    arrange,
    read_parquet,
)
from datar_polars_spark.functions import sum_, n, grouping_id

SF = "/root/testdata/sf0.001"


def _duck(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _norm(rows):
    return sorted(
        tuple("<NA>" if v is None else v for v in r) for r in rows
    )


class TestCube:
    def test_cube_matches_duckdb(self, spark):
        td = read_parquet(spark, f"{SF}/orders.parquet")
        out = (
            td
            >> group_by_cube(f.o_orderpriority, f.o_orderstatus)
            >> summarise(total=n())
        ).collect()
        got = _norm(out.where(out.notna(), None).itertuples(index=False, name=None))
        want = _norm(
            _duck(
                f"""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS total
                FROM '{SF}/orders.parquet'
                GROUP BY CUBE(o_orderpriority, o_orderstatus)"""
            )
        )
        assert got == want

    def test_cube_row_count(self, spark):
        td = tibble(
            spark,
            a=["x", "x", "y", "y"],
            b=["1", "2", "1", "2"],
            v=[1, 2, 3, 4],
        )
        out = (td >> group_by_cube(f.a, f.b) >> summarise(s=sum_(f.v))).collect()
        # 4 (a,b) + 2 (a) + 2 (b) + 1 () = 9
        assert out.shape[0] == 9
        total_row = out[out["a"].isna() & out["b"].isna()]
        assert total_row["s"].tolist() == [10]

    def test_grouping_id_distinguishes_subtotals(self, spark):
        td = tibble(spark, a=["x", None], v=[1, 2])
        out = (
            td
            >> group_by_cube(f.a)
            >> summarise(s=sum_(f.v), gid=grouping_id())
        ).collect()
        # gid=1 -> the grand-total row; gid=0 rows include the genuine
        # NULL data key
        grand = out[out["gid"] == 1]
        assert grand["s"].tolist() == [3]
        data_null = out[(out["gid"] == 0) & out["a"].isna()]
        assert data_null["s"].tolist() == [2]


class TestRollup:
    def test_rollup_matches_duckdb(self, spark):
        td = read_parquet(spark, f"{SF}/orders.parquet")
        out = (
            td
            >> group_by_rollup(f.o_orderpriority, f.o_orderstatus)
            >> summarise(total=n())
        ).collect()
        got = _norm(out.where(out.notna(), None).itertuples(index=False, name=None))
        want = _norm(
            _duck(
                f"""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS total
                FROM '{SF}/orders.parquet'
                GROUP BY ROLLUP(o_orderpriority, o_orderstatus)"""
            )
        )
        assert got == want

    def test_rollup_hierarchy_only(self, spark):
        td = tibble(
            spark,
            a=["x", "x", "y", "y"],
            b=["1", "2", "1", "2"],
            v=[1, 2, 3, 4],
        )
        out = (td >> group_by_rollup(f.a, f.b) >> summarise(s=sum_(f.v))).collect()
        # 4 (a,b) + 2 (a) + 1 () = 7  — no (b)-only rows in a rollup
        assert out.shape[0] == 7

    def test_rollup_result_not_grouped(self, spark):
        td = tibble(spark, a=["x", "y"], v=[1, 2])
        out = td >> group_by_rollup(f.a) >> summarise(s=sum_(f.v))
        assert out.group_vars == ()
