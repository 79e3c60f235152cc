"""asof_join — merge-style rolling join (no reference equivalent;
pandas merge_asof / dplyr join_by(closest(...)) semantics), verified
against DuckDB's native ASOF JOIN on real data."""

from __future__ import annotations

import duckdb
import pytest

from datar_polars_spark import f, tibble, arrange, filter_, select, read_parquet
from datar_polars_spark.operators.join import asof_join

from conftest import assert_iterable_equal

SF = "/root/testdata/sf0.001"


class TestAsofBasic:
    def test_backward_basic(self, spark):
        quotes = tibble(spark, k=["a", "a", "a"], t=[1.0, 5.0, 10.0], px=[100.0, 105.0, 110.0])
        trades = tibble(spark, k=["a", "a", "a", "a"], t=[0.5, 5.0, 7.0, 12.0], qty=[1, 2, 3, 4])
        out = (
            trades
            >> asof_join(quotes, by=f.k, on=f.t)
            >> arrange(f.t)
        ).collect()
        # t=0.5 -> no quote yet; t=5 -> exact match 105; t=7 -> 105; t=12 -> 110
        assert_iterable_equal(out["px"].tolist(), [None, 105.0, 105.0, 110.0])

    def test_forward_basic(self, spark):
        quotes = tibble(spark, k=["a", "a"], t=[5.0, 10.0], px=[105.0, 110.0])
        trades = tibble(spark, k=["a", "a", "a"], t=[1.0, 5.0, 11.0], qty=[1, 2, 3])
        out = (
            trades
            >> asof_join(quotes, by=f.k, on=f.t, direction="forward")
            >> arrange(f.t)
        ).collect()
        # t=1 -> next quote 105; t=5 -> exact 105; t=11 -> none after
        assert_iterable_equal(out["px"].tolist(), [105.0, 105.0, None])

    def test_keys_partition_matches(self, spark):
        quotes = tibble(spark, k=["a", "b"], t=[1.0, 2.0], px=[1.0, 2.0])
        trades = tibble(spark, k=["a", "b", "c"], t=[5.0, 5.0, 5.0], qty=[1, 1, 1])
        out = (trades >> asof_join(quotes, by=f.k, on=f.t) >> arrange(f.k)).collect()
        assert_iterable_equal(out["px"].tolist(), [1.0, 2.0, None])

    def test_tolerance(self, spark):
        quotes = tibble(spark, k=["a", "a"], t=[1.0, 10.0], px=[100.0, 110.0])
        trades = tibble(spark, k=["a", "a"], t=[2.0, 50.0], qty=[1, 2])
        out = (
            trades >> asof_join(quotes, by=f.k, on=f.t, tolerance=5.0) >> arrange(f.t)
        ).collect()
        # t=2 matches t=1 (diff 1 <= 5); t=50's nearest is t=10 (diff 40 > 5)
        assert_iterable_equal(out["px"].tolist(), [100.0, None])

    def test_null_probe_never_matches(self, spark):
        quotes = tibble(spark, k=["a"], t=[1.0], px=[100.0])
        trades = tibble(spark, k=["a", "a"], t=[2.0, None], qty=[1, 2])
        out = (trades >> asof_join(quotes, by=f.k, on=f.t) >> arrange(f.qty)).collect()
        assert_iterable_equal(out["px"].tolist(), [100.0, None])

    def test_no_by_global_asof(self, spark):
        quotes = tibble(spark, t=[1.0, 5.0], px=[100.0, 105.0])
        trades = tibble(spark, t=[3.0, 6.0], qty=[1, 2])
        out = (trades >> asof_join(quotes, on=f.t) >> arrange(f.t)).collect()
        assert out["px"].tolist() == [100.0, 105.0]

    def test_clashing_payload_suffixed(self, spark):
        quotes = tibble(spark, k=["a"], t=[1.0], v=[9.0])
        trades = tibble(spark, k=["a"], t=[2.0], v=[1.0])
        out = (trades >> asof_join(quotes, by=f.k, on=f.t)).collect()
        assert out["v"].tolist() == [1.0]
        assert out["v_y"].tolist() == [9.0]


class TestAsofVsDuckdb:
    def test_backward_matches_duckdb_asof_join(self, spark):
        ev = read_parquet(spark, f"{SF}/events.parquet")
        purchases = ev >> filter_(f.event_type == "purchase") >> select(
            f.event_id, f.user_id, f.ts, f.value
        )
        signups = ev >> filter_(f.event_type == "signup") >> select(
            f.user_id, f.ts, f.value
        )
        out = (
            purchases
            >> asof_join(signups, by=f.user_id, on=f.ts)
            >> select(f.event_id, f.value, f.value_y)
            >> arrange(f.event_id)
        ).collect()

        want = duckdb.sql(
            f"""
            WITH p AS (SELECT event_id, user_id, ts, value
                       FROM '{SF}/events.parquet' WHERE event_type = 'purchase'),
                 s AS (SELECT user_id, ts, value
                       FROM '{SF}/events.parquet' WHERE event_type = 'signup')
            SELECT p.event_id, p.value, s.value AS value_y
            FROM p ASOF LEFT JOIN s
              ON p.user_id = s.user_id AND p.ts >= s.ts
            ORDER BY p.event_id
            """
        ).fetchall()

        got = [
            tuple(None if v != v else v for v in row)  # NaN -> None
            for row in out.itertuples(index=False, name=None)
        ]
        want = [tuple(r) for r in want]
        assert len(got) == len(want)
        assert got == want
