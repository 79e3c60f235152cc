"""Rolling window functions (r3 extension: roll_sum/mean/min/max —
the zoo::rollsumr / slider family, absent from the reference).

Semantics: trailing k-row window in frame order; NULLs skipped (like
the window aggregates they compile to); rows before min_periods
(default k) yield NULL. Ungrouped rolling is two-pass distributed
(per-bucket windows + carried previous-bucket tails) — locked by a
physical-plan guard and a multi-file differential fuzz vs pandas."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datar_polars_spark import arrange, f, group_by, mutate, read_parquet, tibble
from datar_polars_spark.functions import (
    roll_max,
    roll_mean,
    roll_min,
    roll_sum,
    row_number,
)

from conftest import assert_iterable_equal


def _oracle(s: pd.Series, k: int, fn: str, min_periods=None):
    mp = k if min_periods is None else min_periods
    r = getattr(s.rolling(k, min_periods=1), fn)()
    mask = pd.Series(np.arange(1, len(s) + 1)) >= mp
    return r.where(mask)


class TestRollingBasics:
    def test_roll_sum_with_nulls(self, spark):
        xs = [1.0, 2.0, None, 4.0, 5.0, 6.0]
        out = (tibble(spark, x=xs) >> mutate(r=roll_sum(f.x, 3))).collect()
        exp = _oracle(pd.Series(xs), 3, "sum")
        assert_iterable_equal(out["r"].tolist(), exp.tolist(), approx=True)

    def test_roll_mean_min_max(self, spark):
        xs = [3.0, None, 1.0, 7.0, None, 2.0, 9.0]
        out = (
            tibble(spark, x=xs)
            >> mutate(m=roll_mean(f.x, 3), lo=roll_min(f.x, 3), hi=roll_max(f.x, 3))
        ).collect()
        s = pd.Series(xs)
        for col, fn in (("m", "mean"), ("lo", "min"), ("hi", "max")):
            assert_iterable_equal(
                out[col].tolist(), _oracle(s, 3, fn).tolist(), approx=True
            )

    def test_min_periods(self, spark):
        xs = [1.0, 2.0, 3.0, 4.0]
        out = (
            tibble(spark, x=xs) >> mutate(r=roll_sum(f.x, 3, min_periods=1))
        ).collect()
        assert_iterable_equal(
            out["r"].tolist(), [1.0, 3.0, 6.0, 9.0], approx=True
        )

    def test_k1_is_identity_after_mask(self, spark):
        xs = [5.0, None, 7.0]
        out = (tibble(spark, x=xs) >> mutate(r=roll_sum(f.x, 1))).collect()
        assert_iterable_equal(out["r"].tolist(), xs, approx=True)

    def test_k_must_be_positive(self, spark):
        td = tibble(spark, x=[1.0])
        with pytest.raises(ValueError):
            (td >> mutate(r=roll_sum(f.x, 0))).collect()

    def test_grouped_rolling_respects_groups(self, spark):
        td = tibble(
            spark, g=["a"] * 4 + ["b"] * 4, x=[1.0, 2, 3, 4, 10, 20, 30, 40]
        ) >> group_by(f.g)
        out = (td >> mutate(r=roll_sum(f.x, 2))).collect()
        assert_iterable_equal(
            out["r"].tolist(),
            [None, 3.0, 5.0, 7.0, None, 30.0, 50.0, 70.0],
            approx=True,
        )


class TestRollingTwoPass:
    def _multi_file(self, tmp_path, seed, n_rows, n_files, null_frac=0.2):
        rng = np.random.RandomState(seed)
        pdf = pd.DataFrame(
            {"v": rng.randint(-40, 40, n_rows).astype("float64"),
             "k": rng.uniform(0, 1000, n_rows).round(3)}
        )
        pdf.loc[rng.rand(n_rows) < null_frac, "v"] = np.nan
        per = max(1, n_rows // n_files)
        for i in range(0, n_rows, per):
            pq.write_table(
                pa.Table.from_pandas(pdf.iloc[i : i + per]),
                f"{tmp_path}/p-{i:06d}.parquet",
            )
        return pdf

    @pytest.mark.parametrize("k", [2, 5, 13])
    @pytest.mark.parametrize("fn,col", [("sum", roll_sum), ("mean", roll_mean), ("min", roll_min), ("max", roll_max)])
    def test_ungrouped_multifile_matches_pandas(self, spark, tmp_path, k, fn, col):
        pdf = self._multi_file(tmp_path, seed=k * 7 + len(fn), n_rows=211, n_files=5)
        td = read_parquet(spark, str(tmp_path))
        out = (
            (td >> mutate(rn=row_number(), r=col(f.v, k)))
            .collect()
            .sort_values("rn")
            .reset_index(drop=True)
        )
        exp = _oracle(out["v"], k, fn)
        got = out["r"].to_numpy(dtype="float64")
        e = np.asarray(exp, dtype="float64")
        assert np.allclose(
            np.nan_to_num(got, nan=-9e17), np.nan_to_num(e, nan=-9e17)
        ), f"roll_{fn} k={k}"

    def test_post_arrange_rolling_matches_pandas(self, spark, tmp_path):
        self._multi_file(tmp_path, seed=42, n_rows=180, n_files=4)
        td = read_parquet(spark, str(tmp_path)) >> arrange(f.k)
        out = (
            (td >> mutate(rn=row_number(), r=roll_sum(f.v, 4)))
            .collect()
            .sort_values("rn")
            .reset_index(drop=True)
        )
        exp = _oracle(out["v"], 4, "sum")
        got = out["r"].to_numpy(dtype="float64")
        assert np.allclose(
            np.nan_to_num(got, nan=-9e17),
            np.nan_to_num(np.asarray(exp, dtype="float64"), nan=-9e17),
        )

    def test_ungrouped_rolling_no_single_partition(self, spark):
        td = read_parquet(spark, "/root/testdata/sf0.001/orders.parquet")
        out = td >> mutate(r=roll_mean(f.o_totalprice, 8))
        plan = out.df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan


class TestFallbackShapes:
    """The least-exercised branches of the window engine (r3 verdict
    #8): the k > MAX_TWO_PASS_SHIFT global-window fallback, large-n
    lag/lead fallback, grouped rolling with order_by, and NULL
    timestamps through trailing_agg."""

    def test_large_k_falls_back_and_matches_pandas(self, spark):
        # k-1 > MAX_TWO_PASS_SHIFT (32) -> the simple global window
        # path must produce identical answers (only the plan differs)
        rng = np.random.RandomState(11)
        xs = rng.standard_normal(120).round(3).tolist()
        k = 40
        out = (
            tibble(spark, x=xs)
            >> mutate(rn=row_number(), r=roll_sum(f.x, k, min_periods=5))
        ).collect().sort_values("rn")
        exp = _oracle(pd.Series(xs), k, "sum", min_periods=5)
        assert np.allclose(
            np.nan_to_num(out["r"].to_numpy(dtype="float64"), nan=-9e17),
            np.nan_to_num(np.asarray(exp, dtype="float64"), nan=-9e17),
        )

    def test_large_shift_falls_back_and_matches_pandas(self, spark):
        from datar_polars_spark.functions import lag, lead

        xs = list(range(100))
        n = 40  # > MAX_TWO_PASS_SHIFT -> simple F.lag path
        out = (
            tibble(spark, x=xs)
            >> mutate(rn=row_number(), l=lag(f.x, n, default=-1),
                      d=lead(f.x, n, default=-1))
        ).collect().sort_values("rn")
        s = pd.Series(xs, dtype="float64")
        assert out["l"].tolist() == s.shift(n, fill_value=-1).astype(int).tolist()
        assert out["d"].tolist() == s.shift(-n, fill_value=-1).astype(int).tolist()

    def test_grouped_rolling_with_order_by(self, spark):
        # grouped roll in ANOTHER column's order: windows must follow
        # order_by, not frame order
        rng = np.random.RandomState(7)
        n = 60
        pdf = pd.DataFrame({
            "g": rng.randint(0, 3, n),
            "t": rng.permutation(n),
            "v": rng.standard_normal(n).round(3),
        })
        td = tibble(spark, g=pdf["g"].tolist(), t=pdf["t"].tolist(),
                    v=pdf["v"].tolist())
        out = (
            td >> group_by(f.g)
            >> mutate(r=roll_sum(f.v, 3, order_by=f.t))
        ).collect()
        exp = (
            pdf.sort_values(["g", "t"])
            .groupby("g")["v"]
            .transform(lambda s: s.rolling(3).sum())
        )
        got = out.sort_values(["g", "t"])["r"].to_numpy(dtype="float64")
        e = pdf.assign(e=exp).sort_values(["g", "t"])["e"].to_numpy(dtype="float64")
        assert np.allclose(np.nan_to_num(got, nan=-9e17),
                           np.nan_to_num(e, nan=-9e17))

    def test_trailing_agg_null_timestamps(self, spark):
        # NULL ts rows: all NULL-ts rows of a group are RANGE peers (one
        # shared frame), matching DuckDB's RANGE window semantics
        import duckdb

        from datar_polars_spark.scale.sessions import trailing_agg

        pdf = pd.DataFrame({
            "g": ["a", "a", "a", "b", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", None, "2024-01-01 00:30:00",
                 None, None]
            ),
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
        })
        from datar_polars_spark.tibble import from_pandas

        td = from_pandas(spark, pdf) >> group_by(f.g)
        out = trailing_agg(td, f.ts, f.v, window="1 hour", fns=("sum",))
        got = (
            out.df.select("g", "ts", "v", "v_sum")
            .toPandas()
            .sort_values(["g", "v"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", pdf)
        exp = con.execute(
            """
            SELECT g, ts, v, SUM(v) OVER (
                PARTITION BY g ORDER BY ts
                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
            ) AS v_sum FROM t ORDER BY g, v
            """
        ).df().reset_index(drop=True)
        assert np.allclose(
            np.nan_to_num(got["v_sum"].to_numpy(dtype="float64"), nan=-9e17),
            np.nan_to_num(exp["v_sum"].to_numpy(dtype="float64"), nan=-9e17),
        )
