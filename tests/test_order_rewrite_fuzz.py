"""Differential fuzzing of the order discipline under column REWRITES
(round 3 — the sort_meta staleness bug territory): random chains of
arrange -> value-rewriting verb (replace_na / fill / mutate-overwrite /
filter / slice_head) -> order-sensitive window, checked against a
pandas oracle rebuilt from the engine's own carried columns. A stale
sort-key cache would bucket the two-pass window on pre-rewrite values
and silently scramble the cumulative results — exactly what the r2
advisor reproduced; this suite locks the fix across the verb grid."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datar_polars_spark import arrange, desc, f, filter_, mutate, read_parquet, replace_na, select
from datar_polars_spark.functions import cumsum, lag, min_rank, row_number
from datar_polars_spark.operators.core import slice_head
from datar_polars_spark.operators.tidyr import fill

# r15: heavy property/fuzz breadth — skipped by the default
# "-m not slow" run (driver verify window); tools/partest.py and
# any explicit -m override still run it in full.
pytestmark = pytest.mark.slow

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _write_frame(tmpdir, rng_seed, n_rows, n_files):
    rng = np.random.RandomState(rng_seed)
    pdf = pd.DataFrame(
        {
            "k": rng.uniform(-100, 100, n_rows).round(3),
            "v": rng.randint(-50, 50, n_rows).astype("float64"),
        }
    )
    pdf.loc[rng.rand(n_rows) < 0.25, "v"] = np.nan
    per = max(1, n_rows // n_files)
    for i in range(0, n_rows, per):
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[i : i + per]),
            f"{tmpdir}/part-{i:06d}.parquet",
        )
    return pdf


ORDERS = st.sampled_from(["none", "arr_k", "arr_desc_k", "arr_v"])
REWRITES = st.sampled_from(
    ["none", "replace_na_v", "fill_down_v", "overwrite_v", "filter_pos_k", "head10", "select_kv"]
)
WINS = st.sampled_from(["cumsum", "lag1", "row_number", "min_rank"])


@SET
@given(
    seed=st.integers(0, 10_000),
    n_rows=st.integers(40, 300),
    n_files=st.integers(1, 5),
    order_op=ORDERS,
    rewrite_op=REWRITES,
    win_op=WINS,
)
def test_rewrite_then_window_matches_pandas(
    spark, tmp_path_factory, seed, n_rows, n_files, order_op, rewrite_op, win_op
):
    tmpdir = tmp_path_factory.mktemp("ofz")
    _write_frame(str(tmpdir), seed, n_rows, n_files)
    td = read_parquet(spark, str(tmpdir))

    if order_op == "arr_k":
        td = td >> arrange(f.k)
    elif order_op == "arr_desc_k":
        td = td >> arrange(desc(f.k))
    elif order_op == "arr_v":
        td = td >> arrange(f.v)

    if rewrite_op == "replace_na_v":
        td = td >> replace_na({"v": -1.0})
    elif rewrite_op == "fill_down_v":
        td = td >> fill(f.v, _direction="down")
    elif rewrite_op == "overwrite_v":
        td = td >> mutate(v=f.v * 2 + 1)
    elif rewrite_op == "filter_pos_k":
        td = td >> filter_(f.k > 0)
    elif rewrite_op == "head10":
        td = td >> slice_head(n=10)
    elif rewrite_op == "select_kv":
        td = td >> select(f.k, f.v)

    td = td >> mutate(rn=row_number())
    if win_op == "cumsum":
        td = td >> mutate(o=cumsum(f.v))
    elif win_op == "lag1":
        td = td >> mutate(o=lag(f.v))
    elif win_op == "row_number":
        td = td >> mutate(o=row_number())
    elif win_op == "min_rank":
        td = td >> mutate(o=min_rank(f.v))

    got = td.collect().sort_values("rn").reset_index(drop=True)
    base = got[["k", "v"]]

    # frame order must still follow the arrange key where it survives
    # (v rewrites invalidate an arrange-on-v order check, k never
    # changes)
    ks = base["k"].to_numpy()
    if order_op == "arr_k" and len(ks) > 1:
        assert (np.diff(ks) >= 0).all()
    elif order_op == "arr_desc_k" and len(ks) > 1:
        assert (np.diff(ks) <= 0).all()

    if win_op == "cumsum":
        exp = base["v"].fillna(np.nan).cumsum().ffill()
        exp[base["v"].isna() & exp.isna()] = np.nan
    elif win_op == "lag1":
        exp = base["v"].shift(1)
    elif win_op == "row_number":
        exp = pd.Series(np.arange(1, len(base) + 1), dtype="float64")
    else:
        exp = base["v"].rank(method="min")

    g = got["o"].to_numpy(dtype="float64")
    e = np.asarray(exp, dtype="float64")
    assert np.allclose(
        np.nan_to_num(g, nan=-1e18), np.nan_to_num(e, nan=-1e18), equal_nan=True
    ), f"{(order_op, rewrite_op, win_op)} mismatch"
