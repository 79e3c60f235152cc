"""Differential fuzzing of the TWO-PASS window rewrites: random
multi-file parquet frames (several order buckets) through random
chains of arrange + order-sensitive ops, checked against a pandas
oracle that models frame order positionally. Exercises mono-id
buckets, key-value buckets (post-arrange), carry maps, and the rank
quantile buckets — the paths a single-partition window would hide."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datar_polars_spark import arrange, desc, f, mutate, read_parquet
from datar_polars_spark.functions import (
    cumsum,
    dense_rank,
    lag,
    lead,
    min_rank,
    row_number,
)

# r15: heavy property/fuzz breadth — skipped by the default
# "-m not slow" run (driver verify window); tools/partest.py and
# any explicit -m override still run it in full.
pytestmark = pytest.mark.slow

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _write_frame(tmpdir, rng_seed, n_rows, n_files, with_nulls):
    rng = np.random.RandomState(rng_seed)
    pdf = pd.DataFrame(
        {
            "k": rng.uniform(-100, 100, n_rows).round(3),
            "v": rng.randint(-50, 50, n_rows).astype("float64"),
        }
    )
    if with_nulls:
        pdf.loc[rng.rand(n_rows) < 0.1, "v"] = np.nan
    per = max(1, n_rows // n_files)
    for i in range(0, n_rows, per):
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[i : i + per]),
            f"{tmpdir}/part-{i:06d}.parquet",
        )
    return pdf


CHAINS = st.sampled_from(
    [
        ("plain", "lag1"),
        ("plain", "cumsum"),
        ("arr_k", "cumsum"),
        ("arr_k", "lag1"),
        ("arr_k", "lead2"),
        ("arr_k", "row_number"),
        ("arr_desc_k", "cumsum"),
        ("plain", "min_rank"),
        ("plain", "dense_rank"),
    ]
)


@SET
@given(
    seed=st.integers(0, 10_000),
    n_rows=st.integers(30, 400),
    n_files=st.integers(1, 6),
    with_nulls=st.booleans(),
    chain=CHAINS,
)
def test_two_pass_matches_pandas(spark, tmp_path_factory, seed, n_rows, n_files, with_nulls, chain):
    tmpdir = tmp_path_factory.mktemp("fuzz")
    pdf = _write_frame(str(tmpdir), seed, n_rows, n_files, with_nulls)
    td = read_parquet(spark, str(tmpdir))
    order_op, win_op = chain

    if order_op == "arr_k":
        td = td >> arrange(f.k)
    elif order_op == "arr_desc_k":
        td = td >> arrange(desc(f.k))

    td = td >> mutate(rn=row_number())
    if win_op == "lag1":
        td = td >> mutate(o=lag(f.v))
    elif win_op == "lead2":
        td = td >> mutate(o=lead(f.v, 2))
    elif win_op == "cumsum":
        td = td >> mutate(o=cumsum(f.v))
    elif win_op == "row_number":
        td = td >> mutate(o=row_number())
    elif win_op == "min_rank":
        td = td >> mutate(o=min_rank(f.v))
    elif win_op == "dense_rank":
        td = td >> mutate(o=dense_rank(f.v))

    got = td.collect().sort_values("rn").reset_index(drop=True)

    # pandas oracle in the SAME frame order: reorder pdf to match the
    # engine's row order via (k, v) multiset alignment is fragile with
    # duplicates — instead rebuild the oracle from the engine's own
    # (k, v) columns, which the engine carries through unchanged
    base = got[["k", "v"]]
    if win_op == "lag1":
        exp = base["v"].shift(1)
    elif win_op == "lead2":
        exp = base["v"].shift(-2)
    elif win_op == "cumsum":
        exp = base["v"].fillna(np.nan).cumsum().ffill()
        exp[base["v"].isna() & exp.isna()] = np.nan
    elif win_op == "row_number":
        exp = pd.Series(np.arange(1, len(base) + 1), dtype="float64")
    elif win_op == "min_rank":
        exp = base["v"].rank(method="min")
    elif win_op == "dense_rank":
        exp = base["v"].rank(method="dense")

    # frame-order sanity when arranged
    if order_op == "arr_k":
        assert (np.diff(base["k"].to_numpy()) >= 0).all()
    elif order_op == "arr_desc_k":
        assert (np.diff(base["k"].to_numpy()) <= 0).all()

    g = got["o"].to_numpy(dtype="float64")
    e = np.asarray(exp, dtype="float64")
    assert np.allclose(
        np.nan_to_num(g, nan=-1e18), np.nan_to_num(e, nan=-1e18), equal_nan=True
    ), f"{chain} mismatch"
