"""Hypothesis differential fuzzing for range_join / overlap_join vs
DuckDB's raw inequality predicates: random interval data (including
zero-width, nested, giant, and negative intervals), random by-keys."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datar_polars_spark import f, tibble
from datar_polars_spark.operators.join import overlap_join, range_join

# r15: heavy property/fuzz breadth — skipped by the default
# "-m not slow" run (driver verify window); tools/partest.py and
# any explicit -m override still run it in full.
pytestmark = pytest.mark.slow

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _mk(seed, n_pts, n_iv, grouped, giant):
    rng = np.random.RandomState(seed)
    gvals = ["a", "b", "c"] if grouped else ["z"]
    pts = pd.DataFrame(
        {
            "g": rng.choice(gvals, n_pts),
            "k": rng.uniform(-50, 50, n_pts).round(2),
            "pid": np.arange(n_pts),
        }
    )
    iv = pd.DataFrame(
        {"g": rng.choice(gvals, n_iv), "lo": rng.uniform(-60, 55, n_iv).round(2)}
    )
    spans = rng.exponential(5, n_iv)
    spans[rng.rand(n_iv) < 0.2] = 0.0  # zero-width intervals
    iv["hi"] = (iv.lo + spans).round(2)
    if giant and n_iv > 0:
        iv.loc[iv.index[0], ["lo", "hi"]] = [-1e6, 1e6]
    iv["iid"] = np.arange(n_iv)
    return pts, iv


@SET
@given(
    seed=st.integers(0, 99999),
    n_pts=st.integers(5, 120),
    n_iv=st.integers(1, 40),
    grouped=st.booleans(),
    giant=st.booleans(),
)
def test_range_join_matches_duckdb(spark, seed, n_pts, n_iv, grouped, giant):
    pts, iv = _mk(seed, n_pts, n_iv, grouped, giant)
    tx = tibble(spark, **{c: pts[c].tolist() for c in pts})
    ty = tibble(spark, **{c: iv[c].tolist() for c in iv})
    by = "g" if grouped else None
    out = range_join(tx, ty, on=(f.k, f.lo, f.hi), by=by).collect()
    con = duckdb.connect()
    con.register("pts", pts)
    con.register("iv", iv)
    cond = "p.k BETWEEN i.lo AND i.hi" + (" AND p.g=i.g" if grouped else "")
    exp = con.execute(
        f"SELECT p.pid, i.iid FROM pts p JOIN iv i ON {cond}"
    ).df()
    a = sorted(map(tuple, out[["pid", "iid"]].to_numpy().tolist()))
    b = sorted(map(tuple, exp.to_numpy().tolist()))
    assert a == b


@SET
@given(
    seed=st.integers(0, 99999),
    n_x=st.integers(3, 60),
    n_y=st.integers(1, 40),
    grouped=st.booleans(),
    giant=st.booleans(),
)
def test_overlap_join_matches_duckdb(spark, seed, n_x, n_y, grouped, giant):
    rng = np.random.RandomState(seed)
    gvals = ["a", "b"] if grouped else ["z"]
    xs = pd.DataFrame(
        {"g": rng.choice(gvals, n_x), "s": rng.uniform(-50, 50, n_x).round(2)}
    )
    xs["e"] = (xs.s + rng.exponential(4, n_x)).round(2)
    xs["xid"] = np.arange(n_x)
    ys = pd.DataFrame(
        {"g": rng.choice(gvals, n_y), "lo": rng.uniform(-55, 55, n_y).round(2)}
    )
    ys["hi"] = (ys.lo + rng.exponential(4, n_y)).round(2)
    if giant:
        ys.loc[ys.index[0], ["lo", "hi"]] = [-1e6, 1e6]
    ys["yid"] = np.arange(n_y)
    tx = tibble(spark, **{c: xs[c].tolist() for c in xs})
    ty = tibble(spark, **{c: ys[c].tolist() for c in ys})
    by = "g" if grouped else None
    out = overlap_join(tx, ty, on=((f.s, f.e), (f.lo, f.hi)), by=by).collect()
    con = duckdb.connect()
    con.register("xs", xs)
    con.register("ys", ys)
    cond = "x.s <= y.hi AND y.lo <= x.e" + (" AND x.g=y.g" if grouped else "")
    exp = con.execute(
        f"SELECT x.xid, y.yid FROM xs x JOIN ys y ON {cond}"
    ).df()
    a = sorted(map(tuple, out[["xid", "yid"]].to_numpy().tolist()))
    b = sorted(map(tuple, exp.to_numpy().tolist()))
    assert a == b
