"""range_join: point-in-interval join with bucketized equi-join
prefilter (no reference equivalent; dplyr 1.1 join_by(between())
semantics). Differential-tested against DuckDB's BETWEEN join."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datar_polars_spark import f, tibble
from datar_polars_spark.operators.join import range_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(11)
    pts = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 400),
            "k": rng.uniform(0, 1000, 400).round(2),
            "pid": np.arange(400),
        }
    )
    iv = pd.DataFrame(
        {"g": rng.choice(["a", "b", "c"], 80), "lo": rng.uniform(0, 950, 80).round(2)}
    )
    iv["hi"] = (iv.lo + rng.exponential(25, 80)).round(2)
    # giant interval exercises the broadcast wide path
    iv.loc[0, ["lo", "hi"]] = [0.0, 1e6]
    iv["iid"] = np.arange(80)
    return pts, iv


def _duck(pts, iv, sql):
    con = duckdb.connect()
    con.register("pts", pts)
    con.register("iv", iv)
    return con.execute(sql).df()


def test_inner_matches_duckdb(spark, frames):
    pts, iv = frames
    tx = tibble(spark, **{c: pts[c].tolist() for c in pts})
    ty = tibble(spark, **{c: iv[c].tolist() for c in iv})
    out = range_join(tx, ty, on=(f.k, f.lo, f.hi), by="g").collect()
    exp = _duck(
        pts, iv,
        "SELECT p.g, p.k, p.pid, i.lo, i.hi, i.iid FROM pts p "
        "JOIN iv i ON p.g=i.g AND p.k BETWEEN i.lo AND i.hi",
    )
    a = sorted(map(tuple, out[["g", "k", "pid", "lo", "hi", "iid"]].to_numpy().tolist()))
    b = sorted(map(tuple, exp.to_numpy().tolist()))
    assert a == b


def test_left_keeps_unmatched(spark, frames):
    pts, iv = frames
    tx = tibble(spark, **{c: pts[c].tolist() for c in pts})
    ty = tibble(spark, **{c: iv[c].tolist() for c in iv})
    out = range_join(tx, ty, on=(f.k, f.lo, f.hi), by="g", how="left").collect()
    exp_n = _duck(
        pts, iv,
        "SELECT count(*) c FROM pts p LEFT JOIN iv i "
        "ON p.g=i.g AND p.k BETWEEN i.lo AND i.hi",
    )["c"][0]
    assert len(out) == int(exp_n)
    assert set(out["pid"]) == set(pts["pid"])


def test_no_by_cross_range(spark, frames):
    pts, iv = frames
    tx = tibble(spark, **{c: pts[c].tolist() for c in pts.columns})
    ty = tibble(spark, **{c: iv[c].tolist() for c in iv.columns})
    out = range_join(tx, ty, on=(f.k, f.lo, f.hi)).collect()
    exp_n = _duck(
        pts, iv, "SELECT count(*) c FROM pts p JOIN iv i ON p.k BETWEEN i.lo AND i.hi"
    )["c"][0]
    assert len(out) == int(exp_n)


def test_compiles_to_hash_join_not_bnlj(spark, frames):
    pts, iv = frames
    tx = tibble(spark, **{c: pts[c].tolist() for c in pts.columns})
    ty = tibble(spark, **{c: iv[c].tolist() for c in iv.columns})
    plan = (
        range_join(tx, ty, on=(f.k, f.lo, f.hi), by="g")
        .df._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_suffix_on_clash(spark):
    tx = tibble(spark, k=[5.0, 50.0], v=[1, 2])
    ty = tibble(spark, lo=[0.0], hi=[10.0], v=[9])
    out = range_join(tx, ty, on=(f.k, f.lo, f.hi)).collect()
    assert "v_y" in out.columns and out["v"].tolist() == [1]


def test_bad_args_raise(spark):
    tx = tibble(spark, k=[1.0])
    ty = tibble(spark, lo=[0.0], hi=[2.0])
    with pytest.raises(ValueError, match="on="):
        range_join(tx, ty)
    with pytest.raises(ValueError, match="how"):
        range_join(tx, ty, on=(f.k, f.lo, f.hi), how="outer")


def test_timestamp_keys(spark):
    """Temporal keys route through the timestamp->double cast (same
    path asof_join uses); event time joined into [start, end] windows."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    events = tibble(
        spark,
        t=[base + dt.timedelta(minutes=m) for m in (5, 30, 65, 200)],
        eid=[0, 1, 2, 3],
    )
    windows = tibble(
        spark,
        w_start=[base, base + dt.timedelta(hours=1)],
        w_end=[base + dt.timedelta(minutes=45), base + dt.timedelta(hours=2)],
        wid=[10, 20],
    )
    out = (
        range_join(events, windows, on=(f.t, f.w_start, f.w_end), how="left")
        .collect()
        .sort_values("eid")
    )
    got = dict(zip(out["eid"], out["wid"]))
    assert got[0] == 10 and got[1] == 10 and got[2] == 20
    assert pd.isna(got[3])


def test_empty_sides(spark):
    """Empty left / empty right frames: quantile probe degrades
    gracefully to the fallback width; no crash, correct emptiness."""
    tx = tibble(spark, k=[1.0, 2.0], pid=[0, 1])
    te = tibble(spark, k=[], pid=[])
    ty = tibble(spark, lo=[0.0], hi=[5.0], iid=[9])
    tye = tibble(spark, lo=[], hi=[], iid=[])
    assert len(range_join(te, ty, on=(f.k, f.lo, f.hi)).collect()) == 0
    assert len(range_join(tx, tye, on=(f.k, f.lo, f.hi)).collect()) == 0
    left = range_join(tx, tye, on=(f.k, f.lo, f.hi), how="left").collect()
    assert len(left) == 2 and left["iid"].isna().all()
