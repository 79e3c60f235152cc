"""overlap_join: interval-interval join, bucketized on both sides.
Differential-tested against DuckDB's raw overlap predicate."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datar_polars_spark import f, tibble
from datar_polars_spark.operators.join import overlap_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(23)
    xs = pd.DataFrame(
        {"g": rng.choice(["a", "b"], 150), "s": rng.uniform(0, 500, 150).round(2)}
    )
    xs["e"] = (xs.s + rng.exponential(20, 150)).round(2)
    xs["xid"] = np.arange(150)
    ys = pd.DataFrame(
        {"g": rng.choice(["a", "b"], 60), "lo": rng.uniform(0, 500, 60).round(2)}
    )
    ys["hi"] = (ys.lo + rng.exponential(15, 60)).round(2)
    ys.loc[0, ["lo", "hi"]] = [0.0, 1e6]  # giant right interval
    ys["yid"] = np.arange(60)
    return xs, ys


def _duck(xs, ys, sql):
    con = duckdb.connect()
    con.register("xs", xs)
    con.register("ys", ys)
    return con.execute(sql).df()


def test_inner_matches_duckdb(spark, frames):
    xs, ys = frames
    tx = tibble(spark, **{c: xs[c].tolist() for c in xs})
    ty = tibble(spark, **{c: ys[c].tolist() for c in ys})
    out = overlap_join(tx, ty, on=((f.s, f.e), (f.lo, f.hi)), by="g").collect()
    exp = _duck(
        xs, ys,
        "SELECT x.xid, y.yid FROM xs x JOIN ys y "
        "ON x.g=y.g AND x.s <= y.hi AND y.lo <= x.e",
    )
    a = sorted(map(tuple, out[["xid", "yid"]].to_numpy().tolist()))
    b = sorted(map(tuple, exp.to_numpy().tolist()))
    assert a == b


def test_left_keeps_unmatched(spark, frames):
    xs, ys = frames
    tx = tibble(spark, **{c: xs[c].tolist() for c in xs})
    ty = tibble(spark, **{c: ys[c].tolist() for c in ys})
    out = overlap_join(
        tx, ty, on=((f.s, f.e), (f.lo, f.hi)), by="g", how="left"
    ).collect()
    exp_n = _duck(
        xs, ys,
        "SELECT count(*) c FROM xs x LEFT JOIN ys y "
        "ON x.g=y.g AND x.s <= y.hi AND y.lo <= x.e",
    )["c"][0]
    assert len(out) == int(exp_n)
    assert set(out["xid"]) == set(xs["xid"])


def test_no_by(spark, frames):
    xs, ys = frames
    tx = tibble(spark, **{c: xs[c].tolist() for c in xs})
    ty = tibble(spark, **{c: ys[c].tolist() for c in ys})
    out = overlap_join(tx, ty, on=((f.s, f.e), (f.lo, f.hi))).collect()
    exp_n = _duck(
        xs, ys,
        "SELECT count(*) c FROM xs x JOIN ys y ON x.s <= y.hi AND y.lo <= x.e",
    )["c"][0]
    assert len(out) == int(exp_n)


def test_bad_on_raises(spark):
    tx = tibble(spark, s=[1.0], e=[2.0])
    ty = tibble(spark, lo=[0.0], hi=[3.0])
    with pytest.raises(ValueError, match="on="):
        overlap_join(tx, ty)
