"""Window/rank function behavior parity (reference api/base/rank.py,
api/dplyr/rank.py, cum.py, funs.py suites): exact dplyr values."""

import pytest

from datar_polars_spark import f, tibble, mutate, group_by
from datar_polars_spark.functions import (
    row_number,
    min_rank,
    dense_rank,
    percent_rank,
    cume_dist,
    ntile,
    lead,
    lag,
    cumsum,
    cummax,
    cummin,
    cummean,
    cumall,
    cumany,
    consecutive_id,
    first,
    last,
    nth,
)

from conftest import assert_iterable_equal


def test_rank_family_values(spark):
    td = tibble(spark, x=[10, 20, 20, 30])
    got = (
        td >> mutate(
            mr=min_rank(f.x),
            dr=dense_rank(f.x),
            pr=percent_rank(f.x),
            cd=cume_dist(f.x),
        )
    ).collect()
    assert got["mr"].tolist() == [1, 2, 2, 4]
    assert got["dr"].tolist() == [1, 2, 2, 3]
    assert got["pr"].tolist() == pytest.approx([0.0, 1 / 3, 1 / 3, 1.0])
    assert got["cd"].tolist() == pytest.approx([0.25, 0.75, 0.75, 1.0])


def test_row_number_on_key_vs_frame(spark):
    td = tibble(spark, x=[30, 10, 20])
    got = (td >> mutate(rf=row_number(), rk=row_number(f.x))).collect()
    assert got["rf"].tolist() == [1, 2, 3]
    assert got["rk"].tolist() == [3, 1, 2]


def test_ntile_buckets(spark):
    td = tibble(spark, x=[1, 2, 3, 4, 5])
    got = (td >> mutate(t=ntile(f.x, n=2))).collect()
    assert got["t"].tolist() == [1, 1, 1, 2, 2]


def test_lead_lag_defaults(spark):
    td = tibble(spark, x=[1, 2, 3])
    got = (
        td >> mutate(
            l1=lag(f.x), l2=lag(f.x, 2, default=0), n1=lead(f.x, default=-1)
        )
    ).collect()
    assert_iterable_equal(got["l1"].tolist(), [None, 1, 2])
    assert got["l2"].tolist() == [0, 0, 1]
    assert got["n1"].tolist() == [2, 3, -1]


def test_cumulative_family(spark):
    td = tibble(spark, x=[3.0, 1.0, 2.0])
    got = (
        td >> mutate(
            cs=cumsum(f.x), cx=cummax(f.x), cn=cummin(f.x), cm=cummean(f.x)
        )
    ).collect()
    assert got["cs"].tolist() == [3.0, 4.0, 6.0]
    assert got["cx"].tolist() == [3.0, 3.0, 3.0]
    assert got["cn"].tolist() == [3.0, 1.0, 1.0]
    assert got["cm"].tolist() == pytest.approx([3.0, 2.0, 2.0])


def test_cumall_cumany(spark):
    td = tibble(spark, x=[True, True, False, True])
    got = (td >> mutate(a=cumall(f.x), o=cumany(~f.x))).collect()
    assert got["a"].tolist() == [True, True, False, False]
    assert got["o"].tolist() == [False, False, True, True]


def test_consecutive_id_runs(spark):
    td = tibble(spark, x=["a", "a", "b", "a"])
    got = (td >> mutate(cid=consecutive_id(f.x))).collect()
    assert got["cid"].tolist() == [1, 1, 2, 3]


def test_first_last_nth_with_order_by(spark):
    td = tibble(spark, g=["a", "a", "a"], x=[2, 1, 3], t=[1, 2, 3])
    got = (
        td >> group_by(f.g) >> mutate(
            fi=first(f.x), la=last(f.x), n2=nth(f.x, 1),
            fo=first(f.x, order_by=f.x),
        )
    ).collect()
    assert got["fi"].tolist() == [2, 2, 2]
    assert got["la"].tolist() == [3, 3, 3]
    assert got["n2"].tolist() == [1, 1, 1]
    assert got["fo"].tolist() == [1, 1, 1]


def test_grouped_windows_stay_in_group(spark):
    td = tibble(spark, g=["a", "b", "a", "b"], x=[1, 10, 2, 20])
    got = (td >> group_by(f.g) >> mutate(cs=cumsum(f.x), rn=row_number())).collect()
    assert got["cs"].tolist() == [1, 10, 3, 30]
    assert got["rn"].tolist() == [1, 1, 2, 2]


def test_rank_na_masked_grouped(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[None, 2.0, 5.0])
    got = (td >> group_by(f.g) >> mutate(r=min_rank(f.x))).collect()
    assert_iterable_equal(got["r"].tolist(), [None, 1, 1])


def test_min_rank_desc_key(spark):
    from datar_polars_spark import desc

    td = tibble(spark, x=list(range(1, 11)))
    out = td >> mutate(r=min_rank(desc(f.x)), dr=dense_rank(desc(f.x)))
    assert out.collect()["r"].tolist() == list(range(10, 0, -1))
    assert out.collect()["dr"].tolist() == list(range(10, 0, -1))


def test_min_rank_all_na_column(spark):
    td = tibble(spark, ID=[1] * 3, e=[None] * 3) >> group_by(f.ID)
    out = td >> mutate(r=min_rank(f.e))
    assert out.collect()["r"].isna().all()


def test_two_pass_shift_multi_bucket_parquet(spark):
    """lag/lead/ntile over a multi-file parquet scan (several order
    buckets) agree with the single-order pandas shift — exercises the
    per-bucket shift + carry-map boundary patch, including a shift
    distance larger than one bucket."""
    import numpy as np
    import pandas as pd

    from datar_polars_spark import read_parquet

    td = read_parquet(spark, "/root/testdata/sf0.01/orders.parquet")
    out = (
        td
        >> mutate(
            prev=lag(f.o_totalprice),
            prev9=lag(f.o_totalprice, 9, default=-1.0),
            nxt=lead(f.o_totalprice),
            rn=row_number(),
            nt=ntile(n=7),
        )
    ).collect()
    out = out.sort_values("rn").reset_index(drop=True)
    v = out["o_totalprice"]
    exp_prev9 = v.shift(9)
    exp_prev9.iloc[:9] = -1.0
    assert np.allclose(out["prev"].to_numpy()[1:], v.shift(1).to_numpy()[1:])
    assert out["prev"].isna().tolist()[:1] == [True]
    assert np.allclose(out["prev9"].to_numpy(), exp_prev9.to_numpy())
    assert np.allclose(out["nxt"].to_numpy()[:-1], v.shift(-1).to_numpy()[:-1])
    n_rows = len(out)
    base, rem = divmod(n_rows, 7)
    cut = rem * (base + 1)
    exp_nt = [
        (i // (base + 1) + 1) if i < cut else (rem + (i - cut) // base + 1)
        for i in range(n_rows)
    ]
    assert out["nt"].tolist() == exp_nt
