"""R-base vector helpers + cur_data context expression."""

import pytest

from datar_polars_spark import f, tibble, group_by, mutate
from datar_polars_spark.functions import (
    seq,
    seq_len,
    rep,
    rev_list,
    sort_list,
    order_list,
    sample_list,
    cur_data,
    lengths,
)


def test_seq():
    assert seq(5) == [1, 2, 3, 4, 5]
    assert seq(2, 10, by=2) == [2, 4, 6, 8, 10]
    assert seq(0, 1, length_out=5) == [0.0, 0.25, 0.5, 0.75, 1.0]
    assert seq(5, 1) == [5, 4, 3, 2, 1]
    # reference api/base/seq.py:64: seq_len is 0-based range(n)
    assert seq_len(3) == [0, 1, 2]


def test_rep():
    assert rep(1, 3) == [1, 1, 1]
    assert rep([1, 2], times=2) == [1, 2, 1, 2]
    assert rep([1, 2], each=2) == [1, 1, 2, 2]
    assert rep([1, 2], times=[2, 3]) == [1, 1, 2, 2, 2]


def test_sort_order_rev():
    assert rev_list([1, 2, 3]) == [3, 2, 1]
    assert sort_list([3, None, 1], decreasing=True) == [3, 1]
    assert order_list([30, 10, 20]) == [2, 3, 1]


def test_sample_seeded():
    a = sample_list(10, 5, seed=42)
    b = sample_list(10, 5, seed=42)
    assert a == b and len(set(a)) == 5


def test_seq_in_tibble(spark):
    td = tibble(spark, x=seq(3), y=rep("a", 3))
    assert td.collect()["x"].tolist() == [1, 2, 3]


def test_cur_data(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3])
    out = td >> group_by(f.g) >> mutate(sz=lengths(cur_data()))
    got = out.collect()
    assert got["sz"].tolist() == [2, 2, 1]
    out2 = td >> group_by(f.g) >> mutate(d=cur_data())
    rows = out2.collect()["d"].tolist()
    assert [r["x"] for r in rows[0]] == [1, 2]
