"""Port of reference tests/base/test_seq.py (exact names)."""

from __future__ import annotations

from datar_polars_spark import f, mutate, tibble
from datar_polars_spark.functions import rep, rev_, sample_, seq_along, seq_len


def test_seq_along_series():
    assert seq_along([10, 20, 30]) == [1, 2, 3]


def test_seq_along_list():
    assert seq_along([10, 20, 30, 40]) == [1, 2, 3, 4]


def test_seq_along_empty():
    assert seq_along([]) == []


def test_seq_along_scalar():
    assert seq_along(42) == [1]


def test_seq_along_in_mutate(spark):
    td = tibble(spark, x=[10, 20, 30])
    assert (td >> mutate(y=seq_along(f.x))).collect()["y"].tolist() == [1, 2, 3]


def test_seq_len_int():
    # reference's polars backend chose 0-based seq_len; matched here
    assert seq_len(3) == [0, 1, 2]


def test_seq_len_zero():
    assert seq_len(0) == []


def test_seq_len_one():
    assert seq_len(1) == [0]


def test_rep_series_times():
    assert rep([1, 2, 3], times=2) == [1, 2, 3, 1, 2, 3]


def test_rep_series_each():
    assert rep([1, 2, 3], each=2) == [1, 1, 2, 2, 3, 3]


def test_rep_series_length_out():
    assert rep([1, 2, 3], times=3, length=5) == [1, 2, 3, 1, 2]


def test_rep_list():
    assert rep([1, 2], times=3) == [1, 2, 1, 2, 1, 2]


def test_rep_scalar():
    assert rep(5, times=3) == [5, 5, 5]


def test_rep_with_c():
    assert rep([1, 2], times=[1, 2]) == [1, 2, 2]


def test_rev_series():
    assert rev_([1, 2, 3, 4]) == [4, 3, 2, 1]


def test_rev_list():
    assert rev_([1, 2, 3]) == [3, 2, 1]


def test_rev_scalar():
    assert rev_(42) == 42


def test_rev_empty():
    assert rev_([]) == []


def test_rev_in_mutate(spark):
    td = tibble(spark, x=[1, 2, 3])
    assert (td >> mutate(y=rev_(f.x))).collect()["y"].tolist() == [3, 2, 1]


def test_sample_series_no_replace():
    out = sample_([1, 2, 3, 4, 5], size=3)
    assert len(out) == 3 and set(out).issubset({1, 2, 3, 4, 5})


def test_sample_series_all():
    out = sample_([1, 2, 3])
    assert len(out) == 3 and set(out) == {1, 2, 3}
