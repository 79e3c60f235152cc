"""Shared fixtures: one local SparkSession per test session, plus the
NA-tolerant comparators the reference uses (tests/conftest.py:23-80)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("datar-polars-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


SENTINEL = object()


def _norm(v):
    if v is None:
        return SENTINEL
    if isinstance(v, float) and math.isnan(v):
        return SENTINEL
    return v


def assert_iterable_equal(a, b, approx=False):
    a = [_norm(x) for x in a]
    b = [_norm(x) for x in b]
    assert len(a) == len(b), f"length {len(a)} != {len(b)}: {a} vs {b}"
    for x, y in zip(a, b):
        if x is SENTINEL or y is SENTINEL:
            assert x is SENTINEL and y is SENTINEL, f"{a} vs {b}"
        elif approx and isinstance(x, float):
            assert x == pytest.approx(y), f"{a} vs {b}"
        else:
            assert x == y, f"{a} vs {b}"


def assert_frame_equal(pdf, expected: dict, approx=True):
    """expected: {col: [values]} in frame order."""
    assert list(pdf.columns) == list(expected.keys()), (
        f"columns {list(pdf.columns)} != {list(expected.keys())}"
    )
    for c, vals in expected.items():
        assert_iterable_equal(pdf[c].tolist(), vals, approx=approx)
