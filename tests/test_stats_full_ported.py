"""Port of reference tests/base/test_stats.py (exact names): cov,
diff, scale, weighted_mean, quantile — list and in-verb dispatch.
The reference returns None-padded diffs (R drops the first lag
elements; the reference pads to input length) — matched here."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, mutate, summarise, tibble
from datar_polars_spark.functions import (
    cov,
    diff,
    quantile,
    scale,
    weighted_mean,
)


def test_cov_two_series():
    assert cov([1, 2, 3, 4, 5], [2, 4, 6, 8, 10]) == pytest.approx(5.0)


def test_cov_series_with_list():
    assert cov([1, 2, 3, 4, 5], [2, 4, 6, 8, 10]) == pytest.approx(5.0)


def test_cov_series_no_y_raises():
    with pytest.raises((ValueError, TypeError)):
        cov([1, 2, 3])


def test_cov_scalars():
    assert cov([1, 2, 3], [4, 5, 6]) == pytest.approx(1.0)


def test_cov_in_mutate(spark):
    td = tibble(spark, x=[1, 2, 3, 4, 5], y=[2, 4, 6, 8, 10])
    out = (td >> summarise(z=cov(f.x, f.y))).collect()
    assert out["z"].tolist() == pytest.approx([5.0])


def test_diff_series_lag1():
    assert diff([1, 3, 6, 10, 15]) == [None, 2, 3, 4, 5]


def test_diff_series_lag2():
    assert diff([1, 3, 6, 10, 15], lag=2) == [None, None, 5, 7, 9]


def test_diff_series_diff2():
    assert diff([1, 3, 6, 10, 15], differences=2) == [None, None, 1, 1, 1]


def test_diff_list():
    assert diff([1, 4, 9, 16]) == [None, 3, 5, 7]


def test_diff_in_mutate(spark):
    td = tibble(spark, x=[1, 3, 6, 10])
    vals = (td >> mutate(y=diff(f.x))).collect()["y"].tolist()
    import math

    assert vals[0] is None or math.isnan(vals[0])
    assert vals[1:] == [2, 3, 4]


def test_scale_series_default():
    vals = scale([1, 2, 3, 4, 5])
    assert vals[2] == pytest.approx(0.0)
    expected = [-1.2649, -0.6325, 0.0, 0.6325, 1.2649]
    for v, e in zip(vals, expected):
        assert v == pytest.approx(e, rel=1e-3)


def test_scale_series_center_only():
    assert scale([1, 2, 3, 4, 5], center=True, scale_=False) == [-2, -1, 0, 1, 2]


def test_scale_series_scale_only():
    vals = scale([1, 2, 3, 4, 5], center=False, scale_=True)
    assert sum(vals) != pytest.approx(0.0)


def test_scale_series_noop():
    assert scale([1, 2, 3], center=False, scale_=False) == [1, 2, 3]


def test_scale_list():
    assert scale([1, 2, 3, 4, 5])[2] == pytest.approx(0.0)


def test_scale_in_mutate(spark):
    td = tibble(spark, x=[1, 2, 3, 4, 5])
    vals = (td >> mutate(y=scale(f.x))).collect()["y"].tolist()
    assert vals[2] == pytest.approx(0.0)


def test_weighted_mean_series():
    assert weighted_mean([1, 2, 3, 4], [1, 1, 1, 1]) == pytest.approx(2.5)


def test_weighted_mean_unequal_weights():
    assert weighted_mean([1, 2, 3, 4], [1, 2, 3, 4]) == pytest.approx(3.0)


def test_weighted_mean_no_weights():
    assert weighted_mean([1, 2, 3, 4]) == pytest.approx(2.5)


def test_weighted_mean_list():
    assert weighted_mean([1, 2, 3, 4], [1, 2, 3, 4]) == pytest.approx(3.0)


def test_weighted_mean_in_mutate(spark):
    td = tibble(spark, x=[1, 2, 3, 4], w=[1, 2, 3, 4])
    out = (td >> summarise(y=weighted_mean(f.x, f.w))).collect()
    assert out["y"].tolist() == pytest.approx([3.0])


def test_quantile_series_single():
    assert quantile([1, 2, 3, 4, 5], probs=0.5) == 3.0


def test_quantile_series_multiple():
    assert quantile([1, 2, 3, 4, 5], probs=[0.25, 0.5, 0.75]) == [2.0, 3.0, 4.0]


def test_quantile_series_default():
    assert quantile([1, 2, 3, 4, 5]) == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_quantile_list():
    assert quantile([1, 2, 3, 4, 5], probs=0.5) == 3.0


def test_quantile_in_mutate(spark):
    td = tibble(spark, x=[1, 2, 3, 4, 5])
    out = (td >> summarise(y=quantile(f.x, probs=0.5))).collect()
    assert out["y"].tolist() == pytest.approx([3.0])
