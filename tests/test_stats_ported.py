"""Ported from reference tests/base/test_stats.py — cov, diff, scale,
weighted_mean, quantile in both eager (list) and deferred (mutate)
forms.
"""

import pytest

from datar_polars_spark import f, group_by, mutate, summarise, tibble
from datar_polars_spark.functions import (
    cov,
    diff,
    quantile,
    round_,
    scale,
    weighted_mean,
)


class TestCov:
    def test_cov_lists(self):
        assert cov([1, 2, 3, 4], [4, 3, 2, 1]) == pytest.approx(-5 / 3)

    def test_cov_no_y_raises(self):
        with pytest.raises(ValueError):
            cov([1, 2, 3])

    def test_cov_in_summarise(self, spark):
        td = tibble(spark, x=[1.0, 2.0, 3.0, 4.0], y=[4.0, 3.0, 2.0, 1.0])
        out = (td >> summarise(c=round_(cov(f.x, f.y), 4))).collect()
        assert out["c"].tolist() == [round(-5 / 3, 4)]


class TestDiff:
    def test_diff_lag1(self):
        assert diff([1, 3, 6, 10, 15]) == [None, 2, 3, 4, 5]

    def test_diff_lag2(self):
        assert diff([1, 3, 6, 10, 15], lag=2) == [None, None, 5, 7, 9]

    def test_diff_differences2(self):
        assert diff([1, 3, 6, 10, 15], differences=2) == [None, None, 1, 1, 1]

    def test_diff_scalar(self):
        assert diff(5) is None

    def test_diff_in_mutate(self, spark):
        td = tibble(spark, x=[1, 3, 6, 10])
        out = (td >> mutate(y=diff(f.x))).collect()
        vals = out["y"].tolist()
        assert vals[0] is None or vals[0] != vals[0]
        assert vals[1:] == [2, 3, 4]

    def test_diff_differences2_in_mutate(self, spark):
        td = tibble(spark, x=[1, 3, 6, 10, 15])
        out = (td >> mutate(y=diff(f.x, differences=2))).collect()
        assert out["y"].tolist()[2:] == [1, 1, 1]

    def test_diff_grouped(self, spark):
        td = tibble(spark, g=["a", "a", "a", "b", "b"], x=[1, 3, 6, 10, 11])
        out = (td >> group_by(f.g) >> mutate(y=diff(f.x))).collect()
        vals = out.sort_values(["g", "x"])["y"].tolist()
        assert vals[1:3] == [2, 3]
        assert vals[4] == 1


class TestScale:
    def test_scale_default(self):
        vals = scale([1, 2, 3, 4, 5])
        assert vals[2] == pytest.approx(0.0)
        assert vals[0] == pytest.approx(-1.2649, rel=1e-3)

    def test_scale_center_only(self):
        assert scale([1, 2, 3, 4, 5], center=True, scale_=False) == [
            -2,
            -1,
            0,
            1,
            2,
        ]

    def test_scale_noop(self):
        assert scale([1, 2, 3], center=False, scale_=False) == [1.0, 2.0, 3.0]

    def test_scale_in_mutate(self, spark):
        td = tibble(spark, x=[1.0, 2.0, 3.0, 4.0, 5.0])
        out = (td >> mutate(y=scale(f.x))).collect()
        assert sorted(out["y"].tolist())[2] == pytest.approx(0.0)

    def test_scale_center_only_in_mutate(self, spark):
        td = tibble(spark, x=[1.0, 2.0, 3.0, 4.0, 5.0])
        out = (td >> mutate(y=scale(f.x, center=True, scale_=False))).collect()
        assert sorted(out["y"].tolist()) == [-2, -1, 0, 1, 2]


class TestWeightedMean:
    def test_weighted_mean_equal(self):
        assert weighted_mean([1, 2, 3, 4], [1, 1, 1, 1]) == pytest.approx(2.5)

    def test_weighted_mean_unequal(self):
        assert weighted_mean([1, 2, 3, 4], [1, 2, 3, 4]) == pytest.approx(3.0)

    def test_weighted_mean_no_weights(self):
        assert weighted_mean([1, 2, 3, 4]) == pytest.approx(2.5)

    def test_weighted_mean_in_summarise(self, spark):
        td = tibble(spark, x=[1.0, 2.0, 3.0, 4.0], w=[1.0, 2.0, 3.0, 4.0])
        out = (td >> summarise(y=weighted_mean(f.x, f.w))).collect()
        assert out["y"].tolist() == [pytest.approx(3.0)]


class TestQuantile:
    def test_quantile_single(self):
        assert quantile([1, 2, 3, 4, 5], probs=0.5) == 3.0

    def test_quantile_multiple(self):
        assert quantile([1, 2, 3, 4, 5], probs=[0.25, 0.5, 0.75]) == [2.0, 3.0, 4.0]

    def test_quantile_default_quartiles(self):
        assert quantile([1, 2, 3, 4, 5]) == [1.0, 2.0, 3.0, 4.0, 5.0]

    def test_quantile_in_summarise(self, spark):
        td = tibble(spark, x=[1.0, 2.0, 3.0, 4.0, 5.0])
        out = (td >> summarise(q=quantile(f.x, 0.5))).collect()
        assert out["q"].tolist() == [3.0]
