"""Ported from reference tests/base/test_verbs.py: sum_/mean/median/
min_/max_/prod/abs_/sqrt/round_/ceiling/floor/sd/var in mutate,
summarise, grouped summarise, and EAGER scalar/list dispatch (the
reference registers both Expr and object backends; our builders fall
back to driver-side Python when no deferred expression is present).
"""

import pytest

from datar_polars_spark import diag_, f, group_by, mutate, summarise, tibble
from datar_polars_spark.functions import (
    abs_,
    ceiling,
    floor,
    max_,
    mean,
    median,
    min_,
    prod,
    round_,
    sd,
    sqrt,
    sum_,
    var,
)


def _one(spark, data, expr, **groups):
    td = tibble(spark, **data)
    return td, expr


class TestSum:
    def test_sum_in_mutate(self, spark):
        out = (tibble(spark, x=[1, 2, 3]) >> mutate(y=sum_(f.x))).collect()
        assert out["y"].tolist() == [6, 6, 6]

    def test_sum_in_summarise(self, spark):
        out = (tibble(spark, x=[1, 2, 3]) >> summarise(y=sum_(f.x))).collect()
        assert out["y"].tolist() == [6]

    def test_sum_scalar(self):
        assert sum_([1, 2, 3, 4]) == 10

    def test_sum_grouped(self, spark):
        td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3])
        out = (td >> group_by(f.g) >> summarise(y=sum_(f.x))).collect()
        assert sorted(out["y"].tolist()) == [3, 3]


class TestMean:
    def test_mean_in_mutate(self, spark):
        out = (tibble(spark, x=[1, 2, 3]) >> mutate(y=mean(f.x))).collect()
        assert out["y"].tolist() == [2.0, 2.0, 2.0]

    def test_mean_in_summarise(self, spark):
        out = (tibble(spark, x=[1, 2, 3]) >> summarise(y=mean(f.x))).collect()
        assert out["y"].tolist() == [2.0]

    def test_mean_scalar(self):
        assert mean([1, 2, 3]) == 2.0

    def test_mean_grouped(self, spark):
        td = tibble(spark, g=["a", "a", "b"], x=[1, 3, 5])
        out = (td >> group_by(f.g) >> summarise(y=mean(f.x))).collect()
        assert sorted(out["y"].tolist()) == [2.0, 5.0]


class TestMedian:
    def test_median_in_mutate(self, spark):
        out = (tibble(spark, x=[1, 2, 3]) >> mutate(y=median(f.x))).collect()
        assert out["y"].tolist() == [2.0, 2.0, 2.0]

    def test_median_in_summarise(self, spark):
        out = (tibble(spark, x=[1, 3, 5]) >> summarise(y=median(f.x))).collect()
        assert out["y"].tolist() == [3.0]

    def test_median_scalar(self):
        assert median([1, 3, 5]) == 3.0

    def test_median_grouped(self, spark):
        td = tibble(spark, g=["a", "a", "b"], x=[1, 5, 10])
        out = (td >> group_by(f.g) >> summarise(y=median(f.x))).collect()
        assert sorted(out["y"].tolist()) == [3.0, 10.0]


class TestMinMax:
    def test_min_in_mutate(self, spark):
        out = (tibble(spark, x=[3, 1, 2]) >> mutate(y=min_(f.x))).collect()
        assert out["y"].tolist() == [1, 1, 1]

    def test_min_in_summarise(self, spark):
        out = (tibble(spark, x=[3, 1, 2]) >> summarise(y=min_(f.x))).collect()
        assert out["y"].tolist() == [1]

    def test_min_scalar(self):
        assert min_([3, 1, 2]) == 1

    def test_max_in_mutate(self, spark):
        out = (tibble(spark, x=[3, 1, 2]) >> mutate(y=max_(f.x))).collect()
        assert out["y"].tolist() == [3, 3, 3]

    def test_max_in_summarise(self, spark):
        out = (tibble(spark, x=[3, 1, 2]) >> summarise(y=max_(f.x))).collect()
        assert out["y"].tolist() == [3]

    def test_max_scalar(self):
        assert max_([3, 1, 2]) == 3


class TestProd:
    def test_prod_in_summarise(self, spark):
        out = (tibble(spark, x=[1, 2, 3]) >> summarise(y=prod(f.x))).collect()
        assert out["y"].tolist() == [6]

    def test_prod_scalar(self):
        assert prod([1, 2, 3, 4]) == 24


class TestUnaryMath:
    def test_abs_in_mutate(self, spark):
        out = (tibble(spark, x=[-1, 2, -3]) >> mutate(y=abs_(f.x))).collect()
        assert out["y"].tolist() == [1, 2, 3]

    def test_abs_scalar(self):
        assert abs_(-5) == 5

    def test_sqrt_in_mutate(self, spark):
        out = (tibble(spark, x=[1, 4, 9]) >> mutate(y=sqrt(f.x))).collect()
        assert out["y"].tolist() == [1.0, 2.0, 3.0]

    def test_sqrt_scalar(self):
        assert sqrt(16) == 4.0

    def test_ceiling_in_mutate(self, spark):
        out = (tibble(spark, x=[1.2, 2.7, 3.0]) >> mutate(y=ceiling(f.x))).collect()
        assert out["y"].tolist() == [2.0, 3.0, 3.0]

    def test_ceiling_scalar(self):
        assert ceiling(2.3) == 3.0

    def test_floor_in_mutate(self, spark):
        out = (tibble(spark, x=[1.2, 2.7, 3.0]) >> mutate(y=floor(f.x))).collect()
        assert out["y"].tolist() == [1.0, 2.0, 3.0]

    def test_floor_scalar(self):
        assert floor(2.9) == 2.0


class TestRound:
    def test_round_in_mutate(self, spark):
        out = (
            tibble(spark, x=[1.234, 2.567, 3.891]) >> mutate(y=round_(f.x, 1))
        ).collect()
        assert out["y"].tolist() == [1.2, 2.6, 3.9]

    def test_round_default_digits(self, spark):
        out = (tibble(spark, x=[1.4, 2.6]) >> mutate(y=round_(f.x))).collect()
        assert out["y"].tolist() == [1.0, 3.0]

    def test_round_scalar(self):
        assert round_(3.14159, digits=2) == 3.14


class TestSdVar:
    def test_sd_in_summarise(self, spark):
        out = (tibble(spark, x=[1, 2, 3]) >> summarise(y=sd(f.x))).collect()
        assert out["y"].tolist() == [1.0]

    def test_sd_grouped(self, spark):
        td = tibble(spark, g=["a", "a", "b", "b"], x=[1, 3, 5, 7])
        out = (td >> group_by(f.g) >> summarise(y=sd(f.x))).collect()
        for v in out["y"].tolist():
            assert abs(v - 1.4142135623730951) < 0.01

    def test_var_in_summarise(self, spark):
        out = (tibble(spark, x=[1, 2, 3]) >> summarise(y=var(f.x))).collect()
        assert out["y"].tolist() == [1.0]

    def test_var_scalar(self):
        import numpy as np

        assert var([1, 2, 3, 4]) == pytest.approx(np.var([1, 2, 3, 4], ddof=1))

    def test_sd_scalar(self):
        assert sd([1, 3]) == pytest.approx(1.4142135623730951)


class TestDiag:
    def test_diag_vector_builds_matrix(self):
        assert diag_([1, 2, 3]).tolist() == [[1, 0, 0], [0, 2, 0], [0, 0, 3]]


class TestEagerNaHandling:
    def test_agg_with_none_propagates(self):
        assert sum_([1, None, 3]) is None
        assert sum_([1, None, 3], na_rm=True) == 4
        assert mean([1.0, None], na_rm=True) == 1.0
