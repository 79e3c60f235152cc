"""Port of remaining small reference cases (exact names): special
scalars, seq/sample/length stragglers, summarise/group_by/stats/
distinct leftovers."""

from __future__ import annotations

import math

import pytest

from datar_polars_spark import distinct, f, group_by, mutate, summarise, tibble
from datar_polars_spark.functions import (
    lchoose,
    length,
    lfactorial,
    lgamma,
    psigamma,
    sample_,
    trigamma,
)


def test_lgamma():
    assert lgamma(1) == pytest.approx(0)
    assert lgamma([1, 2]) == pytest.approx([0, 0])


def test_trigamma():
    assert trigamma(1) == pytest.approx(1.6449340668482266)
    assert trigamma([1, 2]) == pytest.approx(
        [1.6449340668482266, 0.6449340668482266]
    )


def test_lfactorial():
    assert lfactorial(1) == pytest.approx(0)
    assert lfactorial([1, 2]) == pytest.approx([0, math.log(2)])


def test_lchoose():
    assert lchoose(2, 1) == pytest.approx(math.log(2))
    assert lchoose([2, 4], [1, 2]) == pytest.approx([math.log(2), math.log(6)])


def test_psigamma():
    assert psigamma(1, 0) == pytest.approx(-0.5772156649015329)
    assert psigamma(1, 1) == pytest.approx(1.6449340668482266)


def test_sample_list():
    result = sample_([1, 2, 3, 4, 5], size=2)
    assert len(result) == 2 and set(result).issubset({1, 2, 3, 4, 5})


def test_sample_scalar():
    assert sample_(42) == [42]


def test_length_series():
    assert length([1, 2, 3, 4]) == 4


def test_rep_in_mutate(spark):
    from datar_polars_spark.functions import rep

    # rep over a column multiplies rows; engine handles via list value
    td = tibble(spark, x=[1, 2])
    out = td >> mutate(y=rep([9], times=2))
    assert out.collect()["y"].tolist() == [9, 9]


def test_group_by_drop_default(spark):
    from datar_polars_spark import group_by_drop_default

    td = tibble(spark, x=[1, 2])
    assert group_by_drop_default(td) in (True, False)


def test_summarise_with_quantile_vector(spark):
    from datar_polars_spark.functions import quantile

    td = tibble(spark, g=[1, 1, 2, 2], x=[1.0, 2.0, 3.0, 4.0]) >> group_by(f.g)
    out = (td >> summarise(q=quantile(f.x, [0.5]))).collect()
    assert len(out) == 2


def test_distinct_on_computed(spark):
    td = tibble(spark, x=[1, 2, 3, 4])
    out = td >> distinct(parity=f.x % 2)
    assert sorted(out.collect()["parity"].tolist()) == [0, 1]
