"""summarise multi-value explode (reference `_MultiValueExpr`,
summarise.py:61-64,240-247): quantile with a probs list yields one row
per prob per group; several multi-value columns zip together."""

import pytest

from datar_polars_spark import f, tibble, group_by, summarise
from datar_polars_spark.functions import quantile, n, mean


@pytest.fixture
def qdf(spark):
    return tibble(
        spark,
        g=["a"] * 4 + ["b"] * 4,
        x=[1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0],
    )


def test_multi_prob_quantile_explodes(qdf):
    out = qdf >> group_by(f.g) >> summarise(q=quantile(f.x, probs=[0.25, 0.5, 0.75]))
    got = out.collect().sort_values(["g", "q"]).reset_index(drop=True)
    assert got["g"].tolist() == ["a"] * 3 + ["b"] * 3
    assert got["q"].tolist() == pytest.approx([1.75, 2.5, 3.25, 17.5, 25.0, 32.5])


def test_multi_value_zips_with_scalar_aggs(qdf):
    out = qdf >> group_by(f.g) >> summarise(
        q=quantile(f.x, probs=[0.5, 0.9]), m=mean(f.x, na_rm=True), c=n()
    )
    got = out.collect().sort_values(["g", "q"]).reset_index(drop=True)
    # scalar aggs recycle across the exploded rows
    assert got["c"].tolist() == [4, 4, 4, 4]
    assert got["m"].tolist() == pytest.approx([2.5, 2.5, 25.0, 25.0])
    assert len(got) == 4


def test_two_multi_value_columns_align(qdf):
    out = qdf >> group_by(f.g) >> summarise(
        lo=quantile(f.x, probs=[0.1, 0.2]), hi=quantile(f.x, probs=[0.8, 0.9])
    )
    got = out.collect()
    assert len(got) == 4  # zipped, not cartesian
    a = got[got.g == "a"].sort_values("lo")
    assert a["lo"].tolist() == pytest.approx([1.3, 1.6])
    assert a["hi"].tolist() == pytest.approx([3.4, 3.7])


def test_scalar_quantile_unchanged(qdf):
    out = qdf >> group_by(f.g) >> summarise(q=quantile(f.x, probs=0.5))
    got = out.collect().sort_values("g")
    assert got["q"].tolist() == pytest.approx([2.5, 25.0])
