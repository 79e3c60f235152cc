"""Port of reference tests/dplyr/test_rank.py (exact names)."""

from __future__ import annotations

import pytest

from datar_polars_spark import arrange, f, mutate, tibble
from datar_polars_spark.functions import (
    cume_dist,
    dense_rank,
    lag,
    lead,
    min_rank,
    ntile,
    percent_rank,
    row_number,
)


def test_row_number_in_mutate(spark):
    td = tibble(spark, x=[10, 20, 30])
    assert (td >> mutate(rn=row_number())).collect()["rn"].tolist() == [1, 2, 3]


def test_row_number_after_arrange(spark):
    td = tibble(spark, x=[30, 10, 20])
    out = (td >> arrange(f.x) >> mutate(rn=row_number())).collect()
    assert out["rn"].tolist() == [1, 2, 3]
    assert out["x"].tolist() == [10, 20, 30]


def test_min_rank_in_mutate(spark):
    td = tibble(spark, x=[3, 1, 2, 2])
    assert (td >> mutate(r=min_rank(f.x))).collect()["r"].tolist() == [4, 1, 2, 2]


def test_dense_rank_in_mutate(spark):
    td = tibble(spark, x=[3, 1, 2, 2])
    assert (td >> mutate(r=dense_rank(f.x))).collect()["r"].tolist() == [3, 1, 2, 2]


def test_percent_rank_series():
    assert percent_rank([1, 2, 3, 4]) == pytest.approx([0.0, 1 / 3, 2 / 3, 1.0])


def test_cume_dist_series():
    assert cume_dist([1, 2, 3, 4]) == pytest.approx([0.25, 0.5, 0.75, 1.0])


def test_lead_lag_in_mutate(spark):
    import math

    td = tibble(spark, x=[1, 2, 3, 4])
    out = (td >> mutate(y_lead=lead(f.x), y_lag=lag(f.x))).collect()
    lead_vals = out["y_lead"].tolist()
    lag_vals = out["y_lag"].tolist()
    assert lead_vals[:3] == [2, 3, 4]
    assert lead_vals[3] is None or math.isnan(lead_vals[3])
    assert lag_vals[1:] == [1, 2, 3]
    assert lag_vals[0] is None or math.isnan(lag_vals[0])


def test_ntile_plain():
    assert ntile([1, 2, 3, 4, 5, 6], n=3) == [1, 1, 2, 2, 3, 3]


def test_ranks(spark):
    import math

    td = tibble(spark, x=[5.0, 1.0, 3.0, 2.0, 2.0, None])
    out = (
        td
        >> mutate(
            rn=row_number(f.x),
            mr=min_rank(f.x),
            dr=dense_rank(f.x),
            pr=percent_rank(f.x),
            cd=cume_dist(f.x),
            nt=ntile(f.x, n=2),
        )
    ).collect()
    assert out["mr"].tolist()[:5] == [5, 1, 4, 2, 2]
    assert out["dr"].tolist()[:5] == [4, 1, 3, 2, 2]
    assert out["rn"].tolist()[:5] == [5, 1, 4, 2, 3]
    assert out["pr"].tolist()[:5] == pytest.approx([1.0, 0.0, 0.75, 0.25, 0.25])
    assert out["cd"].tolist()[:5] == pytest.approx([1.0, 0.2, 0.8, 0.6, 0.6])
    for col in ("rn", "mr", "dr", "pr", "cd", "nt"):
        v = out[col].tolist()[5]
        assert v is None or (isinstance(v, float) and math.isnan(v))
