"""Port of reference tests/dplyr/test_arrange.py (exact names).
NA placement deviations from the reference's polars defaults are
deliberate: this engine follows dplyr (NAs last in both directions)."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    arrange,
    desc,
    f,
    filter_,
    group_by,
    group_vars,
    load_dataset,
    tibble,
)
from datar_polars_spark.functions import across


def _gvars(td):
    return list(group_vars(td))


def test_arrange_single_column(spark):
    td = tibble(spark, x=[3, 1, 2])
    assert (td >> arrange(f.x)).collect()["x"].tolist() == [1, 2, 3]


def test_arrange_preserves_shape(spark):
    td = tibble(spark, x=[3, 1, 4, 1, 5], y=[1, 2, 3, 4, 5])
    out = td >> arrange(f.x)
    assert out.nrow() == 5 and out.columns == ["x", "y"]


def test_arrange_na_last(spark):
    # dplyr: NAs last (the reference's polars backend put them first)
    td = tibble(spark, x=[4.0, 3.0, None])
    vals = (td >> arrange(f.x)).collect()["x"].tolist()
    assert vals[:2] == [3.0, 4.0]
    import math

    assert vals[2] is None or math.isnan(vals[2])


def test_arrange_descending_single(spark):
    td = tibble(spark, x=[1, 3, 2])
    assert (td >> arrange(desc(f.x))).collect()["x"].tolist() == [3, 2, 1]


def test_arrange_desc_na_last(spark):
    # dplyr puts NAs last even for desc (reference/polars put them first)
    import math

    td = tibble(spark, x=[4.0, 3.0, None])
    vals = (td >> arrange(desc(f.x))).collect()["x"].tolist()
    assert vals[:2] == [4.0, 3.0]
    assert vals[2] is None or math.isnan(vals[2])


def test_arrange_with_across(spark):
    td = tibble(spark, x=[1, 1, 2, 2], y=[2, 1, 4, 3], z=[10, 40, 30, 20])
    out = (td >> arrange(across(f[f.y:]))).collect()
    assert out["x"].tolist() == [1, 1, 2, 2]
    assert out["y"].tolist() == [1, 2, 3, 4]
    assert out["z"].tolist() == [40, 10, 20, 30]


def test_arrange_two_columns(spark):
    td = tibble(spark, x=[1, 1, 2, 2], y=[2, 1, 4, 3])
    out = (td >> arrange(f.x, f.y)).collect()
    assert out["x"].tolist() == [1, 1, 2, 2]
    assert out["y"].tolist() == [1, 2, 3, 4]


def test_arrange_mixed_directions(spark):
    td = tibble(spark, x=[1, 1, 2, 2], y=[1, 2, 3, 4])
    out = (td >> arrange(f.x, desc(f.y))).collect()
    assert out["x"].tolist() == [1, 1, 2, 2]
    assert out["y"].tolist() == [2, 1, 4, 3]


def test_empty_returns_self(spark):
    td = tibble(spark, x=[1, 2, 3])
    assert (td >> arrange()).collect()["x"].tolist() == [1, 2, 3]


def test_empty_df_arrange(spark):
    td = tibble(spark, x=[], y=[])
    out = td >> arrange(f.x)
    assert out.nrow() == 0 and out.columns == ["x", "y"]


def test_empty_df_no_args(spark):
    td = tibble(spark, x=[], y=[])
    out = td >> arrange()
    assert out.nrow() == 0 and out.columns == ["x", "y"]


def test_arrange_ignores_group(spark):
    td = tibble(spark, g=[2, 1, 2, 1], x=[4, 3, 2, 1]) >> group_by(f.g)
    assert (td >> arrange(f.x)).collect()["x"].tolist() == [1, 2, 3, 4]


def test_arrange_by_group_true(spark):
    td = tibble(spark, g=[2, 1, 2, 1], x=[4, 3, 2, 1]) >> group_by(f.g)
    out = (td >> arrange(f.x, _by_group=True)).collect()
    g1 = [x for g, x in zip(out["g"], out["x"]) if g == 1]
    g2 = [x for g, x in zip(out["g"], out["x"]) if g == 2]
    assert g1 == [1, 3] and g2 == [2, 4]


def test_arrange_preserves_groups(spark):
    td = tibble(spark, g=[1, 1, 2, 2], x=[4, 3, 2, 1]) >> group_by(f.g)
    assert _gvars(td >> arrange(f.x)) == ["g"]


def test_arrange_group_by_mtchars(spark):
    mtcars = load_dataset(spark, "mtcars")
    out = mtcars >> group_by(f.cyl) >> arrange(desc(f.wt))
    for cyl in (8, 6, 4):
        sub = (out >> filter_(f.cyl == cyl)).collect()["wt"].tolist()
        assert sub == sorted(sub, reverse=True)


def test_arrange_nonexistent_column(spark):
    td = tibble(spark, x=[1, 2])
    with pytest.raises(Exception):
        (td >> arrange(f.z)).collect()


def test_desc():
    assert desc(list(range(1, 11))) == [-v for v in range(1, 11)]
    assert desc(range(1, 11)) == [-v for v in range(1, 11)]
