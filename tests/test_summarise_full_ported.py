"""Port of reference tests/dplyr/test_summarise.py (exact names;
mtcars via the bundled dataset loader)."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    f,
    group_by,
    group_vars,
    load_dataset,
    reframe,
    summarise,
    tibble,
)
from datar_polars_spark.functions import intersect, mean, quantile, sd, sum_


def _gvars(td):
    return list(group_vars(td))


def test_summarise_single_expression(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = td >> summarise(y=sum_(f.x))
    assert out.columns == ["y"]
    got = out.collect()
    assert len(got) == 1 and got["y"].tolist() == [6]


def test_summarise_literal_value(spark):
    td = tibble(spark, x=[1, 2, 3])
    assert (td >> summarise(val=42)).collect()["val"].tolist() == [42]


def test_summarise_multi_expression(spark):
    td = tibble(spark, x=[1, 2, 3])
    got = (td >> summarise(s=sum_(f.x), c=10)).collect()
    assert got["s"].tolist() == [6] and got["c"].tolist() == [10]


def test_summarise_no_args_returns_empty(spark):
    td = tibble(spark, x=[1, 2])
    out = td >> summarise()
    assert out.nrow() == 1 and out.columns == []


def test_summarise_one_per_group(spark):
    td = tibble(spark, g=[1, 1, 2, 2], x=[10, 20, 30, 40]) >> group_by(f.g)
    got = (td >> summarise(s=sum_(f.x))).collect()
    assert sorted(zip(got["g"], got["s"])) == [(1, 30), (2, 70)]


def test_summarise_grouped_literal(spark):
    td = tibble(spark, g=[1, 2], x=[10, 20]) >> group_by(f.g)
    got = (td >> summarise(val=1)).collect()
    assert got["val"].tolist() == [1, 1]


def test_summarise_peels_grouping_layer(spark):
    td = tibble(spark, x=[1, 2, 3, 4], y=[1, 1, 2, 2]) >> group_by(f.x, f.y)
    out = td >> summarise(s=sum_(f.y))
    assert _gvars(out) == ["x"]


def test_summarise_groups_keep(spark):
    td = tibble(spark, x=[1, 2], y=[1, 2]) >> group_by(f.x, f.y)
    out = td >> summarise(z=1, _groups="keep")
    assert _gvars(out) == ["x", "y"]


def test_summarise_groups_drop(spark):
    td = tibble(spark, x=[1, 2], y=[1, 2]) >> group_by(f.x, f.y)
    out = td >> summarise(z=1, _groups="drop")
    assert _gvars(out) == []


def test_summarise_with_quantile(spark):
    mtcars = load_dataset(spark, "mtcars")
    out = (
        mtcars
        >> group_by(f.cyl)
        >> summarise(qs=quantile(f.disp, [0.25, 0.75]), prob=[0.25, 0.75])
    )
    assert out.columns == ["cyl", "qs", "prob"]
    got = out.collect()
    assert len(got) == 6
    assert set(got["cyl"]) == {4, 6, 8}
    assert set(got["prob"]) == {0.25, 0.75}


def test_summarise_reuses_kwargs(spark):
    mtcars = load_dataset(spark, "mtcars")
    out = (
        mtcars >> group_by(f.cyl) >> summarise(_disp_m2=mean(f.disp), disp_m2=f._disp_m2 * 2)
    )
    assert out.columns == ["cyl", "disp_m2"]
    assert out.nrow() == 3


def test_summarise_reuses_original_column_name(spark):
    mtcars = load_dataset(spark, "mtcars")
    out = mtcars >> group_by(f.cyl) >> summarise(disp=mean(f.disp), sd=sd(f.disp))
    assert out.columns == ["cyl", "disp", "sd"]
    assert out.nrow() == 3


def test_summarise_empty_df(spark):
    td = tibble(spark, x=[])
    got = (td >> summarise(y=1)).collect()
    assert len(got) == 1 and got["y"].tolist() == [1]


def test_summarise_empty_grouped(spark):
    td = tibble(spark, g=[], x=[]) >> group_by(f.g)
    out = td >> summarise(y=1)
    assert out.nrow() == 0 and out.columns == ["g", "y"]


def test_summarise_with_mean(spark):
    td = tibble(spark, x=[1, 2, 3])
    got = (td >> summarise(avg=mean(f.x))).collect()
    assert got["avg"].tolist() == [2.0]


def test_summarise_with_sum(spark):
    td = tibble(spark, x=[1, 2, 3])
    got = (td >> summarise(total=sum_(f.x))).collect()
    assert got["total"].tolist() == [6]


def test_reframe_ungrouped(spark):
    td = tibble(spark, x=[1, 2, 3])
    got = (td >> reframe(y=sum_(f.x))).collect()
    assert len(got) == 1 and got["y"].tolist() == [6]


def test_reframe_grouped(spark):
    td = tibble(spark, g=[1, 1, 2, 2], x=[10, 20, 30, 40]) >> group_by(f.g)
    got = (td >> reframe(total=sum_(f.x))).collect()
    assert sorted(zip(got["g"], got["total"])) == [(1, 30), (2, 70)]


def test_reframe_grouped_literal(spark):
    td = tibble(spark, g=[1, 2], x=[1, 2]) >> group_by(f.g)
    got = (td >> reframe(v=42)).collect()
    assert got["v"].tolist() == [42, 42]


def test_reframe_with_intersect(spark):
    tbl = ["a", "b", "d", "f"]
    td = tibble(
        spark,
        g=[1, 1, 1, 2, 2, 2, 2],
        x=["e", "a", "b", "c", "f", "d", "a"],
    )
    out = (td >> reframe(x=intersect(f.x, tbl))).collect()
    assert len(out) == 4
    assert set(out["x"]) == {"a", "b", "d", "f"}


def test_summarise_nonexistent_column(spark):
    td = tibble(spark, x=[1])
    with pytest.raises(Exception):
        (td >> summarise(z=f.notexist)).collect()


def test_summarise_none_args(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = td >> summarise(None)
    assert out.nrow() == 1 and out.columns == []
