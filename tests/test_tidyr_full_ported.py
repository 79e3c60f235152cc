"""Port of reference tests/tidyr/test_tidyr_verbs.py and
test_tidyr_verbs_ext.py (exact names; the relig_income / billboard /
warpbreaks / iris dataset cases are omitted — not bundled)."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    chop,
    drop_na,
    f,
    fill,
    group_by,
    group_vars,
    nest,
    pivot_longer,
    pivot_wider,
    replace_na,
    separate,
    tibble,
    unchop,
    unite,
)


def test_drop_na_all_columns_default(spark):
    td = tibble(spark, x=[1, None, 3], y=["a", "b", None])
    out = (td >> drop_na()).collect()
    assert len(out) == 1 and out["x"].tolist() == [1]


def test_drop_na_specific_column(spark):
    td = tibble(spark, x=[1, None, 3], y=["a", "b", "c"])
    out = (td >> drop_na("x")).collect()
    assert out["x"].tolist() == [1, 3]


def test_drop_na_how_all(spark):
    td = tibble(spark, x=[1, None, None, 4], y=[None, 2, None, None])
    assert (td >> drop_na(_how="all")).nrow() == 3


def test_drop_na_no_nulls(spark):
    td = tibble(spark, x=[1, 2, 3], y=["a", "b", "c"])
    assert (td >> drop_na()).nrow() == 3


def test_replace_na_scalar(spark):
    td = tibble(spark, x=[1, None, 3])
    assert (td >> replace_na(0)).collect()["x"].tolist() == [1, 0, 3]


def test_replace_na_dict_per_column(spark):
    td = tibble(spark, x=[1, None, 3], y=["a", None, "c"])
    out = (td >> replace_na({"x": 0, "y": "z"})).collect()
    assert out["x"].tolist() == [1, 0, 3]
    assert out["y"].tolist() == ["a", "z", "c"]


def test_replace_na_no_nulls(spark):
    td = tibble(spark, x=[1, 2, 3])
    assert (td >> replace_na(0)).collect()["x"].tolist() == [1, 2, 3]


def test_replace_na_str(spark):
    td = tibble(spark, x=["a", None, "c"])
    assert (td >> replace_na("missing")).collect()["x"].tolist() == [
        "a", "missing", "c",
    ]


def test_replace_null_str(spark):
    td = tibble(spark, x=["a", None, "c"])
    assert (td >> replace_na("missing")).collect()["x"].tolist() == [
        "a", "missing", "c",
    ]


def test_fill_down(spark):
    td = tibble(spark, x=[1, None, None, 4, None])
    assert (td >> fill(f.x, _direction="down")).collect()["x"].tolist() == [
        1, 1, 1, 4, 4,
    ]


def test_fill_up(spark):
    td = tibble(spark, x=[None, None, 3, None, 5])
    assert (td >> fill(f.x, _direction="up")).collect()["x"].tolist() == [
        3, 3, 3, 5, 5,
    ]


def test_fill_downup(spark):
    td = tibble(spark, x=[None, 2, None, None, 5])
    assert (td >> fill(f.x, _direction="downup")).collect()["x"].tolist() == [
        2, 2, 2, 2, 5,
    ]


def test_fill_updown(spark):
    td = tibble(spark, x=[1, None, None, 4, None])
    assert (td >> fill(f.x, _direction="updown")).collect()["x"].tolist() == [
        1, 4, 4, 4, 4,
    ]


def test_fill_all_columns(spark):
    td = tibble(spark, x=[1, None], y=[None, 2])
    out = (td >> fill(_direction="down")).collect()
    assert out["x"].tolist() == [1, 1]
    import math

    assert out["y"].tolist()[1] == 2 and (
        out["y"].tolist()[0] is None or math.isnan(out["y"].tolist()[0])
    )


def test_fill_works_with_NAs(spark):
    td = tibble(spark, x=[1, None, 3])
    out = (td >> replace_na(0) >> fill(f.x, _direction="down")).collect()
    assert out["x"].tolist() == [1, 0, 3]


def test_basic_pivot_longer(spark):
    td = tibble(spark, id=[1, 2], x=[10, 20], y=[30, 40])
    out = td >> pivot_longer(["x", "y"])
    got = out.collect()
    assert len(got) == 4
    assert sorted(set(got["name"])) == ["x", "y"]


def test_pivot_longer_custom_names(spark):
    td = tibble(spark, id=[1, 2], a=[1, 2], b=[3, 4])
    out = (td >> pivot_longer(["a", "b"], names_to="var", values_to="val")).collect()
    assert "var" in out.columns and "val" in out.columns
    assert out["var"].tolist() == ["a", "b", "a", "b"]


def test_pivot_longer_values_drop_na(spark):
    td = tibble(spark, id=[1], x=[None], y=[2])
    out = (td >> pivot_longer(["x", "y"], values_drop_na=True)).collect()
    assert len(out) == 1 and out["value"].tolist() == [2]


def test_basic_pivot_wider(spark):
    td = tibble(
        spark, id=[1, 1, 2, 2], name=["x", "y", "x", "y"], value=[10, 20, 30, 40]
    )
    out = td >> pivot_wider(id_cols="id", names_from="name", values_from="value")
    assert "id" in out.columns and out.nrow() == 2 and len(out.columns) == 3


def test_pivot_wider_names_prefix(spark):
    td = tibble(spark, id=[1, 2], name=["x", "x"], value=[10, 20])
    out = td >> pivot_wider(
        id_cols="id", names_from="name", values_from="value", names_prefix="p_"
    )
    assert "p_x" in out.columns


def test_pivot_wider_values_fill(spark):
    td = tibble(spark, id=[1, 1], name=["x", "y"], value=[10, 20])
    out = td >> pivot_wider(
        id_cols="id", names_from="name", values_from="value", values_fill=0
    )
    assert out.nrow() == 1 and len(out.columns) == 3


def test_separate_basic(spark):
    td = tibble(spark, x=["a_b", "c_d", "e_f"])
    out = (td >> separate("x", into=["first", "second"], sep="_")).collect()
    assert out["first"].tolist() == ["a", "c", "e"]
    assert out["second"].tolist() == ["b", "d", "f"]


def test_separate_custom_sep(spark):
    td = tibble(spark, x=["a-b", "c-d"])
    out = (td >> separate("x", into=["left", "right"], sep="-")).collect()
    assert out["left"].tolist() == ["a", "c"]


def test_drop_na_empty_call(spark):
    td = tibble(spark, x=[1, 2, None], y=["a", None, "b"])
    assert (td >> drop_na()).nrow() == 1


def test_drop_na_specified_vars(spark):
    td = tibble(spark, x=[1, 2, None], y=["a", None, "b"])
    out = (td >> drop_na(f.x)).collect()
    assert out["x"].tolist() == [1, 2]
    assert out["y"].tolist()[0] == "a" and out["y"].isna().tolist()[1]


def test_drop_na_groups_preserved(spark):
    td = tibble(spark, g=["A", "A", "B"], x=[1, 2, None], y=["a", None, "b"])
    gdf = td >> group_by(f.g)
    assert list(group_vars(gdf >> drop_na(f.y))) == list(group_vars(gdf))


def test_replace_na_empty_call():
    assert replace_na([1, None]) == [1, None]


def test_replace_na_values_replaced():
    assert replace_na([1, None], 0) == [1, 0]


def test_replace_na_df(spark):
    td = tibble(spark, x=[1, None])
    assert (td >> replace_na({"x": 0})).collect()["x"].tolist() == [1, 0]


def test_fill_missings_filled_correctly(spark):
    import math

    td = tibble(spark, x=[None, 1, None, 2, None, None])
    vals = (td >> fill(f.x)).collect()["x"].tolist()
    assert (vals[0] is None or math.isnan(vals[0]))
    assert vals[1:] == [1, 1, 2, 2, 2]


def test_fill_respects_grouping(spark):
    import math

    td = tibble(spark, x=[1, 1, 2], y=[1, None, None])
    vals = (td >> group_by(f.x) >> fill(f.y)).collect()["y"].tolist()
    assert vals[:2] == [1, 1] and (vals[2] is None or math.isnan(vals[2]))


def test_unite_basic(spark):
    td = tibble(spark, a=["a", "b"], b=["c", "d"])
    assert (td >> unite("ab", f.a, f.b, sep="_")).collect()["ab"].tolist() == [
        "a_c", "b_d",
    ]


def test_pivot_longer_basic(spark):
    td = tibble(spark, id=[1, 2], x_a=[1, 2], y_a=[3, 4])
    out = (
        td >> pivot_longer([f.x_a, f.y_a], names_to="name", values_to="value")
    ).collect()
    assert out["name"].tolist() == ["x_a", "y_a", "x_a", "y_a"]
    assert out["value"].tolist() == [1, 3, 2, 4]


def test_pivot_wider_basic(spark):
    td = tibble(
        spark, id=[1, 1, 2, 2], name=["x", "y", "x", "y"], value=[1, 3, 2, 4]
    )
    out = (
        (td >> pivot_wider(names_from=f.name, values_from=f.value))
        .collect()
        .sort_values("id")
    )
    assert out["x"].tolist() == [1, 2]
    assert out["y"].tolist() == [3, 4]


def test_nest_basic(spark):
    td = tibble(spark, g=[1, 1, 2, 2], x=[1, 2, 3, 4], y=[5, 6, 7, 8])
    out = td >> nest(data=[f.x, f.y])
    assert "data" in out.columns and "g" in out.columns and out.nrow() == 2


def test_nest(spark):
    td = tibble(
        spark,
        x=[1, 1, 1, 2, 2, 3],
        y=[1, 2, 3, 4, 5, 6],
        z=[6, 5, 4, 3, 2, 1],
    )
    out = (td >> nest(data=[f.y, f.z])).collect()
    data = {row_x: d for row_x, d in zip(out["x"], out["data"])}
    assert [r["y"] for r in data[1]] == [1, 2, 3]
    assert [r["z"] for r in data[1]] == [6, 5, 4]
    assert [r["y"] for r in data[2]] == [4, 5]
    assert [r["y"] for r in data[3]] == [6]


def test_chop(spark):
    td = tibble(
        spark,
        x=[1, 1, 1, 2, 2, 3],
        y=[1, 2, 3, 4, 5, 6],
        z=[6, 5, 4, 3, 2, 1],
    )
    out = (td >> chop([f.y, f.z])).collect()
    m = {row_x: (y, z) for row_x, y, z in zip(out["x"], out["y"], out["z"])}
    assert list(m[1][0]) == [1, 2, 3] and list(m[1][1]) == [6, 5, 4]
    assert list(m[2][0]) == [4, 5] and list(m[3][0]) == [6]


def test_unchop(spark):
    td = tibble(spark, x=[1, 2, 3, 4], y=[[], [1], [1, 2], [1, 2, 3]])
    out = (td >> unchop(f.y)).collect()
    assert out["x"].tolist() == [2, 3, 3, 4, 4, 4]
    assert out["y"].tolist() == [1, 1, 2, 1, 2, 3]


def test_unchop_empty(spark):
    import math

    td = tibble(spark, x=[1, 2, 3, 4], y=[[], [1], [1, 2], [1, 2, 3]])
    out = (td >> unchop(f.y, keep_empty=True)).collect()
    assert out["x"].tolist() == [1, 2, 3, 3, 4, 4, 4]
    vals = out["y"].tolist()
    assert vals[0] is None or math.isnan(vals[0])
    assert vals[1:] == [1, 1, 2, 1, 2, 3]
