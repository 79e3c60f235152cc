"""tidyr behavior parity ported from the reference suites
(tests/tidyr/test_pivot_long.py, test_pivot_wide.py, test_separate.py,
test_unite.py, test_fill.py — behavioral spec, rewritten)."""

import pytest

from datar_polars_spark import (
    f,
    tibble,
    group_by,
    mutate,
    arrange,
    pivot_longer,
    pivot_wider,
    separate,
    unite,
    extract,
    separate_rows,
    uncount,
    fill,
    drop_na,
    replace_na,
    nest,
    unnest,
    starts_with,
)
from datar_polars_spark.functions import across, mean

from conftest import assert_frame_equal, assert_iterable_equal


def test_pivot_longer_interleaved_order(spark):
    """R order: row 1's x,y then row 2's x,y (interleaved, not stacked)."""
    td = tibble(spark, id=[1, 2], x=[10, 20], y=[30, 40])
    out = td >> pivot_longer([f.x, f.y], names_to="k", values_to="v")
    got = out.collect()
    assert got["id"].tolist() == [1, 1, 2, 2]
    assert got["k"].tolist() == ["x", "y", "x", "y"]
    assert got["v"].tolist() == [10, 30, 20, 40]


def test_pivot_longer_names_prefix_and_sep(spark):
    td = tibble(spark, id=[1], wk_a_1=[5], wk_b_2=[6])
    out = td >> pivot_longer(
        starts_with("wk"), names_to=["grp", "num"], names_prefix="wk_",
        names_sep="_", values_to="v",
    )
    got = out.collect()
    assert got["grp"].tolist() == ["a", "b"]
    assert got["num"].tolist() == ["1", "2"]
    assert got["v"].tolist() == [5, 6]


def test_pivot_longer_values_drop_na(spark):
    td = tibble(spark, id=[1, 2], x=[1.0, None], y=[None, 4.0])
    out = td >> pivot_longer([f.x, f.y], values_drop_na=True)
    got = out.collect()
    assert len(got) == 2
    assert got["value"].tolist() == [1.0, 4.0]


def test_pivot_wider_roundtrip(spark):
    td = tibble(spark, id=[1, 1, 2, 2], k=["a", "b", "a", "b"], v=[1, 2, 3, 4])
    out = td >> pivot_wider(names_from=f.k, values_from=f.v)
    got = out.collect().sort_values("id")
    assert list(got.columns) == ["id", "a", "b"]
    assert got["a"].tolist() == [1, 3]
    assert got["b"].tolist() == [2, 4]


def test_pivot_wider_values_fill_and_fn(spark):
    td = tibble(spark, id=[1, 1, 2], k=["a", "a", "b"], v=[1, 5, 3])
    out = td >> pivot_wider(names_from=f.k, values_from=f.v, values_fn="sum",
                            values_fill=0)
    got = out.collect().sort_values("id")
    assert got["a"].tolist() == [6, 0]
    assert got["b"].tolist() == [0, 3]


def test_separate_basic_and_fill(spark):
    td = tibble(spark, x=["a-1", "b-2", "c"])
    out = td >> separate(f.x, ["k", "v"], sep="-")
    got = out.collect()
    assert got["k"].tolist() == ["a", "b", "c"]
    assert_iterable_equal(got["v"].tolist(), ["1", "2", None])


def test_unite_and_na_rm(spark):
    td = tibble(spark, a=["x", "y"], b=["1", None])
    out = td >> unite("ab", f.a, f.b, sep="-", na_rm=True)
    got = out.collect()
    assert got["ab"].tolist() == ["x-1", "y"]


def test_extract_regex_groups(spark):
    td = tibble(spark, x=["a-1", "b-2"])
    out = td >> extract(f.x, ["l", "d"], regex=r"([a-z])-(\d)")
    got = out.collect()
    assert got["l"].tolist() == ["a", "b"]
    assert got["d"].tolist() == ["1", "2"]


def test_separate_rows_explodes(spark):
    td = tibble(spark, id=[1, 2], v=["a,b", "c"])
    out = td >> separate_rows(f.v, sep=",")
    got = out.collect()
    assert got["id"].tolist() == [1, 1, 2]
    assert got["v"].tolist() == ["a", "b", "c"]


def test_uncount_replicates(spark):
    td = tibble(spark, x=["a", "b"], w=[2, 1])
    out = td >> uncount(f.w)
    assert out.collect()["x"].tolist() == ["a", "a", "b"]


def test_fill_down_and_up_grouped(spark):
    td = tibble(spark, g=["a", "a", "a", "b", "b"],
                x=[1.0, None, 3.0, None, 5.0])
    down = td >> group_by(f.g) >> fill(f.x, _direction="down")
    assert_iterable_equal(down.collect()["x"].tolist(), [1.0, 1.0, 3.0, None, 5.0])
    up = td >> group_by(f.g) >> fill(f.x, _direction="up")
    assert_iterable_equal(up.collect()["x"].tolist(), [1.0, 3.0, 3.0, 5.0, 5.0])


def test_drop_na_subset(spark):
    td = tibble(spark, x=[1.0, None], y=[None, 2.0])
    assert (td >> drop_na()).nrow() == 0
    out = td >> drop_na(f.x)
    assert out.collect()["x"].tolist() == [1.0]


def test_replace_na_dict(spark):
    td = tibble(spark, x=[1.0, None], y=["a", None])
    out = td >> replace_na(x=0.0, y="missing")
    got = out.collect()
    assert got["x"].tolist() == [1.0, 0.0]
    assert got["y"].tolist() == ["a", "missing"]


def test_nest_unnest_roundtrip(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3])
    nested = td >> nest(data=f.x)
    assert set(nested.columns) == {"g", "data"}
    assert nested.nrow() == 2
    back = nested >> unnest(f.data)
    got = back.collect().sort_values(["g", "x"])
    assert got["g"].tolist() == ["a", "a", "b"]
    assert got["x"].tolist() == [1, 2, 3]


def test_across_names_template(spark):
    td = tibble(spark, x=[1.0, 2.0], y=[3.0, 5.0])
    out = td >> mutate(across([f.x, f.y], mean, _names="{_col}_m"))
    assert set(out.columns) == {"x", "y", "x_m", "y_m"}
    got = out.collect()
    assert got["x_m"].tolist() == [1.5, 1.5]
    assert got["y_m"].tolist() == [4.0, 4.0]


def test_pivot_longer_names_pattern(spark):
    td = tibble(spark, id=[1], wk1_new=[5], wk2_old=[6])
    out = td >> pivot_longer(
        starts_with("wk"), names_to=["week", "status"],
        names_pattern=r"wk(\d+)_(\w+)", values_to="v",
    )
    got = out.collect()
    assert got["week"].tolist() == ["1", "2"]
    assert got["status"].tolist() == ["new", "old"]
    assert got["v"].tolist() == [5, 6]


def test_full_seq_on_vectors():
    """Reference full_seq vector dispatch: fill the range at the period."""
    from datar_polars_spark.operators.tidyr import full_seq

    assert full_seq([1, 4, 2], 1) == [1, 2, 3, 4]
    assert full_seq([1.0, 2.5], 0.5) == [1.0, 1.5, 2.0, 2.5]
