"""tidyr verb behavior (modeled on reference tests/tidyr suites)."""

import pytest

from datar_polars_spark import (
    f,
    tibble,
    group_by,
    arrange,
    pivot_longer,
    pivot_wider,
    separate,
    unite,
    extract,
    separate_rows,
    uncount,
    drop_na,
    replace_na,
    fill,
    nest,
    unnest,
    chop,
    unchop,
    pack,
    unpack,
    expand,
    nesting,
    complete,
)

from conftest import assert_iterable_equal


@pytest.fixture()
def wide(spark):
    return tibble(spark, id=[1, 2], x_1=[1.0, 3.0], x_2=[2.0, 4.0], y_1=[5.0, 6.0])


def test_pivot_longer(wide):
    out = (wide >> pivot_longer(["x_1", "x_2", "y_1"])).collect()
    assert list(out.columns) == ["id", "name", "value"]
    # R-interleaved row order: row 1's three values first
    assert_iterable_equal(out["value"].tolist(), [1.0, 2.0, 5.0, 3.0, 4.0, 6.0])
    assert_iterable_equal(
        out["name"].tolist(), ["x_1", "x_2", "y_1", "x_1", "x_2", "y_1"]
    )


def test_pivot_longer_names_sep(wide):
    out = (
        wide
        >> pivot_longer(
            ["x_1", "x_2", "y_1"], names_to=["var", "idx"], names_sep="_"
        )
    ).collect()
    assert list(out.columns) == ["id", "var", "idx", "value"]
    assert_iterable_equal(out["var"].tolist(), ["x", "x", "y", "x", "x", "y"])


def test_pivot_wider(spark):
    long = tibble(
        spark,
        id=[1, 1, 2, 2],
        name=["a", "b", "a", "b"],
        value=[1.0, 2.0, 3.0, 4.0],
    )
    out = (long >> pivot_wider(names_from=f.name, values_from=f.value)).collect()
    out = out.sort_values("id").reset_index(drop=True)
    assert_iterable_equal(out["a"].tolist(), [1.0, 3.0])
    assert_iterable_equal(out["b"].tolist(), [2.0, 4.0])


def test_pivot_roundtrip(wide):
    long = wide >> pivot_longer(["x_1", "x_2", "y_1"])
    back = (long >> pivot_wider(names_from=f.name, values_from=f.value)).collect()
    back = back.sort_values("id").reset_index(drop=True)
    assert_iterable_equal(back["x_1"].tolist(), [1.0, 3.0])
    assert_iterable_equal(back["y_1"].tolist(), [5.0, 6.0])


def test_separate(spark):
    td = tibble(spark, s=["a_b", "c_d", None])
    out = (td >> separate(f.s, [f.left, f.right], sep="_")).collect()
    assert list(out.columns) == ["left", "right"]
    assert_iterable_equal(out["left"].tolist(), ["a", "c", None])
    assert_iterable_equal(out["right"].tolist(), ["b", "d", None])


def test_separate_extra_merge(spark):
    td = tibble(spark, s=["a_b_c"])
    out = (td >> separate(f.s, [f.x, f.y], sep="_", extra="merge")).collect()
    assert_iterable_equal(out["y"].tolist(), ["b_c"])


def test_unite(spark):
    td = tibble(spark, a=["x", "y"], b=["1", None])
    out = (td >> unite("ab", f.a, f.b, sep="-")).collect()
    assert_iterable_equal(out["ab"].tolist(), ["x-1", "y-NA"])
    out = (td >> unite("ab", f.a, f.b, sep="-", na_rm=True)).collect()
    assert_iterable_equal(out["ab"].tolist(), ["x-1", "y"])


def test_extract(spark):
    td = tibble(spark, s=["a-1", "b-2", "zzz"])
    out = (td >> extract(f.s, [f.ch, f.num], regex=r"([a-z])-(\d)")).collect()
    assert_iterable_equal(out["ch"].tolist(), ["a", "b", None])
    assert_iterable_equal(out["num"].tolist(), ["1", "2", None])


def test_separate_rows(spark):
    td = tibble(spark, g=["a", "b"], v=["1,2,3", "4"])
    out = (td >> separate_rows(f.v, sep=",")).collect()
    assert_iterable_equal(out["v"].tolist(), ["1", "2", "3", "4"])
    assert_iterable_equal(out["g"].tolist(), ["a", "a", "a", "b"])


def test_uncount(spark):
    td = tibble(spark, x=["a", "b", "c"], w=[2, 0, 1])
    out = (td >> uncount(f.w, _id="rep")).collect()
    assert_iterable_equal(out["x"].tolist(), ["a", "a", "c"])
    # reference semantics: _id is the 0-based ORIGINATING row index
    assert_iterable_equal(out["rep"].tolist(), [0, 0, 2])


def test_drop_na(spark):
    td = tibble(spark, a=[1.0, None, 3.0], b=["x", "y", None])
    out = (td >> drop_na()).collect()
    assert_iterable_equal(out["a"].tolist(), [1.0])
    out = (td >> drop_na(f.a)).collect()
    assert_iterable_equal(out["a"].tolist(), [1.0, 3.0])


def test_replace_na(spark):
    td = tibble(spark, a=[1.0, None], b=["x", None])
    out = (td >> replace_na({"a": 0.0, "b": "?"})).collect()
    assert_iterable_equal(out["a"].tolist(), [1.0, 0.0])
    assert_iterable_equal(out["b"].tolist(), ["x", "?"])


def test_fill(spark):
    td = tibble(spark, g=["a", "a", "a", "b", "b"], v=[1.0, None, None, None, 5.0])
    out = (td >> group_by(f.g) >> fill(f.v, _direction="down")).collect()
    assert_iterable_equal(out["v"].tolist(), [1.0, 1.0, 1.0, None, 5.0])
    out = (td >> group_by(f.g) >> fill(f.v, _direction="up")).collect()
    assert_iterable_equal(out["v"].tolist(), [1.0, None, None, 5.0, 5.0])
    out = (td >> group_by(f.g) >> fill(f.v, _direction="downup")).collect()
    assert_iterable_equal(out["v"].tolist(), [1.0, 1.0, 1.0, 5.0, 5.0])


def test_nest_unnest(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3], y=[4, 5, 6])
    nested = td >> nest(data=[f.x, f.y])
    assert nested.columns == ["g", "data"]
    back = (nested >> unnest(f.data)).collect()
    assert_iterable_equal(sorted(back["x"].tolist()), [1, 2, 3])


def test_chop_unchop(spark):
    td = tibble(spark, g=["a", "a", "b"], v=[1, 2, 3])
    ch = td >> chop(f.v)
    pdf = ch.collect()
    assert sorted(map(len, pdf["v"].tolist())) == [1, 2]
    back = (ch >> unchop(f.v)).collect()
    assert_iterable_equal(sorted(back["v"].tolist()), [1, 2, 3])


def test_pack_unpack(spark):
    td = tibble(spark, a=[1, 2], b=["x", "y"], c=[3.0, 4.0])
    packed = td >> pack(s=[f.b, f.c])
    assert packed.columns == ["a", "s"]
    back = (packed >> unpack(f.s)).collect()
    assert list(back.columns) == ["a", "b", "c"]
    assert_iterable_equal(back["b"].tolist(), ["x", "y"])


def test_expand_complete(spark):
    td = tibble(spark, g=["a", "a", "b"], k=[1, 2, 1], v=[1.0, 2.0, 3.0])
    grid = (td >> expand(f.g, f.k)).collect()
    assert len(grid) == 4
    comp = (td >> complete(f.g, f.k, fill={"v": 0.0})).collect()
    assert len(comp) == 4
    assert sorted(comp["v"].tolist()) == [0.0, 1.0, 2.0, 3.0]
