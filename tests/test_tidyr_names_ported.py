"""Residual exact-name ports from reference tests/tidyr/
test_tidyr_verbs.py and test_tidyr_verbs_ext.py (round 3, VERDICT item
3). Dataset-backed cases (billboard, relig_income, warpbreaks, iris)
run against small synthetic frames with the same shape — the verb path
exercised is identical; shape assertions are computed, not copied.
Polars-Object cases (mixed-type / heterogeneous nested frames) adapt to
our documented encodings: arrays for chopped values, structs for packed
frames."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, tibble
from datar_polars_spark.operators.factor import factor_
from datar_polars_spark.operators.tidyr import (
    complete,
    expand,
    expand_grid,
    nest,
    pack,
    pivot_longer,
    pivot_wider,
    separate,
    separate_rows,
    uncount,
    unite,
    unnest,
    unchop,
    unpack,
)
from datar_polars_spark.plans.selection import starts_with

from conftest import assert_iterable_equal


class TestPivotLonger:
    def test_pivot_longer_relig_income(self, spark):
        # relig_income-shaped: religion + k income-bracket count columns
        brackets = ["u10k", "b10_20k", "b20_30k", "over30k"]
        religions = ["Agnostic", "Atheist", "Buddhist"]
        data = {"religion": religions}
        for i, b in enumerate(brackets):
            data[b] = [10 * i + j for j in range(len(religions))]
        td = tibble(spark, **data)
        out = pivot_longer(td, ~f.religion, names_to="income", values_to="count")
        assert out.columns == ["religion", "income", "count"]
        assert out.shape == (len(religions) * len(brackets), 3)

    def test_pivot_longer_billboard(self, spark):
        # billboard-shaped: id cols + wk1..wk5 rank columns with NAs
        td = tibble(
            spark,
            artist=["A", "B", "C"],
            track=["t1", "t2", "t3"],
            wk1=[1, 2, 3],
            wk2=[4, None, 5],
            wk3=[None, None, 6],
            wk4=[None, None, None],
            wk5=[7, None, None],
        )
        out = pivot_longer(
            td,
            cols=starts_with("wk"),
            names_to="week",
            names_prefix="wk",
            values_to="rank",
            values_drop_na=True,
        )
        pdf = out.collect()
        # one row per non-null rank cell
        assert out.columns == ["artist", "track", "week", "rank"]
        assert len(pdf) == 7
        assert pdf["rank"].notna().all()


class TestPivotWider:
    def test_pivot_wider_warpbreaks(self, spark):
        # warpbreaks-shaped: wool (A/B) x tension (L/M/H), numeric breaks
        td = tibble(
            spark,
            wool=["A", "A", "A", "B", "B", "B", "A", "B"],
            tension=["L", "M", "H", "L", "M", "H", "L", "H"],
            breaks=[26.0, 18.0, 36.0, 27.0, 42.0, 20.0, 30.0, 44.0],
        )
        out = pivot_wider(
            td, names_from=f.wool, values_from=f.breaks, values_fn="mean"
        )
        pdf = out.collect()
        assert pdf.shape == (3, 3)
        assert set(pdf["tension"]) == {"H", "L", "M"}


class TestSeparate:
    def test_separate_merge(self, spark):
        td = tibble(spark, x=["x", "x y", "x y z", None])
        out = (
            td >> separate(f.x, ["a", "b"], extra="merge", fill="left")
        ).collect()
        assert_iterable_equal(out["a"].tolist(), [None, "x", "x", None])
        assert_iterable_equal(out["b"].tolist(), ["x", "y", "y z", None])

    def test_separate_convert(self, spark):
        td = tibble(spark, x=["x:1", "x:2", "y:4", "z", None])
        out = (
            td >> separate("x", into=["a", "b"], sep=":", convert={"b": float})
        ).collect()
        assert_iterable_equal(out["a"].tolist(), ["x", "x", "y", "z", None])
        assert_iterable_equal(
            out["b"].tolist(), [1.0, 2.0, 4.0, None, None], approx=True
        )


class TestSeparateRows:
    def test_separate_rows_basic(self, spark):
        td = tibble(
            spark,
            x=[1, 2, 3],
            y=["a", "d,e,f", "g,h"],
            z=["1", "2,3,4", "5,6"],
        )
        out = (td >> separate_rows(f.y, f.z, convert={"z": int})).collect()
        assert out.shape == (6, 3)
        assert out["y"].tolist() == ["a", "d", "e", "f", "g", "h"]
        assert out["z"].tolist() == [1, 2, 3, 4, 5, 6]


class TestUnite:
    def test_unite_removal_false(self, spark):
        td = expand_grid(spark, x=["a", None], y=["b", None])
        out = (td >> unite("z", f.x, f.y, na_rm=True, remove=False)).collect()
        assert list(out.columns) == ["z", "x", "y"]
        assert out["z"].tolist() == ["a_b", "a", "b", ""]
        assert_iterable_equal(out["x"].tolist(), ["a", "a", None, None])
        assert_iterable_equal(out["y"].tolist(), ["b", None, "b", None])


class TestUnnest:
    def test_unnest_basic(self, spark):
        td = tibble(
            spark,
            a=[["a", "b"], ["c"]],
            b=[[1, 2], [3]],
            c=[11, 22],
        )
        out = td >> unnest(f.a, f.b)
        assert out.columns == ["a", "b", "c"]
        assert out.shape == (3, 3)

    def test_unnest_list_column(self, spark):
        td = tibble(spark, id=[1, 2], vals=[[10, 20], [30]])
        out = (td >> unnest("vals")).collect()
        assert out.shape == (3, 2)
        assert sorted(out["vals"].tolist()) == [10, 20, 30]


class TestUncount:
    def test_uncount_basic(self, spark):
        td = tibble(spark, id=[1, 2], n=[2, 3])
        out = (td >> uncount("n")).collect()
        assert out.shape == (5, 1)
        assert out["id"].tolist() == [1, 1, 2, 2, 2]

    def test_uncount_zero(self, spark):
        td = tibble(spark, id=[1, 2], n=[0, 3])
        out = (td >> uncount("n")).collect()
        assert out.shape == (3, 1)
        assert out["id"].tolist() == [2, 2, 2]

    def test_uncount_with_id(self, spark):
        td = tibble(spark, x=["a", "b"], n=[1, 2])
        out = (td >> uncount("n", _id="id")).collect()
        assert out["x"].tolist() == ["a", "b", "b"]
        # _id is the 0-based originating-row index (reference
        # api/tidyr.py row_copy[_id] = i)
        assert out["id"].tolist() == [0, 1, 1]


class TestExpandGrid:
    def test_expand_grid_basic(self, spark):
        td = expand_grid(spark, x=[1, 2], y=["a", "b"])
        pdf = td.collect()
        assert pdf.shape == (4, 2)
        assert sorted(pdf["x"].unique().tolist()) == [1, 2]
        assert sorted(pdf["y"].unique().tolist()) == ["a", "b"]


# ---- ext: complete / expand / nest / unchop / unpack ----------------------


def test_complete(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4])
    out = complete(td, f.x, f.y).collect()
    assert out["x"].tolist() == [1, 1, 2, 2]
    assert out["y"].tolist() == [3, 4, 3, 4]


def test_expand(spark):
    td = tibble(
        spark,
        type=["apple", "orange", "apple", "orange", "orange", "orange"],
        year=[2010, 2010, 2012, 2010, 2010, 2012],
        size=["XS", "S", "M", "S", "S", "M"],
    )
    td = factor_(td, f.size, levels=["XS", "S", "M", "L"])
    out = expand(td, f.type, f.size)
    # 2 types x 4 factor levels (unused L kept) = 8
    assert out.shape == (8, 2)


def test_nest_iris(spark):
    # iris-shaped: 3 species x 4 measurements, n rows per species
    n = 6
    species = ["setosa", "versicolor", "virginica"]
    td = tibble(
        spark,
        Species=[s for s in species for _ in range(n)],
        Sepal_Length=[float(i) for i in range(3 * n)],
        Sepal_Width=[float(i) for i in range(3 * n)],
        Petal_Length=[float(i) for i in range(3 * n)],
        Petal_Width=[float(i) for i in range(3 * n)],
    )
    out = nest(td, data=~f.Species)
    pdf = out.collect()
    assert pdf.shape == (3, 2)
    for row in pdf["data"]:
        assert len(row) == n  # each nested frame has n rows
        assert len(row[0].asDict() if hasattr(row[0], "asDict") else row[0]) == 4


def test_unchop_mixed_types(spark):
    # Spark columns are homogeneous: the mixed scalar/list case adapts
    # to one-element vs multi-element arrays (same recycle semantics)
    td = tibble(spark, x=[1, 1], y=[["a"], ["b", "c", "d"]])
    out = (td >> unchop(f.y)).collect()
    assert out["x"].tolist() == [1] * 4
    assert out["y"].tolist() == ["a", "b", "c", "d"]


def test_unchop_nested_df(spark):
    # arrays-of-structs stand in for nested frames (unified schema —
    # Spark cannot union heterogeneous nested schemas in one column)
    td = tibble(
        spark,
        x=[2, 3],
        y=[
            [{"a": 1, "b": None}],
            [{"a": None, "b": 1}, {"a": None, "b": 2}, {"a": None, "b": 3}],
        ],
    )
    out = (td >> unchop(f.y)).collect()
    assert out["x"].tolist() == [2, 3, 3, 3]
    ys = out["y"].tolist()
    assert_iterable_equal([v["a"] for v in ys], [1, None, None, None])
    assert_iterable_equal([v["b"] for v in ys], [None, 1, 2, 3])


def test_unpack(spark):
    # outer id column named w, not x: Spark resolves column names
    # case-insensitively by default, so packed field "X" would collide
    # with an outer "x" (polars is case-sensitive; adapted)
    td = tibble(
        spark,
        w=[1, 2, 3],
        a=[1, 2, 3],
        b=[3, 2, 1],
        X=["a", "b", "c"],
        Y=[0.1, 0.2, 0.3],
        Z=[True, False, None],
    )
    packed = pack(td, y=[f.a, f.b], z=[f.X, f.Y, f.Z])
    assert packed.columns == ["w", "y", "z"]
    out = (packed >> unpack([f.y, f.z])).collect()
    assert list(out.columns) == ["w", "a", "b", "X", "Y", "Z"]
    assert out["w"].tolist() == [1, 2, 3]
    assert out["a"].tolist() == [1, 2, 3]
    assert out["b"].tolist() == [3, 2, 1]
    assert out["X"].tolist() == ["a", "b", "c"]
    assert_iterable_equal(out["Z"].tolist(), [True, False, None])
