"""Ported from the reference's tests/tibble/test_tibble.py: name
repair, tribble/tibble_row error corners, enframe/deframe variants,
add_row/add_column positional cases, rownames roundtrips. The
positional-pl.Series constructor cases are Polars-specific; here the
same semantics surface through kwargs, as_tibble(name_repair=), and
the rownames metadata family."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    Tibble,
    add_column,
    add_row,
    as_tibble,
    column_to_rownames,
    deframe,
    enframe,
    f,
    has_rownames,
    mutate,
    remove_rownames,
    rownames,
    rownames_to_column,
    select,
    set_rownames,
    tibble,
    tibble_row,
    tribble,
)
from datar_polars_spark.tibble import repair_names


def col(t, name):
    return list(t.collect()[name])


# -- name repair ------------------------------------------------------------

class TestNameRepair:
    def test_check_unique_raises_on_duplicates(self):
        with pytest.raises(ValueError):
            repair_names(["x", "x"], "check_unique")

    def test_minimal_keeps_duplicates(self):
        assert repair_names(["x", "x"], "minimal") == ["x", "x"]

    def test_unique_suffixes(self):
        assert repair_names(["x", "x"], "unique") == ["x__0", "x__1"]
        assert repair_names(["x", "y"], "unique") == ["x", "y"]

    def test_literal_list_renames(self):
        assert repair_names(["a", "b"], ["x", "y"]) == ["x", "y"]
        with pytest.raises(ValueError):
            repair_names(["a"], ["x", "y"])

    def test_universal_makes_syntactic(self):
        assert repair_names(["a b", "a b"], "universal") == ["a.b__0", "a.b__1"]

    def test_tibble_literal_name_repair(self, spark):
        t = tibble(spark, a=[1], b=[2], _name_repair=["x", "y"])
        assert t.columns == ["x", "y"]

    def test_as_tibble_repairs_duplicate_spark_columns(self, spark):
        a = tibble(spark, k=[1], v=[2])
        b = tibble(spark, k=[1], v=[3])
        # a join producing duplicate column names — repairable
        joined = a.df.select("k", "v").join(
            b.df.select("k", "v"), a.df["k"] == b.df["k"]
        )
        assert joined.columns == ["k", "v", "k", "v"]
        t = as_tibble(joined, name_repair="unique")
        assert t.columns == ["k__0", "v__0", "k__1", "v__1"]

    def test_unknown_repair_errors(self):
        with pytest.raises(ValueError):
            repair_names(["a"], "bogus")


# -- tribble corners (reference TestTribble) --------------------------------

class TestTribble:
    def test_multiple_rows(self, spark):
        t = tribble(f.x, f.y, 1, "a", 2, "b")
        pdf = t.collect()
        assert list(pdf["x"]) == [1, 2]
        assert list(pdf["y"]) == ["a", "b"]

    def test_errors_no_f_columns(self, spark):
        with pytest.raises(ValueError):
            tribble(1, 2, 3)

    def test_errors_non_rectangular(self, spark):
        with pytest.raises(ValueError):
            tribble(f.x, f.y, 1, "a", 2)


# -- tibble_row (reference TestTibbleRow) -----------------------------------

class TestTibbleRow:
    def test_basic(self, spark):
        t = tibble_row(x=1, y="a")
        assert t.collect().shape == (1, 2)

    def test_list_wrapped(self, spark):
        t = tibble_row(x=[1])
        assert col(t, "x") == [1]

    def test_error_on_multi_row(self, spark):
        with pytest.raises(ValueError):
            tibble_row(x=[1, 2])


# -- enframe / deframe variants (reference TestEnframe/TestDeframe) ---------

class TestEnframeDeframe:
    def test_from_list(self, spark):
        t = enframe([10, 20])
        pdf = t.collect()
        assert list(pdf["name"]) == [1, 2]
        assert list(pdf["value"]) == [10, 20]

    def test_from_dict(self, spark):
        t = enframe({"a": 1, "b": 2})
        pdf = t.collect()
        assert list(pdf["name"]) == ["a", "b"]

    def test_custom_column_names(self, spark):
        t = enframe([5], name="k", value="v")
        assert t.columns == ["k", "v"]

    def test_two_column_to_dict(self, spark):
        t = tibble(spark, name=["a", "b"], value=[1, 2])
        assert (t >> deframe()) == {"a": 1, "b": 2}

    def test_one_column_to_list(self, spark):
        t = tibble(spark, v=[1, 2, 3])
        assert (t >> deframe()) == [1, 2, 3]

    def test_enframe_deframe_roundtrip(self, spark):
        d = {"x": 1, "y": 2}
        assert (enframe(d) >> deframe()) == d


# -- add_row positions (reference TestAddRow) -------------------------------

class TestAddRowPositions:
    def test_add_before(self, spark):
        t = tibble(spark, x=[1, 2])
        out = t >> add_row(x=99, _before=1)
        assert col(out, "x") == [99, 1, 2]

    def test_add_after(self, spark):
        t = tibble(spark, x=[1, 2])
        out = t >> add_row(x=99, _after=1)
        assert col(out, "x") == [1, 99, 2]

    def test_extra_column_missing_is_null(self, spark):
        t = tibble(spark, x=[1])
        out = (t >> add_row(x=2)).collect()
        assert len(out) == 2


# -- add_column positions (reference TestAddColumn) -------------------------

class TestAddColumnPositions:
    def test_add_before(self, spark):
        t = tibble(spark, a=[1], c=[3])
        out = t >> add_column(b=[2], _before=f.c)
        assert out.columns == ["a", "b", "c"]

    def test_add_after(self, spark):
        t = tibble(spark, a=[1], c=[3])
        out = t >> add_column(b=[2], _after=f.a)
        assert out.columns == ["a", "b", "c"]

    def test_scalar_column(self, spark):
        t = tibble(spark, a=[1, 2])
        out = t >> add_column(k="z")
        assert col(out, "k") == ["z", "z"]


# -- rownames roundtrips (reference TestRownames*) --------------------------

class TestRownamesRoundtrips:
    def test_rownames_roundtrip(self, spark):
        t = tibble(spark, x=[10, 20]) >> set_rownames(["r1", "r2"])
        back = t >> rownames_to_column("rn") >> column_to_rownames("rn")
        assert (back >> rownames()) == ["r1", "r2"]
        assert back.columns == ["x"]

    def test_without_rownames_uses_integers(self, spark):
        t = tibble(spark, x=[10, 20])
        out = t >> rownames_to_column("rn")
        assert col(out, "rn") == ["1", "2"]

    def test_converts_to_strings(self, spark):
        t = tibble(spark, k=[7, 8], x=[1, 2]) >> column_to_rownames("k")
        assert (t >> rownames()) == ["7", "8"]

    def test_noop_without_rownames(self, spark):
        t = tibble(spark, x=[1])
        assert ((t >> remove_rownames()) >> has_rownames()) is False
