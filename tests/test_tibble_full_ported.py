"""Residual ports from reference tests/tibble/test_tibble.py (round 3:
the exact-name residue VERDICT item 3). Semantics re-expressed against
the Spark engine's documented conventions: 1-based positions/enframe
names, rownames metadata on the Tibble wrapper, dup-name collapse under
"minimal" repair (Spark cannot hold duplicate column names, matching
the reference's own polars-backend adaptation), dicts in place of named
pl.Series for the positional-arg cases.
"""

from __future__ import annotations

import numpy as np
import pytest

from datar_polars_spark import (
    as_tibble,
    f,
    tibble,
)
from datar_polars_spark.operators.tibble_verbs import (
    add_column,
    add_row,
    column_to_rownames,
    deframe,
    enframe,
    has_rownames,
    remove_rownames,
    rowid_to_column,
    rownames,
    rownames_to_column,
    set_rownames,
    tibble_row,
    tribble,
)
from datar_polars_spark.plans.selection import c_
from datar_polars_spark.tibble import Tibble

from conftest import assert_iterable_equal


def col(t, name):
    return t[name]


# ============================================================================
# tibble() — construction
# ============================================================================


class TestTibbleConstruction:
    def test_from_args(self, spark):
        df = tibble(spark, [1, 2, 3], ["a", "b", "c"], _name_repair="minimal")
        assert df.shape == (3, 2)

    def test_from_mixed(self, spark):
        df = tibble(spark, [1, 2, 3], z=[7, 8, 9], _name_repair="minimal")
        assert df.shape == (3, 2)
        assert col(df, "z") == [7, 8, 9]

    def test_name_repair_check_unique(self, spark):
        with pytest.raises(ValueError):
            tibble(spark, {"x": [1]}, {"x": [1]})

    def test_name_repair_minimal(self, spark):
        # Spark (like polars) holds no duplicate names: first wins
        df = tibble(spark, {"x": [1]}, {"x": [2]}, _name_repair="minimal")
        assert df.columns == ["x"]
        assert col(df, "x") == [1]

    def test_name_repair_unique(self, spark):
        df = tibble(spark, {"x": [1]}, {"x": [1]}, _name_repair="unique")
        assert df.columns == ["x__0", "x__1"]

    def test_name_repair_literals(self, spark):
        df = tibble(spark, {"x": [1]}, {"x": [1]}, _name_repair=["x", "y"])
        assert df.columns == ["x", "y"]

    def test_name_repair_literals_rename(self, spark):
        base = tibble(spark, x=[1], y=[2])
        df2 = tibble(spark, base[:, :2], _name_repair=["a", "b"])
        assert df2.columns == ["a", "b"]

    def test_tibble_with_c(self, spark):
        df = tibble(
            spark, x=c_(1, 1, 1, 2, 2, 3), y=list(range(1, 7)), z=list(range(6, 0, -1))
        )
        assert df.shape == (6, 3)
        assert col(df, "x") == [1, 1, 1, 2, 2, 3]
        assert col(df, "y") == [1, 2, 3, 4, 5, 6]
        assert col(df, "z") == [6, 5, 4, 3, 2, 1]

    def test_dict_arg(self, spark):
        df = tibble(spark, {"x": [1, 2], "y": [3, 4]})
        assert df.shape == (2, 2)

    def test_none_value_creates_none_column(self, spark):
        df = tibble(spark, a=None)
        assert df.columns == ["a"]
        assert_iterable_equal(col(df, "a"), [None])

    def test_pl_series_arg(self, spark):
        # our "named series" is a one-entry dict
        df = tibble(spark, {"x": [1, 2, 3]})
        assert df.columns == ["x"]
        assert col(df, "x") == [1, 2, 3]

    def test_pl_dataframe_arg(self, spark):
        inner = tibble(spark, a=[1, 2], b=[3, 4])
        df = tibble(spark, inner)
        assert df.shape == (2, 2)
        assert sorted(df.columns) == ["a", "b"]

    def test_tibble_respects_argument_order(self, spark):
        df = tibble(spark, a=list(range(5)), b=f.a * 2, c=1)
        assert df.columns == ["a", "b", "c"]


class TestTibbleAccess:
    def test_get_column(self, spark):
        df = tibble(spark, x=[1, 2, 3], y=["a", "b", "c"])
        assert df.get_column("x") == [1, 2, 3]

    def test_get_column_dot(self, spark):
        df = tibble(spark, x=[1, 2, 3], y=["a", "b", "c"])
        assert df.x == [1, 2, 3]

    def test_get_nonexistent_column(self, spark):
        df = tibble(spark, x=[1, 2, 3])
        with pytest.raises(KeyError):
            df.get_column("y")

    def test_get_column_by_getitem(self, spark):
        df = tibble(spark, x=[1, 2, 3], y=["a", "b", "c"])
        assert df["y"] == ["a", "b", "c"]

    def test_get_column_by_index(self, spark):
        df = tibble(spark, x=[1, 2, 3], y=["a", "b", "c"])
        assert df[:, 0] == [1, 2, 3]

    def test_subset_df_by_indexes(self, spark):
        df = tibble(spark, x=[1, 2, 3], y=["a", "b", "c"])
        subset = df[:, [0]]
        assert isinstance(subset, Tibble)
        assert subset.shape == (3, 1)
        assert subset.columns == ["x"]


# ============================================================================
# tribble()
# ============================================================================


class TestTribble:
    def test_non_atomic_values(self, spark):
        out = tribble(f.a, f.b, None, 1, 2, 3)
        assert_iterable_equal(col(out, "a"), [None, 2])
        assert col(out, "b") == [1, 3]

    def test_with_name_repair(self, spark):
        out = tribble(f.x, f.x, 1, 2, _name_repair="minimal")
        assert out.columns == ["x"]
        assert col(out, "x") == [1]


# ============================================================================
# tibble_row()
# ============================================================================


class TestTibbleRow:
    def test_error_on_mixed_length(self, spark):
        with pytest.raises(ValueError):
            tibble_row(a=1, b=[2, 3])


# ============================================================================
# as_tibble()
# ============================================================================


class TestAsTibble:
    def test_from_polars_dataframe(self, spark):
        # our frame type IS the Spark DataFrame
        sdf = spark.createDataFrame([(1,), (2,), (3,)], "x long")
        result = as_tibble(sdf)
        assert isinstance(result, Tibble)
        assert result.shape == (3, 1)

    def test_from_polars_lazyframe(self, spark):
        # Spark frames are always lazy; an unexecuted transformation
        # plays the LazyFrame role
        sdf = spark.range(3).selectExpr("id AS x")
        result = as_tibble(sdf)
        assert isinstance(result, Tibble)
        assert result.shape == (3, 1)

    def test_tibble_is_idempotent(self, spark):
        df = tibble(spark, x=[1, 2])
        result = as_tibble(df)
        assert result is df or result.shape == (2, 1)
        assert isinstance(result, Tibble)

    def test_already_tibble_is_idempotent(self, spark):
        df = tibble(spark, x=[1, 2], y=[3, 4])
        assert as_tibble(df) is df

    def test_from_pandas_df(self, spark):
        import pandas as pd

        result = as_tibble(pd.DataFrame({"x": [1, 2, 3]}), spark)
        assert result.shape == (3, 1)


# ============================================================================
# enframe() / deframe()
# ============================================================================


class TestEnframe:
    def test_from_lists(self, spark):
        result = enframe(dict(one=1, two=[2, 3], three=[4, 5, 6]))
        assert result.shape == (3, 2)
        assert result.columns == ["name", "value"]
        assert col(result, "name") == ["one", "two", "three"]
        # Spark has no Object dtype: scalars promote to 1-elem arrays
        assert [list(v) for v in col(result, "value")] == [[1], [2, 3], [4, 5, 6]]

    def test_from_list_no_name(self, spark):
        result = enframe([10, 20, 30], name=None)
        assert result.shape == (3, 1)
        assert result.columns == ["value"]
        assert col(result, "value") == [10, 20, 30]

    def test_from_dict_no_name(self, spark):
        result = enframe({"a": 1, "b": 2}, name=None)
        assert result.shape == (2, 1)
        assert sorted(col(result, "value")) == [1, 2]

    def test_empty_value_raises(self, spark):
        with pytest.raises(ValueError):
            enframe([1, 2], value=None)

    def test_none_input(self, spark):
        result = enframe(None)
        assert result.shape == (0, 2)

    def test_from_polars_series(self, spark):
        # plain vector stands in for the named series
        result = enframe([1, 2, 3])
        assert result.shape == (3, 2)
        assert col(result, "value") == [1, 2, 3]

    def test_error_on_2d_input(self, spark):
        with pytest.raises(ValueError):
            enframe(np.array([[1, 2], [3, 4]]))


class TestDeframe:
    def test_from_tibble_enframe_roundtrip(self, spark):
        framed = enframe([10, 20, 30], name="idx", value="num")
        result = framed >> deframe()
        assert result == {1: 10, 2: 20, 3: 30}

    def test_from_plain_polars_df(self, spark):
        sdf = spark.createDataFrame([("x", 10), ("y", 20)], "key string, val long")
        result = Tibble(sdf) >> deframe()
        assert result == {"x": 10, "y": 20}

    def test_three_column_warns(self, spark):
        df = tibble(spark, a=[1], b=[2], c=[3])
        result = df >> deframe()
        assert isinstance(result, dict)
        assert result == {1: 2}


# ============================================================================
# add_row() / add_column()
# ============================================================================


class TestAddRow:
    def test_add_single_row(self, spark):
        df = tibble(spark, x=[1, 2], y=["a", "b"])
        result = df >> add_row(x=3, y="c")
        assert result.shape == (3, 2)
        assert col(result, "x") == [1, 2, 3]

    def test_add_empty_row(self, spark):
        df = tibble(spark, x=[1, 2], y=["a", "b"])
        result = df >> add_row()
        assert result.shape == (3, 2)
        assert_iterable_equal(col(result, "x"), [1, 2, None])

    def test_before_and_after_error(self, spark):
        df = tibble(spark, x=[1, 2])
        with pytest.raises(ValueError):
            df >> add_row(x=3, _before=1, _after=1)

    def test_extra_column_error(self, spark):
        df = tibble(spark, x=[1, 2])
        with pytest.raises(ValueError):
            df >> add_row(x=3, z=9)

    def test_metadata_preserved(self, spark):
        df = tibble(spark, x=[1, 2], g=["a", "b"])
        from datar_polars_spark import group_by, group_vars

        gdf = df >> group_by(f.g)
        result = gdf >> add_row(x=3, g="c")
        assert (result >> group_vars()) == ["g"]


class TestAddColumn:
    def test_add_single_column(self, spark):
        df = tibble(spark, x=[1, 2, 3])
        result = df >> add_column(y=[4, 5, 6])
        assert result.shape == (3, 2)
        assert result.columns == ["x", "y"]

    def test_add_scalar_column(self, spark):
        df = tibble(spark, x=[1, 2, 3])
        result = df >> add_column(y=99)
        assert col(result, "y") == [99, 99, 99]

    def test_before_nonexistent_column_error(self, spark):
        df = tibble(spark, x=[1, 2])
        with pytest.raises(KeyError):
            df >> add_column(y=[3, 4], _before="does_not_exist")

    def test_length_mismatch_error(self, spark):
        df = tibble(spark, x=[1, 2, 3])
        with pytest.raises(ValueError):
            df >> add_column(y=[4, 5])

    def test_name_repair_on_duplicate(self, spark):
        df = tibble(spark, x=[1, 2])
        with pytest.raises(ValueError):
            df >> add_column(x=[3, 4])

    def test_add_column_nonunique(self, spark):
        df = tibble(spark, x=[1, 2])
        with pytest.raises(ValueError):
            df >> add_column(x=[3, 4])

    def test_empty_new_columns(self, spark):
        df = tibble(spark, x=[1, 2])
        result = df >> add_column()
        assert result.columns == ["x"]
        assert result.shape == (2, 1)

    def test_add_column_before(self, spark):
        df = tibble(spark, x=[1, 2], z=[5, 6])
        result = df >> add_column(y=[3, 4], _before=f.z)
        assert result.columns == ["x", "y", "z"]

    def test_add_row_and_add_column(self, spark):
        df = tibble(spark, x=[1, 2])
        with_col = df >> add_column(y=["a", "b"])
        assert with_col.shape == (2, 2)
        with_row = with_col >> add_row(x=3, y="c")
        assert with_row.shape == (3, 2)
        assert col(with_row, "x") == [1, 2, 3]


# ============================================================================
# rownames family
# ============================================================================


class TestHasRownames:
    def test_no_rownames(self, spark):
        df = tibble(spark, x=[1, 2])
        assert not (df >> has_rownames())

    def test_with_rownames(self, spark):
        df = tibble(spark, x=[1, 2]) >> set_rownames(["r1", "r2"])
        assert df >> has_rownames()


class TestRemoveRownames:
    def test_removes_rownames(self, spark):
        df = tibble(spark, x=[1, 2]) >> set_rownames(["r1", "r2"])
        assert df >> has_rownames()
        result = df >> remove_rownames()
        assert not (result >> has_rownames())
        assert (result >> rownames()) is None


class TestRownamesToColumn:
    def test_with_stored_rownames(self, spark):
        df = tibble(spark, x=[1, 2]) >> set_rownames(["r1", "r2"])
        result = df >> rownames_to_column()
        assert result.columns == ["rowname", "x"]
        assert col(result, "rowname") == ["r1", "r2"]

    def test_custom_var_name(self, spark):
        df = tibble(spark, x=[1, 2])
        result = df >> rownames_to_column(var="id")
        assert result.columns == ["id", "x"]

    def test_duplicate_var_name_error(self, spark):
        df = tibble(spark, x=[1, 2])
        with pytest.raises(ValueError):
            df >> rownames_to_column(var="x")

    def test_clears_rownames_in_metadata(self, spark):
        df = tibble(spark, x=[1, 2]) >> set_rownames(["r1", "r2"])
        result = df >> rownames_to_column()
        assert (result >> rownames()) is None


class TestRowidToColumn:
    def test_duplicate_var_error(self, spark):
        df = tibble(spark, x=[1, 2])
        with pytest.raises(ValueError):
            df >> rowid_to_column(var="x")


class TestColumnToRownames:
    def test_default_var(self, spark):
        df = tibble(spark, rowname=["a", "b"], y=[1, 2])
        result = df >> column_to_rownames()
        assert result.columns == ["y"]
        assert (result >> rownames()) == ["a", "b"]

    def test_missing_column_error(self, spark):
        df = tibble(spark, x=[1, 2])
        with pytest.raises(KeyError):
            df >> column_to_rownames(var="does_not_exist")

    def test_existing_rownames_error(self, spark):
        df = tibble(spark, label=["r1", "r2"], x=[10, 20]) >> set_rownames(["e"])
        with pytest.raises(ValueError):
            df >> column_to_rownames(var="label")


# ============================================================================
# round trips
# ============================================================================


class TestRoundTrips:
    def test_tibble_of_tribble(self, spark):
        a = tibble(spark, x=["a", "b"], y=[1, 2])
        b = tribble(f.x, f.y, "a", 1, "b", 2)
        assert a.columns == b.columns
        assert col(a, "x") == col(b, "x")
        assert col(a, "y") == col(b, "y")
