"""Residual exact-name ports from reference tests/core/test_utils.py
and tests/core/test_tibble.py (round 3, VERDICT item 3): the internal
Collection/Negated/Inverted/Intersect selection machinery with pool
resolution, reconstruct_tibble metadata propagation, and the common
vector utilities. The named-pl.Series analogue here is a one-entry
dict ({name: values}); metadata lives on the Tibble wrapper's typed
attributes exposed through the reference-compat ``_datar`` view
(backend reports "spark")."""

from __future__ import annotations

import pytest

from datar_polars_spark import as_tibble, f, group_by, tibble
from datar_polars_spark.functions import is_null, unique_
from datar_polars_spark.functions.rbase import intersect, setdiff, union
from datar_polars_spark.plans.selection import (
    Collection,
    Intersect,
    Inverted,
    Negated,
    name_of,
    is_scalar,
)
from datar_polars_spark.tibble import Tibble, reconstruct_tibble

from conftest import assert_iterable_equal


# ── name_of / is_scalar (series cases) ──────────────────────────────────


def test_name_of_series():
    assert name_of({"mycol": [1, 2, 3]}) == "mycol"


def test_name_of_unnamed_series():
    assert name_of([1, 2, 3]) is None


def test_is_scalar_series():
    assert is_scalar([1, 2, 3]) is False


# ── setdiff / union / intersect on plain vectors ────────────────────────


class TestSetdiff:
    def test_empty_a(self):
        assert setdiff([], [1, 2]) == []

    def test_empty_b(self):
        assert setdiff([1, 2, 3], []) == [1, 2, 3]

    def test_no_overlap(self):
        assert setdiff([1, 2], [3, 4]) == [1, 2]


class TestUnion:
    def test_order_preserved(self):
        assert union([3, 1], [2, 3]) == [3, 1, 2]


class TestIntersect:
    def test_order_from_first(self):
        assert intersect([3, 1, 2], [2, 3, 4]) == [3, 2]


# ── Collection machinery with pool resolution ───────────────────────────


class TestCollection:
    def test_basic_collection(self):
        c = Collection("a", "b", pool=["a", "b", "c"])
        assert list(c) == [0, 1]

    def test_collection_unmatched(self):
        c = Collection("a", "z", pool=["a", "b", "c"])
        assert c.unmatched == {"z"}

    def test_collection_empty(self):
        c = Collection(pool=["a", "b"])
        assert list(c) == []

    def test_collection_with_none(self):
        c = Collection(None, "a", pool=["a", "b"])
        assert list(c) == [0]

    def test_collection_nested(self):
        inner = Collection("b", "c", pool=["a", "b", "c", "d"])
        c = Collection("a", inner, pool=["a", "b", "c", "d"])
        assert list(c) == [0, 1, 2]

    def test_collection_int_pool(self):
        c = Collection(0, 2, pool=5)
        assert list(c) == [0, 2]

    def test_collection_int_pool_out_of_range(self):
        c = Collection(0, 5, pool=5)
        assert c.unmatched == {5}


class TestNegated:
    def test_negated_int_pool(self):
        n = Negated(0, pool=5)
        assert sorted(list(n)) == [1, 2, 3, 4]

    def test_negated_no_pool(self):
        n = Negated(0, 1, 2)
        assert list(n) == [0, -1, -2]


class TestInverted:
    def test_inverted_int_pool(self):
        inv = Inverted(0, 1, pool=5)
        assert sorted(list(inv)) == [2, 3, 4]

    def test_inverted_no_pool(self):
        inv = Inverted(0, 1)
        assert list(inv) == [0, 1]


class TestIntersectCollection:
    def test_intersect_expand(self):
        ic = Intersect([0, 1, 2, 3], [2, 3, 4], pool=5)
        ic.expand()
        assert list(ic) == [2, 3]


# ── reconstruct_tibble ──────────────────────────────────────────────────


class TestReconstructTibble:
    def test_sets_datar(self, spark):
        sdf = spark.createDataFrame([(1,), (2,), (3,)], "x long")
        result = reconstruct_tibble(sdf)
        assert result._datar["backend"] == "spark"
        assert result._datar["groups"] is None
        assert result._datar["rownames"] is None

    def test_sets_datar_on_plain_df(self, spark):
        sdf = spark.createDataFrame([(1,), (2,)], "x long")
        result = reconstruct_tibble(sdf)
        assert result._datar["backend"] == "spark"
        assert result._datar["groups"] is None

    def test_preserves_existing_datar(self, spark):
        df = tibble(spark, x=[1, 2, 3]) >> group_by(f.x)
        result = reconstruct_tibble(df)
        assert result._datar["groups"] == ["x"]

    def test_copies_from_old_data(self, spark):
        old = tibble(spark, x=[1, 2, 3]) >> group_by(f.x)
        new = tibble(spark, x=[4, 5, 6])
        result = reconstruct_tibble(new, old)
        assert result._datar["groups"] == ["x"]

    def test_preserves_existing_metadata(self, spark):
        from datar_polars_spark.operators.tibble_verbs import set_rownames

        df = tibble(spark, x=[1, 2, 3]) >> group_by(f.x) >> set_rownames(["a", "b", "c"])
        result = reconstruct_tibble(df)
        assert result._datar["groups"] == ["x"]
        assert result._datar["rownames"] == ["a", "b", "c"]

    def test_preserves_existing_metadata_on_data(self, spark):
        from datar_polars_spark.operators.tibble_verbs import set_rownames

        df = tibble(spark, x=[1, 2]) >> set_rownames(["r1", "r2"])
        result = reconstruct_tibble(df)
        assert result._datar["rownames"] == ["r1", "r2"]

    def test_data_metadata_takes_priority_over_old(self, spark):
        old = tibble(spark, x=[1, 2], y=[3, 4]) >> group_by(f.x)
        new = tibble(spark, x=[5, 6], y=[7, 8]) >> group_by(f.y)
        result = reconstruct_tibble(new, old)
        assert result._datar["groups"] == ["y"]

    def test_no_old_data_defaults_clean(self, spark):
        sdf = spark.createDataFrame([(1,)], "x long")
        result = reconstruct_tibble(sdf, None)
        assert result._datar["groups"] is None

    def test_old_data_none(self, spark):
        sdf = spark.createDataFrame([(1,), (2,)], "x long")
        result = reconstruct_tibble(sdf, None)
        assert result._datar["backend"] == "spark"

    def test_many_columns(self, spark):
        data = {f"col_{i}": [i] for i in range(10)}
        result = reconstruct_tibble(tibble(spark, **data))
        assert result.shape == (1, 10)

    def test_metadata_survives_basic_ops(self, spark):
        from datar_polars_spark import mutate

        df = tibble(spark, x=[1, 2, 3]) >> group_by(f.x)
        result = df >> mutate(y=f.x * 2)
        assert result._datar["groups"] == ["x"]

    def test_metadata_survives_filter(self, spark):
        from datar_polars_spark import filter_

        df = tibble(spark, x=[1, 2, 3, 4]) >> group_by(f.x)
        result = df >> filter_(f.x > 2)
        assert result._datar["groups"] == ["x"]

    def test_metadata_survives_sort(self, spark):
        from datar_polars_spark import arrange

        df = tibble(spark, x=[3, 1, 2]) >> group_by(f.x)
        result = df >> arrange(f.x)
        assert result._datar["groups"] == ["x"]

    def test_metadata_survives_unique(self, spark):
        from datar_polars_spark import distinct

        df = tibble(spark, x=[1, 1, 2, 2]) >> group_by(f.x)
        result = df >> distinct()
        assert result._datar["groups"] == ["x"]

    def test_metadata_survives_group_by(self, spark):
        df = tibble(spark, x=[1, 2, 3, 4], g=[1, 1, 2, 2]) >> group_by(f.g)
        assert df._datar["groups"] == ["g"]

    def test_reconstruct_preserves_after_select(self, spark):
        from datar_polars_spark import select

        df = tibble(spark, x=[1, 2], y=[3, 4], z=[5, 6]) >> group_by(f.x)
        result = reconstruct_tibble(df >> select(f.x, f.y), df)
        assert result._datar["groups"] == ["x"]

    def test_reconstruct_preserves_after_with_columns(self, spark):
        from datar_polars_spark import mutate

        df = tibble(spark, x=[1, 2, 3]) >> group_by(f.x)
        result = reconstruct_tibble(df >> mutate(y=f.x * 2), df)
        assert result._datar["groups"] == ["x"]

    def test_nested_tibble_metadata(self, spark):
        # nested frames are arrays-of-structs here (our Object-dtype
        # replacement); metadata handling must not disturb them
        td = tibble(
            spark,
            x=[10, 20],
            nested=[[{"a": 1}, {"a": 2}], [{"a": 1}, {"a": 2}]],
        )
        result = reconstruct_tibble(td)
        assert result._datar["backend"] == "spark"
        assert result.shape == (2, 2)

    def test_datar_set_on_result(self, spark):
        result = as_tibble({"x": [1, 2, 3]}, spark)
        assert result._datar["backend"] == "spark"
        assert result._datar["groups"] is None
        assert result._datar["rownames"] is None


# ── as_tibble edge cases ────────────────────────────────────────────────


class TestAsTibbleEdges:
    def test_from_plain_polars_df(self, spark):
        sdf = spark.createDataFrame([(1,), (2,), (3,)], "x long")
        result = as_tibble(sdf)
        assert isinstance(result, Tibble)
        assert result["x"] == [1, 2, 3]

    def test_from_list_of_lists(self, spark):
        import pandas as pd

        from datar_polars_spark.tibble import from_pandas

        result = from_pandas(
            spark, pd.DataFrame([[1, "a"], [2, "b"], [3, "c"]], columns=["c0", "c1"])
        )
        assert result.shape == (3, 2)


# ── common utils ────────────────────────────────────────────────────────


class TestCommonUtils:
    def test_unique_list(self):
        assert set(unique_([1, 2, 2, 3, 1])) == {1, 2, 3}

    def test_unique_series(self):
        assert set(unique_([1, 2, 2, 3, 1])) == {1, 2, 3}

    def test_is_null_series(self):
        # our is_null is the R scalar predicate; the elementwise form
        # (the reference common.is_null on a Series) is is_na
        from datar_polars_spark.functions import is_na

        assert is_na([1, None, 3]) == [False, True, False]
