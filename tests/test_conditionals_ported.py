"""Conditional / recode / type-predicate corners ported from the
reference's tests/dplyr/test_if_else.py, test_recode.py,
test_coalesce.py and tests/base/test_asis.py (vector-level there;
column-level here)."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, tibble, mutate, filter_, summarise, arrange
from datar_polars_spark.functions import (
    if_else,
    case_when,
    case_match,
    coalesce,
    na_if,
    recode,
    is_na,
    is_finite,
    is_infinite,
    is_double,
    is_integer,
    is_character,
    is_logical,
    is_true,
    is_false,
    as_character,
    as_double,
    as_integer,
    as_logical,
    sum_,
)

from conftest import assert_iterable_equal


# -- if_else (reference test_if_else.py:19-54) ------------------------------


class TestIfElse:
    def test_scalar_branches_vectorized(self, spark):
        td = tibble(spark, x=[True, True, False, False])
        out = (td >> mutate(y=if_else(f.x, 1, 2))).collect()
        assert out["y"].tolist() == [1, 1, 2, 2]

    def test_vector_branches(self, spark):
        td = tibble(spark, x=[-1, 0, 1])
        out = (td >> mutate(y=if_else(f.x < 0, f.x, 0))).collect()
        assert out["y"].tolist() == [-1, 0, 0]
        out2 = (td >> mutate(y=if_else(f.x > 0, f.x, 0))).collect()
        assert out2["y"].tolist() == [0, 0, 1]

    def test_missing_cond_is_missing(self, spark):
        td = tibble(spark, x=[True, None, False])
        out = (td >> mutate(y=if_else(f.x, -1, 1))).collect()
        assert_iterable_equal(out["y"].tolist(), [-1, None, 1])

    def test_missing_arg_fills_na_cond(self, spark):
        td = tibble(spark, x=[True, None, False])
        out = (td >> mutate(y=if_else(f.x, -1, 1, missing=0))).collect()
        assert out["y"].tolist() == [-1, 0, 1]


# -- case_when (reference test_if_else.py:58-105) ---------------------------


class TestCaseWhen:
    def test_matches_values_in_order(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = (
            td >> mutate(y=case_when(f.x <= 1, 1, f.x <= 2, 2, f.x <= 3, 3))
        ).collect()
        assert out["y"].tolist() == [1, 2, 3]

    def test_unmatched_gets_missing(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = (td >> mutate(y=case_when(f.x <= 1, 1, f.x <= 2, 2))).collect()
        assert_iterable_equal(out["y"].tolist(), [1, 2, None])

    def test_missing_values_can_be_replaced(self, spark):
        td = tibble(spark, x=[1.0, 2.0, 3.0, None])
        out = (
            td
            >> mutate(y=case_when(f.x <= 1, 1, f.x <= 2, 2, is_na(f.x), 0))
        ).collect()
        assert_iterable_equal(out["y"].tolist(), [1, 2, None, 0])

    def test_true_default_catch_all(self, spark):
        td = tibble(spark, x=[4, 1, 0])
        out = (
            td >> mutate(y=case_when(f.x == 4, 1, f.x == 1, 2, True, 0))
        ).collect()
        assert out["y"].tolist() == [1, 2, 0]


# -- case_match (reference api; test_if_else.py case_match section) ---------


class TestCaseMatch:
    def test_value_matching(self, spark):
        td = tibble(spark, x=["a", "b", "c"])
        out = (
            td >> mutate(y=case_match(f.x, ["a", "b"], "ab", "c", "see"))
        ).collect()
        assert out["y"].tolist() == ["ab", "ab", "see"]

    def test_default(self, spark):
        td = tibble(spark, x=["a", "z"])
        out = (
            td >> mutate(y=case_match(f.x, "a", "A", _default="other"))
        ).collect()
        assert out["y"].tolist() == ["A", "other"]

    def test_none_in_match_list_catches_na(self, spark):
        td = tibble(spark, x=["a", None])
        out = (
            td >> mutate(y=case_match(f.x, [None], "missing", _default="ok"))
        ).collect()
        assert out["y"].tolist() == ["ok", "missing"]


# -- recode (reference test_recode.py) --------------------------------------


class TestRecode:
    def test_recode_kwargs(self, spark):
        td = tibble(spark, x=["x", "y", "z"])
        out = (td >> mutate(y=recode(f.x, x="X", y="Y"))).collect()
        assert out["y"].tolist() == ["X", "Y", "z"]

    def test_recode_positional_0based(self, spark):
        # positional args map {0: a0, 1: a1, ...} against x VALUES —
        # the reference's _args_to_recodings convention (recode.py:17-37),
        # same as the eager vector path (round-2 ADVICE alignment)
        td = tibble(spark, x=[0, 1, 2])
        out = (td >> mutate(y=recode(f.x, "one", "two", "three"))).collect()
        assert out["y"].tolist() == ["one", "two", "three"]

    def test_recode_default(self, spark):
        td = tibble(spark, x=[0, 2, 3])
        out = (td >> mutate(y=recode(f.x, "a", _default="other"))).collect()
        assert out["y"].tolist() == ["a", "other", "other"]

    def test_recode_missing(self, spark):
        td = tibble(spark, x=[1.0, None, 3.0])
        out = (td >> mutate(y=recode(f.x, {1: "a"}, _missing="NA_val"))).collect()
        assert out["y"].tolist() == ["a", "NA_val", "3.0"]

    def test_recode_to_null_not_dropped(self, spark):
        # a None VALUE is a genuine recode-to-null branch, not a no-op
        td = tibble(spark, x=["a", "b", "c"])
        out = (
            td >> mutate(y=recode(f.x, {"a": None, "b": "B"}, _default="z"))
        ).collect()
        assert out["y"].tolist()[1:] == ["B", "z"]
        import pandas as pd

        assert pd.isna(out["y"].tolist()[0])

    def test_recode_none_key_is_missing_marker(self, spark):
        td = tibble(spark, x=["a", None])
        out = (td >> mutate(y=recode(f.x, {None: "miss"}, _default="d"))).collect()
        assert out["y"].tolist() == ["d", "miss"]


# -- coalesce (reference test_coalesce.py) ----------------------------------


class TestCoalesce:
    def test_coalesce_two_cols(self, spark):
        td = tibble(spark, a=[None, 2.0, None], b=[1.0, None, None])
        out = (td >> mutate(c=coalesce(f.a, f.b))).collect()
        assert_iterable_equal(out["c"].tolist(), [1.0, 2.0, None])

    def test_coalesce_with_scalar_fallback(self, spark):
        td = tibble(spark, a=[None, 2.0])
        out = (td >> mutate(c=coalesce(f.a, 0.0))).collect()
        assert out["c"].tolist() == [0.0, 2.0]

    def test_na_if_inverse(self, spark):
        td = tibble(spark, x=[0.0, 1.0, 0.0])
        out = (td >> mutate(y=coalesce(na_if(f.x, 0.0), -1.0))).collect()
        assert out["y"].tolist() == [-1.0, 1.0, -1.0]


# -- type predicates (reference tests/base/test_asis.py) --------------------


class TestPredicates:
    def test_is_na_in_filter(self, spark):
        td = tibble(spark, x=[1.0, None, 3.0, None])
        out = (td >> filter_(is_na(f.x))).collect()
        assert_iterable_equal(out["x"].tolist(), [None, None])

    def test_is_na_in_mutate(self, spark):
        td = tibble(spark, x=[1.0, None, 3.0])
        out = (td >> mutate(y=is_na(f.x))).collect()
        assert out["y"].tolist() == [False, True, False]

    def test_is_finite_infinite(self, spark):
        td = tibble(spark, x=[1.0, float("inf"), 3.0])
        out = (td >> mutate(fin=is_finite(f.x), inf=is_infinite(f.x))).collect()
        assert out["fin"].tolist() == [True, False, True]
        assert out["inf"].tolist() == [False, True, False]

    def test_dtype_predicates(self, spark):
        td = tibble(spark, d=[1.5], i=[1], s=["a"], b=[True])
        out = (
            td
            >> mutate(
                dd=is_double(f.d),
                ii=is_integer(f.i),
                ss=is_character(f.s),
                bb=is_logical(f.b),
            )
        ).collect()
        assert out[["dd", "ii", "ss", "bb"]].values.tolist() == [[True] * 4]

    def test_is_true_false_scalar_identity(self, spark):
        # R isTRUE/isFALSE: identity on the plain scalar — a column is
        # never the scalar TRUE (reference api/base/types.py:268-271)
        td = tibble(spark, b=[True, False, None])
        out = (
            td >> mutate(t=is_true(True), fa=is_false(False), cv=is_true(f.b))
        ).collect()
        assert out["t"].tolist() == [True] * 3
        assert out["fa"].tolist() == [True] * 3
        assert out["cv"].tolist() == [False] * 3

    def test_casts_roundtrip(self, spark):
        td = tibble(spark, x=["1", "2"])
        out = (
            td
            >> mutate(
                i=as_integer(f.x),
                d=as_double(f.x),
                s=as_character(as_integer(f.x)),
                b=as_logical(as_integer(f.x)),
            )
        ).collect()
        assert out["i"].tolist() == [1, 2]
        assert out["d"].tolist() == [1.0, 2.0]
        assert out["s"].tolist() == ["1", "2"]
        assert out["b"].tolist() == [True, True]
