"""Ported reference cases: tests/dplyr/test_recode.py (dict positional,
None placeholder + positional index recode, recode_factor with
_default/_missing and level order) and tests/tidyr/test_tidyr_verbs_ext
(extract duplicate-name group concatenation, unchop of an all-empty
list column)."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, mutate, tibble
from datar_polars_spark.functions import recode
from datar_polars_spark.operators.factor import recode_factor
from datar_polars_spark.operators.tidyr import extract, unchop


class TestRecode:
    def test_dict_positional(self, spark):
        out = (
            tibble(spark, x=[1, 2, 3]) >> mutate(y=recode(f.x, {1: "one", 2: "two"}))
        ).collect()
        assert out["y"].tolist() == ["one", "two", "3"]

    def test_none_placeholder_then_index_recode(self, spark):
        out = (
            tibble(spark, x=[1, 2, 3])
            >> mutate(y=recode(f.x, None, "one", "two", "three"))
        ).collect()
        assert out["y"].tolist() == ["one", "two", "three"]

    def test_no_replacements_raises(self, spark):
        with pytest.raises(ValueError, match="recode"):
            tibble(spark, x=[1]) >> mutate(y=recode(f.x))


class TestRecodeFactor:
    def test_dict_default_missing(self, spark):
        rf = tibble(spark, x=[0, 1, 2, 3, None]) >> recode_factor(
            f.x, {0: "z", 1: "y", 2: "x"}, _default="D", _missing="M"
        )
        assert rf.collect()["x"].tolist() == ["z", "y", "x", "D", "M"]
        assert rf.levels["x"] == ["z", "y", "x", "D", "M"]

    def test_kwargs_preserve_level_order(self, spark):
        rf = tibble(spark, x=["a", "b", "c"]) >> recode_factor(
            f.x, a="Apple", b="Banana"
        )
        assert rf.collect()["x"].tolist() == ["Apple", "Banana", "c"]
        assert rf.levels["x"] == ["Apple", "Banana", "c"]

    def test_no_replacements_raises(self, spark):
        with pytest.raises(ValueError):
            tibble(spark, x=[1, 2]) >> recode_factor(f.x)


class TestExtractUnchop:
    def test_extract_concat_dup_names(self, spark):
        out = (
            tibble(spark, x=["abcd"])
            >> extract(f.x, ["a", "b", "a", "b"], r"(.)(.)(.)(.)")
        ).collect()
        assert list(out.columns) == ["a", "b"]
        assert out["a"].tolist() == ["ac"]
        assert out["b"].tolist() == ["bd"]

    def test_unchop_all_empty_lists(self, spark):
        out = (tibble(spark, g=[1], v=[[]]) >> unchop(f.v)).collect()
        assert out.shape == (0, 2)

    def test_empty_array_column_dtype(self, spark):
        td = tibble(spark, g=[1, 2], v=[[], []])
        assert dict(td.dtypes)["v"] == "array<double>"
