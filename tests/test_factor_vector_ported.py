"""Port of reference tests/base/test_factor.py and the remaining
tests/forcats/test_forcats.py vector cases (exact names). Vector
factors are functions.factor_eager.Factor (list + levels), standing in
for the reference's polars Categorical/Enum Series."""

from __future__ import annotations

import warnings

import pytest

from datar_polars_spark import f, mutate, tibble
from datar_polars_spark.functions.factor_eager import Factor
from datar_polars_spark.operators.factor import (
    as_factor,
    as_ordered,
    droplevels,
    factor_ as factor,
    fct_c,
    fct_cross,
    fct_relabel,
    fct_relevel,
    fct_reorder,
    is_factor,
    is_ordered,
    levels_ as levels,
    nlevels,
)


def test_as_factor_series():
    result = as_factor(["a", "b", "a", "c"])
    assert isinstance(result, Factor)
    assert result.to_list() == ["a", "b", "a", "c"]


def test_as_factor_already_factor():
    result = as_factor(as_factor(["a", "b"]))
    assert isinstance(result, Factor)


def test_as_factor_numeric():
    assert isinstance(as_factor([1, 2, 1, 3]), Factor)


def test_as_factor_in_mutate(spark):
    td = tibble(spark, x=["a", "b", "a", "c"])
    out = td >> as_factor(f.x)
    assert out is not None and out.nrow() == 4 and "x" in out.levels


def test_as_factor_list():
    result = as_factor(["a", "b", "a"])
    assert isinstance(result, Factor)
    assert result.to_list() == ["a", "b", "a"]


def test_as_factor_c():
    result = as_factor(["a", "b", "a"])
    assert result.to_list() == ["a", "b", "a"]


def test_as_factor_should_not_accumulate_levels():
    af = as_factor(["a", "z", "g"])
    assert levels(af) == ["a", "z", "g"]
    afy = as_factor(["1.1", "11", "2.2", "22"])
    assert levels(afy) == ["1.1", "11", "2.2", "22"]


def test_as_ordered_series():
    assert is_ordered(as_ordered(["low", "medium", "high"]))


def test_as_ordered_c():
    result = as_ordered(["low", "medium", "high"])
    assert result.to_list() == ["low", "medium", "high"]


def test_factor_series():
    assert isinstance(factor(["a", "b", "a", "c", "b"]), Factor)


def test_factor_with_levels():
    result = factor(["a", "b", "a", "c", "b"], levels=["a", "b", "c", "d"])
    assert levels(result) == ["a", "b", "c", "d"]


def test_factor_list():
    assert isinstance(factor(["a", "b", "a"]), Factor)


def test_ordered_series():
    assert is_ordered(as_ordered(["low", "medium", "high", "low"]))


def test_levels_series():
    assert "a" in levels(factor(["a", "b", "c"]))


def test_levels_numeric():
    assert levels(as_factor([1, 2, 3])) is not None


def test_nlevels_series():
    assert nlevels(factor(["a", "b", "c"])) == 3


def test_nlevels_with_duplicates():
    assert nlevels(factor(["a", "b", "a", "b"])) == 2


def test_is_factor_true():
    assert is_factor(factor(["a", "b"]))


def test_is_factor_false():
    assert not is_factor(["a", "b"])


def test_is_ordered_true():
    assert is_ordered(as_ordered(["a", "b"]))


def test_is_ordered_false():
    assert not is_ordered([1.0, 2.0])


def test_droplevels_series():
    assert droplevels(factor(["a", "b", "a"])) is not None


def test_droplevels():
    result = droplevels(factor(["a", "b"], levels=["a", "b", "c"]))
    assert levels(result) == ["a", "b"]


# ---- forcats vector gap cases --------------------------------------------


def test_relevel_unknown_warns():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        result = fct_relevel(["a", "b", "c"], "z", "a")
        assert len(w) == 1
    assert set(levels(result)) == {"a", "b", "c"}


def test_reorder_length_mismatch():
    with pytest.raises(ValueError):
        fct_reorder(["a", "b", "c"], [1, 2])


def test_reorder_works_with_mutate(spark):
    from datar_polars_spark import group_by
    from datar_polars_spark.operators.factor import fct_reorder as fr

    td = tibble(spark, x=["a", "a", "b", "b", "c"], y=[10, 20, 5, 5, 30])
    out = td >> fr(f.x, f.y)
    assert out.levels.get("x") == ["b", "a", "c"]


def test_relabel_not_callable():
    with pytest.raises(TypeError):
        fct_relabel(["a", "b"], "not_a_function")


def test_relabel_with_fun():
    result = fct_relabel(
        ["a", "b", "c"], lambda levs: [f"level_{i}" for i in range(len(levs))]
    )
    assert levels(result) == ["level_0", "level_1", "level_2"]
    assert result.to_list() == ["level_0", "level_1", "level_2"]


def test_c_empty():
    result = fct_c()
    assert result.to_list() == []
    assert isinstance(result, Factor)


def test_c_with_factors():
    fa = factor(["a"])
    fb = factor(["b"])
    fab = factor(["a", "b"])
    result = fct_c(fa, fb, fab)
    assert result.to_list() == ["a", "b", "a", "b"]
    assert set(levels(result)) == {"a", "b"}
    assert fa.to_list() == ["a"] and levels(fa) == ["a"]


def test_cross_length_mismatch():
    with pytest.raises(ValueError):
        fct_cross(["a", "b"], ["x"])
