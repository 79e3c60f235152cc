"""Port of reference tests/dplyr/test_if_else.py (exact names):
eager vectorized if_else / case_when / case_match + grouped mutate."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    f,
    group_by,
    group_vars,
    load_dataset,
    head_,
    mutate,
    pull,
    tibble,
)
from datar_polars_spark.functions import case_match, case_when, if_else


def test_scalar_true_false_are_vectorized():
    x = [True, True, False, False]
    assert if_else(x, 1, 2) == [1, 1, 2, 2]


def test_vector_true_false_ok():
    x = [-1, 0, 1]
    assert if_else([v < 0 for v in x], x, 0) == [-1, 0, 0]
    assert if_else([v > 0 for v in x], x, 0) == [0, 0, 1]


def test_missing_values_are_missing():
    # DELIBERATE deviation: dplyr (and R ifelse) yield NA for NA
    # conditions without `missing`; the reference's polars port
    # asserted [-1, 1, 1] here. We follow dplyr.
    assert if_else([True, None, False], -1, 1) == [-1, None, 1]
    assert if_else([True, None, False], -1, 1, 0) == [-1, 0, 1]


def test_if_else_errors():
    assert if_else(range(1, 11), 1, 2) == [1] * 10
    data = [1, 2, 3]
    with pytest.raises(ValueError, match="size"):
        if_else([v < 2 for v in data], [1, 2], [1, 2, 3])
    with pytest.raises(ValueError, match="size"):
        if_else([v < 2 for v in data], [1, 2, 3], [1, 2])


def test_matches_values_in_order():
    x = [1, 2, 3]
    out = case_when(
        [v <= 1 for v in x], 1,
        [v <= 2 for v in x], 2,
        [v <= 3 for v in x], 3,
    )
    assert out == [1, 2, 3]


def test_unmatched_gets_missing_value():
    x = [1, 2, 3]
    out = case_when([v <= 1 for v in x], 1, [v <= 2 for v in x], 2)
    assert out == [1, 2, None]


def test_missing_values_can_be_replaced():
    x = [1, 2, 3, None]
    out = case_when(
        [v is not None and v <= 1 for v in x], 1,
        [v is not None and v <= 2 for v in x], 2,
        [v is None for v in x], 0,
    )
    assert out == [1, 2, None, 0]


def test_na_conditions():
    assert case_when([True, False, None], [1, 2, 3], True, 4) == [1, 4, 4]


def test_atomic_conditions():
    assert case_when(True, [1, 2, 3], False, [4, 5, 6]) == [1, 2, 3]
    assert case_when(None, [1, 2, 3], True, [4, 5, 6]) == [4, 5, 6]


def test_0len_conditions_and_values():
    assert case_when(True, [], False, []) == []


def test_inside_mutate(spark):
    mtcars = load_dataset(spark, "mtcars")
    out = (
        mtcars
        >> head_(4)
        >> mutate(out=case_when(f.cyl == 4, 1, f.am == 1, 2, True, 0))
        >> pull(f.out)
    )
    assert list(out) == [2, 2, 1, 0]


def test_errors():
    with pytest.raises(ValueError, match="paired"):
        case_when([1, 2, 3], [1, 2], [3, 4], [5, 6], [7, 8])
    with pytest.raises(TypeError):
        case_when()
    with pytest.raises(TypeError):
        case_when("a")


def test_case_match_lhs_can_match_multiple_values():
    assert case_match(1, [1, 2], "x") == ["x"]


def test_case_match_lhs_can_match_na():
    assert case_match(None, None, "x") == ["x"]


def test_case_match_rhs_recycling():
    x = [1, 2, 3]
    assert case_match(x, [1, 3], [v * 2 for v in x]) == [2, None, 6]


def test_case_match_requires_at_least_one_condition():
    with pytest.raises(ValueError):
        case_match(1)


def test_case_match_default_works():
    assert case_match(1, 3, 1, _default=2) == [2]
    assert case_match([1, 2, 3, 4, 5], 6, 1, _default=2) == [2] * 5
    assert case_match(
        [1, 2, 3, 4, 5], 6, [1, 2, 3, 4, 5], _default=[2, 3, 4, 5, 6]
    ) == [2, 3, 4, 5, 6]


def test_case_match_dtypes():
    assert case_match(1, 1, 1.1, _dtypes=int) == [1]


def test_case_match_on_grouped(spark):
    gdf = tibble(spark, g=[1, 2], x=[1, 2]) >> group_by(f.g)
    out = gdf >> mutate(y=case_match(f.x, 1, 2))
    assert list(group_vars(out)) == ["g"]
    got = out.collect()
    assert got["y"].tolist() == [2, None] or (
        got["y"].fillna(-1).tolist() == [2, -1]
    )
