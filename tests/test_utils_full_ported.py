"""Port of the applicable reference tests/core/test_utils.py cases
(exact names): vars_select / name_of / is_scalar compat helpers and
as_tibble coercions. The Collection/Negated/Inverted pool machinery
and _datar metadata internals are datar-core plumbing with no analog
here (selection resolves through plans.selection.resolve_selection)."""

from __future__ import annotations

import pytest

from datar_polars_spark import f, tibble
from datar_polars_spark.operators.tibble_verbs import as_tibble
from datar_polars_spark.plans.selection import is_scalar, name_of, vars_select


def test_vars_select_by_string():
    assert vars_select(["a", "b", "c", "d"], "a", "c") == [0, 2]


def test_vars_select_by_index():
    assert vars_select(["a", "b", "c", "d"], 0, 2) == [0, 2]


def test_vars_select_by_reference_attr():
    assert vars_select(["a", "b", "c"], f.a, f.c) == [0, 2]


def test_vars_select_mixed():
    assert vars_select(["a", "b", "c", "d"], "a", 2, f.d) == [0, 2, 3]


def test_vars_select_raises_on_missing():
    with pytest.raises(KeyError):
        vars_select(["a", "b"], "z")


def test_vars_select_no_raise():
    assert vars_select(["a", "b"], "z", raise_nonexists=False) == []


def test_vars_select_raises_on_duplicate_names():
    with pytest.raises(ValueError, match="Names must be unique"):
        vars_select(["a", "b", "a"], "a")


def test_vars_select_empty_args():
    assert vars_select(["a", "b", "c"]) == []


def test_vars_select_null_skipped():
    assert vars_select(["a", "b", "c"], None, "b") == [1]


def test_name_of_string():
    assert name_of("hello") == "hello"


def test_name_of_int():
    assert name_of(42) == "42"


def test_is_scalar_int():
    assert is_scalar(1) is True


def test_is_scalar_str():
    assert is_scalar("hello") is True


def test_is_scalar_none():
    assert is_scalar(None) is True


def test_is_scalar_list():
    assert is_scalar([1, 2, 3]) is False


def test_is_scalar_empty_list():
    assert is_scalar([]) is True


def test_from_dict(spark):
    td = as_tibble({"x": [1, 2, 3]}, spark=spark)
    assert td.collect()["x"].tolist() == [1, 2, 3]


def test_from_polars_df(spark):
    # nearest analog: a pandas frame (the engine's eager interchange type)
    import pandas as pd

    td = as_tibble(pd.DataFrame({"x": [1, 2, 3]}), spark=spark)
    assert td.collect()["x"].tolist() == [1, 2, 3]


def test_from_list_of_dicts(spark):
    td = as_tibble([{"x": 1}, {"x": 2}], spark=spark)
    assert td.collect()["x"].tolist() == [1, 2]
