"""Port of remaining reference tidyr cases (exact names):
separate remove=False / NA rows, unite variants, expand+nesting,
tibble-metadata survival analogs."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    expand,
    f,
    group_by,
    group_vars,
    mutate,
    nesting,
    select,
    separate,
    tibble,
    unite,
)


def test_separate_keep_original(spark):
    td = tibble(spark, x=["a_b", "c_d"])
    out = td >> separate("x", into=["first", "second"], remove=False)
    assert "x" in out.columns and "first" in out.columns


def test_separate_single_piece(spark):
    td = tibble(spark, x=["a_b", "c_d"])
    out = td >> separate("x", into=["first", None])
    assert out.collect()["first"].tolist() == ["a", "c"]


def test_separate_ignore_column_with_na(spark):
    td = tibble(spark, x=["x", "x y", "x y z", None])
    out = (td >> separate("x", into=["a", "b"], sep=" ")).collect()
    assert out["a"].tolist() == ["x", "x", "x", None]
    # default fill pads missing RIGHT pieces with NA; extra pieces drop
    assert out["b"].tolist()[0] is None and out["b"].tolist()[1] == "y"
    assert out["b"].tolist()[3] is None


def test_unite_custom_sep(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4])
    out = (td >> unite("ab", f.a, f.b, sep="-")).collect()
    assert out["ab"].tolist() == ["1-3", "2-4"]


def test_unite_keep_original(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4])
    out = td >> unite("ab", f.a, f.b, remove=False)
    assert set(out.columns) >= {"ab", "a", "b"}


def test_expand_nesting_single_col(spark):
    td = tibble(
        spark,
        type=["apple", "orange", "apple", "orange", "orange", "orange"],
        year=[2010, 2010, 2012, 2010, 2010, 2012],
    )
    out = (td >> expand(nesting(f.type))).collect()
    assert sorted(out["type"]) == ["apple", "orange"]


def test_expand_nesting_multi_col(spark):
    td = tibble(
        spark,
        type=["apple", "orange", "apple", "orange", "orange", "orange"],
        year=[2010, 2010, 2012, 2010, 2010, 2012],
    )
    out = (td >> expand(nesting(f.type, f.year))).collect()
    # distinct observed (type, year) combos
    assert len(out) == 4


# ---- tibble metadata survival (reference test_tibble.py analogs) ---------


def test_metadata_survives_select(spark):
    td = tibble(spark, g=["a", "b"], x=[1, 2]) >> group_by(f.g)
    out = td >> select(f.g, f.x)
    assert list(group_vars(out)) == ["g"]


def test_metadata_survives_with_columns(spark):
    td = tibble(spark, g=["a", "b"], x=[1, 2]) >> group_by(f.g)
    out = td >> mutate(y=f.x + 1)
    assert list(group_vars(out)) == ["g"]


def test_copies_metadata_from_old(spark):
    td = tibble(spark, x=["a", "b"])
    from datar_polars_spark.operators.factor import factor_ as fct

    fd = td >> fct(f.x)
    out = fd >> mutate(y=1)
    assert out.levels.get("x") == ["a", "b"]
