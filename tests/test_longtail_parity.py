"""Parity tests for the round-2 long-tail functions.

Ported from reference test suites: tests/base/test_types.py (type
predicates), tests/base/test_random.py (distributions),
tests/base/test_sets.py (vector set ops), tests/base/test_stats.py
(col_*/row_* families), tests/dplyr/test_context.py (cur_column).
"""

from __future__ import annotations

import pytest

from datar_polars_spark import (
    f,
    tibble,
    mutate,
    summarise,
    group_by,
    factor_,
    as_ordered,
    is_ordered,
    col_sums,
    col_means,
    col_sds,
    col_medians,
)
from datar_polars_spark.functions import (
    across,
    cur_column,
    paste0,
    round_,
    mean,
    var,
    as_double,
    is_double,
    is_integer,
    is_logical,
    is_character,
    is_numeric,
    is_true,
    is_false,
    is_atomic,
    as_null,
    rpois,
    rbinom,
    rexp,
    rcauchy,
    rchisq,
    row_sds,
    row_medians,
    first2,
    last2,
    intersect,
    union,
    setdiff,
    setequal,
    append_,
    sum_,
)

from conftest import assert_iterable_equal


@pytest.fixture(scope="module")
def td(spark):
    return tibble(
        spark,
        x=[1.0, 2.0, None, 4.0],
        y=[10, 20, 30, 40],
        s=["a", "b", "c", "d"],
        b=[True, False, True, False],
    )


# ---- type predicates (reference tests/base/test_types.py) -----------------

def test_type_predicates_on_columns(td):
    out = (
        td
        >> mutate(
            xd=is_double(f.x),
            yd=is_double(f.y),
            yi=is_integer(f.y),
            xi=is_integer(f.x),
            bl=is_logical(f.b),
            sl=is_logical(f.s),
            sc=is_character(f.s),
            xn=is_numeric(f.x),
            sn=is_numeric(f.s),
        )
    ).collect()
    row = out.iloc[0]
    assert row["xd"] and not row["yd"]
    assert row["yi"] and not row["xi"]
    assert row["bl"] and not row["sl"]
    assert row["sc"]
    assert row["xn"] and not row["sn"]


def test_type_predicates_on_scalars(td):
    out = (
        td
        >> mutate(
            a=is_double(1.5),
            b2=is_double(1),
            c=is_integer(2),
            d=is_integer(True),
            e=is_logical(False),
            g=is_true(True),
            h=is_true(1),
            i=is_false(False),
            j=is_atomic("s"),
            k=as_null(f.x),
        )
    ).collect()
    row = out.iloc[0]
    assert row["a"] and not row["b2"]
    assert row["c"] and not row["d"]
    assert row["e"]
    assert row["g"] and not row["h"]
    assert row["i"]
    assert row["j"]
    assert row["k"] is None


def test_is_expression_dtype(td):
    # a computed expression's dtype is resolved through the plan schema
    out = (td >> mutate(z=is_double(f.x + 1.0), w=is_integer(f.y + 1))).collect()
    assert out.iloc[0]["z"]
    assert out.iloc[0]["w"]


def test_is_ordered_factor(spark):
    td = tibble(spark, s=["a", "b", "a"])
    plain = td >> factor_(f.s)
    assert not is_ordered(plain, f.s)
    ordered = plain >> as_ordered(f.s)
    assert is_ordered(ordered, f.s)
    # level order declared before as_ordered survives
    lv = tibble(spark, s=["a", "b"]) >> factor_(f.s, levels=["b", "a"]) >> as_ordered(f.s)
    assert lv.levels["s"] == ["b", "a"]


# ---- random distributions (reference tests/base/test_random.py) -----------

@pytest.fixture(scope="module")
def big(spark):
    return tibble(spark, i=list(range(20000)))


def test_rpois_moments(big):
    out = (
        big
        >> mutate(p=rpois(lambda_=4.0, seed=7))
        >> summarise(m=mean(f.p), v=var(f.p))
    ).collect()
    assert abs(out.iloc[0]["m"] - 4.0) < 0.15
    assert abs(out.iloc[0]["v"] - 4.0) < 0.3


def test_rbinom_moments(big):
    out = (
        big
        >> mutate(b=rbinom(size=10, prob=0.3, seed=11))
        >> summarise(m=mean(f.b), v=var(f.b))
    ).collect()
    assert abs(out.iloc[0]["m"] - 3.0) < 0.15
    assert abs(out.iloc[0]["v"] - 2.1) < 0.3


def test_rexp_rcauchy_rchisq(big):
    out = (
        big
        >> mutate(
            e=rexp(rate=2.0, seed=13),
            c3=rchisq(df=3, seed=17),
            cy=rcauchy(location=5.0, scale=1.0, seed=19),
        )
        >> summarise(
            me=mean(f.e),
            mc=mean(f.c3),
            vc=var(f.c3),
            n_pos=sum_((f.e > 0).cast("long")),
        )
    ).collect()
    row = out.iloc[0]
    assert abs(row["me"] - 0.5) < 0.05
    assert abs(row["mc"] - 3.0) < 0.25
    assert abs(row["vc"] - 6.0) < 1.2
    assert row["n_pos"] == 20000


def test_random_seed_reproducible(big):
    a = (big >> mutate(p=rpois(lambda_=2.0, seed=5))).collect()["p"].tolist()
    b = (big >> mutate(p=rpois(lambda_=2.0, seed=5))).collect()["p"].tolist()
    assert a == b


# ---- vector set ops (reference tests/base/test_sets.py) -------------------

def test_set_ops_lists():
    assert intersect([1, 2, 3], [3, 4]) == [3]
    assert intersect([1, 2, 3], [4, 5]) == []
    assert union([1, 2, 3], [3, 4]) == [1, 2, 3, 4]
    assert union([1, 1, 2], [2, 3]) == [1, 2, 3]
    assert setdiff([1, 2, 3], [3, 4]) == [1, 2]
    assert setdiff([1, 2], [3, 4]) == [1, 2]
    assert setequal([1, 2], [2, 1])
    assert not setequal([1, 2], [2, 3])
    assert append_([1, 2], [3]) == [1, 2, 3]
    assert append_([1, 2, 3], 9, after=1) == [1, 9, 2, 3]


def test_set_ops_array_columns(spark):
    td = tibble(spark, a=[[1, 2, 3], [4, 5, 6]], b=[[3, 4, 5], [4, 6, 7]])
    out = (
        td
        >> mutate(
            c=intersect(f.a, f.b),
            u=union(f.a, f.b),
            d=setdiff(f.a, f.b),
            eq=setequal(f.a, f.b),
        )
    ).collect()
    assert out["c"].tolist() == [[3], [4, 6]]
    assert out["u"].tolist() == [[1, 2, 3, 4, 5], [4, 5, 6, 7]]
    assert out["d"].tolist() == [[1, 2], [5]]
    assert out["eq"].tolist() == [False, False]


def test_set_ops_column_vs_literal(spark):
    td = tibble(spark, a=[[1, 2, 3], [4, 5, 6]])
    out = (td >> mutate(c=intersect(f.a, [2, 4, 6]))).collect()
    assert out["c"].tolist() == [[2], [4, 6]]


# ---- col_* / row_* stats (reference tests/base/test_stats.py) -------------

def test_col_aggregations(td):
    assert col_sums(td)["y"] == 100
    assert col_sums(td, f.y) == {"y": 100}
    assert col_means(td)["y"] == 25.0
    assert abs(col_sds(td, f.y)["y"] - 12.9099) < 1e-3
    assert col_medians(td, f.y)["y"] == 25.0
    # NA-tolerant by default (Spark aggs skip nulls)
    assert col_sums(td, f.x)["x"] == 7.0


def test_row_sds_row_medians(td):
    out = (
        td
        >> mutate(
            rs=round_(row_sds(f.x, as_double(f.y)), 4),
            rmed=row_medians(f.x, as_double(f.y)),
        )
    ).collect()
    # row (1.0, 10) -> sd = 6.3640; NA row propagates (na_rm default False)
    assert_iterable_equal(
        out["rs"].tolist(), [6.364, 12.7279, None, 25.4558], approx=True
    )
    # reference semantics: upper median of non-null values
    assert_iterable_equal(out["rmed"].tolist(), [10.0, 20.0, 30.0, 40.0])


def test_row_sds_na_rm(spark):
    td = tibble(spark, a=[1.0, None], b=[3.0, 5.0], c=[5.0, None])
    out = (td >> mutate(s=round_(row_sds(f.a, f.b, f.c, na_rm=True), 4))).collect()
    # row2 has a single non-null -> sd undefined -> NA
    assert_iterable_equal(out["s"].tolist(), [2.0, None])


# ---- first2 / last2 -------------------------------------------------------

def test_first2_last2(spark):
    td = tibble(spark, x=[3.0, 1.0, 2.0], y=["c", "a", "b"])
    out = (td >> summarise(fy=first2(f.x, f.y), ly=last2(f.x, f.y))).collect()
    assert out.iloc[0]["fy"] == "a"
    assert out.iloc[0]["ly"] == "c"


def test_first2_grouped(spark):
    td = tibble(
        spark, g=["a", "a", "b", "b"], x=[2.0, 1.0, 4.0, 3.0], y=[10, 20, 30, 40]
    )
    out = (
        td >> group_by(f.g) >> summarise(fy=first2(f.x, f.y))
    ).collect().sort_values("g")
    assert out["fy"].tolist() == [20, 40]


# ---- cur_column (reference tests/dplyr/test_context.py) -------------------

def test_cur_column_in_across(td):
    out = (
        td
        >> summarise(
            across(
                [f.x, f.y],
                lambda c: paste0(cur_column(), "=", round_(mean(c, na_rm=True), 1)),
            )
        )
    ).collect()
    assert out.iloc[0]["x"] == "x=2.3"
    assert out.iloc[0]["y"] == "y=25.0"


def test_cur_column_in_across_mutate(td):
    out = (
        td
        >> mutate(across([f.s], lambda c: paste0(cur_column(), "_", c), _names="{_col}_tag"))
    ).collect()
    assert out["s_tag"].tolist() == ["s_a", "s_b", "s_c", "s_d"]


class TestNthNegativeAndSeqByZero:
    """Reference: polars x.get(n) python-style negative nth; R seq
    rejects by=0 unless from == to."""

    def test_nth_negative_index(self, spark):
        from datar_polars_spark import f, tibble, summarise
        from datar_polars_spark.functions import nth

        td = tibble(spark, x=[3.0, 1.0, 2.0])
        assert (td >> summarise(v=nth(f.x, -1))).collect()["v"].tolist() == [2.0]

    def test_nth_negative_out_of_bounds_default(self, spark):
        from datar_polars_spark import f, tibble, summarise
        from datar_polars_spark.functions import nth

        td = tibble(spark, x=[3.0, 1.0, 2.0])
        got = (td >> summarise(v=nth(f.x, -5, default=0.0))).collect()
        assert got["v"].tolist() == [0.0]

    def test_seq_by_zero(self):
        import pytest
        from datar_polars_spark.functions import seq

        assert seq(1, 1, by=0) == [1]
        with pytest.raises(ValueError):
            seq(1, 5, by=0)
