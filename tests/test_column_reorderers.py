"""Column-level sort/order/rank/sample/unique/any_na + rownames verbs
+ group_cols/cur_group_rows/ordered_ — reference parity:
``api/base/seq.py:140-420``, ``api/base/verbs.py:118-290``,
``api/base/sets.py:160-178``, ``api/dplyr/context.py:208-245``,
``api/dplyr/group_data.py:202-210``."""

import pytest

from datar_polars_spark import (
    Tibble,
    f,
    arrange,
    column_to_rownames,
    group_by,
    group_cols,
    has_rownames,
    mutate,
    ordered_,
    pull,
    rownames,
    rownames_to_column,
    remove_rownames,
    set_colnames,
    set_rownames,
    summarise,
    tibble,
)
from datar_polars_spark.functions import (
    any_na,
    cur_group_rows,
    order_,
    outer,
    rank,
    sample_,
    sort_,
    unique_,
)


@pytest.fixture(scope="module")
def td(spark):
    return tibble(spark, g=["a", "a", "a", "b", "b"], x=[3, 1, 2, 5, 4])


def col(t, name):
    vals = list(t.collect()[name])
    return [None if isinstance(v, float) and v != v else v for v in vals]


# ---- sort ----------------------------------------------------------------

def test_sort_ungrouped(td):
    out = td >> mutate(s=sort_(f.x))
    assert col(out, "s") == [1, 2, 3, 4, 5]


def test_sort_decreasing(td):
    out = td >> mutate(s=sort_(f.x, decreasing=True))
    assert col(out, "s") == [5, 4, 3, 2, 1]


def test_sort_grouped(td):
    out = td >> group_by(f.g) >> mutate(s=sort_(f.x))
    assert col(out, "s") == [1, 2, 3, 4, 5]


def test_sort_nulls_last(spark):
    t = tibble(spark, x=[3.0, None, 1.0])
    out = t >> mutate(s=sort_(f.x))
    assert col(out, "s") == [1.0, 3.0, None]
    out2 = t >> mutate(s=sort_(f.x, na_last=False))
    assert col(out2, "s") == [None, 1.0, 3.0]


def test_sort_summarise_multivalue(td):
    out = td >> group_by(f.g) >> summarise(s=sort_(f.x)) >> arrange(f.g, f.s)
    assert col(out, "s") == [1, 2, 3, 4, 5]


def test_sort_eager():
    assert sort_([3, 1, 2]) == [1, 2, 3]
    assert sort_([3, None, 1], na_last=False) == [None, 1, 3]


# ---- order ---------------------------------------------------------------

def test_order_ungrouped(td):
    out = td >> mutate(o=order_(f.x))
    # positions of sorted values: x=[3,1,2,5,4] → sorted 1,2,3,4,5 at idx 1,2,0,4,3
    assert col(out, "o") == [1, 2, 0, 4, 3]


def test_order_decreasing(td):
    out = td >> mutate(o=order_(f.x, decreasing=True))
    assert col(out, "o") == [3, 4, 0, 2, 1]


def test_order_grouped(td):
    out = td >> group_by(f.g) >> mutate(o=order_(f.x))
    # within-group 0-based positions: a:[3,1,2]→[1,2,0]; b:[5,4]→[1,0]
    assert col(out, "o") == [1, 2, 0, 1, 0]


def test_order_with_nulls(spark):
    t = tibble(spark, x=[3.0, None, 1.0])
    out = t >> mutate(o=order_(f.x))
    assert col(out, "o") == [2, 0, 1]  # nulls last
    out2 = t >> mutate(o=order_(f.x, na_last=False))
    assert col(out2, "o") == [1, 2, 0]


def test_order_eager():
    assert order_([3, 1, 2]) == [1, 2, 0]


# ---- rank ----------------------------------------------------------------

def test_rank_average(spark):
    t = tibble(spark, x=[10, 20, 10, 30])
    out = t >> mutate(r=rank(f.x))
    assert col(out, "r") == [1.5, 3.0, 1.5, 4.0]


def test_rank_min_max_first(spark):
    t = tibble(spark, x=[10, 20, 10, 30])
    assert col(t >> mutate(r=rank(f.x, ties_method="min")), "r") == [1, 3, 1, 4]
    assert col(t >> mutate(r=rank(f.x, ties_method="max")), "r") == [2, 3, 2, 4]
    assert col(t >> mutate(r=rank(f.x, ties_method="first")), "r") == [1, 3, 2, 4]


def test_rank_null(spark):
    t = tibble(spark, x=[10.0, None, 5.0])
    out = t >> mutate(r=rank(f.x, ties_method="min"))
    assert col(out, "r") == [2, None, 1]


def test_rank_grouped(td):
    out = td >> group_by(f.g) >> mutate(r=rank(f.x, ties_method="min"))
    assert col(out, "r") == [3, 1, 2, 2, 1]


def test_rank_eager():
    assert rank([10, 20, 10]) == [1.5, 3.0, 1.5]
    assert rank([10, 20, 10], ties_method="max") == [2, 3, 2]


# ---- sample --------------------------------------------------------------

def test_sample_is_permutation(td):
    out = td >> mutate(s=sample_(f.x, seed=42))
    assert sorted(col(out, "s")) == [1, 2, 3, 4, 5]


def test_sample_grouped_permutes_within_group(td):
    out = td >> group_by(f.g) >> mutate(s=sample_(f.x, seed=7))
    vals = col(out, "s")
    assert sorted(vals[:3]) == [1, 2, 3] and sorted(vals[3:]) == [4, 5]


def test_sample_eager():
    assert sorted(sample_([1, 2, 3], seed=1) if False else sample_([1, 2, 3])) == [1, 2, 3]


# ---- unique / any_na ------------------------------------------------------

def test_unique_summarise(spark):
    t = tibble(spark, g=["a", "a", "b"], x=[1, 1, 2])
    out = t >> group_by(f.g) >> summarise(u=unique_(f.x)) >> arrange(f.g)
    assert col(out, "u") == [1, 2]


def test_unique_multivalue_explodes(spark):
    t = tibble(spark, x=[3, 1, 3, 2])
    out = t >> summarise(u=unique_(f.x))
    assert col(out, "u") == [1, 2, 3]


def test_any_na(spark):
    t = tibble(spark, g=["a", "a", "b"], x=[1.0, None, 2.0])
    out = t >> group_by(f.g) >> summarise(a=any_na(f.x)) >> arrange(f.g)
    assert col(out, "a") == [True, False]
    assert any_na([1, None]) is True and any_na([1, 2]) is False


# ---- outer ---------------------------------------------------------------

def test_outer():
    assert outer([1, 2], [10, 20]) == [[10, 20], [20, 40]]
    assert outer([1, 2], [3], "+") == [[4], [5]]


# ---- cur_group_rows -------------------------------------------------------

def test_cur_group_rows_summarise(td):
    out = td >> group_by(f.g) >> summarise(rows=cur_group_rows()) >> arrange(f.g)
    assert col(out, "rows") == [[0, 1, 2], [3, 4]]


def test_cur_group_rows_mutate(td):
    out = td >> group_by(f.g) >> mutate(rows=cur_group_rows())
    assert col(out, "rows") == [[0, 1, 2]] * 3 + [[3, 4]] * 2


# ---- rownames family ------------------------------------------------------

def test_set_rownames_roundtrip(spark):
    t = tibble(spark, x=[1, 2, 3])
    t2 = t >> set_rownames(["r1", "r2", "r3"])
    assert (t2 >> has_rownames()) is True
    assert (t2 >> rownames()) == ["r1", "r2", "r3"]
    t3 = t2 >> rownames_to_column("rn")
    assert col(t3, "rn") == ["r1", "r2", "r3"]
    assert (t3 >> has_rownames()) is False


def test_remove_rownames(spark):
    t = tibble(spark, x=[1]) >> set_rownames(["a"])
    assert ((t >> remove_rownames()) >> has_rownames()) is False


def test_column_to_rownames(spark):
    t = tibble(spark, name=["a", "b"], x=[1, 2])
    t2 = t >> column_to_rownames("name")
    assert t2.columns == ["x"]
    assert (t2 >> rownames()) == ["a", "b"]
    with pytest.raises(ValueError):
        t2 >> column_to_rownames("x")
    with pytest.raises(KeyError):
        t >> column_to_rownames("nope")


def test_set_colnames(spark):
    t = tibble(spark, a=[1], b=[2])
    t2 = t >> set_colnames(["x", "y"])
    assert t2.columns == ["x", "y"]
    with pytest.raises(ValueError):
        t >> set_colnames(["only_one"])


# ---- group_cols / ordered_ -----------------------------------------------

def test_group_cols(td):
    assert (td >> group_by(f.g) >> group_cols()) == [0]
    assert (td >> group_cols()) == []


def test_ordered_constructor(spark):
    t = tibble(spark, x=["lo", "hi", "lo"])
    t2 = t >> ordered_(f.x, levels=["lo", "hi"])
    assert t2.levels["x"] == ["lo", "hi"]
    assert "x" in t2.ordered_factors
