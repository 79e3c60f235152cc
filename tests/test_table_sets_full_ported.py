"""Port of reference tests/base/test_table.py and
tests/dplyr/test_sets.py vector cases (exact names; vector inputs are
wrapped in a one-column tibble — table/tabulate are frame verbs here)."""

from __future__ import annotations

from datar_polars_spark import Tibble, f, tibble
from datar_polars_spark.functions import intersect, setdiff, setequal, union
from datar_polars_spark.operators.misc import table_, tabulate


def test_table_series(spark):
    td = tibble(spark, x=["a", "b", "a", "c", "b", "a"])
    out = table_(td, f.x)
    assert isinstance(out, Tibble)
    got = out.collect()
    assert "a" in got["x"].tolist()
    assert dict(zip(got["x"], got["n"]))["a"] == 3


def test_table_list(spark):
    td = tibble(spark, x=["a", "b", "a", "c", "b"])
    assert isinstance(table_(td, f.x), Tibble)


def test_table_two_series(spark):
    td = tibble(spark, x=["a", "b", "a", "b"], y=[1, 1, 2, 2])
    out = table_(td, f.x, f.y)
    assert isinstance(out, Tibble)
    assert out.nrow() == 4  # full grid incl. zero combos


def test_table_empty(spark):
    td = tibble(spark, x=[])
    assert isinstance(table_(td, f.x), Tibble)


def test_tabulate_series(spark):
    td = tibble(spark, x=[1, 2, 1, 3, 2, 1])
    assert tabulate(td, f.x) == [3, 2, 1]


def test_tabulate_list(spark):
    td = tibble(spark, x=[1, 2, 2, 3, 3, 3])
    assert tabulate(td, f.x) == [1, 2, 3]


def test_tabulate_with_nbins(spark):
    td = tibble(spark, x=[1, 2, 1, 3])
    assert len(tabulate(td, f.x, nbins=5)) == 5


def test_works_with_vectors():
    assert intersect([1, 2, 3], [3, 4]) == [3]
    assert union([1, 2, 3], [3, 4]) == [1, 2, 3, 4]
    assert setdiff([1, 2, 3], [3, 4]) == [1, 2]


def test_set_equality():
    assert setequal([1, 2, 3], [1, 2, 3])
    assert not setequal([1, 2], [2, 3])


def test_with_series():
    assert intersect([1, 2, 3], [3, 4]) == [3]
    assert union([1, 2, 3], [3, 4]) == [1, 2, 3, 4]
    assert setdiff([1, 2, 3], [3, 4]) == [1, 2]
