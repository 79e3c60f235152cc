"""Join / set-op / rows-DML behavior parity (reference
api/dplyr/join.py, sets.py, bind.py, rows.py suites)."""

import pytest

from datar_polars_spark import (
    f,
    tibble,
    arrange,
    inner_join,
    left_join,
    right_join,
    full_join,
    semi_join,
    anti_join,
    cross_join,
    nest_join,
    bind_rows,
    bind_cols,
    union_,
    union_all,
    intersect_,
    setdiff_,
    symdiff,
    setequal,
    rows_insert,
    rows_update,
    rows_patch,
    rows_upsert,
    rows_delete,
)

from conftest import assert_frame_equal, assert_iterable_equal


@pytest.fixture
def ab(spark):
    a = tibble(spark, k=[1, 2, 3], x=["a", "b", "c"])
    b = tibble(spark, k=[2, 3, 4], y=["B", "C", "D"])
    return a, b


def test_full_join_keeps_both_sides(ab):
    a, b = ab
    out = (a >> full_join(b, by="k") >> arrange(f.k)).collect()
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert_iterable_equal(out["x"].tolist(), ["a", "b", "c", None])
    assert_iterable_equal(out["y"].tolist(), [None, "B", "C", "D"])


def test_right_join(ab):
    a, b = ab
    out = (a >> right_join(b, by="k") >> arrange(f.k)).collect()
    assert out["k"].tolist() == [2, 3, 4]
    assert_iterable_equal(out["x"].tolist(), ["b", "c", None])


def test_semi_anti_are_filters(ab):
    a, b = ab
    semi = (a >> semi_join(b, by="k")).collect()
    assert semi["k"].tolist() == [2, 3]
    assert list(semi.columns) == ["k", "x"]  # no y columns
    anti = (a >> anti_join(b, by="k")).collect()
    assert anti["k"].tolist() == [1]


def test_cross_join_cartesian(spark):
    a = tibble(spark, x=[1, 2])
    b = tibble(spark, y=["u", "v"])
    out = (a >> cross_join(b)).collect()
    assert len(out) == 4
    assert sorted(zip(out["x"], out["y"])) == [(1, "u"), (1, "v"), (2, "u"), (2, "v")]


def test_join_keep_true_preserves_both_keys(ab):
    a, b = ab
    out = a >> inner_join(b, by={"k": "k"}, keep=True)
    assert "k_x" in out.columns and "k_y" in out.columns


def test_nest_join_collects_matches(spark):
    a = tibble(spark, k=[1, 2])
    b = tibble(spark, k=[1, 1, 3], v=[10, 20, 30])
    out = (a >> nest_join(b, by="k", name="b") >> arrange(f.k)).collect()
    lists = [sorted(r["v"] for r in row) if row is not None else [] for row in out["b"]]
    assert lists == [[10, 20], []]


def test_bind_cols_positional(spark):
    a = tibble(spark, x=[1, 2])
    b = tibble(spark, y=["u", "v"])
    out = bind_cols(a, b).collect()
    assert out["x"].tolist() == [1, 2]
    assert out["y"].tolist() == ["u", "v"]


def test_bind_rows_id_tag(spark):
    a = tibble(spark, x=[1])
    b = tibble(spark, x=[2])
    out = bind_rows(a, b, _id="src").collect()
    assert out["src"].tolist() == [0, 1]  # reference: 0-based int ids
    assert out["x"].tolist() == [1, 2]


def test_set_ops(spark):
    a = tibble(spark, x=[1, 2, 2, 3])
    b = tibble(spark, x=[2, 3, 4])
    assert sorted(union_(a, b).collect()["x"]) == [1, 2, 3, 4]
    assert sorted(union_all(a, b).collect()["x"]) == [1, 2, 2, 2, 3, 3, 4]
    assert sorted(intersect_(a, b).collect()["x"]) == [2, 3]
    assert sorted(setdiff_(a, b).collect()["x"]) == [1]
    assert sorted(symdiff(a, b).collect()["x"]) == [1, 4]
    assert setequal(a, tibble(spark, x=[3, 2, 1, 2]))
    assert not setequal(a, b)


def test_rows_insert_errors_on_conflict(spark):
    a = tibble(spark, k=[1], v=[10])
    b = tibble(spark, k=[1], v=[99])
    with pytest.raises(ValueError):
        rows_insert(a, b, by="k")


def test_rows_update_patch_upsert_delete(spark):
    a = tibble(spark, k=[1, 2], v=[10.0, None])
    upd = tibble(spark, k=[1], v=[11.0])
    out = (rows_update(a, upd, by="k") >> arrange(f.k)).collect()
    assert_iterable_equal(out["v"].tolist(), [11.0, None])

    patch = tibble(spark, k=[1, 2], v=[99.0, 20.0])
    out2 = (rows_patch(a, patch, by="k") >> arrange(f.k)).collect()
    # patch only fills NA: k=1 keeps 10, k=2 gets 20
    assert out2["v"].tolist() == [10.0, 20.0]

    ups = tibble(spark, k=[2, 3], v=[21.0, 30.0])
    out3 = (rows_upsert(a, ups, by="k") >> arrange(f.k)).collect()
    assert out3["k"].tolist() == [1, 2, 3]
    assert out3["v"].tolist() == [10.0, 21.0, 30.0]

    out4 = (rows_delete(a, tibble(spark, k=[1]), by="k")).collect()
    assert out4["k"].tolist() == [2]
