"""Ported from reference tests/tidyr/test_tidyr_verbs.py — the cases
not already covered by test_tidyr / test_tidyr_parity: drop_na _how,
replace_na scalar over mixed types, fill downup/updown/all-columns,
pivot_longer custom names, pivot_wider id_cols/names_prefix/values_fn,
separate single-piece/ignored-piece/convert, separate_rows convert
dict, unite removal=False, unnest keep_empty/multi, uncount errors and
row-index _id, expand_grid with missing.
"""

import pytest

from datar_polars_spark import (
    expand_grid,
    f,
    fill,
    mutate,
    pivot_longer,
    pivot_wider,
    replace_na,
    separate,
    separate_rows,
    tibble,
    uncount,
    unite,
    unnest,
)
from datar_polars_spark.operators.tidyr import drop_na
from datar_polars_spark.functions import mean

from conftest import assert_iterable_equal


class TestDropNA:
    def test_drop_na_how_all(self, spark):
        td = tibble(spark, x=[1.0, None, None, 4.0], y=[None, 2.0, None, None])
        out = (td >> drop_na(_how="all")).collect()
        assert len(out) == 3

    def test_drop_na_no_nulls(self, spark):
        td = tibble(spark, x=[1, 2, 3], y=["a", "b", "c"])
        assert len((td >> drop_na()).collect()) == 3


class TestReplaceNA:
    def test_replace_na_scalar_mixed_types(self, spark):
        # numeric default must not touch the string column
        td = tibble(spark, x=[1.0, None, 3.0], y=[None, "b", None])
        out = (td >> replace_na(0)).collect()
        assert out["x"].tolist() == [1.0, 0.0, 3.0]
        assert_iterable_equal(out["y"].tolist(), [None, "b", None])

    def test_replace_na_str_scalar(self, spark):
        td = tibble(spark, x=["a", None, "c"])
        out = (td >> replace_na("missing")).collect()
        assert out["x"].tolist() == ["a", "missing", "c"]


class TestFill:
    def test_fill_downup(self, spark):
        td = tibble(spark, x=[None, 2.0, None, None, 5.0])
        out = (td >> fill(f.x, _direction="downup")).collect()
        assert out["x"].tolist() == [2.0, 2.0, 2.0, 2.0, 5.0]

    def test_fill_updown(self, spark):
        td = tibble(spark, x=[1.0, None, None, 4.0, None])
        out = (td >> fill(f.x, _direction="updown")).collect()
        assert out["x"].tolist() == [1.0, 4.0, 4.0, 4.0, 4.0]

    def test_fill_all_columns(self, spark):
        td = tibble(spark, x=[1.0, None], y=[None, 2.0])
        out = (td >> fill(_direction="down")).collect()
        assert out["x"].tolist() == [1.0, 1.0]
        assert_iterable_equal(out["y"].tolist(), [None, 2.0])


class TestPivotLonger:
    def test_pivot_longer_custom_names(self, spark):
        td = tibble(spark, id=[1, 2], a=[1, 2], b=[3, 4])
        out = (
            td >> pivot_longer([f.a, f.b], names_to="var", values_to="val")
        ).collect()
        assert "var" in out.columns and "val" in out.columns
        assert out["var"].tolist() == ["a", "b", "a", "b"]

    def test_pivot_longer_default_names(self, spark):
        td = tibble(spark, id=[1, 2], x=[10, 20], y=[30, 40])
        out = (td >> pivot_longer([f.x, f.y])).collect()
        assert len(out) == 4
        assert sorted(out["name"].unique().tolist()) == ["x", "y"]


class TestPivotWider:
    def test_basic_pivot_wider_id_cols(self, spark):
        td = tibble(
            spark,
            id=[1, 1, 2, 2],
            name=["x", "y", "x", "y"],
            value=[10, 20, 30, 40],
        )
        out = (
            td >> pivot_wider(id_cols="id", names_from=f.name, values_from=f.value)
        ).collect()
        assert "id" in out.columns and out.shape == (2, 3)

    def test_pivot_wider_names_prefix(self, spark):
        td = tibble(spark, id=[1, 2], name=["x", "x"], value=[10, 20])
        out = (
            td
            >> pivot_wider(
                id_cols="id",
                names_from=f.name,
                values_from=f.value,
                names_prefix="p_",
            )
        ).collect()
        assert "p_x" in out.columns

    def test_pivot_wider_values_fn_builder(self, spark):
        # reference passes the datar `mean` builder as values_fn
        td = tibble(
            spark,
            tension=["L", "L", "H"],
            wool=["A", "A", "B"],
            breaks=[10.0, 20.0, 30.0],
        )
        out = (
            td >> pivot_wider(names_from=f.wool, values_from=f.breaks, values_fn=mean)
        ).collect()
        row_l = out[out["tension"] == "L"]
        assert row_l["A"].tolist() == [15.0]


class TestSeparate:
    def test_separate_single_piece(self, spark):
        td = tibble(spark, x=["a_b", "c_d"])
        out = (td >> separate(f.x, "first", sep="_")).collect()
        assert out["first"].tolist() == ["a", "c"]

    def test_separate_ignore_column(self, spark):
        td = tibble(spark, x=[None, "x.y", "x.z", "y.z"])
        out = (td >> separate(f.x, [None, "B"], sep=r"\.")).collect()
        assert_iterable_equal(out["B"].tolist(), [None, "y", "z", "z"])
        assert list(out.columns) == ["B"]

    def test_separate_fill_right_default(self, spark):
        td = tibble(spark, x=["x", "x y", "x y z", None])
        out = (td >> separate(f.x, ["a", "b"], sep=" ", extra="drop", fill="right")).collect()
        assert_iterable_equal(out["a"].tolist(), ["x", "x", "x", None])
        assert_iterable_equal(out["b"].tolist(), [None, "y", "y", None])

    def test_separate_merge_fill_left(self, spark):
        td = tibble(spark, x=["x", "x y", "x y z", None])
        out = (td >> separate(f.x, ["a", "b"], sep=" ", extra="merge", fill="left")).collect()
        assert_iterable_equal(out["a"].tolist(), [None, "x", "x", None])
        assert_iterable_equal(out["b"].tolist(), ["x", "y", "y z", None])

    def test_separate_convert_dict(self, spark):
        td = tibble(spark, x=["x:1", "x:2", "y:4", "z", None])
        out = (
            td >> separate(f.x, ["a", "b"], sep=":", convert={"b": float})
        ).collect()
        assert_iterable_equal(out["a"].tolist(), ["x", "x", "y", "z", None])
        assert_iterable_equal(out["b"].tolist(), [1.0, 2.0, 4.0, None, None])


class TestSeparateRows:
    def test_separate_rows_convert_dict(self, spark):
        td = tibble(
            spark,
            x=[1, 2, 3],
            y=["a", "d,e,f", "g,h"],
            z=["1", "2,3,4", "5,6"],
        )
        out = (td >> separate_rows(f.y, f.z, sep=",", convert={"z": int})).collect()
        assert len(out) == 6
        assert out["y"].tolist() == ["a", "d", "e", "f", "g", "h"]
        assert out["z"].tolist() == [1, 2, 3, 4, 5, 6]


class TestUnite:
    def test_unite_removal_false_all_na_empty(self, spark):
        td = expand_grid(spark, x=["a", None], y=["b", None])
        out = (td >> unite("z", f.x, f.y, na_rm=True, remove=False)).collect()
        assert list(out.columns) == ["z", "x", "y"]
        assert sorted(out["z"].tolist()) == ["", "a", "a_b", "b"]


class TestUnnest:
    def test_unnest_multiple_columns(self, spark):
        td = tibble(spark, id=[1, 2], a=[[1, 2], [3]], b=[[4, 5], [6]])
        out = (td >> unnest(f.a, f.b)).collect()
        assert out.shape == (3, 3)

    def test_unnest_keep_empty(self, spark):
        td = tibble(spark, id=[1, 2], vals=[[10], []])
        out = (td >> unnest(f.vals, keep_empty=True)).collect()
        assert out.shape == (2, 2)
        assert_iterable_equal(sorted(out["id"].tolist()), [1, 2])


class TestUncount:
    def test_uncount_string_column_name(self, spark):
        td = tibble(spark, id=[1, 2], n=[2, 3])
        out = (td >> uncount("n")).collect()
        assert out["id"].tolist() == [1, 1, 2, 2, 2]
        assert list(out.columns) == ["id"]

    def test_uncount_no_count_column(self, spark):
        td = tibble(spark, id=[1, 2])
        with pytest.raises(ValueError, match="weights"):
            td >> uncount("n")

    def test_uncount_non_integer(self, spark):
        td = tibble(spark, id=[1, 2], n=[1.5, 3.0])
        with pytest.raises(ValueError, match="integer"):
            td >> uncount(f.n)

    def test_uncount_with_id_row_index(self, spark):
        td = tibble(spark, x=["a", "b"], n=[1, 2])
        out = (td >> uncount(f.n, _id="id")).collect()
        assert out["x"].tolist() == ["a", "b", "b"]
        assert out["id"].tolist() == [0, 1, 1]

    def test_uncount_with_expr(self, spark):
        td = tibble(spark, x=["a", "b"], n=[1, 2])
        out = (td >> uncount(f.n + 1, _id="id")).collect()
        assert out["x"].tolist() == ["a", "a", "b", "b", "b"]
        assert out["id"].tolist() == [0, 0, 1, 1, 1]

        out = (td >> uncount(2 // f.n, _id="id")).collect()
        assert out["x"].tolist() == ["a", "a", "b"]
        assert out["id"].tolist() == [0, 0, 1]


class TestExpandGrid:
    def test_expand_grid_with_missing(self, spark):
        out = expand_grid(spark, x=["a", None], y=["b", None]).collect()
        assert out.shape == (4, 2)
        assert set(out["x"].tolist()) == {"a", None}
        assert set(out["y"].tolist()) == {"b", None}


class TestExpandCompleteNesting:
    # reference tests/tidyr/test_tidyr_verbs_ext.py:215-345
    def test_complete_cross(self, spark):
        td = tibble(spark, x=[1, 2], y=[3, 4])
        from datar_polars_spark import complete

        out = (td >> complete(f.x, f.y)).collect()
        assert out["x"].tolist() == [1, 1, 2, 2]
        assert out["y"].tolist() == [3, 4, 3, 4]

    def test_complete_with_nesting(self, spark):
        from datar_polars_spark import complete, nesting

        td = tibble(
            spark,
            group=[1, 2, 1],
            item_id=[1, 2, 2],
            item_name=["a", "b", "b"],
            value1=[1, 2, 3],
            value2=[4, 5, 6],
        )
        out = (td >> complete(f.group, nesting(f.item_id, f.item_name))).collect()
        assert out["group"].tolist() == [1, 1, 2, 2]
        assert out["item_id"].tolist() == [1, 2, 1, 2]
        assert out["item_name"].tolist() == ["a", "b", "a", "b"]
        from conftest import assert_iterable_equal

        assert_iterable_equal(out["value1"].tolist(), [1, 3, None, 2])
        assert_iterable_equal(out["value2"].tolist(), [4, 6, None, 5])

    def test_complete_with_nesting_and_fill(self, spark):
        from datar_polars_spark import complete, nesting

        td = tibble(
            spark,
            group=[1, 2, 1],
            item_id=[1, 2, 2],
            item_name=["a", "b", "b"],
            value1=[1, 2, 3],
            value2=[4.0, 5.0, 6.0],
        )
        out = (
            td
            >> complete(f.group, nesting(f.item_id, f.item_name), fill={"value1": 0})
        ).collect()
        assert out["value1"].tolist() == [1, 3, 0, 2]

    def test_expand_factor_levels(self, spark):
        from datar_polars_spark import expand, factor_

        td = tibble(
            spark,
            type=["apple", "orange", "apple", "orange", "orange", "orange"],
            size=["XS", "S", "M", "S", "S", "M"],
        ) >> factor_(f.size, levels=["XS", "S", "M", "L"])
        out = td >> expand(f.type, f.size)
        assert len(out.collect()) == 8  # 2 types x 4 levels incl unused L

    def test_expand_nesting_first_seen_order(self, spark):
        from datar_polars_spark import expand, nesting

        td = tibble(
            spark,
            type=["apple", "orange", "apple", "orange", "orange", "orange"],
            size=["XS", "S", "M", "S", "S", "M"],
        )
        out = (td >> expand(nesting(f.type, f.size))).collect()
        assert out["type"].tolist() == ["apple", "orange", "apple", "orange"]
        assert out["size"].tolist() == ["XS", "S", "M", "M"]

    def test_expand_with_full_seq(self, spark):
        from datar_polars_spark import expand
        from datar_polars_spark.operators.tidyr import full_seq

        td = tibble(
            spark,
            type=["apple", "orange", "apple"],
            year=[2010, 2010, 2012],
        )
        out = (td >> expand(f.type, full_seq(f.year, 1))).collect()
        assert len(out) == 6  # 2 types x years 2010..2012
        assert sorted(set(out["year"].tolist())) == [2010, 2011, 2012]


class TestTidyrRemainingCorners:
    def test_uncount_zero_weight_drops_rows(self, spark):
        from datar_polars_spark import uncount

        t = tibble(spark, x=["a", "b", "c"], w=[2, 0, 1])
        out = (t >> uncount(f.w)).collect()
        assert list(out["x"]) == ["a", "a", "c"]

    def test_unite_custom_sep(self, spark):
        from datar_polars_spark import unite

        t = tibble(spark, a=["x"], b=["y"])
        out = t >> unite("ab", f.a, f.b, sep="::")
        assert list(out.collect()["ab"]) == ["x::y"]

    def test_separate_custom_sep(self, spark):
        from datar_polars_spark import separate

        t = tibble(spark, v=["a::b"])
        out = t >> separate(f.v, ["l", "r"], sep="::")
        pdf = out.collect()
        assert pdf["l"][0] == "a" and pdf["r"][0] == "b"

    def test_replace_na_no_nulls_is_noop(self, spark):
        from datar_polars_spark import replace_na

        t = tibble(spark, x=[1, 2])
        out = t >> replace_na(0)
        assert list(out.collect()["x"]) == [1, 2]

    def test_fill_works_with_nas_mixed(self, spark):
        from datar_polars_spark import fill

        t = tibble(spark, x=[None, 1.0, None, None, 2.0, None])
        down = t >> fill(f.x)
        vals = list(down.collect()["x"])
        assert vals[1:] == [1.0, 1.0, 1.0, 2.0, 2.0]
