"""Ported from reference tests/dplyr/test_select.py — helpers with &,
kwarg renames, None args, grouped selection rules, range selection,
errors.
"""

import pytest

from datar_polars_spark import f, group_by, select, tibble
from datar_polars_spark.plans.selection import ends_with, starts_with


class TestSelectBasics:
    def test_select_single_column(self, spark):
        td = tibble(spark, x=[1, 2, 3], y=[4, 5, 6])
        out = td >> select(f.x)
        assert out.columns == ["x"]
        assert out.collect()["x"].tolist() == [1, 2, 3]

    def test_select_with_strings(self, spark):
        td = tibble(spark, cyl=[1, 2], am=[3, 4])
        out = td >> select("cyl", "am")
        assert out.columns == ["cyl", "am"]

    def test_select_with_helpers_and_intersection(self, spark):
        td = tibble(spark, name=["a"], height=[1], mass=[3], hair_color=["x"])
        assert (td >> select(starts_with("h"))).columns == ["height", "hair_color"]
        assert (td >> select(ends_with("t"))).columns == ["height"]
        assert (td >> select(ends_with("t") & starts_with("h"))).columns == ["height"]

    def test_reorder_columns(self, spark):
        td = tibble(spark, x=[1, 2], y=[3, 4])
        assert (td >> select(f.y, f.x)).columns == ["y", "x"]

    def test_select_range_f_slice(self, spark):
        td = tibble(spark, name=["a"], height=[1], mass=[2], hair_color=["x"])
        out = td >> select(f[f.name : f.mass])
        assert out.columns == ["name", "height", "mass"]


class TestSelectRename:
    def test_rename_column_with_kwarg(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = td >> select(new_x=f.x)
        assert out.columns == ["new_x"]
        assert out.collect()["new_x"].tolist() == [1, 2, 3]

    def test_rename_doesnt_preserve_old_name(self, spark):
        td = tibble(spark, a=[1], b=[2])
        assert (td >> select(foo=f.a)).columns == ["foo"]

    def test_select_arg_dont_match_internal_args(self, spark):
        td = tibble(spark, a=[1])
        assert (td >> select(var=f.a)).columns == ["var"]


class TestSelectNoneArgs:
    def test_none_arg_treated_as_empty(self, spark):
        td = tibble(spark, x=[1], y=[2])
        out = td >> select(None, f.x, None)
        assert out.columns == ["x"]


class TestSelectGrouped:
    def test_preserves_grouping_variables(self, spark):
        td = tibble(spark, g=[1, 2, 3], x=[3, 2, 1]) >> group_by(f.g)
        out = td >> select(f.x)
        assert out.columns == ["g", "x"]
        assert list(out.group_vars) == ["g"]

    def test_groups_always_included_first(self, spark):
        td = tibble(spark, g=[1, 2], x=[3, 4], y=[5, 6]) >> group_by(f.g)
        out = td >> select(f.y)
        assert out.columns == ["g", "y"]

    def test_select_renamed_groups(self, spark):
        td = tibble(spark, g=[1, 2, 3], x=[3, 2, 1]) >> group_by(f.g)
        out = td >> select(h=f.g)
        assert list(out.group_vars) == ["h"]


class TestSelectErrors:
    def test_select_nonexistent_column(self, spark):
        td = tibble(spark, x=[1])
        with pytest.raises(KeyError):
            td >> select(f.z)


class TestTidyselectPorted:
    # reference tests/dplyr/test_tidyselect.py
    def test_starts_with_case_insensitive(self, spark):
        td = tibble(spark, Abc=[1], abd=[2], xyz=[3])
        out = td >> select(starts_with("ab"))
        assert out.columns == ["Abc", "abd"]

    def test_matches_regex(self, spark):
        from datar_polars_spark.plans.selection import matches

        td = tibble(spark, x1=[1], x2=[2], y1=[3], y2=[4])
        out = td >> select(matches(r"^x\d$"))
        assert out.columns == ["x1", "x2"]

    def test_all_of_any_of(self, spark):
        from datar_polars_spark.plans.selection import all_of, any_of

        td = tibble(spark, a=[1], b=[2], c=[3])
        assert (td >> select(all_of(["a", "c"]))).columns == ["a", "c"]
        assert (td >> select(any_of(["a", "z"]))).columns == ["a"]
        assert (td >> select(any_of(["z"]))).columns == []

    def test_num_range_plain_list(self):
        from datar_polars_spark.plans.selection import num_range

        assert num_range("x", 3) == ["x0", "x1", "x2"]
        assert num_range("wk", range(1, 3), width=2) == ["wk01", "wk02"]
