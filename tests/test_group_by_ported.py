"""Ported from reference tests/dplyr/test_group_by.py — the cases not
already in test_group_meta / test_groups_tidyr_ported: partial
ungroup, rowwise with key columns, error paths, empty frames.
"""

import pytest

from datar_polars_spark import f, group_by, mutate, rowwise, tibble, ungroup
from datar_polars_spark.functions import sum_ as sum_f
from datar_polars_spark.functions import c_across


class TestUngroup:
    def test_ungroup_some_columns(self, spark):
        td = tibble(spark, x=[1, 2], y=[3, 4], z=[5, 6])
        out = td >> group_by(f.x, f.y) >> ungroup(f.x)
        assert list(out.group_vars) == ["y"]

    def test_ungroup_string_col(self, spark):
        td = tibble(spark, x=[1, 2], y=[3, 4])
        out = td >> group_by(f.x) >> ungroup("x")
        assert list(out.group_vars) == []

    def test_ungroup_nonexistent_col_error(self, spark):
        td = tibble(spark, x=[1, 2])
        gf = td >> group_by(f.x)
        with pytest.raises(KeyError):
            gf >> ungroup(f.z)

    def test_ungroup_no_groups_is_noop(self, spark):
        td = tibble(spark, x=[1, 2])
        out = td >> ungroup()
        assert list(out.group_vars) == []


class TestRowwise:
    def test_rowwise_sets_flag(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = td >> rowwise()
        assert out.rowwise is True
        assert list(out.group_vars) == []

    def test_rowwise_with_cols_sets_groups(self, spark):
        td = tibble(spark, x=[1, 2, 3], y=[4, 5, 6])
        out = td >> rowwise(f.x)
        assert out.rowwise is True
        assert list(out.group_vars) == ["x"]

    def test_group_by_after_rowwise_replaces(self, spark):
        td = tibble(spark, x=[1, 2], y=[3, 4])
        out = td >> rowwise(f.x) >> group_by(f.y)
        assert out.rowwise is False
        assert list(out.group_vars) == ["y"]

    def test_rowwise_keys_kept_through_mutate(self, spark):
        td = tibble(spark, sim=[1, 2, 3], a=[1.0, 2.0, 3.0], b=[4.0, 5.0, 6.0])
        out = (
            td >> rowwise(f.sim) >> mutate(s=sum_f(c_across([f.a, f.b])))
        ).collect()
        assert out["s"].tolist() == [5.0, 7.0, 9.0]


class TestGroupByEdges:
    def test_group_by_nonexistent_col(self, spark):
        td = tibble(spark, x=[1])
        with pytest.raises(KeyError):
            td >> group_by(f.z)

    def test_group_by_no_args(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = td >> group_by()
        assert list(out.group_vars) == []

    def test_group_by_empty_df(self, spark):
        td = tibble(spark, g=[1], x=[1])
        td = td.__class__(td.df.filter("g < 0"), levels=td.levels)
        out = td >> group_by(f.g)
        assert list(out.group_vars) == ["g"]
        assert len(out.collect()) == 0

    def test_does_not_affect_input_data(self, spark):
        td = tibble(spark, x=[1, 2])
        _ = td >> group_by(f.x)
        assert list(td.group_vars) == []
