"""Ported from reference tests/dplyr/test_relocate.py, test_pull.py,
test_rename.py.
"""

import numpy as np
import pytest

from datar_polars_spark import (
    f,
    group_by,
    pull,
    relocate,
    rename,
    rename_with,
    tibble,
)


class TestRelocate:
    def test_move_to_front(self, spark):
        td = tibble(spark, a=[1, 2], b=[3, 4], c=[5, 6])
        assert (td >> relocate(f.c)).columns == ["c", "a", "b"]

    def test_before(self, spark):
        td = tibble(spark, a=[1, 2], b=[3, 4], c=[5, 6])
        assert (td >> relocate(f.a, _before="c")).columns == ["b", "a", "c"]

    def test_after(self, spark):
        td = tibble(spark, a=[1, 2], b=[3, 4], c=[5, 6])
        assert (td >> relocate(f.b, _after="a")).columns == ["a", "b", "c"]

    def test_range_after(self, spark):
        td = tibble(spark, a=[1], b=[3], c=[5], d=[7])
        out = td >> relocate(f[f.b : f.c], _after="d")
        assert out.columns == ["a", "d", "b", "c"]

    def test_before_and_after_error(self, spark):
        td = tibble(spark, a=[1, 2], b=[3, 4])
        with pytest.raises(ValueError, match="only one"):
            td >> relocate(f.a, _before="b", _after="b")

    def test_no_args_noop(self, spark):
        td = tibble(spark, a=[1, 2], b=[3, 4])
        out = td >> relocate()
        assert out.columns == ["a", "b"]
        assert out.collect()["a"].tolist() == [1, 2]

    def test_with_rename(self, spark):
        td = tibble(spark, x=[1, 2], y=[3, 4])
        out = td >> relocate(new_x=f.x)
        assert "new_x" in out.columns
        assert out.columns[0] == "new_x"


class TestPull:
    def test_pull_default_last_column(self, spark):
        td = tibble(spark, a=[1, 2], b=[3, 4])
        assert pull(td) == [3, 4]

    def test_pull_by_name_and_ref(self, spark):
        td = tibble(spark, a=[1, 2], b=[3, 4])
        assert pull(td, "a") == [1, 2]
        assert pull(td, f.b) == [3, 4]

    def test_pull_by_index(self, spark):
        td = tibble(spark, a=[1, 2], b=[3, 4])
        assert pull(td, 0) == [1, 2]
        assert pull(td, 1) == [3, 4]
        assert pull(td, -1) == [3, 4]

    def test_pull_to_array(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        assert np.array_equal(pull(td, "x", to="array"), np.array([1, 2, 3]))

    def test_pull_named_dict_from_list(self, spark):
        td = tibble(spark, x=[10, 20])
        assert pull(td, "x", name=["a", "b"]) == {"a": 10, "b": 20}

    def test_pull_named_dict_from_column(self, spark):
        td = tibble(spark, name=["Luke", "Leia"], height=[172.0, 150.0])
        out = td >> pull(f.height, name=f.name)
        assert out["Luke"] == 172.0


class TestRename:
    def test_rename_single(self, spark):
        td = tibble(spark, old_name=[1, 2, 3])
        out = td >> rename(new_name=f.old_name)
        assert out.columns == ["new_name"]

    def test_rename_multiple(self, spark):
        td = tibble(spark, a=[1], b=[2], c=[3])
        out = td >> rename(x=f.a, y=f.b)
        assert out.columns == ["x", "y", "c"]

    def test_rename_original_unchanged(self, spark):
        td = tibble(spark, x=[1, 2])
        out = td >> rename(new_x=f.x)
        assert td.columns == ["x"]
        assert out.columns == ["new_x"]

    def test_rename_with_upper(self, spark):
        td = tibble(spark, hello=[1], world=[2])
        out = td >> rename_with(str.upper)
        assert out.columns == ["HELLO", "WORLD"]

    def test_rename_with_specific_columns(self, spark):
        td = tibble(spark, a_test=[1], b_test=[2], c=[3])
        out = td >> rename_with(lambda n: n.replace("_test", ""), ["a_test", "b_test"])
        assert out.columns == ["a", "b", "c"]

    def test_rename_grouped_updates_group_vars(self, spark):
        td = tibble(spark, g=[1, 2], x=[3, 4]) >> group_by(f.g)
        out = td >> rename(h=f.g)
        assert list(out.group_vars) == ["h"]


class TestRowsPorted:
    # reference tests/dplyr/test_rows.py
    def test_rows_append_simple(self, spark):
        from datar_polars_spark import rows_append

        x = tibble(spark, a=[1, 2], b=[3, 4])
        y = tibble(spark, a=[5, 6], b=[7, 8])
        out = rows_append(x, y).collect()
        assert out["a"].tolist() == [1, 2, 5, 6]

    def test_rows_append_column_mismatch_error(self, spark):
        from datar_polars_spark import rows_append

        x = tibble(spark, a=[1])
        y = tibble(spark, b=[2])
        with pytest.raises(ValueError, match="columns"):
            rows_append(x, y)

    def test_rows_insert_conflict_ignore(self, spark):
        from datar_polars_spark import rows_insert

        x = tibble(spark, id=[1, 2], val=["a", "b"])
        y = tibble(spark, id=[2, 3], val=["b2", "c"])
        out = rows_insert(x, y, by=f.id, conflict="ignore").collect()
        assert len(out) == 3

    def test_rows_update_unmatched_error(self, spark):
        from datar_polars_spark import rows_update

        x = tibble(spark, id=[1, 2], val=["a", "b"])
        y = tibble(spark, id=[3], val=["c"])
        with pytest.raises(ValueError):
            rows_update(x, y, by=f.id)
