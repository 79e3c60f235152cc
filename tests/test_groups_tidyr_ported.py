"""Grouping metadata, empty-group, tidyr and forcats corners — ported
from reference tests/dplyr/test_empty_groups.py, test_group_by.py,
tests/tidyr/test_tidyr_verbs*.py and tests/forcats/test_forcats.py.
"""

from __future__ import annotations

import pytest

from conftest import assert_iterable_equal

from datar_polars_spark import (
    f,
    tibble,
    mutate,
    filter_,
    select,
    group_by,
    ungroup,
    summarise,
    arrange,
    group_vars,
    group_size,
    n_groups,
    group_keys,
    rowwise,
    desc,
    # tidyr
    pivot_longer,
    pivot_wider,
    separate,
    unite,
    extract,
    separate_rows,
    uncount,
    drop_na,
    replace_na,
    fill,
    nest,
    unnest,
    chop,
    unchop,
    pack,
    unpack,
    expand_grid,
    complete,
    full_seq,
    # forcats
    factor_,
    levels_,
    nlevels,
    is_factor,
    droplevels,
    fct_relevel,
    fct_inorder,
    fct_infreq,
    fct_rev,
    fct_recode,
    fct_collapse,
    fct_lump_min,
    fct_lump_prop,
    fct_other,
    fct_count,
    fct_expand,
    fct_explicit_na,
    fct_cross,
    cut_,
)
from datar_polars_spark.functions import n, sum_, mean


def _col(td, name):
    return td.collect()[name].tolist()


# ---------------------------------------------------------------------------
# grouping metadata / empty groups
# ---------------------------------------------------------------------------

class TestGroups:
    def test_mutate_keeps_groups(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4], g=[1, 1, 2, 2]) >> group_by(f.g)
        assert group_size(td >> mutate(z=2)) == [2, 2]

    def test_summarise_row_per_group(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4], g=[1, 1, 2, 2])
        out = td >> group_by(f.g) >> summarise(z=n())
        assert out.nrow() == 2

    def test_arrange_keeps_groups(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4], g=[1, 1, 2, 2]) >> group_by(f.g)
        assert group_size(td >> arrange(f.x)) == [2, 2]

    def test_group_by_adds_to_existing(self, spark):
        td = tibble(spark, a=[1], b=[2], c=[3]) >> group_by(f.a)
        out = td >> group_by(f.b, _add=True)
        assert group_vars(out) == ["a", "b"]

    def test_group_by_replaces_by_default(self, spark):
        td = tibble(spark, a=[1], b=[2]) >> group_by(f.a)
        out = td >> group_by(f.b)
        assert group_vars(out) == ["b"]

    def test_ungroup_clears(self, spark):
        td = tibble(spark, a=[1]) >> group_by(f.a)
        assert group_vars(td >> ungroup()) == []

    def test_n_groups_and_keys(self, spark):
        td = tibble(spark, g=["b", "a", "b"]) >> group_by(f.g)
        assert n_groups(td) == 2
        keys = group_keys(td).collect()
        assert keys["g"].tolist() == ["a", "b"]

    def test_group_by_expression_creates_column(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4])
        out = td >> group_by(big=f.x > 2) >> summarise(c=n()) >> arrange(f.big)
        assert _col(out, "c") == [2, 2]

    def test_rowwise_mean(self, spark):
        from datar_polars_spark.functions import c_across

        td = tibble(spark, a=[1.0, 3.0], b=[3.0, 5.0])
        out = td >> rowwise() >> mutate(m=mean(c_across([f.a, f.b])))
        assert _col(out, "m") == [2.0, 4.0]

    def test_filter_keeps_empty_group_semantics(self, spark):
        # filtering away a whole group: summarise only emits remaining
        td = tibble(spark, g=["a", "b"], x=[1, 10]) >> group_by(f.g)
        out = td >> filter_(f.x > 5) >> summarise(c=n())
        assert out.nrow() == 1


# ---------------------------------------------------------------------------
# tidyr corners
# ---------------------------------------------------------------------------

class TestTidyr:
    def test_pivot_longer_basic(self, spark):
        td = tibble(spark, id=[1, 2], a=[1.0, 2.0], b=[3.0, 4.0])
        out = td >> pivot_longer([f.a, f.b], names_to="k", values_to="v")
        assert out.nrow() == 4
        got = out.collect().sort_values(["id", "k"])
        assert got["v"].tolist() == [1.0, 3.0, 2.0, 4.0]

    def test_pivot_longer_interleaves_row_major(self, spark):
        td = tibble(spark, a=[1], b=[2])
        out = (td >> pivot_longer([f.a, f.b])).collect()
        assert out["name"].tolist() == ["a", "b"]

    def test_pivot_wider_roundtrip(self, spark):
        td = tibble(spark, id=[1, 1, 2, 2], k=["a", "b", "a", "b"], v=[1, 2, 3, 4])
        wide = td >> pivot_wider(names_from=f.k, values_from=f.v)
        assert set(wide.columns) == {"id", "a", "b"}
        assert _col(wide >> arrange(f.id), "a") == [1, 3]

    def test_pivot_wider_values_fill(self, spark):
        td = tibble(spark, id=[1, 2], k=["a", "b"], v=[1, 2])
        wide = td >> pivot_wider(names_from=f.k, values_from=f.v, values_fill=0)
        got = wide.collect().sort_values("id")
        assert got["b"].tolist() == [0, 2]

    def test_separate_too_few_pieces_pads_na(self, spark):
        td = tibble(spark, s=["a-b", "c"])
        out = (td >> separate(f.s, [f.x, f.y], sep="-")).collect()
        assert_iterable_equal(out["y"].tolist(), ["b", None])

    def test_separate_drop_piece_with_none(self, spark):
        td = tibble(spark, s=["a-b"])
        out = td >> separate(f.s, [None, f.y], sep="-")
        assert out.columns == ["y"]
        assert _col(out, "y") == ["b"]

    def test_unite_na_rm(self, spark):
        td = tibble(spark, a=["x", None], b=["y", "z"])
        out = (td >> unite("u", f.a, f.b, sep="_", na_rm=True)).collect()
        assert out["u"].tolist() == ["x_y", "z"]

    def test_extract_regex_groups(self, spark):
        td = tibble(spark, s=["a1", "b2"])
        out = (td >> extract(f.s, [f.l, f.d], r"([a-z])(\d)")).collect()
        assert out["l"].tolist() == ["a", "b"]
        assert out["d"].tolist() == ["1", "2"]

    def test_separate_rows_convert(self, spark):
        td = tibble(spark, x=["1,2", "3"])
        out = td >> separate_rows(f.x, sep=",", convert=True)
        assert _col(out, "x") == [1, 2, 3]

    def test_uncount_zero_drops_row(self, spark):
        td = tibble(spark, x=["a", "b"], w=[2, 0])
        out = td >> uncount(f.w)
        assert _col(out, "x") == ["a", "a"]

    def test_drop_na_subset(self, spark):
        td = tibble(spark, a=[1.0, None, 3.0], b=[None, 2.0, 3.0])
        assert (td >> drop_na()).nrow() == 1
        assert (td >> drop_na(f.a)).nrow() == 2

    def test_replace_na_dict(self, spark):
        td = tibble(spark, a=[1.0, None], b=[None, "x"])
        out = (td >> replace_na({"a": 0.0, "b": "?"})).collect()
        assert out["a"].tolist() == [1.0, 0.0]
        assert out["b"].tolist() == ["?", "x"]

    def test_fill_down_then_up(self, spark):
        td = tibble(spark, x=[None, 1.0, None, 2.0, None])
        down = (td >> fill(f.x, _direction="down")).collect()
        assert_iterable_equal(down["x"].tolist(), [None, 1.0, 1.0, 2.0, 2.0])
        up = (td >> fill(f.x, _direction="up")).collect()
        assert_iterable_equal(up["x"].tolist(), [1.0, 1.0, 2.0, 2.0, None])

    def test_fill_grouped_does_not_leak(self, spark):
        td = tibble(spark, g=["a", "a", "b"], x=[1.0, None, None])
        out = (td >> group_by(f.g) >> fill(f.x, _direction="down")).collect()
        by_g = out.sort_values("g")["x"].tolist()
        assert by_g[0] == 1.0 and by_g[1] == 1.0
        assert str(by_g[2]) in ("nan", "None")

    def test_nest_unnest_identity(self, spark):
        td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3])
        nested = td >> nest(data=[f.x])
        assert nested.nrow() == 2
        back = nested >> unnest(f.data) >> arrange(f.x)
        assert _col(back, "x") == [1, 2, 3]

    def test_chop_unchop(self, spark):
        td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3])
        chopped = td >> chop(f.x)
        assert chopped.nrow() == 2
        back = chopped >> unchop(f.x) >> arrange(f.x)
        assert _col(back, "x") == [1, 2, 3]

    def test_pack_unpack(self, spark):
        td = tibble(spark, a=[1], b=[2], c=[3])
        packed = td >> pack(grp=[f.a, f.b])
        assert set(packed.columns) == {"c", "grp"}
        back = packed >> unpack(f.grp)
        assert set(back.columns) == {"a", "b", "c"}

    def test_expand_grid(self, spark):
        out = expand_grid(spark, x=[1, 2], y=["a", "b"])
        assert out.nrow() == 4
        got = out.collect()
        assert got["x"].tolist() == [1, 1, 2, 2]
        assert got["y"].tolist() == ["a", "b", "a", "b"]

    def test_complete_fills_missing_combo(self, spark):
        td = tibble(spark, g=["a", "b"], k=[1, 2], v=[10, 20])
        out = td >> complete(f.g, f.k, fill={"v": 0}) >> arrange(f.g, f.k)
        assert out.nrow() == 4
        assert _col(out, "v") == [10, 0, 0, 20]

    def test_full_seq(self, spark):
        out = full_seq(spark, 1, 4, by=1)
        assert _col(out, "x") == [1, 2, 3, 4]


# ---------------------------------------------------------------------------
# forcats corners
# ---------------------------------------------------------------------------

class TestForcats:
    def test_factor_unknown_level_becomes_na(self, spark):
        td = tibble(spark, s=["a", "b", "z"]) >> factor_(f.s, levels=["a", "b"])
        out = td.collect()
        assert_iterable_equal(out["s"].tolist(), ["a", "b", None])

    def test_levels_and_nlevels(self, spark):
        td = tibble(spark, s=["b", "a"]) >> factor_(f.s)
        assert levels_(td, f.s) == ["a", "b"]
        assert nlevels(td, f.s) == 2
        assert is_factor(td, f.s)

    def test_droplevels(self, spark):
        td = tibble(spark, s=["a"]) >> factor_(f.s, levels=["a", "b", "c"])
        assert levels_(droplevels(td, f.s), f.s) == ["a"]

    def test_fct_relevel_after(self, spark):
        td = tibble(spark, s=["a", "b", "c"]) >> factor_(f.s)
        out = td >> fct_relevel(f.s, "c")
        assert levels_(out, f.s) == ["c", "a", "b"]
        out2 = td >> fct_relevel(f.s, "a", after=2)
        assert levels_(out2, f.s) == ["b", "c", "a"]

    def test_fct_inorder(self, spark):
        td = tibble(spark, s=["b", "c", "a", "c"]) >> factor_(f.s)
        out = td >> fct_inorder(f.s)
        assert levels_(out, f.s) == ["b", "c", "a"]

    def test_fct_infreq_tiebreak_alpha(self, spark):
        td = tibble(spark, s=["b", "b", "a", "c"]) >> factor_(f.s)
        out = td >> fct_infreq(f.s)
        assert levels_(out, f.s) == ["b", "a", "c"]

    def test_fct_rev(self, spark):
        td = tibble(spark, s=["a", "b"]) >> factor_(f.s)
        assert levels_(td >> fct_rev(f.s), f.s) == ["b", "a"]

    def test_fct_recode_values_and_levels(self, spark):
        td = tibble(spark, s=["a", "b"]) >> factor_(f.s)
        out = td >> fct_recode(f.s, apple="a")
        assert levels_(out, f.s) == ["apple", "b"]
        assert _col(out, "s") == ["apple", "b"]

    def test_fct_collapse_other(self, spark):
        td = tibble(spark, s=["a", "b", "c", "d"]) >> factor_(f.s)
        out = td >> fct_collapse(f.s, ab=["a", "b"], other_level="rest")
        assert _col(out, "s") == ["ab", "ab", "rest", "rest"]

    def test_fct_lump_min(self, spark):
        td = tibble(spark, s=["a"] * 3 + ["b"] * 2 + ["c"]) >> factor_(f.s)
        out = td >> fct_lump_min(f.s, 2)
        assert set(_col(out, "s")) == {"a", "b", "Other"}

    def test_fct_lump_prop(self, spark):
        td = tibble(spark, s=["a"] * 8 + ["b", "c"]) >> factor_(f.s)
        out = td >> fct_lump_prop(f.s, 0.5)
        assert set(_col(out, "s")) == {"a", "Other"}

    def test_fct_other_keep(self, spark):
        td = tibble(spark, s=["a", "b", "c"]) >> factor_(f.s)
        out = td >> fct_other(f.s, keep=["a"])
        assert _col(out, "s") == ["a", "Other", "Other"]

    def test_fct_count_zero_levels(self, spark):
        td = tibble(spark, s=["a", "a"]) >> factor_(f.s, levels=["a", "b"])
        out = fct_count(td, f.s).collect()
        assert out["f"].tolist() == ["a", "b"]
        assert out["n"].tolist() == [2, 0]

    def test_fct_expand(self, spark):
        td = tibble(spark, s=["a"]) >> factor_(f.s)
        out = td >> fct_expand(f.s, "b", "c")
        assert levels_(out, f.s) == ["a", "b", "c"]

    def test_fct_explicit_na(self, spark):
        td = tibble(spark, s=["a", None]) >> factor_(f.s)
        out = td >> fct_explicit_na(f.s, na_level="(Missing)")
        assert _col(out, "s") == ["a", "(Missing)"]
        assert "(Missing)" in levels_(out, f.s)

    def test_fct_cross(self, spark):
        td = tibble(spark, a=["x", "y"], b=["1", "2"])
        td = td >> factor_(f.a) >> factor_(f.b)
        out = td >> fct_cross(f.a, f.b)
        assert _col(out, "fct_cross") == ["x:1", "y:2"]

    def test_cut_labels_and_na_outside(self, spark):
        td = tibble(spark, x=[5.0, 15.0, 50.0])
        out = td >> cut_(f.x, "b", [0, 10, 20], labels=["lo", "hi"])
        got = out.collect()
        assert_iterable_equal(got["b"].tolist(), ["lo", "hi", None])
