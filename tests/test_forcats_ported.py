"""forcats semantics ported from the reference suite
(reference tests/forcats/test_forcats.py — Series-based there; here the
factor lives as a Tibble column + levels metadata, so each case wraps the
vector in a one-column tibble first).
"""

from __future__ import annotations

import pytest

from datar_polars_spark import f, tibble
from datar_polars_spark.operators.factor import (
    factor_,
    levels_,
    fct_count,
    fct_unique,
    fct_match,
    fct_relevel,
    fct_reorder,
    fct_reorder2,
    fct_rev,
    fct_collapse,
    fct_lump,
    fct_lump_n,
    fct_lump_min,
    fct_lump_prop,
    fct_lump_lowfreq,
    fct_recode,
    fct_relabel,
    fct_drop,
    fct_expand,
    fct_explicit_na,
    fct_inorder,
    fct_infreq,
    fct_inseq,
    fct_anon,
    fct_shift,
    fct_shuffle,
    fct_other,
    fct_cross,
    fct_c,
    fct_unify,
)

from conftest import assert_iterable_equal


def _t(spark, values, name="x"):
    return tibble(spark, **{name: values})


def _col(td, name="x"):
    return td.collect()[name].tolist()


# -- fct_count (reference test_forcats.py:78-106) ---------------------------


class TestFctCount:
    def test_count_basic(self, spark):
        td = _t(spark, ["a", "b", "a", "c", "a"]) >> factor_(f.x)
        out = fct_count(td, f.x).collect()
        assert out.shape == (3, 2)
        assert out["f"].tolist() == ["a", "b", "c"]
        assert out["n"].tolist() == [3, 1, 1]

    def test_count_sorted(self, spark):
        td = _t(spark, ["a", "b", "a", "c", "a"]) >> factor_(f.x)
        out = fct_count(td, f.x, sort=True).collect()
        assert out["n"].tolist() == [3, 1, 1]
        assert out["f"].tolist() == ["a", "b", "c"]

    def test_count_prop(self, spark):
        td = _t(spark, ["a", "b", "a", "c", "a"]) >> factor_(f.x)
        out = fct_count(td, f.x, prop=True).collect()
        assert out.shape == (3, 3)
        assert "p" in out.columns
        assert out["p"].tolist() == pytest.approx([0.6, 0.2, 0.2])

    def test_count_with_nulls(self, spark):
        td = _t(spark, ["a", None, "b", None, "a"]) >> factor_(f.x)
        out = fct_count(td, f.x).collect()
        assert out.shape == (3, 2)
        n_na = out[out["f"].isna()]["n"].iloc[0]
        assert n_na == 2


# -- fct_unique (reference test_forcats.py:112-128) -------------------------


class TestFctUnique:
    def test_unique_basic(self, spark):
        td = _t(spark, ["b", "a", "b", "c", "a"]) >> factor_(f.x) >> fct_inorder(f.x)
        assert fct_unique(td, f.x) == ["b", "a", "c"]

    def test_unique_single(self, spark):
        td = _t(spark, ["a", "a", "a"]) >> factor_(f.x)
        assert fct_unique(td, f.x) == ["a"]

    def test_unique_with_nulls(self, spark):
        td = _t(spark, ["b", None, "a", None, "c"]) >> factor_(f.x) >> fct_inorder(f.x)
        vals = fct_unique(td, f.x)
        assert vals == ["b", "a", "c"]
        assert None not in vals


# -- fct_match (reference test_forcats.py:134-153) --------------------------


class TestFctMatch:
    def test_match_basic(self, spark):
        td = _t(spark, ["a", "b", "c", "d"]) >> factor_(f.x)
        out = fct_match(td, f.x, ["a", "c"]).collect()
        assert out["__fct_match__"].tolist() == [True, False, True, False]

    def test_match_empty(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x)
        out = fct_match(td, f.x, []).collect()
        assert out["__fct_match__"].tolist() == [False, False, False]

    def test_match_unknown_levels(self, spark):
        td = _t(spark, ["a", "b"]) >> factor_(f.x)
        with pytest.raises(ValueError):
            fct_match(td, f.x, ["z"])


# -- fct_relevel (reference test_forcats.py:159-185) ------------------------


class TestFctRelevel:
    def test_relevel_basic(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x) >> fct_relevel(f.x, "c", "a")
        assert levels_(td, f.x) == ["c", "a", "b"]

    def test_relevel_with_after(self, spark):
        td = _t(spark, ["a", "b", "c", "d"]) >> factor_(f.x) >> fct_relevel(f.x, "d", after=2)
        assert levels_(td, f.x) == ["a", "b", "d", "c"]

    def test_relevel_after_end(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x) >> fct_relevel(f.x, "a", after=2)
        assert levels_(td, f.x) == ["b", "c", "a"]

    def test_relevel_unknown_skipped(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x) >> fct_relevel(f.x, "z", "a")
        assert levels_(td, f.x) == ["a", "b", "c"]


# -- fct_reorder / fct_reorder2 (reference test_forcats.py:191-219,652-666) -


class TestFctReorder:
    def test_reorder_basic(self, spark):
        td = tibble(spark, x=["a", "a", "b", "b", "c"], y=[10.0, 20.0, 5.0, 5.0, 30.0])
        out = td >> factor_(f.x) >> fct_reorder(f.x, f.y)
        # by median: b=5, a=15, c=30
        assert levels_(out, f.x) == ["b", "a", "c"]

    def test_reorder_descending(self, spark):
        td = tibble(spark, x=["a", "a", "b", "b", "c"], y=[10.0, 20.0, 5.0, 5.0, 30.0])
        out = td >> factor_(f.x) >> fct_reorder(f.x, f.y, desc=True)
        assert levels_(out, f.x) == ["c", "a", "b"]

    def test_reorder_values_unchanged(self, spark):
        td = tibble(spark, x=["a", "a", "b", "b", "c"], y=[10.0, 20.0, 5.0, 5.0, 30.0])
        out = td >> factor_(f.x) >> fct_reorder(f.x, f.y)
        assert _col(out) == ["a", "a", "b", "b", "c"]

    def test_reorder2_basic(self, spark):
        # last2: y at max x per level; a->20 (x=2), b->40 (x=4); desc => b first
        td = tibble(
            spark,
            x=["a", "a", "b", "b"],
            xv=[1.0, 2.0, 3.0, 4.0],
            yv=[10.0, 20.0, 30.0, 40.0],
        )
        out = td >> factor_(f.x) >> fct_reorder2(f.x, f.xv, f.yv)
        assert levels_(out, f.x) == ["b", "a"]


# -- fct_rev (reference test_forcats.py:225-234) ----------------------------


class TestFctRev:
    def test_rev_basic(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x) >> fct_rev(f.x)
        assert levels_(td, f.x) == ["c", "b", "a"]

    def test_rev_values_unchanged(self, spark):
        td = _t(spark, ["a", "b", "c", "a"]) >> factor_(f.x) >> fct_rev(f.x)
        assert _col(td) == ["a", "b", "c", "a"]


# -- fct_collapse (reference test_forcats.py:240-259) -----------------------


class TestFctCollapse:
    def test_collapse_basic(self, spark):
        td = _t(spark, ["a", "b", "c", "d"]) >> factor_(f.x) >> fct_collapse(f.x, ab=["a", "b"])
        assert levels_(td, f.x) == ["ab", "c", "d"]
        assert _col(td) == ["ab", "ab", "c", "d"]

    def test_collapse_with_other(self, spark):
        td = (
            _t(spark, ["a", "b", "c", "d", "e"])
            >> factor_(f.x)
            >> fct_collapse(f.x, ab=["a", "b"], other_level="Other")
        )
        assert _col(td) == ["ab", "ab", "Other", "Other", "Other"]
        assert levels_(td, f.x)[-1] == "Other"

    def test_collapse_no_mapping(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x) >> fct_collapse(f.x)
        assert set(levels_(td, f.x)) == {"a", "b", "c"}
        assert _col(td) == ["a", "b", "c"]


# -- fct_lump family (reference test_forcats.py:265-302,630-646,698-705) ----


class TestFctLump:
    def test_lump_min_basic(self, spark):
        td = _t(spark, ["a", "a", "a", "b", "c"]) >> factor_(f.x) >> fct_lump_min(f.x, 2)
        assert "Other" in levels_(td, f.x)
        assert _col(td) == ["a", "a", "a", "Other", "Other"]

    def test_lump_min_none_to_lump(self, spark):
        td = _t(spark, ["a", "a", "b", "b", "c", "c"]) >> factor_(f.x) >> fct_lump_min(f.x, 1)
        assert "Other" not in levels_(td, f.x)

    def test_lump_prop_basic(self, spark):
        td = (
            _t(spark, ["a", "a", "a", "a", "a", "b", "c"])
            >> factor_(f.x)
            >> fct_lump_prop(f.x, 0.2)
        )
        assert "Other" in levels_(td, f.x)
        assert _col(td) == ["a", "a", "a", "a", "a", "Other", "Other"]

    def test_lump_prop_single_level_unchanged(self, spark):
        # R forcats: lumping exactly one level is pointless -> unchanged
        td = _t(spark, ["a", "a", "a", "a", "b"]) >> factor_(f.x) >> fct_lump_prop(f.x, 0.3)
        assert "Other" not in levels_(td, f.x)

    def test_lump_prop_nothing_to_lump(self, spark):
        td = _t(spark, ["a", "a", "b", "b"]) >> factor_(f.x) >> fct_lump_prop(f.x, 0.1)
        assert "Other" not in levels_(td, f.x)

    def test_lump_no_args_is_lowfreq(self, spark):
        td = _t(spark, ["a", "a", "a", "b", "c"]) >> factor_(f.x) >> fct_lump(f.x)
        assert "Other" in levels_(td, f.x)

    def test_lump_with_n(self, spark):
        td = (
            _t(spark, ["a", "a", "a", "b", "b", "c", "d"])
            >> factor_(f.x)
            >> fct_lump(f.x, n=2)
        )
        assert levels_(td, f.x) == ["a", "b", "Other"]

    def test_lump_both_n_and_prop(self, spark):
        td = _t(spark, ["a", "b"]) >> factor_(f.x)
        with pytest.raises(ValueError):
            fct_lump(td, f.x, n=1, prop=0.5)

    def test_lump_lowfreq(self, spark):
        # rep(LETTERS[:9], times=c(40,10,5,27,1,1,1,1,1)):
        # keep A(40), D(27); Other = 10+5+1*5 = 20
        times = {"A": 40, "B": 10, "C": 5, "D": 27, "E": 1, "F": 1, "G": 1, "H": 1, "I": 1}
        vals = [l for l, n in times.items() for _ in range(n)]
        td = _t(spark, vals) >> factor_(f.x) >> fct_lump_lowfreq(f.x)
        counts = fct_count(td, f.x).collect()
        got = dict(zip(counts["f"], counts["n"]))
        assert got == {"A": 40, "D": 27, "Other": 20}


# -- fct_recode / fct_relabel (reference test_forcats.py:308-345) -----------


class TestFctRecode:
    def test_recode_basic(self, spark):
        td = _t(spark, ["a", "b", "c", "a"]) >> factor_(f.x) >> fct_recode(f.x, x="a", y="b")
        assert _col(td) == ["x", "y", "c", "x"]
        assert levels_(td, f.x) == ["x", "y", "c"]

    def test_recode_missing_unchanged(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x) >> fct_recode(f.x, x="a")
        assert _col(td) == ["x", "b", "c"]

    def test_recode_unknown(self, spark):
        td = _t(spark, ["a", "b"]) >> factor_(f.x) >> fct_recode(f.x, z="x")
        assert _col(td) == ["a", "b"]

    def test_relabel_basic(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x) >> fct_relabel(f.x, str.upper)
        assert levels_(td, f.x) == ["A", "B", "C"]
        assert _col(td) == ["A", "B", "C"]

    def test_relabel_prefix(self, spark):
        td = (
            _t(spark, ["a", "b", "c"])
            >> factor_(f.x)
            >> fct_relabel(f.x, lambda l: f"level_{l}")
        )
        assert levels_(td, f.x) == ["level_a", "level_b", "level_c"]


# -- fct_drop / fct_expand (reference test_forcats.py:351-380) --------------


class TestFctDropExpand:
    def test_drop_unused(self, spark):
        td = _t(spark, ["a", "b", "a"]) >> factor_(f.x, levels=["a", "b", "c"]) >> fct_drop(f.x)
        assert levels_(td, f.x) == ["a", "b"]

    def test_drop_nothing_to_drop(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x, levels=["a", "b", "c"]) >> fct_drop(f.x)
        assert levels_(td, f.x) == ["a", "b", "c"]

    def test_expand_basic(self, spark):
        td = _t(spark, ["a", "b"]) >> factor_(f.x) >> fct_expand(f.x, "c", "d")
        assert levels_(td, f.x) == ["a", "b", "c", "d"]

    def test_expand_existing(self, spark):
        td = _t(spark, ["a", "b"]) >> factor_(f.x) >> fct_expand(f.x, "a")
        assert levels_(td, f.x) == ["a", "b"]


# -- fct_explicit_na (reference test_forcats.py:386-397) --------------------


class TestFctExplicitNa:
    def test_explicit_na_basic(self, spark):
        td = _t(spark, ["a", None, "b", None]) >> factor_(f.x) >> fct_explicit_na(f.x)
        assert _col(td) == ["a", "(Missing)", "b", "(Missing)"]
        assert "(Missing)" in levels_(td, f.x)

    def test_explicit_na_no_missing(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x) >> fct_explicit_na(f.x)
        assert _col(td) == ["a", "b", "c"]
        assert "(Missing)" not in levels_(td, f.x)


# -- fct_inorder / fct_infreq / fct_inseq (ref :403-423,505-518) ------------


class TestFctOrderings:
    def test_inorder_basic(self, spark):
        td = _t(spark, ["b", "a", "c", "b", "a"]) >> factor_(f.x) >> fct_inorder(f.x)
        assert levels_(td, f.x) == ["b", "a", "c"]

    def test_inorder_preserves_values(self, spark):
        td = _t(spark, ["c", "a", "b"]) >> factor_(f.x) >> fct_inorder(f.x)
        assert _col(td) == ["c", "a", "b"]

    def test_infreq_basic(self, spark):
        td = _t(spark, ["a", "b", "b", "c", "a", "a"]) >> factor_(f.x) >> fct_infreq(f.x)
        assert levels_(td, f.x) == ["a", "b", "c"]

    def test_inseq_numeric(self, spark):
        td = _t(spark, ["10", "2", "1", "20"]) >> factor_(f.x) >> fct_inseq(f.x)
        assert levels_(td, f.x) == ["1", "2", "10", "20"]

    def test_inseq_mixed(self, spark):
        td = _t(spark, ["10", "abc", "2", "xyz"]) >> factor_(f.x) >> fct_inseq(f.x)
        levs = levels_(td, f.x)
        assert levs[0] == "2"
        assert levs[1] == "10"
        assert set(levs[2:]) == {"abc", "xyz"}


# -- fct_c / fct_unify (reference test_forcats.py:429-461,672-692) ----------


class TestFctCUnify:
    def test_c_basic(self, spark):
        a = _t(spark, ["x", "y"]) >> factor_(f.x)
        b = _t(spark, ["z"]) >> factor_(f.x)
        out = fct_c([a, b], f.x)
        assert _col(out) == ["x", "y", "z"]
        assert set(levels_(out, f.x)) == {"x", "y", "z"}

    def test_c_overlapping_levels(self, spark):
        a = _t(spark, ["x", "y"]) >> factor_(f.x)
        b = _t(spark, ["y", "z"]) >> factor_(f.x)
        out = fct_c([a, b], f.x)
        assert _col(out) == ["x", "y", "y", "z"]
        assert set(levels_(out, f.x)) == {"x", "y", "z"}

    def test_unify_basic(self, spark):
        tds = [
            _t(spark, ["a"]) >> factor_(f.x),
            _t(spark, ["b"]) >> factor_(f.x),
            _t(spark, ["a", "b"]) >> factor_(f.x),
        ]
        out = fct_unify(tds, f.x)
        assert _col(out[0]) == ["a"]
        assert _col(out[1]) == ["b"]
        assert _col(out[2]) == ["a", "b"]
        for t in out:
            assert set(levels_(t, f.x)) == {"a", "b"}
        # originals unchanged
        assert levels_(tds[0], f.x) == ["a"]

    def test_unify_empty(self, spark):
        assert fct_unify([], f.x) == []


# -- fct_cross (reference test_forcats.py:467-499) --------------------------


class TestFctCross:
    def test_cross_basic(self, spark):
        td = tibble(spark, a=["x", "y", "z"], b=["1", "2", "3"])
        out = td >> factor_(f.a) >> factor_(f.b) >> fct_cross(f.a, f.b)
        assert _col(out, "fct_cross") == ["x:1", "y:2", "z:3"]
        assert set(levels_(out, "fct_cross")) == {"x:1", "y:2", "z:3"}

    def test_cross_keep_empty(self, spark):
        td = tibble(spark, a=["x", "y"], b=["1", "2"])
        out = td >> factor_(f.a) >> factor_(f.b) >> fct_cross(f.a, f.b, keep_empty=True)
        assert set(levels_(out, "fct_cross")) == {"x:1", "x:2", "y:1", "y:2"}

    def test_cross_custom_sep(self, spark):
        td = tibble(spark, a=["x", "y"], b=["1", "2"])
        out = td >> factor_(f.a) >> factor_(f.b) >> fct_cross(f.a, f.b, sep="-")
        assert _col(out, "fct_cross") == ["x-1", "y-2"]

    def test_cross_with_nulls(self, spark):
        td = tibble(spark, a=["x", None], b=["1", "2"])
        out = td >> fct_cross(f.a, f.b)
        assert_iterable_equal(_col(out, "fct_cross"), ["x:1", None])


# -- fct_anon / fct_shift / fct_shuffle (ref :524-599) ----------------------


class TestFctAnonShiftShuffle:
    def test_anon_basic(self, spark):
        td = _t(spark, ["a", "b", "c", "a"]) >> factor_(f.x) >> fct_anon(f.x, prefix="L")
        levs = levels_(td, f.x)
        assert len(levs) == 3
        assert all(l.startswith("L") for l in levs)

    def test_anon_no_prefix(self, spark):
        td = _t(spark, ["x", "y", "z"]) >> factor_(f.x) >> fct_anon(f.x)
        levs = levels_(td, f.x)
        assert len(levs) == 3
        assert all(l.isdigit() for l in levs)

    def test_shift_positive(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x) >> fct_shift(f.x, n=1)
        assert levels_(td, f.x) == ["b", "c", "a"]

    def test_shift_negative(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x) >> fct_shift(f.x, n=-1)
        assert levels_(td, f.x) == ["c", "a", "b"]

    def test_shift_noop(self, spark):
        td = _t(spark, ["a", "b", "c"]) >> factor_(f.x) >> fct_shift(f.x, n=3)
        assert levels_(td, f.x) == ["a", "b", "c"]

    def test_shuffle_changes_order(self, spark):
        td = _t(spark, [str(i) for i in range(20)]) >> factor_(f.x)
        original = levels_(td, f.x)
        changed = False
        for seed in range(5):
            if levels_(td >> fct_shuffle(f.x, seed=seed), f.x) != original:
                changed = True
                break
        assert changed

    def test_shuffle_preserves_values(self, spark):
        td = _t(spark, ["a", "b", "c", "a"]) >> factor_(f.x) >> fct_shuffle(f.x, seed=7)
        assert sorted(_col(td)) == ["a", "a", "b", "c"]


# -- fct_other (reference test_forcats.py:605-624) --------------------------


class TestFctOther:
    def test_other_keep(self, spark):
        td = _t(spark, ["a", "b", "c", "d"]) >> factor_(f.x) >> fct_other(f.x, keep=["a", "b"])
        assert _col(td) == ["a", "b", "Other", "Other"]

    def test_other_drop(self, spark):
        td = _t(spark, ["a", "b", "c", "d"]) >> factor_(f.x) >> fct_other(f.x, drop=["c", "d"])
        assert _col(td) == ["a", "b", "Other", "Other"]

    def test_other_neither_keep_nor_drop(self, spark):
        td = _t(spark, ["a", "b"]) >> factor_(f.x)
        with pytest.raises(ValueError):
            fct_other(td, f.x)

    def test_other_both_keep_and_drop(self, spark):
        td = _t(spark, ["a", "b"]) >> factor_(f.x)
        with pytest.raises(ValueError):
            fct_other(td, f.x, keep=["a"], drop=["b"])


class TestForcatsRemainingCorners:
    def test_drop_only_specific(self, spark):
        t = tibble(spark, x=["a", "b", "a"]) >> factor_(
            f.x, levels=["a", "b", "c", "d"]
        )
        out = t >> fct_drop(f.x, only=["d"])
        assert out.levels["x"] == ["a", "b", "c"]

    def test_relabel_with_whole_list_fun(self, spark):
        t = tibble(spark, x=["a", "b", "c"]) >> factor_(f.x)
        out = t >> fct_relabel(f.x, lambda levs: [f"level_{i}" for i in range(len(levs))])
        assert out.levels["x"] == ["level_0", "level_1", "level_2"]
        assert sorted(out.collect()["x"]) == ["level_0", "level_1", "level_2"]

    def test_relevel_callable(self, spark):
        t = tibble(spark, x=["a", "b", "c"]) >> factor_(f.x)
        out = t >> fct_relevel(f.x, lambda levs: ["c"])
        assert out.levels["x"] == ["c", "a", "b"]

    def test_match_scalar(self, spark):
        t = tibble(spark, x=["a", "b", "c"]) >> factor_(f.x)
        out = (t >> fct_match(f.x, "b")).collect()
        assert list(out["__fct_match__"]) == [False, True, False]

    def test_lump_no_args_is_lowfreq(self, spark):
        t = tibble(spark, x=["a", "a", "a", "b", "c"]) >> factor_(f.x)
        out = t >> fct_lump(f.x)
        assert "Other" in out.levels["x"]
