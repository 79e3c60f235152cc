"""Factor / forcats behavior (reference tests/base/test_factor.py,
tests/forcats/)."""

import pytest

from datar_polars_spark import f, tibble, arrange, desc
from datar_polars_spark.operators.factor import (
    factor_,
    levels_,
    droplevels,
    fct_relevel,
    fct_inorder,
    fct_infreq,
    fct_rev,
    fct_reorder,
    fct_recode,
    fct_collapse,
    fct_lump_n,
    fct_lump_min,
    fct_other,
    fct_anon,
    fct_expand,
    fct_explicit_na,
    fct_cross,
    fct_count,
    cut_,
)

from conftest import assert_iterable_equal


@pytest.fixture()
def td(spark):
    return tibble(
        spark,
        g=["b", "a", "c", "a", "b", "a", None],
        v=[1.0, 5.0, 3.0, 6.0, 2.0, 4.0, 0.0],
    )


def test_factor_levels(td):
    ft = td >> factor_(f.g, levels=["c", "b", "a"])
    assert levels_(ft, f.g) == ["c", "b", "a"]
    # out-of-level values become NA
    ft2 = td >> factor_(f.g, levels=["a", "b"])
    pdf = ft2.collect()
    assert_iterable_equal(
        pdf["g"].tolist(), ["b", "a", None, "a", "b", "a", None]
    )


def test_arrange_by_level_order(td):
    ft = td >> factor_(f.g, levels=["c", "b", "a"])
    out = (ft >> arrange(f.g)).collect()
    assert out["g"].tolist()[:6].count("c") == 1
    assert out["g"].tolist()[0] == "c"
    assert out["g"].tolist()[1] == "b"
    out_desc = (ft >> arrange(desc(f.g))).collect()
    assert out_desc["g"].tolist()[0] == "a"


def test_droplevels(td):
    ft = td >> factor_(f.g, levels=["a", "b", "c", "zz"])
    assert levels_(droplevels(ft, f.g), f.g) == ["a", "b", "c"]


def test_fct_relevel(td):
    ft = td >> factor_(f.g) >> fct_relevel(f.g, "c")
    assert levels_(ft, f.g) == ["c", "a", "b"]


def test_fct_inorder(td):
    ft = td >> factor_(f.g) >> fct_inorder(f.g)
    assert levels_(ft, f.g) == ["b", "a", "c"]


def test_fct_infreq(td):
    ft = td >> factor_(f.g) >> fct_infreq(f.g)
    assert levels_(ft, f.g) == ["a", "b", "c"]


def test_fct_rev(td):
    ft = td >> factor_(f.g) >> fct_rev(f.g)
    assert levels_(ft, f.g) == ["c", "b", "a"]


def test_fct_reorder(td):
    # medians: a -> 5, b -> 1.5, c -> 3
    ft = td >> factor_(f.g) >> fct_reorder(f.g, f.v, fn="median")
    assert levels_(ft, f.g) == ["b", "c", "a"]


def test_fct_recode(td):
    ft = td >> factor_(f.g) >> fct_recode(f.g, alpha="a")
    assert levels_(ft, f.g) == ["alpha", "b", "c"]
    assert "alpha" in ft.collect()["g"].tolist()


def test_fct_collapse(td):
    ft = td >> factor_(f.g) >> fct_collapse(f.g, ab=["a", "b"])
    assert levels_(ft, f.g) == ["ab", "c"]
    vals = ft.collect()["g"].tolist()
    assert vals.count("ab") == 5


def test_fct_lump(td):
    ft = td >> factor_(f.g) >> fct_lump_n(f.g, 1)
    assert levels_(ft, f.g) == ["a", "Other"]
    vals = ft.collect()["g"].tolist()
    assert vals.count("Other") == 3
    ft = td >> factor_(f.g) >> fct_lump_min(f.g, 3)
    assert levels_(ft, f.g) == ["a", "Other"]


def test_fct_other(td):
    ft = td >> factor_(f.g) >> fct_other(f.g, keep=["a"])
    vals = ft.collect()["g"].tolist()
    assert set(v for v in vals if v is not None) == {"a", "Other"}


def test_fct_anon(td):
    ft = td >> factor_(f.g) >> fct_anon(f.g, prefix="x")
    assert levels_(ft, f.g) == ["x1", "x2", "x3"]


def test_fct_expand_explicit_na(td):
    ft = td >> factor_(f.g) >> fct_expand(f.g, "zz")
    assert levels_(ft, f.g) == ["a", "b", "c", "zz"]
    ft = td >> factor_(f.g) >> fct_explicit_na(f.g)
    vals = ft.collect()["g"].tolist()
    assert "(Missing)" in vals


def test_fct_cross(spark):
    td = tibble(spark, a=["x", "y"], b=["1", "2"])
    ft = td >> factor_(f.a) >> factor_(f.b) >> fct_cross(f.a, f.b, keep_empty=True)
    assert levels_(ft, "fct_cross") == ["x:1", "y:1", "x:2", "y:2"]
    assert ft.collect()["fct_cross"].tolist() == ["x:1", "y:2"]
    # default keeps only observed combinations (reference forcats.py:1266)
    ft2 = td >> factor_(f.a) >> factor_(f.b) >> fct_cross(f.a, f.b)
    assert levels_(ft2, "fct_cross") == ["x:1", "y:2"]


def test_fct_count(td):
    ft = td >> factor_(f.g, levels=["a", "b", "c", "zz"])
    out = fct_count(ft, f.g).df.collect()
    d = {r["f"]: r["n"] for r in out}
    assert d["a"] == 3 and d["zz"] == 0


def test_cut(spark):
    td = tibble(spark, x=[1.0, 4.0, 6.0, 9.0])
    out = td >> cut_(f.x, "bin", breaks=[0, 5, 10], labels=["lo", "hi"])
    assert out.collect()["bin"].tolist() == ["lo", "lo", "hi", "hi"]
    assert levels_(out, "bin") == ["lo", "hi"]
    out2 = td >> cut_(f.x, "bin", breaks=2)
    assert len(set(out2.collect()["bin"].tolist())) == 2
