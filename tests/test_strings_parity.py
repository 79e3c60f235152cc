"""String / conditional / recode behavior parity (reference
api/base/string.py, api/dplyr/if_else.py, recode.py suites)."""

import pytest

from datar_polars_spark import f, tibble, mutate, filter_
from datar_polars_spark.functions import (
    toupper,
    tolower,
    nchar,
    nzchar,
    paste,
    paste0,
    grepl,
    gsub,
    sub,
    substr,
    sprintf,
    trimws,
    strsplit,
    strtoi,
    chartr,
    startswith,
    endswith,
    if_else,
    case_when,
    case_match,
    na_if,
    coalesce,
    recode,
    between,
    near,
    is_na,
)

from conftest import assert_frame_equal, assert_iterable_equal


def test_case_transforms(spark):
    td = tibble(spark, s=["Ab", "cD"])
    got = (td >> mutate(u=toupper(f.s), l=tolower(f.s))).collect()
    assert got["u"].tolist() == ["AB", "CD"]
    assert got["l"].tolist() == ["ab", "cd"]


def test_nchar_nzchar(spark):
    td = tibble(spark, s=["abc", "", None])
    got = (td >> mutate(n=nchar(f.s), z=nzchar(f.s))).collect()
    assert_iterable_equal(got["n"].tolist(), [3, 0, None])
    assert_iterable_equal(got["z"].tolist(), [True, False, None])


def test_paste_sep_and_collapse(spark):
    td = tibble(spark, a=["x", "y"], b=[1, 2])
    got = (td >> mutate(p=paste(f.a, f.b, sep="-"), p0=paste0(f.a, f.b))).collect()
    assert got["p"].tolist() == ["x-1", "y-2"]
    assert got["p0"].tolist() == ["x1", "y2"]


def test_grepl_fixed_and_ignorecase(spark):
    td = tibble(spark, s=["Apple", "banana", "a.b"])
    got = (
        td >> mutate(
            rx=grepl("^a", f.s),
            rxi=grepl("^a", f.s, ignore_case=True),
            fx=grepl("a.b", f.s, fixed=True),
        )
    ).collect()
    assert got["rx"].tolist() == [False, False, True]
    assert got["rxi"].tolist() == [True, False, True]
    assert got["fx"].tolist() == [False, False, True]


def test_gsub_vs_sub(spark):
    td = tibble(spark, s=["aaa"])
    got = (td >> mutate(g=gsub("a", "b", f.s), s1=sub("a", "b", f.s))).collect()
    assert got["g"].tolist() == ["bbb"]
    assert got["s1"].tolist() == ["baa"]


def test_substr_python_slice_semantics(spark):
    # reference api/base/string.py:497: 0-indexed start, exclusive stop
    td = tibble(spark, s=["abcdef"])
    got = (td >> mutate(x=substr(f.s, 1, 3))).collect()
    assert got["x"].tolist() == ["bc"]


def test_sprintf_and_strtoi(spark):
    td = tibble(spark, n=[3.14159], h=["ff"])
    got = (td >> mutate(s=sprintf("%.2f", f.n), i=strtoi(f.h, base=16))).collect()
    assert got["s"].tolist() == ["3.14"]
    assert got["i"].tolist() == [255]


def test_trimws_sides(spark):
    td = tibble(spark, s=["  x  "])
    got = (
        td >> mutate(b=trimws(f.s), l=trimws(f.s, "left"), r=trimws(f.s, "right"))
    ).collect()
    assert got["b"].tolist() == ["x"]
    assert got["l"].tolist() == ["x  "]
    assert got["r"].tolist() == ["  x"]


def test_strsplit_and_chartr(spark):
    td = tibble(spark, s=["a,b,c"])
    got = (td >> mutate(parts=strsplit(f.s, ","), t=chartr("abc", "xyz", f.s))).collect()
    assert list(got["parts"][0]) == ["a", "b", "c"]
    assert got["t"].tolist() == ["x,y,z"]


def test_startswith_endswith(spark):
    td = tibble(spark, s=["apple", "grape"])
    got = (td >> mutate(a=startswith(f.s, "ap"), e=endswith(f.s, "pe"))).collect()
    assert got["a"].tolist() == [True, False]
    assert got["e"].tolist() == [False, True]


# ---- conditionals ----------------------------------------------------------

def test_if_else_with_missing_arg(spark):
    td = tibble(spark, x=[None, 1.0, 5.0])
    got = (
        td >> mutate(y=if_else(f.x > 3, "hi", "lo", missing="na"))
    ).collect()
    assert got["y"].tolist() == ["na", "lo", "hi"]


def test_case_when_first_match_wins(spark):
    td = tibble(spark, x=[1, 5, 10])
    got = (
        td >> mutate(y=case_when(f.x < 3, "small", f.x < 8, "mid", True, "big"))
    ).collect()
    assert got["y"].tolist() == ["small", "mid", "big"]


def test_case_match_values(spark):
    td = tibble(spark, x=["a", "b", "z"])
    got = (
        td >> mutate(y=case_match(f.x, ["a"], "A", ["b"], "B", _default="?"))
    ).collect()
    assert got["y"].tolist() == ["A", "B", "?"]


def test_recode_with_default_and_missing(spark):
    td = tibble(spark, x=["a", "b", None])
    got = (
        td >> mutate(y=recode(f.x, a="apple", _default="other", _missing="none"))
    ).collect()
    assert got["y"].tolist() == ["apple", "other", "none"]


def test_na_if_coalesce_between_near(spark):
    td = tibble(spark, x=[0.0, 2.0], y=[5.0, None])
    got = (
        td >> mutate(
            nx=na_if(f.x, 0.0),
            c=coalesce(na_if(f.x, 0.0), f.y, -1.0),
            b=between(f.x, 0, 1),
            nr=near(f.x, 2.0 + 1e-12),
        )
    ).collect()
    assert_iterable_equal(got["nx"].tolist(), [None, 2.0])
    assert got["c"].tolist() == [5.0, 2.0]
    assert got["b"].tolist() == [True, False]
    assert got["nr"].tolist() == [False, True]


def test_is_na_counts_nan(spark):
    td = tibble(spark, x=[1.0, None, float("nan")])
    got = (td >> mutate(m=is_na(f.x))).collect()
    assert got["m"].tolist() == [False, True, True]
