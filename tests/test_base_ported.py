"""base-function semantics corners — ported from the reference's
tests/base suites (test_cum.py, test_rank.py, test_which.py,
test_arithm.py, test_trig.py, test_string.py, test_seq.py,
test_table.py).
"""

from __future__ import annotations

import math

import pytest

from conftest import assert_iterable_equal

from datar_polars_spark import (
    f,
    tibble,
    mutate,
    filter_,
    group_by,
    summarise,
    arrange,
    which_,
    which_min_,
    which_max_,
    table_,
    tabulate,
    desc,
)
from datar_polars_spark.functions import (
    cumsum,
    cummax,
    cummin,
    cumprod,
    cumall,
    cumany,
    cummean,
    row_number,
    min_rank,
    dense_rank,
    percent_rank,
    cume_dist,
    ntile,
    lead,
    lag,
    abs_,
    sqrt,
    exp,
    log,
    log2,
    log10,
    floor,
    ceiling,
    round_,
    trunc,
    sign,
    signif,
    pmin,
    pmax,
    sin,
    cos,
    tan,
    atan2,
    toupper,
    tolower,
    nchar,
    substr,
    paste,
    paste0,
    gsub,
    sub,
    sprintf,
    trimws,
    strsplit,
    startswith,
    endswith,
    grepl,
    mean,
    n,
    seq,
    rep,
)


def _col(td, name):
    return td.collect()[name].tolist()


# ---------------------------------------------------------------------------
# cumulative functions (reference tests/base/test_cum.py)
# ---------------------------------------------------------------------------

class TestCumulative:
    def test_cumsum_in_mutate(self, spark):
        td = tibble(spark, x=[1.0, 2.0, 3.0])
        assert _col(td >> mutate(cs=cumsum(f.x)), "cs") == [1.0, 3.0, 6.0]

    def test_cummax_in_mutate(self, spark):
        td = tibble(spark, x=[1.0, 3.0, 2.0, 5.0])
        assert _col(td >> mutate(cm=cummax(f.x)), "cm") == [1.0, 3.0, 3.0, 5.0]

    def test_cummin_in_mutate(self, spark):
        td = tibble(spark, x=[3.0, 1.0, 2.0])
        assert _col(td >> mutate(cm=cummin(f.x)), "cm") == [3.0, 1.0, 1.0]

    def test_cumprod_in_mutate(self, spark):
        td = tibble(spark, x=[1.0, 2.0, 3.0, 4.0])
        assert _col(td >> mutate(cp=cumprod(f.x)), "cp") == [1.0, 2.0, 6.0, 24.0]

    def test_cummean(self, spark):
        td = tibble(spark, x=[2.0, 4.0, 6.0])
        assert _col(td >> mutate(cm=cummean(f.x)), "cm") == [2.0, 3.0, 4.0]

    def test_cumall_cumany(self, spark):
        td = tibble(spark, x=[True, True, False, True])
        out = (td >> mutate(a=cumall(f.x), o=cumany(~f.x))).collect()
        assert out["a"].tolist() == [True, True, False, False]
        assert out["o"].tolist() == [False, False, True, True]

    def test_cumsum_grouped(self, spark):
        td = tibble(spark, g=["a", "b", "a", "b"], x=[1.0, 10.0, 2.0, 20.0])
        out = (td >> group_by(f.g) >> mutate(cs=cumsum(f.x))).collect()
        assert out["cs"].tolist() == [1.0, 10.0, 3.0, 30.0]

    def test_cumsum_preserves_frame_order_after_arrange(self, spark):
        td = tibble(spark, x=[3.0, 1.0, 2.0])
        out = td >> arrange(f.x) >> mutate(cs=cumsum(f.x))
        assert _col(out, "cs") == [1.0, 3.0, 6.0]


# ---------------------------------------------------------------------------
# window ranks (reference tests/base/test_rank.py)
# ---------------------------------------------------------------------------

class TestRankWindows:
    def test_row_number_after_arrange(self, spark):
        td = tibble(spark, x=[30, 10, 20])
        out = td >> arrange(f.x) >> mutate(rn=row_number())
        assert _col(out, "rn") == [1, 2, 3]
        assert _col(out, "x") == [10, 20, 30]

    def test_percent_rank(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4, 5])
        out = (td >> mutate(p=percent_rank(f.x))).collect()
        assert out["p"].tolist() == [0.0, 0.25, 0.5, 0.75, 1.0]

    def test_cume_dist(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4])
        out = (td >> mutate(c=cume_dist(f.x))).collect()
        assert out["c"].tolist() == [0.25, 0.5, 0.75, 1.0]

    def test_ntile(self, spark):
        td = tibble(spark, x=[1, 2, 3, 4, 5, 6])
        out = (td >> mutate(b=ntile(f.x, 3))).collect()
        assert out["b"].tolist() == [1, 1, 2, 2, 3, 3]

    def test_lead_with_default(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = (td >> mutate(ld=lead(f.x, default=-1))).collect()
        assert out["ld"].tolist() == [2, 3, -1]

    def test_rank_desc(self, spark):
        td = tibble(spark, x=[10, 30, 20])
        out = (td >> mutate(r=min_rank(desc(f.x)))).collect()
        assert out["r"].tolist() == [3, 1, 2]


# ---------------------------------------------------------------------------
# which family (reference tests/base/test_which.py)
# ---------------------------------------------------------------------------

class TestWhich:
    def test_which(self, spark):
        td = tibble(spark, x=[False, True, False, True])
        assert which_(td, f.x) == [2, 4]

    def test_which_empty(self, spark):
        td = tibble(spark, x=[False, False])
        assert which_(td, f.x) == []

    def test_which_min_max(self, spark):
        td = tibble(spark, x=[3.0, 1.0, 2.0, 1.0])
        assert which_min_(td, f.x) == 2  # first minimum, 1-based
        assert which_max_(td, f.x) == 1

    def test_which_predicate_expression(self, spark):
        td = tibble(spark, x=[5, 15, 25])
        assert which_(td, f.x > 10) == [2, 3]


# ---------------------------------------------------------------------------
# arithmetic / math (reference tests/base/test_arithm.py, test_trig.py)
# ---------------------------------------------------------------------------

class TestMath:
    def test_abs_sqrt_exp_log(self, spark):
        td = tibble(spark, x=[-4.0])
        out = (
            td
            >> mutate(
                a=abs_(f.x),
                s=sqrt(abs_(f.x)),
                e=round_(exp(0.0) + 0 * f.x, 4),
                l=round_(log(abs_(f.x) * 0 + math.e), 4),
            )
        ).collect()
        row = out.iloc[0]
        assert row["a"] == 4.0 and row["s"] == 2.0
        assert row["e"] == 1.0 and row["l"] == 1.0

    def test_log_bases(self, spark):
        td = tibble(spark, x=[8.0, 100.0])
        out = (td >> mutate(l2=log2(f.x), l10=log10(f.x))).collect()
        assert out["l2"].tolist()[0] == 3.0
        assert out["l10"].tolist()[1] == 2.0

    def test_log_custom_base(self, spark):
        td = tibble(spark, x=[9.0])
        out = (td >> mutate(l=round_(log(f.x, base=3.0), 4))).collect()
        assert out["l"].tolist() == [2.0]

    def test_floor_ceiling_trunc_round(self, spark):
        td = tibble(spark, x=[1.7, -1.7])
        out = (
            td >> mutate(fl=floor(f.x), ce=ceiling(f.x), tr=trunc(f.x), ro=round_(f.x))
        ).collect()
        assert out["fl"].tolist() == [1.0, -2.0]
        assert out["ce"].tolist() == [2.0, -1.0]
        assert out["tr"].tolist() == [1.0, -1.0]
        assert out["ro"].tolist() == [2.0, -2.0]

    def test_sign(self, spark):
        td = tibble(spark, x=[-5.0, 0.0, 5.0])
        assert _col(td >> mutate(s=sign(f.x)), "s") == [-1.0, 0.0, 1.0]

    def test_signif(self, spark):
        td = tibble(spark, x=[123.456])
        out = (td >> mutate(s=signif(f.x, 4))).collect()
        assert out["s"].tolist() == [123.5]

    def test_pmin_pmax(self, spark):
        td = tibble(spark, a=[1.0, 5.0], b=[3.0, 2.0])
        out = (td >> mutate(lo=pmin(f.a, f.b), hi=pmax(f.a, f.b))).collect()
        assert out["lo"].tolist() == [1.0, 2.0]
        assert out["hi"].tolist() == [3.0, 5.0]

    def test_trig_roundtrip(self, spark):
        td = tibble(spark, x=[0.5])
        out = (
            td
            >> mutate(
                s=round_(sin(f.x) * sin(f.x) + cos(f.x) * cos(f.x), 4),
                t=round_(tan(f.x) - sin(f.x) / cos(f.x), 4),
                a2=round_(atan2(1.0 + 0 * f.x, 1.0 + 0 * f.x), 4),
            )
        ).collect()
        row = out.iloc[0]
        assert row["s"] == 1.0 and row["t"] == 0.0
        assert row["a2"] == round(math.pi / 4, 4)

    def test_integer_division_and_mod(self, spark):
        td = tibble(spark, x=[7, -7])
        out = (td >> mutate(d=f.x // 2, m=f.x % 2)).collect()
        # R semantics: %/% floors, %% has the sign of the divisor —
        # consistent: d*2 + m == x for both rows
        assert out["d"].tolist() == [3, -4]
        assert out["m"].tolist() == [1, 1]
        out2 = (td >> mutate(m=f.x % -2)).collect()
        assert out2["m"].tolist() == [-1, -1]


# ---------------------------------------------------------------------------
# strings (reference tests/base/test_string.py, test_string_ext.py)
# ---------------------------------------------------------------------------

class TestStrings:
    def test_case_functions(self, spark):
        td = tibble(spark, s=["Hello"])
        out = (td >> mutate(u=toupper(f.s), l=tolower(f.s))).collect()
        assert out["u"].tolist() == ["HELLO"]
        assert out["l"].tolist() == ["hello"]

    def test_nchar_substr(self, spark):
        td = tibble(spark, s=["spark"])
        out = (td >> mutate(nc=nchar(f.s), ss=substr(f.s, 2, 4))).collect()
        assert out["nc"].tolist() == [5]
        assert out["ss"].tolist() == ["ar"]

    def test_paste_sep_collapse_free(self, spark):
        td = tibble(spark, a=["x"], b=["y"])
        out = (td >> mutate(p=paste(f.a, f.b, sep="-"), p0=paste0(f.a, f.b))).collect()
        assert out["p"].tolist() == ["x-y"]
        assert out["p0"].tolist() == ["xy"]

    def test_gsub_vs_sub(self, spark):
        td = tibble(spark, s=["banana"])
        out = (td >> mutate(g=gsub("a", "o", f.s), s1=sub("a", "o", f.s))).collect()
        assert out["g"].tolist() == ["bonono"]
        assert out["s1"].tolist() == ["bonana"]

    def test_sprintf(self, spark):
        td = tibble(spark, x=[3.14159])
        out = (td >> mutate(s=sprintf("%.2f!", f.x))).collect()
        assert out["s"].tolist() == ["3.14!"]

    def test_trimws(self, spark):
        td = tibble(spark, s=["  pad  "])
        out = (td >> mutate(t=trimws(f.s))).collect()
        assert out["t"].tolist() == ["pad"]

    def test_startswith_endswith_grepl(self, spark):
        td = tibble(spark, s=["spark-graft"])
        out = (
            td
            >> mutate(
                a=startswith(f.s, "spark"),
                b=endswith(f.s, "graft"),
                g=grepl("k-g", f.s),
            )
        ).collect()
        assert out.iloc[0][["a", "b", "g"]].tolist() == [True, True, True]

    def test_strsplit(self, spark):
        td = tibble(spark, s=["a,b,c"])
        out = (td >> mutate(parts=strsplit(f.s, ","))).collect()
        assert out["parts"].tolist()[0] == ["a", "b", "c"]


# ---------------------------------------------------------------------------
# table_/tabulate (reference tests/base/test_table.py)
# ---------------------------------------------------------------------------

class TestTable:
    def test_table_one_var(self, spark):
        td = tibble(spark, x=["a", "b", "a"])
        out = table_(td, f.x).collect()
        assert out["x"].tolist() == ["a", "b"]
        assert out["n"].tolist() == [2, 1]

    def test_table_two_var_includes_zero_combos(self, spark):
        td = tibble(spark, x=["a", "a", "b"], y=["p", "q", "p"])
        out = table_(td, f.x, f.y).collect()
        assert len(out) == 4
        z = out[(out["x"] == "b") & (out["y"] == "q")]["n"].tolist()
        assert z == [0]

    def test_tabulate(self, spark):
        td = tibble(spark, x=[1, 2, 2, 5])
        assert tabulate(td, f.x, nbins=5) == [1, 2, 0, 0, 1]


# ---------------------------------------------------------------------------
# seq / rep list helpers (reference tests/base/test_seq.py)
# ---------------------------------------------------------------------------

class TestSeqRep:
    def test_seq_by_negative(self):
        assert seq(10, 2, by=-2) == [10, 8, 6, 4, 2]

    def test_seq_length_out(self):
        assert seq(1, 2, length_out=3) == [1.0, 1.5, 2.0]

    def test_rep_times_vector(self):
        assert rep([1, 2], times=[2, 3]) == [1, 1, 2, 2, 2]

    def test_rep_each_and_times(self):
        assert rep([1, 2], times=2, each=2) == [1, 1, 2, 2, 1, 1, 2, 2]
