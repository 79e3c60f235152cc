"""Math / numeric scalar function parity (reference api/base/arithm.py,
trig.py suites): R values pinned."""

import math

import pytest

from datar_polars_spark import f, tibble, mutate, group_by, summarise
from datar_polars_spark.functions import (
    abs_,
    sqrt,
    exp,
    log,
    log2,
    log10,
    log1p,
    round_,
    ceiling,
    floor,
    trunc,
    sign,
    signif,
    pmin,
    pmax,
    mod,
    scale,
    proportions,
    atan2,
    sin,
    cos,
    as_double,
    as_character,
    as_logical,
    is_finite,
    is_infinite,
    is_element,
    match,
)

from conftest import assert_iterable_equal


def test_log_family_with_base(spark):
    td = tibble(spark, x=[8.0, 100.0])
    got = (
        td >> mutate(l2=log2(f.x), l10=log10(f.x), lb=log(f.x, base=2),
                     ln=log(f.x), l1p=log1p(f.x - 1))
    ).collect()
    assert got["l2"].tolist() == pytest.approx([3.0, math.log2(100)])
    assert got["l10"].tolist() == pytest.approx([math.log10(8), 2.0])
    assert got["lb"].tolist() == pytest.approx([3.0, math.log2(100)])
    assert got["ln"].tolist() == pytest.approx([math.log(8), math.log(100)])
    assert got["l1p"].tolist() == pytest.approx([math.log(8), math.log(100)])


def test_rounding_family(spark):
    td = tibble(spark, x=[2.567, -2.567])
    got = (
        td >> mutate(r=round_(f.x, 1), c=ceiling(f.x), fl=floor(f.x),
                     t=trunc(f.x), s=sign(f.x))
    ).collect()
    assert got["r"].tolist() == pytest.approx([2.6, -2.6])
    assert got["c"].tolist() == [3, -2]
    assert got["fl"].tolist() == [2, -3]
    assert got["t"].tolist() == [2, -2]
    assert got["s"].tolist() == [1.0, -1.0]


def test_signif(spark):
    td = tibble(spark, x=[123456.0, 0.0012345])
    got = (td >> mutate(s3=signif(f.x, 3))).collect()
    assert got["s3"].tolist() == pytest.approx([123000.0, 0.00123])


def test_pmin_pmax_elementwise(spark):
    td = tibble(spark, a=[1.0, 5.0], b=[3.0, 2.0])
    got = (td >> mutate(lo=pmin(f.a, f.b, 2.5), hi=pmax(f.a, f.b))).collect()
    assert got["lo"].tolist() == [1.0, 2.0]
    assert got["hi"].tolist() == [3.0, 5.0]


def test_mod_and_atan2(spark):
    td = tibble(spark, a=[7, -7], b=[3, 3])
    got = (td >> mutate(m=mod(f.a, f.b), t=atan2(as_double(f.a), as_double(f.b)))).collect()
    # R %% follows the sign of the divisor: -7 %% 3 == 2
    assert got["m"].tolist() == [1, 2]
    assert got["t"].tolist() == pytest.approx([math.atan2(7, 3), math.atan2(-7, 3)])


def test_scale_standardizes_per_group(spark):
    td = tibble(spark, g=["a", "a", "b", "b"], x=[1.0, 3.0, 10.0, 30.0])
    got = (td >> group_by(f.g) >> mutate(z=scale(f.x))).collect()
    for gname in ("a", "b"):
        vals = [z for g_, z in zip(got["g"], got["z"]) if g_ == gname]
        assert sum(vals) == pytest.approx(0.0)
        assert max(vals) == pytest.approx(math.sqrt(0.5), rel=1e-6)


def test_proportions_within_group(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1.0, 3.0, 5.0])
    got = (td >> group_by(f.g) >> mutate(p=proportions(f.x))).collect()
    assert got["p"].tolist() == pytest.approx([0.25, 0.75, 1.0])


def test_trig_roundtrip(spark):
    td = tibble(spark, x=[0.5])
    got = (td >> mutate(s=sin(f.x), c=cos(f.x))).collect()
    assert got["s"][0] ** 2 + got["c"][0] ** 2 == pytest.approx(1.0)


def test_casts_and_predicates(spark):
    td = tibble(spark, x=["1", "2"], y=[1.0, float("inf")])
    got = (
        td >> mutate(d=as_double(f.x), s=as_character(f.y),
                     b=as_logical(f.x), fin=is_finite(f.y), inf=is_infinite(f.y))
    ).collect()
    assert got["d"].tolist() == [1.0, 2.0]
    # R as.logical("2") is NA; try_cast gives NA instead of an ANSI error
    assert got["b"].isna().all()
    assert got["fin"].tolist() == [True, False]
    assert got["inf"].tolist() == [False, True]
    # unparseable numeric -> NA, not error
    bad = tibble(spark, z=["abc"]) >> mutate(v=as_double(f.z))
    assert bad.collect()["v"].isna().all()


def test_is_element_and_match(spark):
    td = tibble(spark, x=["b", "z", "a"])
    got = (
        td >> mutate(e=is_element(f.x, ["a", "b"]), m=match(f.x, ["a", "b"]))
    ).collect()
    assert got["e"].tolist() == [True, False, True]
    # match: 1-based index of first occurrence, NA when absent
    assert_iterable_equal(got["m"].tolist(), [2, None, 1])


def test_as_date_formats_and_invalid(spark):
    from datar_polars_spark.functions import as_date
    import datetime

    td = tibble(spark, s=["2024-03-05", "bogus"], us=["03/05/2024", "12/31/2023"])
    got = (td >> mutate(d=as_date(f.s), d2=as_date(f.us, format="%m/%d/%Y"))).collect()
    assert got["d"][0] == datetime.date(2024, 3, 5)
    assert got["d"].isna().tolist() == [False, True]  # unparseable -> NA
    assert got["d2"].tolist() == [datetime.date(2024, 3, 5), datetime.date(2023, 12, 31)]
