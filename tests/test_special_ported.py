"""Ported from reference tests/base/test_special.py and
tests/base/test_bessel.py — eager scalar and list dispatch. The
digamma and bessel families run on scipy when present, else the
mpmath fallback (special.py backend chain).
"""

import pytest

from datar_polars_spark import f, mutate, tibble
from datar_polars_spark.functions import (
    beta,
    choose,
    factorial,
    gamma,
    lbeta,
    lchoose,
    lfactorial,
    lgamma,
)


def test_beta():
    assert beta(1, 2) == pytest.approx(0.5)
    got = beta([1, 2], [2, 3])
    assert got[0] == pytest.approx(0.5)
    assert got[1] == pytest.approx(1 / 12)


def test_lbeta():
    import math

    assert lbeta(1, 2) == pytest.approx(math.log(0.5))


def test_gamma_lgamma():
    assert gamma(1) == 1
    assert gamma([1, 2]) == [1, 1]
    assert lgamma(1) == pytest.approx(0)
    assert lgamma([1, 2]) == pytest.approx([0, 0])


def test_choose_lchoose():
    assert choose(2, 1) == 2
    assert choose([2, 4], [1, 2]) == [2.0, 6.0]
    import math

    assert lchoose(4, 2) == pytest.approx(math.log(6))


def test_factorial():
    assert factorial(1) == 1
    assert factorial([1, 4]) == [1.0, 24.0]
    assert lfactorial(3) == pytest.approx(__import__("math").log(6))


def test_gamma_in_mutate(spark):
    td = tibble(spark, x=[1.0, 2.0, 3.0])
    out = (td >> mutate(g=gamma(f.x), lf=lfactorial(f.x - 1))).collect()
    assert out["g"].tolist() == pytest.approx([1.0, 1.0, 2.0])
    assert out["lf"].tolist() == pytest.approx([0.0, 0.0, 0.6931], rel=1e-3)


def test_digamma_family():
    from datar_polars_spark.functions import digamma, trigamma, psigamma

    assert digamma(1) == pytest.approx(-0.5772156649015329)
    assert trigamma(1) == pytest.approx(1.6449340668482264)
    assert psigamma(1, 2) == pytest.approx(-2.404113806319188)


@pytest.mark.parametrize(
    "kind, x, nu, scaled, expected",
    [
        # values from reference tests/base/test_bessel.py (R besselI etc.)
        ("i", 1, 0, False, 1.2660658777520082),
        ("i", 2, 0, False, 2.279585302336067),
        ("i", 1, 1, False, 0.5651591039924851),
        ("i", 1, 0, True, 0.46575960759364043),
        ("i", 1, 0.5, False, 0.937674888245489),
        ("j", 1, 0, False, 0.7651976865579666),
        ("j", 1, 1, False, 0.44005058574493355),
        ("k", 1, 0, False, 0.42102443824070834),
        ("k", 1, 0, True, 1.1444630798068947),
        ("k", 1, 1, False, 0.6019072301972346),
        ("y", 1, 0, False, 0.08825696421567696),
        ("y", 1, 1, False, -0.7812128213002887),
    ],
)
def test_bessel_scalars(kind, x, nu, scaled, expected):
    from datar_polars_spark.functions import bessel_i, bessel_j, bessel_k, bessel_y

    fn = {"i": bessel_i, "j": bessel_j, "k": bessel_k, "y": bessel_y}[kind]
    if kind in ("i", "k"):
        assert fn(x, nu, scaled) == pytest.approx(expected, rel=1e-12)
    else:
        assert fn(x, nu) == pytest.approx(expected, rel=1e-12)


def test_bessel_list_dispatch():
    from datar_polars_spark.functions import bessel_i

    got = bessel_i([1, 2], 0)
    assert got == pytest.approx([1.2660658777520082, 2.279585302336067])


def test_bessel_j_no_scaled_variant():
    from datar_polars_spark.functions import bessel_j

    with pytest.raises(ValueError, match="expon_scaled"):
        bessel_j(1, 0, True)


def test_bessel_digamma_in_mutate(spark):
    from datar_polars_spark.functions import bessel_i, digamma

    td = tibble(spark, x=[1.0, 2.0, None])
    out = (td >> mutate(b=bessel_i(f.x, 0), d=digamma(f.x))).collect()
    assert out["b"].tolist()[:2] == pytest.approx(
        [1.2660658777520082, 2.279585302336067]
    )
    assert out["d"].tolist()[:2] == pytest.approx(
        [-0.5772156649015329, 0.42278433509846713]
    )
    assert out["b"].isna().tolist()[2] and out["d"].isna().tolist()[2]
