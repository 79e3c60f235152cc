"""Special mathematical functions (gamma family, beta, choose, bessel).

Reference: ``api/base/special.py:84-286`` and ``bessel.py:68-146``
(scipy-backed via per-element map in the reference). Here: the gamma/
beta/choose family compiles to Arrow-batched pandas UDFs over python
``math`` (always available); digamma/trigamma/bessel need scipy and are
gated behind an import-try — calling them without scipy raises
NotImplementedError at plan-build time, not mid-job.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .registry import register

try:  # optional dependency — container may not ship scipy
    import scipy.special as _sps
except Exception:  # pragma: no cover
    _sps = None


def _vec_udf(fn):
    """Arrow-batched pandas UDF applying a float->float python fn."""

    @F.pandas_udf(DoubleType())
    def udf(s: pd.Series) -> pd.Series:
        def safe(v):
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return None
            try:
                return float(fn(float(v)))
            except (ValueError, OverflowError):
                return float("nan")

        return s.map(safe)

    return udf


_GAMMA = _vec_udf(math.gamma)
_LGAMMA = _vec_udf(math.lgamma)


@register("gamma")
def _gamma(ctx, x):
    return _GAMMA(ctx.col(x))


@register("lgamma")
def _lgamma(ctx, x):
    return _LGAMMA(ctx.col(x))


@register("lfactorial")
def _lfactorial(ctx, x):
    return _LGAMMA(ctx.col(x) + 1)


@register("beta")
def _beta(ctx, a, b):
    ca, cb = ctx.col(a), ctx.col(b)
    return F.exp(_LGAMMA(ca) + _LGAMMA(cb) - _LGAMMA(ca + cb))


@register("lbeta")
def _lbeta(ctx, a, b):
    ca, cb = ctx.col(a), ctx.col(b)
    return _LGAMMA(ca) + _LGAMMA(cb) - _LGAMMA(ca + cb)


@register("choose")
def _choose(ctx, n, k):
    cn, ck = ctx.col(n), ctx.col(k)
    return F.round(F.exp(_LGAMMA(cn + 1) - _LGAMMA(ck + 1) - _LGAMMA(cn - ck + 1)))


@register("lchoose")
def _lchoose(ctx, n, k):
    cn, ck = ctx.col(n), ctx.col(k)
    return _LGAMMA(cn + 1) - _LGAMMA(ck + 1) - _LGAMMA(cn - ck + 1)


def _scipy_fn(name):
    def impl(ctx, x, *args):
        if _sps is None:
            raise NotImplementedError(
                f"{name} requires scipy, which is not installed"
            )
        fn = getattr(_sps, name)
        if args:
            nu = ctx.eval(args[0])
            if isinstance(nu, Column):
                # per-row order column: two-series Arrow UDF
                @F.pandas_udf(DoubleType())
                def udf2(sn: pd.Series, sx: pd.Series) -> pd.Series:
                    return pd.Series(
                        [None if (a is None or b is None) else float(fn(a, b))
                         for a, b in zip(sn, sx)]
                    )

                return udf2(nu, ctx.col(x))
            return _vec_udf(lambda v: fn(nu, v))(ctx.col(x))
        return _vec_udf(fn)(ctx.col(x))

    return impl


register("digamma")(_scipy_fn("digamma"))


@register("trigamma")
def _trigamma(ctx, x):
    if _sps is None:
        raise NotImplementedError("trigamma requires scipy, which is not installed")
    return _vec_udf(lambda v: float(_sps.polygamma(1, v)))(ctx.col(x))


@register("psigamma")
def _psigamma(ctx, x, deriv: int = 0):
    """n-th derivative of digamma (reference api/base/special.py:203)."""
    if _sps is None:
        raise NotImplementedError("psigamma requires scipy, which is not installed")
    d = int(ctx.eval(deriv))
    return _vec_udf(lambda v: float(_sps.polygamma(d, v)))(ctx.col(x))



register("bessel_i")(_scipy_fn("iv"))
register("bessel_j")(_scipy_fn("jv"))
register("bessel_k")(_scipy_fn("kv"))
register("bessel_y")(_scipy_fn("yv"))
