"""Math / numeric scalar functions.

Reference surface: ``api/base/arithm.py`` (abs/sqrt/exp/log*/round/
ceiling/floor/sign/signif/trunc/pmin/pmax/mod/scale/proportions),
``api/base/trig.py``. All JVM built-ins; no UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from .registry import register


def _unary(fn):
    def impl(ctx, x):
        return fn(ctx.col(x))

    return impl


register("abs", "abs_")(_unary(F.abs))
register("sqrt")(_unary(F.sqrt))
register("exp")(_unary(F.exp))
register("log2")(_unary(F.log2))
register("log10")(_unary(F.log10))
register("log1p")(_unary(F.log1p))
register("expm1")(_unary(F.expm1))
register("floor")(_unary(lambda c: F.floor(c).cast("double")))
register("ceiling")(_unary(lambda c: F.ceil(c).cast("double")))
register("sign")(_unary(F.signum))
register("sin")(_unary(F.sin))
register("cos")(_unary(F.cos))
register("tan")(_unary(F.tan))
register("asin")(_unary(F.asin))
register("acos")(_unary(F.acos))
register("atan")(_unary(F.atan))
register("sinh")(_unary(F.sinh))
register("cosh")(_unary(F.cosh))
register("tanh")(_unary(F.tanh))
register("asinh")(_unary(F.asinh))
register("acosh")(_unary(F.acosh))
register("atanh")(_unary(F.atanh))
# R's *pi variants: f(pi * x), with exact 0 at the half-integer poles R
# special-cases (cospi(0.5) == 0 exactly; Spark's cos(pi/2) is ~6e-17)
register("sinpi")(
    _unary(lambda c: F.when(c == F.floor(c), F.lit(0.0)).otherwise(F.sin(c * math.pi)))
)
register("cospi")(
    _unary(
        lambda c: F.when(c - F.floor(c) == 0.5, F.lit(0.0)).otherwise(
            F.cos(c * math.pi)
        )
    )
)
register("tanpi")(
    _unary(
        lambda c: F.when(c == F.floor(c), F.lit(0.0))
        .when(c - F.floor(c) == 0.5, F.lit(None).cast("double"))
        .otherwise(F.tan(c * math.pi))
    )
)
register("factorial")(_unary(lambda c: F.factorial(c.cast("int")).cast("double")))


@register("log")
def _log(ctx, x, base=None):
    col = ctx.col(x)
    if base is None:
        return F.log(col)
    return F.log(float(ctx.eval(base)), col)


@register("atan2")
def _atan2(ctx, y, x):
    return F.atan2(ctx.col(y), ctx.col(x))


@register("round", "round_")
def _round(ctx, x, digits: int = 0):
    return F.round(ctx.col(x), int(ctx.eval(digits)))


@register("trunc")
def _trunc(ctx, x):
    col = ctx.col(x)
    return F.when(col >= 0, F.floor(col)).otherwise(F.ceil(col)).cast("double")


@register("signif")
def _signif(ctx, x, digits: int = 6):
    col = ctx.col(x)
    d = int(ctx.eval(digits))
    mag = F.floor(F.log10(F.abs(col)))
    factor = F.pow(F.lit(10.0), mag - (d - 1))
    return F.when(col == 0, F.lit(0.0)).otherwise(F.round(col / factor) * factor)


@register("pmin")
def _pmin(ctx, *xs, na_rm: bool = False):
    return F.least(*[ctx.col(x) for x in xs])


@register("pmax")
def _pmax(ctx, *xs, na_rm: bool = False):
    return F.greatest(*[ctx.col(x) for x in xs])


@register("mod")
def _mod(ctx, x, y=None):
    """Two args: R ``%%`` remainder. One arg: R ``Mod`` — the modulus
    (absolute value; complex magnitude for struct<re,im> columns),
    reference ``api/base/arithm.py:170-189``."""
    if y is None:
        from .complex import complex_parts

        re, im = complex_parts(ctx, x)
        return F.sqrt(re * re + im * im)
    return F.pmod(ctx.col(x), ctx.col(y))


@register("scale")
def _scale(ctx, x, center: bool = True, scale: bool = True, scale_=None):
    if scale_ is not None:  # reference kwarg spelling (api/base/stats.py)
        scale = scale_
    col = ctx.col(x).cast("double")
    out = col
    if center:
        out = out - ctx.agg(F.mean(col))
    if scale:
        if center:
            out = out / ctx.agg(F.stddev_samp(col))
        else:
            out = out / ctx.agg(F.sqrt(F.sum(col * col) / (F.count(col) - 1)))
    return out


@register("proportions", "prop_table")
def _proportions(ctx, x):
    col = ctx.col(x).cast("double")
    return col / ctx.agg(F.sum(col))
