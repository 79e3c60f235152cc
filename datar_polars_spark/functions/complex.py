"""Complex-number functions (reference ``api/base/complex.py:51-137``).

Spark has no complex dtype, so a complex column is represented as
``struct<re: double, im: double>`` and every operation compiles to
built-in JVM expressions (``atan2``, ``sqrt``, field access, struct
re-assembly) — unlike the reference, which maps Python ``cmath`` over
every element. A plain numeric column is treated as a complex number
with a zero imaginary part, mirroring R's implicit promotion.

``mod`` here is R's ``Mod`` (modulus / absolute value) when called with
one argument — reference ``api/base/arithm.py:170-189`` — while the
two-argument spelling keeps the remainder semantics used elsewhere in
this repo.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .registry import register

COMPLEX_FIELDS = ("re", "im")


def _is_complex_type(dt) -> bool:
    return isinstance(dt, StructType) and [f.name for f in dt.fields] == list(
        COMPLEX_FIELDS
    )


def _col_type(ctx, col: Column):
    """Resolve a Column's dataType via schema analysis (no job runs)."""
    try:
        return ctx.tibble.df.select(col.alias("__c__")).schema[0].dataType
    except Exception:
        return None


def complex_parts(ctx, x) -> tuple[Column, Column]:
    """(re, im) of a value that may be complex-struct or plain numeric."""
    col = ctx.col(x)
    if _is_complex_type(_col_type(ctx, col)):
        return col.getField("re"), col.getField("im")
    d = col.cast("double")
    return d, d * F.lit(0.0)  # d*0 keeps NULLs null


def make_complex(re: Column, im: Column) -> Column:
    return F.struct(re.cast("double").alias("re"), im.cast("double").alias("im"))


@register("complex_")
def _complex(ctx, real=0.0, imaginary=0.0):
    """R ``complex(real=, imaginary=)`` constructor -> struct<re,im>."""
    return make_complex(
        ctx.col(real).cast("double"), ctx.col(imaginary).cast("double")
    )


@register("as_complex")
def _as_complex(ctx, x):
    col = ctx.col(x)
    if _is_complex_type(_col_type(ctx, col)):
        return col
    re, im = complex_parts(ctx, x)
    return make_complex(re, im)


@register("re_")
def _re(ctx, x):
    re, _ = complex_parts(ctx, x)
    return re


@register("im")
def _im(ctx, x):
    _, im = complex_parts(ctx, x)
    return im


@register("conj")
def _conj(ctx, x):
    col = ctx.col(x)
    if _is_complex_type(_col_type(ctx, col)):
        return make_complex(col.getField("re"), -col.getField("im"))
    return col


@register("arg")
def _arg(ctx, x):
    re, im = complex_parts(ctx, x)
    return F.atan2(im, re)


@register("is_complex")
def _is_complex(ctx, x):
    return F.lit(_is_complex_type(_col_type(ctx, ctx.col(x))))
