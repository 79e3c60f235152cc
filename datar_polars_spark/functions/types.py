"""Type predicates and casts (reference ``api/base/types.py``, ``asis.py``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


@register("as_character", "as_string")
def _as_character(ctx, x):
    return ctx.col(x).cast("string")


@register("as_double")
def _as_double(ctx, x):
    # try_cast: unparseable input -> NA (R as.numeric semantics), not an
    # ANSI cast error
    return ctx.col(x).try_cast("double")


@register("as_numeric")
def _as_numeric(ctx, x):
    return ctx.col(x).try_cast("double")


@register("as_integer", "as_int")
def _as_integer(ctx, x):
    """Factor columns cast to their 1-based level codes (reference
    ``api/base/types.py:92-97``: factor -> codes); everything else is a
    plain numeric cast."""
    from ..plans.expr import Ref

    if isinstance(x, Ref) and x._name in ctx.tibble.levels:
        levels = ctx.tibble.levels[x._name]
        return F.array_position(F.lit(levels), F.col(x._name)).cast("long")
    return ctx.col(x).try_cast("long")


@register("as_logical", "as_bool")
def _as_logical(ctx, x):
    """R as.logical: strings map only from TRUE/FALSE/T/F spellings
    (numeric strings like "1" are NA, unlike Spark's boolean cast);
    numeric input is nonzero->TRUE."""
    from ..plans.expr import Ref

    col = ctx.col(x)
    dtype = ""
    if isinstance(x, Ref):
        dtype = dict(ctx.tibble.dtypes).get(x._name, "")
    if dtype == "string":
        s = F.lower(col)
        return (
            F.when(s.isin("true", "t"), F.lit(True))
            .when(s.isin("false", "f"), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
    return col.try_cast("boolean")


@register("as_date")
def _as_date(ctx, x, format=None):
    # try_to_date: unparseable dates -> NA instead of an ANSI error
    col = ctx.col(x)
    fmt = ctx.eval(format) if format is not None else None
    if fmt is not None:
        return F.try_to_date(col, _r_to_java_fmt(fmt))
    return F.try_to_date(col)


def _r_to_java_fmt(fmt: str) -> str:
    return (
        fmt.replace("%Y", "yyyy")
        .replace("%m", "MM")
        .replace("%d", "dd")
        .replace("%H", "HH")
        .replace("%M", "mm")
        .replace("%S", "ss")
    )


@register("cast")
def _cast(ctx, x, dtype):
    return ctx.col(x).cast(ctx.eval(dtype))


@register("is_null")
def _is_null(ctx, x):
    return ctx.col(x).isNull()


@register("is_finite")
def _is_finite(ctx, x):
    col = ctx.col(x).cast("double")
    return col.isNotNull() & ~F.isnan(col) & (F.abs(col) != float("inf"))


@register("is_infinite")
def _is_infinite(ctx, x):
    col = ctx.col(x).cast("double")
    return F.abs(col) == float("inf")


@register("is_element", "isin")
def _is_element(ctx, x, table):
    vals = ctx.eval(table)
    if isinstance(vals, (list, tuple, set)):
        return ctx.col(x).isin(list(vals))
    return ctx.col(x).isin(vals)


@register("match")
def _match(ctx, x, table):
    """1-based index of first match in table; NA when absent (R
    ``match`` — array_position's 0-for-missing is not R semantics)."""
    vals = list(ctx.eval(table))
    col = ctx.col(x).cast("string") if all(isinstance(v, str) for v in vals) else ctx.col(x)
    pos = F.array_position(F.lit(vals), col)
    return F.when(pos > 0, pos)


# --------------------------------------------------------------------------
# type predicates (reference api/base/types.py:155-290): schema-time
# answers — the dtype is known from the plan, so every predicate is a
# literal column (no job, no per-row work)
# --------------------------------------------------------------------------

def _dtype_name(ctx, x) -> str:
    """Spark simpleString dtype of an expression ('' for plain scalars)."""
    from ..plans.expr import Expr, Ref

    if isinstance(x, Ref):
        return dict(ctx.tibble.dtypes).get(x._name, "")
    if isinstance(x, Expr):
        col = ctx.col(x)
        return ctx.tibble.df.select(col.alias("__t__")).schema[0].dataType.simpleString()
    return ""


_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_DOUBLE_TYPES = {"float", "double"}


def _type_pred(name: str, col_types: set, py_check):
    @register(name)
    def impl(ctx, x):
        from ..plans.expr import Expr

        if isinstance(x, Expr):
            return F.lit(_dtype_name(ctx, x) in col_types)
        if isinstance(x, (list, tuple)) and x:
            return F.lit(all(py_check(v) for v in x))
        return F.lit(py_check(x))

    return impl


_type_pred("is_double", _DOUBLE_TYPES, lambda v: isinstance(v, float))
_type_pred(
    "is_integer",
    _INT_TYPES,
    lambda v: isinstance(v, int) and not isinstance(v, bool),
)
_type_pred("is_logical", {"boolean"}, lambda v: isinstance(v, bool))
_type_pred("is_character", {"string"}, lambda v: isinstance(v, str))
_type_pred(
    "is_numeric",
    _INT_TYPES | _DOUBLE_TYPES | {"decimal"},
    lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
)


@register("is_true")
def _is_true(ctx, x):
    """Reference api/base/types.py:268-271: identity check on the plain
    value — an expression/column is never the scalar TRUE."""
    from ..plans.expr import Expr

    return F.lit((not isinstance(x, Expr)) and x is True)


@register("is_false")
def _is_false(ctx, x):
    from ..plans.expr import Expr

    return F.lit((not isinstance(x, Expr)) and x is False)


@register("is_atomic")
def _is_atomic(ctx, x):
    """Reference api/base/types.py:155-161: columns and scalars are
    atomic, containers are not."""
    from ..plans.expr import Expr

    if isinstance(x, Expr):
        return F.lit(True)
    return F.lit(isinstance(x, (int, float, str, bool, complex, bytes)))


@register("as_null")
def _as_null(ctx, x=None):
    return F.lit(None)
