"""Aggregate functions (R semantics: na_rm=False -> NA-poisoning).

Covers the reference's aggregate surface at ``api/base/arithm.py:375-954``
(sum/mean/median/min/max/prod/sd/var/quantile/weighted_mean/cov/cor),
``api/dplyr/funs.py:34-49`` (n), ``api/dplyr/distinct.py:23-53``
(n_distinct). In summarise mode these compile to plain Spark aggregates;
in mutate/filter mode they compile to window aggregates over the group
partition (``ctx.agg``), matching the reference's ``.over(gvars)``.

NaN handling: the reference treats NaN as NA (e.g. ``api/tidyr.py:78-101``),
so double inputs are normalized NaN->null before aggregating.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..plans.expr import Ref
from .registry import register

_FLOATY = ("double", "float")


def _nn(ctx, node) -> Column:
    """Evaluate node to a Column with NaN normalized to null for floats."""
    col = ctx.col(node)
    try:
        if isinstance(node, Ref):
            dtype = dict(ctx.tibble.dtypes).get(node._name)
            if dtype in _FLOATY:
                return F.when(F.isnan(col), F.lit(None)).otherwise(col)
            return col
    except Exception:
        pass
    return col


def _narm(ctx, node, aggregated: Column, na_rm: bool) -> Column:
    """R default na_rm=False: any NA in the group -> NA result."""
    if na_rm:
        return ctx.agg(aggregated)
    col = _nn(ctx, node)
    has_na = ctx.agg(F.max(col.isNull().cast("int"))) == 1
    return F.when(has_na, F.lit(None)).otherwise(ctx.agg(aggregated))


def _is_arrayish(ctx, node) -> bool:
    """Rowwise aggregation target? c_across() or an array-typed column."""
    from ..plans.expr import Call

    if isinstance(node, Call) and node._fname == "c_across":
        return True
    if isinstance(node, Ref):
        dtype = dict(ctx.tibble.dtypes).get(node._name, "")
        return dtype.startswith("array")
    return False


def _rowwise_agg(ctx, node, kind: str, na_rm: bool) -> Column:
    """Horizontal (within-row) aggregation over an array via
    higher-order functions — the distributed replacement for the
    reference's per-row Python loop (``mutate.py:101-141``)."""
    arr = ctx.col(node)
    arr = F.transform(arr, lambda v: F.when(F.isnan(v.cast("double")), None).otherwise(v))
    valid = F.filter(arr, lambda v: v.isNotNull())
    has_na = F.exists(arr, lambda v: v.isNull())
    nv = F.size(valid)
    z = F.lit(0.0)
    total = F.aggregate(valid, z, lambda a, v: a + v.cast("double"))
    if kind == "sum":
        out = total
    elif kind == "mean":
        out = F.when(nv > 0, total / nv)
    elif kind == "min":
        out = F.array_min(valid)
    elif kind == "max":
        out = F.array_max(valid)
    elif kind == "prod":
        out = F.aggregate(valid, F.lit(1.0), lambda a, v: a * v.cast("double"))
    elif kind in ("sd", "var"):
        m = total / nv
        ss = F.aggregate(
            valid, z, lambda a, v: a + (v.cast("double") - m) * (v.cast("double") - m)
        )
        out = F.when(nv > 1, ss / (nv - 1))
        if kind == "sd":
            out = F.sqrt(out)
    elif kind == "median":
        # lower median; exact for odd n. Guard nv=0: element_at(arr, 0)
        # is a runtime error, not null
        out = F.when(
            nv > 0, F.element_at(F.array_sort(valid), ((nv + 1) / 2).cast("int"))
        )
    else:  # pragma: no cover
        raise NotImplementedError(kind)
    if na_rm:
        return out
    return F.when(has_na, F.lit(None)).otherwise(out)


def _simple_agg(fn, kind: str | None = None):
    def impl(ctx, x, na_rm: bool = False):
        if ctx.rowwise and kind is not None and _is_arrayish(ctx, x):
            return _rowwise_agg(ctx, x, kind, na_rm)
        col = _nn(ctx, x)
        return _narm(ctx, x, fn(col), na_rm)

    return impl


register("sum", "sum_")(_simple_agg(F.sum, "sum"))
register("mean", "avg")(_simple_agg(F.mean, "mean"))
register("median")(_simple_agg(F.median, "median"))
register("min", "min_")(_simple_agg(F.min, "min"))
register("max", "max_")(_simple_agg(F.max, "max"))
register("sd", "stddev")(_simple_agg(F.stddev_samp, "sd"))
register("var", "variance")(_simple_agg(F.var_samp, "var"))
register("prod")(_simple_agg(F.product, "prod"))


@register("n")
def _n(ctx):
    return ctx.agg(F.count(F.lit(1)))


@register("grouping_id")
def _grouping_id(ctx, *cols):
    """Bit vector of which keys are aggregated away in a cube/rollup
    row (Spark `grouping_id`); only meaningful inside a summarise after
    group_by_cube / group_by_rollup."""
    return F.grouping_id(*[_nn(ctx, c) for c in cols]) if cols else F.grouping_id()


@register("approx_n_distinct")
def _approx_n_distinct(ctx, x, rsd: float = 0.05):
    """HyperLogLog++ distinct-count sketch — the 100 TB alternative to
    exact n_distinct (no per-key state, fixed memory)."""
    return ctx.agg(F.approx_count_distinct(ctx.col(x), rsd))


@register("approx_quantile")
def _approx_quantile(ctx, x, probs=0.5, accuracy: int = 10000):
    """Greenwald-Khanna sketch quantile — bounded memory at any scale;
    exact `quantile` sorts the full group."""
    return ctx.agg(F.percentile_approx(_nn(ctx, x), F.lit(probs), F.lit(accuracy)))


@register("n_distinct")
def _n_distinct(ctx, *xs, na_rm: bool = False):
    cols = [_nn(ctx, x) for x in xs]
    if na_rm and len(cols) == 1:
        return ctx.agg(F.count_distinct(cols[0]))
    # R n_distinct counts NA as a value; emulate by null-encoding
    encoded = [F.coalesce(c.cast("string"), F.lit("\x00NA")) for c in cols]
    return ctx.agg(F.count_distinct(*encoded))


@register("quantile")
def _quantile(ctx, x, probs=0.5, na_rm: bool = False, type: int = 7):
    col = _nn(ctx, x)
    probs_val = ctx.eval(probs)
    agg = F.percentile(col, F.lit(probs_val))
    return _narm(ctx, x, agg, na_rm)


@register("weighted_mean")
def _weighted_mean(ctx, x, w=None, na_rm: bool = False):
    col = _nn(ctx, x)
    if w is None:
        return _narm(ctx, x, F.mean(col), na_rm)
    wc = _nn(ctx, w)
    agg = F.sum(col * wc) / F.sum(F.when(col.isNotNull(), wc))
    return _narm(ctx, x, agg, na_rm)


@register("cov")
def _cov(ctx, x, y):
    return ctx.agg(F.covar_samp(ctx.col(x).cast("double"), ctx.col(y).cast("double")))


@register("cor")
def _cor(ctx, x, y):
    return ctx.agg(F.corr(ctx.col(x).cast("double"), ctx.col(y).cast("double")))


@register("all", "all_")
def _all(ctx, x, na_rm: bool = False):
    col = _nn(ctx, x).cast("boolean")
    if na_rm:
        return ctx.agg(F.min(col))  # F.min skips nulls natively
    return _narm(ctx, x, F.min(col), False)


@register("any", "any_")
def _any(ctx, x, na_rm: bool = False):
    col = _nn(ctx, x).cast("boolean")
    if na_rm:
        return ctx.agg(F.max(col))
    return _narm(ctx, x, F.max(col), False)


@register("first")
def _first(ctx, x, order_by=None, default=None, na_rm: bool = False):
    col = ctx.col(x)
    if ctx.mode == "agg":
        res = F.first(col, ignorenulls=na_rm)
    else:
        w = ctx.ordered(order_by)
        res = F.first(col, ignorenulls=na_rm).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
    if default is not None:
        res = F.coalesce(res, ctx.col(default))
    return res


@register("last")
def _last(ctx, x, order_by=None, default=None, na_rm: bool = False):
    col = ctx.col(x)
    if ctx.mode == "agg":
        res = F.last(col, ignorenulls=na_rm)
    else:
        w = ctx.ordered(order_by)
        res = F.last(col, ignorenulls=na_rm).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
    if default is not None:
        res = F.coalesce(res, ctx.col(default))
    return res


@register("first2")
def _first2(ctx, x, y):
    """y value at the minimum of x, NAs in x excluded (reference
    ``api/forcats.py:522-527``) — one distributed min_by aggregate."""
    res = F.min_by(ctx.col(y), ctx.col(x))
    return ctx.agg(res)


@register("last2")
def _last2(ctx, x, y):
    """y value at the maximum of x (reference ``api/forcats.py:529-534``)."""
    res = F.max_by(ctx.col(y), ctx.col(x))
    return ctx.agg(res)


@register("nth")
def _nth(ctx, x, n, order_by=None, default=None):
    # 0-based in dplyr-datar; collect the group then element_at (n+1)
    col = ctx.col(x)
    nval = ctx.eval(n)
    if ctx.mode == "agg":
        arr = F.collect_list(col)
    else:
        arr = F.collect_list(col).over(
            ctx.ordered(order_by).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
    if isinstance(nval, int) and nval < 0:
        # python-style negative index (reference polars x.get(n))
        res = F.when(F.size(arr) >= -nval, F.element_at(arr, nval))
    else:
        res = F.when(F.size(arr) > nval, F.element_at(arr, nval + 1))
    if default is not None:
        res = F.coalesce(res, ctx.col(default))
    return res
