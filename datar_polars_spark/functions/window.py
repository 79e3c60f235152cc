"""Window / ordered functions.

Covers the reference's rank/shift/cumulative surface
(``api/base/rank.py:30-265``, ``api/base/cum.py:17-79``,
``api/dplyr/funs.py:102-158``, ``api/dplyr/context.py:277-315``).
Every function compiles to ``F.<fn>().over(Window.partitionBy(*groups)
.orderBy(...))``; frame order comes from the hidden ``__datar_ro__``
column (SURVEY §1.4) unless an explicit ranking key is given.

Rank functions follow dplyr NA rules: NA inputs rank as NA (the
reference masks them at ``api/dplyr/rank.py:48-56``); ranks are
computed over non-NA rows only.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from .aggregates import _nn
from .registry import register

_UNB_PREV = Window.unboundedPreceding
_CUR = Window.currentRow


def _unwrap_key(ctx, node):
    """Resolve a ranking key, honoring a desc() wrapper: returns the
    VALUE column (for NA masking) and the ordered sort key. Without
    this, a Desc node evaluates to a sort-order expression that cannot
    be re-ordered or used as a value (reference test:
    test_desc_correctly_handled_by_window_functions)."""
    from ..plans.expr import Desc

    if isinstance(node, Desc):
        col = _nn(ctx, node._operand)
        return col, col.desc_nulls_last()
    col = _nn(ctx, node)
    return col, col.asc_nulls_last()


def _rank_window(ctx, node, desc: bool = False):
    """Window ordered by the ranking key, NA rows excluded via masking."""
    col, key = _unwrap_key(ctx, node)
    if desc:
        col2 = col
        key = col2.desc_nulls_last()
    w = ctx.partition().orderBy(key, F.col("__datar_ro__").asc())
    return col, w


def _rank_desc(ctx, node):
    """(value column, desc?) for a ranking key node."""
    from ..plans.expr import Desc

    if isinstance(node, Desc):
        return _nn(ctx, node._operand), True
    return _nn(ctx, node), False


def _n_ok_scalar(ctx, col):
    """Eager non-NA count (tiny agg job, memoized per context) for
    rank denominators — the window form would be an unpartitioned
    whole-table window."""
    key = ("n_ok", str(col))
    if key not in ctx._job_cache:
        row = ctx.tibble.df.agg(F.count(col).alias("__n__")).first()
        ctx._job_cache[key] = int(row["__n__"]) if row is not None else 0
    return ctx._job_cache[key]


@register("row_number")
def _row_number(ctx, x=None):
    if x is None:
        if ctx.mode == "agg":
            # summarise(n=row_number()): 1..group_size, exploded to
            # rows post-agg (reference multi-value expr semantics)
            return F.sequence(F.lit(1), F.count(F.lit(1)).cast("int"))
        # frame-order numbering: two-pass distributed when ungrouped
        # (per-bucket row_number + broadcast prefix counts) instead of a
        # single-partition global window
        return ctx.row_number_over()
    col, desc = _rank_desc(ctx, x)
    two = ctx.rank_over(col, desc, "row_number")
    if two is not None:
        return F.when(col.isNotNull(), two)
    col2, w = _rank_window(ctx, x)
    return F.when(col2.isNotNull(), F.row_number().over(w))


@register("min_rank")
def _min_rank(ctx, x):
    col, desc = _rank_desc(ctx, x)
    two = ctx.rank_over(col, desc, "rank")
    if two is not None:
        return F.when(col.isNotNull(), two)
    key = col.desc_nulls_last() if desc else col.asc_nulls_last()
    rw = ctx.partition().orderBy(key)
    return F.when(col.isNotNull(), F.rank().over(rw))


@register("dense_rank")
def _dense_rank(ctx, x):
    col, desc = _rank_desc(ctx, x)
    two = ctx.rank_over(col, desc, "dense_rank")
    if two is not None:
        return F.when(col.isNotNull(), two)
    key = col.desc_nulls_last() if desc else col.asc_nulls_last()
    rw = ctx.partition().orderBy(key)
    return F.when(col.isNotNull(), F.dense_rank().over(rw))


@register("percent_rank")
def _percent_rank(ctx, x):
    col, desc = _rank_desc(ctx, x)
    two = ctx.rank_over(col, desc, "rank")
    if two is not None:
        n_ok = _n_ok_scalar(ctx, col)
        return F.when(col.isNotNull(), (two - 1) / F.lit(n_ok - 1))
    key = col.desc_nulls_last() if desc else col.asc_nulls_last()
    rw = ctx.partition().orderBy(key)
    n_okw = F.sum(col.isNotNull().cast("long")).over(ctx.partition())
    rank = F.rank().over(rw)
    return F.when(col.isNotNull(), (rank - 1) / (n_okw - 1))


@register("cume_dist")
def _cume_dist(ctx, x):
    col, desc = _rank_desc(ctx, x)
    two = ctx.rank_over(col, desc, "cume_count")
    if two is not None:
        n_ok = _n_ok_scalar(ctx, col)
        return F.when(col.isNotNull(), two / F.lit(n_ok))
    key = col.desc_nulls_last() if desc else col.asc_nulls_last()
    rw = ctx.partition().orderBy(key)
    n_okw = F.sum(col.isNotNull().cast("long")).over(ctx.partition())
    # rows with key <= current, among non-NA rows
    upto = F.max(F.when(col.isNotNull(), F.row_number().over(rw))).over(
        rw.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.when(col.isNotNull(), upto / n_okw)


@register("ntile")
def _ntile(ctx, x=None, n: int = 1):
    nval = int(ctx.eval(n))
    if x is None:
        return ctx.ntile_over(nval)
    col, desc = _rank_desc(ctx, x)
    two = ctx.rank_over(col, desc, "row_number")
    if two is not None:
        n_ok = _n_ok_scalar(ctx, col)
        base, rem = divmod(n_ok, nval)
        cut = rem * (base + 1)
        tile = F.when(
            two <= F.lit(cut), F.ceil(two / F.lit(base + 1))
        ).otherwise(F.lit(rem) + F.ceil((two - F.lit(cut)) / F.lit(max(base, 1))))
        return F.when(col.isNotNull(), tile.cast("int"))
    key = col.desc_nulls_last() if desc else col.asc_nulls_last()
    rw = ctx.partition().orderBy(key)
    return F.when(col.isNotNull(), F.ntile(nval).over(rw))


@register("lead")
def _lead(ctx, x, n: int = 1, default=None, order_by=None):
    # two-pass distributed (per-bucket shift + broadcast carry map)
    # when ungrouped on the default frame order; group window otherwise
    col = ctx.col(x)
    dflt = ctx.eval(default)
    return ctx.shift_over(col, int(ctx.eval(n)), dflt, lead=True, order_by=order_by)


@register("lag")
def _lag(ctx, x, n: int = 1, default=None, order_by=None):
    col = ctx.col(x)
    dflt = ctx.eval(default)
    return ctx.shift_over(col, int(ctx.eval(n)), dflt, lead=False, order_by=order_by)


def _cum(kind):
    """Cumulative aggregates route through ctx.cum_over: ordinary group
    windows when grouped, two-pass distributed rewrite when ungrouped on
    the default frame order (no single-partition window)."""

    def impl(ctx, x, order_by=None):
        col = ctx.col(x)
        if kind in ("all", "any"):
            col = col.cast("boolean")
        return ctx.cum_over(kind, col, order_by)

    return impl


register("cumsum")(_cum("sum"))
register("cummax")(_cum("max"))
register("cummin")(_cum("min"))
register("cummean")(_cum("mean"))
register("cumprod")(_cum("product"))
register("cumall")(_cum("all"))
register("cumany")(_cum("any"))


@register("cumcount")
def _cumcount(ctx, x=None):
    return ctx.cum_over("count", None)


@register("with_order")
def _with_order(ctx, order, call, *args):
    """Evaluate a window expression with an explicit ordering instead of
    frame order (reference ``api/dplyr/order_by.py:26-145`` — there it
    sorts, applies, unsorts; Spark windows take the ordering natively,
    so this just swaps the window key). A plain-list order is a
    per-position key: indexed out of a literal array by the
    materialized frame position (``Tibble.ensure_pos``). The reference
    3-arg form with_order(order, fun, x) builds fun(x) first."""
    from ..plans.expr import Desc

    if callable(call) and not hasattr(call, "_fname"):
        call = call(*args)

    if isinstance(order, (list, tuple)):
        from ..plans.context import POS_COL

        arr = F.array(*[F.lit(v) for v in order])
        key = F.get(arr, F.col(POS_COL).cast("int")).asc()
    elif isinstance(order, Desc):
        key = ctx.col(order._operand).desc()
    else:
        key = ctx.col(order).asc()
    saved = ctx.order_override
    ctx.order_override = key
    try:
        return ctx.col(call)
    finally:
        ctx.order_override = saved


register("order_by")(_with_order)


@register("consecutive_id")
def _consecutive_id(ctx, *xs):
    """Run-length id: increments whenever any key changes (reference
    ``api/dplyr/context.py:277-315``). Built on the two-pass shift /
    row_number / cumsum primitives, so the ungrouped case stays
    distributed (the change-flag window expression is legal in the
    offsets job because _bucket_offsets pre-projects its value)."""
    changed = F.lit(0)
    for x in xs:
        col = ctx.col(x)
        prev = ctx.shift_over(col, 1, None, lead=False)
        neq = ~(col.eqNullSafe(prev))
        changed = F.greatest(changed, neq.cast("int"))
    changed = F.when(ctx.row_number_over() == 1, F.lit(1)).otherwise(changed)
    return ctx.cum_over("sum", changed)


# --------------------------------------------------------------------------
# rolling windows (r3 extension; zoo::rollsumr / slider::slide_dbl family —
# absent from the reference, standard tidyverse-adjacent analytics)
# --------------------------------------------------------------------------

def _roll(kind):
    def impl(ctx, x, k, min_periods=None, order_by=None):
        kk = int(ctx.eval(k))
        if kk < 1:
            raise ValueError(f"roll_{kind}: k must be >= 1, got {kk}")
        mp = None if min_periods is None else int(ctx.eval(min_periods))
        return ctx.roll_over(
            kind, ctx.col(x), kk, order_by=order_by, min_periods=mp
        )

    impl.__name__ = f"_roll_{kind}"
    impl.__doc__ = (
        f"Trailing k-row rolling {kind} in frame order, or in "
        "``order_by=`` order when given (grouped: inside the group "
        "partition; ungrouped: two-pass distributed — see "
        "EvalContext.roll_over). Rows before min_periods (default k) "
        "yield NULL."
    )
    return impl


register("roll_sum")(_roll("sum"))
register("roll_mean")(_roll("mean"))
register("roll_min")(_roll("min"))
register("roll_max")(_roll("max"))
