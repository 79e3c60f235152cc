"""Vector utilities + grouping-context functions.

Reference: ``api/base/seq.py``/``verbs.py`` (rev, duplicated, lengths,
sample), ``api/base/random.py:47-134`` (rnorm/runif), and
``api/dplyr/context.py`` (cur_group/cur_group_id/n_groups context fns
— reference builds cur_group_id from a collected distinct-key scan at
``context.py:192-205``; here it's a distributed ``dense_rank`` over the
sorted key order).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .aggregates import _nn
from .registry import NEEDS_ORDER, register

ORDER_COL = "__datar_ro__"


@register("rev")
def _rev(ctx, x):
    """Reverse values within the group, in frame order: value at the
    mirrored position, via a full-frame collect_list in descending
    frame order indexed by the ascending row_number."""
    col = ctx.col(x)
    w_desc = (
        ctx.partition()
        .orderBy(F.col(ORDER_COL).desc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    lst = F.collect_list(col).over(w_desc)
    rn = F.row_number().over(ctx.ordered())
    return F.element_at(lst, rn)


@register("duplicated")
def _duplicated(ctx, *xs):
    """R semantics: True for the 2nd+ occurrence of a value (first
    occurrence in frame order is False) — reference ``verbs.py:214-227``."""
    cols = [ctx.col(x) for x in xs]
    w = Window.partitionBy(*list(ctx.groups), *cols).orderBy(F.col(ORDER_COL).asc())
    return F.row_number().over(w) > 1


@register("lengths")
def _lengths(ctx, x):
    return F.size(ctx.col(x))


@register("seq_along")
def _seq_along(ctx, x=None):
    return F.row_number().over(ctx.ordered())


@register("runif")
def _runif(ctx, n=None, min: float = 0.0, max: float = 1.0, seed: int | None = None):
    r = F.rand(seed) if seed is not None else F.rand()
    return r * (max - min) + min


@register("rnorm")
def _rnorm(ctx, n=None, mean: float = 0.0, sd: float = 1.0, seed: int | None = None):
    r = F.randn(seed) if seed is not None else F.randn()
    return r * sd + mean


@register("row_sums")
def _row_sums(ctx, *xs, na_rm: bool = False):
    """Horizontal sum across columns (reference ``api/base/stats.py``).
    na_rm=True treats NA as 0; default propagates NA (R semantics)."""
    cols = [_nn(ctx, x) for x in xs]
    if na_rm:
        cols = [F.coalesce(c, F.lit(0)) for c in cols]
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


@register("row_means")
def _row_means(ctx, *xs, na_rm: bool = False):
    cols = [_nn(ctx, x) for x in xs]
    if na_rm:
        arr = F.array(*cols)
        valid = F.filter(arr, lambda v: v.isNotNull())
        return F.when(
            F.size(valid) > 0,
            F.aggregate(valid, F.lit(0.0), lambda a, v: a + v) / F.size(valid),
        )
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out / len(cols)


@register("row_mins")
def _row_mins(ctx, *xs):
    return F.least(*[_nn(ctx, x) for x in xs])


@register("row_maxs")
def _row_maxs(ctx, *xs):
    return F.greatest(*[_nn(ctx, x) for x in xs])


@register("cur_data_all")
def _cur_data_all(ctx):
    """Like cur_data() but including the grouping columns."""
    cols = list(ctx.tibble.columns)
    w = (
        ctx.partition()
        .orderBy(F.col(ORDER_COL).asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return F.collect_list(F.struct(*[F.col(c) for c in cols])).over(w)


@register("cur_data")
def _cur_data(ctx):
    """Per-group sub-frame as an array of structs (the reference's
    Object-column escape hatch re-expressed, SURVEY §1.1c):
    ``collect_list(struct(non-group cols)).over(partition)``."""
    cols = [c for c in ctx.tibble.columns if c not in ctx.groups]
    w = (
        ctx.partition()
        .orderBy(F.col(ORDER_COL).asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return F.collect_list(F.struct(*[F.col(c) for c in cols])).over(w)


# ---- grouping-context functions -------------------------------------------

@register("cur_group")
def _cur_group(ctx):
    if not ctx.groups:
        return F.lit(None)
    return F.struct(*[F.col(g) for g in ctx.groups])


@register("cur_group_id")
def _cur_group_id(ctx):
    """1-based id of the current row's group; keys sorted ascending
    (dplyr group order). Global dense_rank — acceptable because group
    cardinality, not row count, bounds the rank domain."""
    if not ctx.groups:
        return F.lit(1)
    return F.dense_rank().over(
        Window.orderBy(*[F.col(g).asc_nulls_last() for g in ctx.groups])
    )


@register("n_groups_")
def _n_groups_expr(ctx):
    if not ctx.groups:
        return F.lit(1)
    # struct keys, not string concat: concat_ws skips nulls, conflating
    # ('a', NULL) with (NULL, 'a')
    key = F.struct(*[F.col(g) for g in ctx.groups])
    return F.size(F.collect_set(key).over(Window.partitionBy()))


NEEDS_ORDER.update({"rev", "duplicated", "seq_along"})


# cur_data() collects whole-group structs — harmless unordered, but
# order it by frame order for deterministic list contents
NEEDS_ORDER.add("cur_data")
