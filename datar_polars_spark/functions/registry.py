"""Function registry: deferred Call nodes -> Spark Column compilers.

The reference dispatches scalar/aggregate functions through pipda's
backend registry (``datar_polars/plugin.py:82-165``). Here the registry
is a plain dict: each entry is a compiler ``(ctx, *raw_args, **kwargs)
-> Column`` that receives *unevaluated* arguments and uses
``ctx.col``/``ctx.eval`` so it can decide which args are columns and
which are plain parameters (e.g. quantile probabilities).
"""

from __future__ import annotations

from typing import Any, Callable

from ..plans.expr import Call

REGISTRY: dict[str, Callable] = {}


def register(*names: str):
    """Register a compiler under one or more names."""

    def deco(fn: Callable) -> Callable:
        for n in names:
            REGISTRY[n] = fn
        return fn

    return deco


def dispatch(name: str, ctx, args: tuple, kwargs: dict) -> Any:
    fn = REGISTRY.get(name)
    if fn is None:
        raise NotImplementedError(f"datar function not implemented: {name!r}")
    return fn(ctx, *args, **kwargs)


# functions whose compilation references the hidden frame-order column
# (windows ordered by __datar_ro__); verbs materialize it lazily before
# evaluating any expression containing these
NEEDS_ORDER: set[str] = {
    "row_number",
    "min_rank",
    "dense_rank",
    "percent_rank",
    "cume_dist",
    "ntile",
    "lead",
    "lag",
    "cumsum",
    "cummax",
    "cummin",
    "cummean",
    "cumprod",
    "cumall",
    "cumany",
    "cumcount",
    "consecutive_id",
    "diff",
    "first",
    "last",
    "nth",
    "paste",
    "paste0",
    "roll_sum",
    "roll_mean",
    "roll_min",
    "roll_max",
}


def tree_needs_order(node) -> bool:
    from ..plans.expr import BinOp, Call, Desc, UnaryOp

    if isinstance(node, Call):
        if node._fname in NEEDS_ORDER:
            return True
        return any(tree_needs_order(a) for a in node._args) or any(
            tree_needs_order(v) for v in node._kwargs.values()
        )
    if isinstance(node, BinOp):
        return tree_needs_order(node._left) or tree_needs_order(node._right)
    if isinstance(node, (UnaryOp, Desc)):
        return tree_needs_order(node._operand)
    if isinstance(node, (list, tuple)):
        return any(tree_needs_order(a) for a in node)
    return False


# functions that can return multiple values per group in summarise
# (reference `_MultiValueExpr`, summarise.py:61-64): the verb explodes
# their array results post-aggregation
def tree_is_multi_value(node) -> bool:
    if not isinstance(node, Call):
        return False
    if node._fname == "quantile":
        probs = node._kwargs.get("probs", node._args[1] if len(node._args) > 1 else None)
        return isinstance(probs, (list, tuple))
    # column reorderers return the whole group as an array in summarise
    if node._fname in ("sort", "order", "unique"):
        return True
    # vector set ops on a scalar column collect to a value-set array
    # (reference reframe(x=intersect(f.x, tbl)) explodes to rows)
    if node._fname in ("vec_intersect", "vec_union", "vec_setdiff"):
        return True
    # summarise(n=row_number()) numbers the group 1..n as rows
    if node._fname == "row_number" and not node._args and not node._kwargs:
        return True
    return False


# functions needing the materialized 0-based position column
# (``Tibble.ensure_pos``, distributed two-pass id assignment)
NEEDS_POS: set[str] = {"cur_group_rows"}

# functions needing the materialized dense group-id column
# (``Tibble.ensure_gid``, rank-over-distinct-keys broadcast join)
NEEDS_GID: set[str] = {"cur_group_id", "n_groups_", "n_groups"}


def tree_needs_gid(node) -> bool:
    from ..plans.expr import BinOp, Call, Desc, UnaryOp

    if isinstance(node, Call):
        if node._fname in NEEDS_GID:
            return True
        return any(tree_needs_gid(a) for a in node._args) or any(
            tree_needs_gid(v) for v in node._kwargs.values()
        )
    if isinstance(node, BinOp):
        return tree_needs_gid(node._left) or tree_needs_gid(node._right)
    if isinstance(node, (UnaryOp, Desc)):
        return tree_needs_gid(node._operand)
    return False


def tree_needs_pos(node) -> bool:
    from ..plans.expr import BinOp, Call, Desc, UnaryOp

    if isinstance(node, Call):
        if node._fname in NEEDS_POS:
            return True
        # with_order/order_by keyed by a plain list indexes the literal
        # array by frame position
        if node._fname in ("with_order", "order_by") and node._args and isinstance(
            node._args[0], (list, tuple)
        ):
            return True
        return any(tree_needs_pos(a) for a in node._args) or any(
            tree_needs_pos(v) for v in node._kwargs.values()
        )
    if isinstance(node, BinOp):
        return tree_needs_pos(node._left) or tree_needs_pos(node._right)
    if isinstance(node, (UnaryOp, Desc)):
        return tree_needs_pos(node._operand)
    return False


def builder(name: str) -> Callable:
    """User-facing callable that captures a deferred Call node — or,
    for plain list/scalar input, evaluates eagerly on the driver (the
    reference registers both dispatches; tests/base/test_verbs.py
    asserts ``sum_([1,2,3,4]) == 10``)."""
    from .eager import EAGER_IMPLS, has_deferred

    # aliases like "sum_"/"max_" share the canonical eager impl
    eager = EAGER_IMPLS.get(name) or EAGER_IMPLS.get(name.rstrip("_"))

    def build(*args: Any, **kwargs: Any) -> Any:
        if eager is not None and not has_deferred(args, kwargs):
            return eager(*args, **kwargs)
        return Call(name, args, kwargs)

    build.__name__ = name
    build.__qualname__ = name
    return build
