"""Expression evaluation contexts.

Mirrors the reference's Context.EVAL / Context.SELECT split
(``datar_polars/contexts.py:47-91``) but resolves references to
``pyspark.sql.functions.col`` instead of ``pl.col``, and compiles
aggregate sub-expressions either to plain aggregates (summarise) or to
window aggregates ``.over(Window.partitionBy(*groups))`` (mutate /
filter on a grouped tibble) — the Spark analogue of Polars'
``.over(gvars)`` rewrite at reference ``filter_.py:68-71``.
"""

from __future__ import annotations

from typing import Any, TYPE_CHECKING

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

from .expr import BIN_IMPL, BinOp, Call, Desc, Expr, Ref, UnaryOp

if TYPE_CHECKING:
    from ..tibble import Tibble

ORDER_COL = "__datar_ro__"


class EvalContext:
    """Carries the tibble + mode through one expression evaluation.

    mode:
      * ``"eval"``  — mutate/filter/arrange: aggregates become window
        aggregates over the group partition.
      * ``"agg"``   — summarise: aggregates stay plain aggregates.
    """

    def __init__(self, tibble: "Tibble", mode: str = "eval"):
        self.tibble = tibble
        self.mode = mode
        self.groups: tuple[str, ...] = tuple(tibble.group_vars)
        self.rowwise: bool = tibble.rowwise
        # names created earlier in the same mutate/summarise (sequential refs)
        self.local_names: dict[str, Column] = {}
        # with_order(): replaces the default frame-order window key
        self.order_override: Column | None = None

    # ---- resolution helpers -------------------------------------------
    def eval(self, node: Any) -> Any:
        """Evaluate a node; literals pass through unchanged."""
        return eval_expr(node, self)

    def col(self, node: Any) -> Column:
        """Evaluate and force the result to be a Column."""
        out = eval_expr(node, self)
        if isinstance(out, Column):
            return out
        return F.lit(out)

    # ---- window plumbing ----------------------------------------------
    def partition(self) -> WindowSpec:
        """Group partition window (unordered, whole-partition frame)."""
        if self.groups:
            return Window.partitionBy(*self.groups)
        return Window.partitionBy()

    def ordered(self, order_by: Any = None, desc: bool = False) -> WindowSpec:
        """Group partition ordered by frame order (or an explicit key)."""
        if order_by is not None:
            key = self.col(order_by)
            key = key.desc() if desc else key.asc()
        elif self.order_override is not None:
            key = self.order_override
        else:
            key = F.col(ORDER_COL).asc()
        return self.partition().orderBy(key)

    def cumulative(self, order_by: Any = None) -> WindowSpec:
        return self.ordered(order_by).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )

    def agg(self, aggregated: Column) -> Column:
        """Wrap an aggregate for the current mode (plain vs window)."""
        if self.mode == "agg":
            return aggregated
        return aggregated.over(self.partition())


def eval_expr(node: Any, ctx: EvalContext) -> Any:
    if isinstance(node, Ref):
        name = node._name
        if name in ctx.local_names:
            return ctx.local_names[name]
        return F.col(name)
    if isinstance(node, BinOp):
        left = eval_expr(node._left, ctx)
        right = eval_expr(node._right, ctx)
        if node._op == "//":
            return F.floor(_as_col(left) / _as_col(right)).cast("long")
        if node._op in ("&", "|") and not isinstance(left, Column) and not isinstance(right, Column):
            return BIN_IMPL[node._op](bool(left), bool(right))
        if not isinstance(left, Column) and not isinstance(right, Column):
            return BIN_IMPL[node._op](left, right)
        return BIN_IMPL[node._op](left, right)
    if isinstance(node, UnaryOp):
        val = eval_expr(node._operand, ctx)
        if node._op == "~":
            return ~_as_col(val) if isinstance(val, Column) else (not val)
        return -val
    if isinstance(node, Call):
        from ..functions.registry import dispatch

        return dispatch(node._fname, ctx, node._args, node._kwargs)
    if isinstance(node, Desc):
        inner = eval_expr(node._operand, ctx)
        return _as_col(inner).desc()
    return node  # plain literal (int/str/list/Column/...)


def _as_col(x: Any) -> Column:
    return x if isinstance(x, Column) else F.lit(x)
