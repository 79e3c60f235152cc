"""across / c_across / if_any / if_all (reference ``api/dplyr/across.py``).

``across()`` is driver-side expansion: a selection × functions product
producing named expressions consumed by mutate/summarise — identical
architecture to the reference (``across.py:84-228``), no Spark
primitive involved.
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Callable

from pyspark.sql import functions as F

from ..plans.expr import Call, Expr, Ref
from .registry import register


class Across:
    def __init__(self, *args: Any, _names: str | None = None, **kwargs: Any):
        # across(selection) or across(selection, fns, *fn_args)
        self.selection = args[0] if args else None
        self.fns = args[1] if len(args) > 1 else None
        self.fn_args = args[2:]  # extra positionals forwarded to fns
        self.names_tpl = _names
        self.fn_kwargs = kwargs


def across(*args: Any, _names: str | None = None, **kwargs: Any) -> Across:
    # across(fn) with no selection applies to every non-group column
    # (reference across() default); a leading callable is a fns arg
    if args and callable(args[0]) and not hasattr(args[0], "_name"):
        from ..plans.selection import everything

        args = (everything(), *args)
    return Across(*args, _names=_names, **kwargs)


class CurColumn:
    """Marker replaced with the current column's NAME (a string literal)
    during across() expansion — reference ``api/dplyr/context.py:251-271``."""

    def __repr__(self) -> str:
        return "cur_column()"


def cur_column() -> CurColumn:
    return CurColumn()


def _sub_cur_column(node: Any, colname: str) -> Any:
    """Rebuild an expression tree with CurColumn markers replaced."""
    from ..plans.expr import BinOp, Desc, UnaryOp

    if isinstance(node, CurColumn):
        return colname
    if isinstance(node, Call):
        return Call(
            node._fname,
            tuple(_sub_cur_column(a, colname) for a in node._args),
            {k: _sub_cur_column(v, colname) for k, v in node._kwargs.items()},
        )
    if isinstance(node, BinOp):
        return BinOp(
            node._op,
            _sub_cur_column(node._left, colname),
            _sub_cur_column(node._right, colname),
        )
    if isinstance(node, UnaryOp):
        return UnaryOp(node._op, _sub_cur_column(node._operand, colname))
    if isinstance(node, Desc):
        return Desc(_sub_cur_column(node._operand, colname))
    if isinstance(node, (list, tuple)):
        return type(node)(_sub_cur_column(a, colname) for a in node)
    return node


def _has_cur_column(node: Any) -> bool:
    from ..plans.expr import BinOp, Desc, UnaryOp

    if isinstance(node, CurColumn):
        return True
    if isinstance(node, Call):
        return any(_has_cur_column(a) for a in node._args) or any(
            _has_cur_column(v) for v in node._kwargs.values()
        )
    if isinstance(node, BinOp):
        return _has_cur_column(node._left) or _has_cur_column(node._right)
    if isinstance(node, (UnaryOp, Desc)):
        return _has_cur_column(node._operand)
    if isinstance(node, (list, tuple)):
        return any(_has_cur_column(a) for a in node)
    return False


def _fn_name(fn: Any) -> str:
    return getattr(fn, "__name__", str(fn)).rstrip("_")


def _apply(fn: Any, ref: Ref, kwargs: dict, args: tuple = ()) -> Expr:
    if isinstance(fn, str):
        return Call(fn, (ref, *args), kwargs)
    return fn(ref, *args, **kwargs)


def expand_across(td, a: Across) -> list[tuple[str, Any]]:
    from ..plans.selection import resolve_selection

    sel_items = a.selection
    if sel_items is None:
        cols = td.columns
    else:
        if not isinstance(sel_items, (list, tuple)):
            sel_items = [sel_items]
        cols = resolve_selection(sel_items, td.columns, dict(td.dtypes))
    cols = [c for c in cols if c not in td.group_vars]

    if a.fns is None:
        return [(c, Ref(c)) for c in cols]

    fns: list[tuple[str, Any]]
    if isinstance(a.fns, dict):
        fns = list(a.fns.items())
        multi = True
    elif isinstance(a.fns, (list, tuple)):
        fns = [(_fn_name(fn), fn) for fn in a.fns]
        multi = True
    else:
        fns = [(_fn_name(a.fns), a.fns)]
        multi = False

    out: list[tuple[str, Any]] = []
    for c in cols:
        for fname, fn in fns:
            if a.names_tpl:
                name = a.names_tpl.format(_col=c, _fn=fname)
            elif multi:
                name = f"{c}_{fname}"
            else:
                name = c
            node = _apply(fn, Ref(c), a.fn_kwargs, a.fn_args)
            if _has_cur_column(node):
                node = _sub_cur_column(node, c)
            out.append((name, node))
    return out


@register("c_across")
def _c_across(ctx, selection=None):
    from ..plans.selection import resolve_selection

    items = selection
    if items is None:
        cols = [c for c in ctx.tibble.columns if c not in ctx.groups]
    else:
        if not isinstance(items, (list, tuple)):
            items = [items]
        cols = resolve_selection(items, ctx.tibble.columns, dict(ctx.tibble.dtypes))
    return F.array(*[F.col(c) for c in cols])


def _if_any_all(ctx, selection, fn, combine):
    from ..plans.context import eval_expr
    from ..plans.selection import resolve_selection

    items = selection if isinstance(selection, (list, tuple)) else [selection]
    cols = resolve_selection(items, ctx.tibble.columns, dict(ctx.tibble.dtypes))
    preds = []
    for c in cols:
        node = _apply(fn, Ref(c), {}) if fn is not None else Ref(c)
        col = eval_expr(node, ctx)
        preds.append(col.cast("boolean"))
    return reduce(combine, preds)


@register("if_any")
def _if_any(ctx, selection, fn=None):
    return _if_any_all(ctx, selection, fn, lambda a, b: a | b)


@register("if_all")
def _if_all(ctx, selection, fn=None):
    return _if_any_all(ctx, selection, fn, lambda a, b: a & b)
