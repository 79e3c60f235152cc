"""Expression-capture front-end (the `f` DSL).

Re-implements, from scratch and Spark-first, the expression surface the
reference gets from the external ``pipda`` library plus its evaluation
contexts (see reference ``datar_polars/contexts.py:27-83`` and
``datar_polars/operators.py:61-96``): ``f.x`` builds an unevaluated
reference; Python operators on it build expression-tree nodes; verbs
later evaluate the tree to a ``pyspark.sql.Column`` under a Context
(EVAL) or to a column *name* (SELECT).

Nothing here touches data — evaluation happens in
:mod:`datar_polars_spark.plans.context`.
"""

from __future__ import annotations

import operator as _op
from typing import Any, Callable

__all__ = [
    "Expr",
    "Ref",
    "BinOp",
    "UnaryOp",
    "Call",
    "Desc",
    "FProxy",
    "f",
    "ensure_expr",
    "collect_refs",
    "deparse",
]


class Expr:
    """Base class for unevaluated expression nodes."""

    # keep numpy from consuming our operators
    __array_ufunc__ = None

    # ---- arithmetic ----
    def __add__(self, o: Any) -> "BinOp":
        return BinOp("+", self, o)

    def __radd__(self, o: Any) -> "BinOp":
        return BinOp("+", o, self)

    def __sub__(self, o: Any) -> "BinOp":
        return BinOp("-", self, o)

    def __rsub__(self, o: Any) -> "BinOp":
        return BinOp("-", o, self)

    def __mul__(self, o: Any) -> "BinOp":
        return BinOp("*", self, o)

    def __rmul__(self, o: Any) -> "BinOp":
        return BinOp("*", o, self)

    def __truediv__(self, o: Any) -> "BinOp":
        return BinOp("/", self, o)

    def __rtruediv__(self, o: Any) -> "BinOp":
        return BinOp("/", o, self)

    def __floordiv__(self, o: Any) -> "BinOp":
        return BinOp("//", self, o)

    def __rfloordiv__(self, o: Any) -> "BinOp":
        return BinOp("//", o, self)

    def __mod__(self, o: Any) -> "BinOp":
        return BinOp("%", self, o)

    def __rmod__(self, o: Any) -> "BinOp":
        return BinOp("%", o, self)

    def __pow__(self, o: Any) -> "BinOp":
        return BinOp("**", self, o)

    def __rpow__(self, o: Any) -> "BinOp":
        return BinOp("**", o, self)

    # ---- comparison ----
    def __eq__(self, o: Any) -> "BinOp":  # type: ignore[override]
        return BinOp("==", self, o)

    def __ne__(self, o: Any) -> "BinOp":  # type: ignore[override]
        return BinOp("!=", self, o)

    def __lt__(self, o: Any) -> "BinOp":
        return BinOp("<", self, o)

    def __le__(self, o: Any) -> "BinOp":
        return BinOp("<=", self, o)

    def __gt__(self, o: Any) -> "BinOp":
        return BinOp(">", self, o)

    def __ge__(self, o: Any) -> "BinOp":
        return BinOp(">=", self, o)

    # ---- boolean ----
    def __and__(self, o: Any) -> "BinOp":
        return BinOp("&", self, o)

    def __rand__(self, o: Any) -> "BinOp":
        return BinOp("&", o, self)

    def __or__(self, o: Any) -> "BinOp":
        return BinOp("|", self, o)

    def __ror__(self, o: Any) -> "BinOp":
        return BinOp("|", o, self)

    def __invert__(self) -> "UnaryOp":
        return UnaryOp("~", self)

    def __neg__(self) -> "UnaryOp":
        return UnaryOp("-", self)

    def __pos__(self) -> "Expr":
        return self

    def __hash__(self) -> int:  # __eq__ is overloaded; keep identity hash
        return id(self)

    def __bool__(self) -> bool:
        raise TypeError(
            "An unevaluated expression has no truth value; use & / | / ~ "
            "instead of and / or / not."
        )

    def __iter__(self):
        raise TypeError("Expressions are not iterable.")

    # method-call sugar: f.x.sum() -> Call("sum", (f.x,))
    def __getattr__(self, name: str) -> "_MethodProxy":
        if name.startswith("_"):
            raise AttributeError(name)
        return _MethodProxy(self, name)


class Ref(Expr):
    """A column reference: ``f.x`` / ``f["x"]``."""

    def __init__(self, name: str):
        self._name = name

    def __repr__(self) -> str:
        return f"f.{self._name}"


class BinOp(Expr):
    def __init__(self, op: str, left: Any, right: Any):
        self._op = op
        self._left = left
        self._right = right

    def __repr__(self) -> str:
        return f"({self._left!r} {self._op} {self._right!r})"


class UnaryOp(Expr):
    def __init__(self, op: str, operand: Any):
        self._op = op
        self._operand = operand

    def __repr__(self) -> str:
        return f"{self._op}{self._operand!r}"


class Call(Expr):
    """A deferred function call resolved against the function registry."""

    def __init__(self, fname: str, args: tuple, kwargs: dict | None = None):
        self._fname = fname
        self._args = args
        self._kwargs = kwargs or {}

    def __repr__(self) -> str:
        parts = [repr(a) for a in self._args]
        parts += [f"{k}={v!r}" for k, v in self._kwargs.items()]
        return f"{self._fname}({', '.join(parts)})"


class Desc(Expr):
    """Descending sort-key marker (``desc(f.x)``)."""

    def __init__(self, operand: Any):
        self._operand = operand

    def __repr__(self) -> str:
        return f"desc({self._operand!r})"


class _MethodProxy:
    """Supports ``f.x.sum()`` by turning method access into a Call node."""

    def __init__(self, obj: Expr, name: str):
        self._obj = obj
        self._mname = name

    def __call__(self, *args: Any, **kwargs: Any) -> Call:
        return Call(self._mname, (self._obj, *args), kwargs)

    def __repr__(self) -> str:
        return f"{self._obj!r}.{self._mname}"


class RangeSel:
    """Inclusive column range ``f[f.a:f.b]`` (reference tidyselect
    ``a:b`` — both endpoints included, positional span)."""

    def __init__(self, start: Any, stop: Any):
        self.start = start
        self.stop = stop

    def __repr__(self) -> str:
        return f"f[{self.start!r}:{self.stop!r}]"


class FProxy:
    """The ``f`` symbol: attribute/item access yields column references."""

    def __getattr__(self, name: str) -> Ref:
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return Ref(name)

    def __getitem__(self, name) -> Ref:
        if isinstance(name, slice):
            return RangeSel(name.start, name.stop)
        return Ref(name)

    def __repr__(self) -> str:
        return "f"


f = FProxy()


def ensure_expr(x: Any) -> Any:
    """Literals stay literal; strings are NOT coerced to refs here."""
    return x


def collect_refs(node: Any, out: set | None = None) -> set:
    """All column names referenced anywhere in an expression tree."""
    if out is None:
        out = set()
    if isinstance(node, Ref):
        out.add(node._name)
    elif isinstance(node, BinOp):
        collect_refs(node._left, out)
        collect_refs(node._right, out)
    elif isinstance(node, UnaryOp):
        collect_refs(node._operand, out)
    elif isinstance(node, Desc):
        collect_refs(node._operand, out)
    elif isinstance(node, Call):
        for a in node._args:
            collect_refs(a, out)
        for v in node._kwargs.values():
            collect_refs(v, out)
    elif isinstance(node, (list, tuple)):
        for a in node:
            collect_refs(a, out)
    return out


def deparse(node: Any) -> str:
    """Best-effort name for an unnamed expression (auto column naming)."""
    if isinstance(node, Ref):
        return node._name
    return repr(node)


# binary-op -> python operator on Columns (Column implements these natively)
BIN_IMPL: dict[str, Callable[[Any, Any], Any]] = {
    "+": _op.add,
    "-": _op.sub,
    "*": _op.mul,
    "/": _op.truediv,
    "%": _op.mod,
    "**": _op.pow,
    "==": _op.eq,
    "!=": _op.ne,
    "<": _op.lt,
    "<=": _op.le,
    ">": _op.gt,
    ">=": _op.ge,
    "&": _op.and_,
    "|": _op.or_,
}
