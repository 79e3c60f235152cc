"""Tidy-selection algebra (reference ``collections.py`` +
``api/dplyr/tidyselect.py:39-261``).

Pure driver-side logic over ``Tibble.columns`` — resolving a selection
never runs a Spark job. Supports names, ``f.x`` refs, 1-based/negative
ints, ``~x`` / ``-x`` exclusion, ``c_(...)`` collections, and the
tidyselect helper predicates.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Iterable

from .expr import Call, Expr, RangeSel, Ref, UnaryOp

__all__ = [
    "resolve_selection",
    "c_",
    "starts_with",
    "ends_with",
    "contains",
    "matches",
    "everything",
    "last_col",
    "all_of",
    "any_of",
    "num_range",
    "where",
]


class SelectHelper:
    def __init__(self, fn: Callable[[list[str], dict[str, str]], list[str]], label: str):
        self._fn = fn
        self._label = label

    def resolve(self, columns: list[str], dtypes: dict[str, str]) -> list[str]:
        return self._fn(columns, dtypes)

    def __invert__(self) -> "_Excluded":
        return _Excluded(self)

    def __and__(self, other: "SelectHelper") -> "SelectHelper":
        """Intersection of two helpers, in frame column order
        (reference: select(ends_with("t") & starts_with("h")))."""
        return SelectHelper(
            lambda cols, dt: [
                c
                for c in self._fn(cols, dt)
                if c in set(other._fn(cols, dt))
            ],
            f"({self._label} & {other._label})",
        )

    def __or__(self, other: "SelectHelper") -> "SelectHelper":
        def fn(cols, dt):
            a = self._fn(cols, dt)
            b = [c for c in other._fn(cols, dt) if c not in set(a)]
            return a + b

        return SelectHelper(fn, f"({self._label} | {other._label})")

    def __repr__(self) -> str:
        return self._label


class _Excluded:
    def __init__(self, item: Any):
        self.item = item


class Collection(list):
    """R-style ``c(...)`` of selection items (reference
    ``datar_polars/collections.py``). Two construction forms:

    * legacy/engine form — ``Collection(items)`` with one iterable:
      the items become the elements verbatim (used by ``c_``);
    * reference form — ``Collection(*items, pool=...)``: when a pool
      (name list or int size) is given, elements resolve to 0-based
      pool indices eagerly; anything that doesn't resolve lands in
      ``.unmatched`` instead of raising (select reports them later).
    """

    def __init__(self, *args: Any, pool: Any = None):
        self.pool = pool
        self.unmatched: set = set()
        if (
            pool is None
            and len(args) == 1
            and isinstance(args[0], (list, tuple, range))
        ):
            list.__init__(self, list(args[0]))
            return
        elems = _flatten_items(args)
        if pool is None:
            list.__init__(self, elems)
            return
        list.__init__(self, self._resolve(elems, pool))

    def __invert__(self) -> "SelectHelper":
        """``~c_(f.a, f.b)``: exclude these columns (combinable with
        helpers, e.g. ``where(is_double) & ~c_(f.x)``)."""
        names = []
        for it in self:
            names.append(it._name if isinstance(it, Ref) else str(it))
        return SelectHelper(
            lambda cols, dt: [c for c in cols if c not in names],
            f"~c_({names})",
        )

    def _resolve(self, elems: list, pool: Any) -> list[int]:
        names = None if isinstance(pool, int) else list(pool)
        size = pool if isinstance(pool, int) else len(names)
        out: list[int] = []
        for e in elems:
            if isinstance(e, int) and not isinstance(e, bool):
                if 0 <= e < size:
                    out.append(e)
                else:
                    self.unmatched.add(e)
            elif names is not None and e in names:
                out.append(names.index(e))
            else:
                self.unmatched.add(e)
        return out


def _flatten_items(args) -> list:
    out: list = []
    for a in args:
        if a is None:
            continue
        if isinstance(a, (Collection, list, tuple, range)):
            out.extend(_flatten_items(list(a)))
        else:
            out.append(a)
    return out


class Negated(Collection):
    """``-x`` selection (reference collections.Negated): with a pool,
    the complement of the resolved elements; without one, numeric
    negation of each element (deferred until a pool is known)."""

    def __init__(self, *args: Any, pool: Any = None):
        if pool is None:
            list.__init__(self, [-e for e in _flatten_items(args)])
            self.pool = None
            self.unmatched = set()
            return
        base = Collection(*args, pool=pool)
        self.pool = pool
        self.unmatched = base.unmatched
        size = pool if isinstance(pool, int) else len(list(pool))
        keep = set(base)
        list.__init__(self, [i for i in range(size) if i not in keep])


class Inverted(Collection):
    """``~x`` selection: complement against the pool; identity until a
    pool is known (reference collections.Inverted)."""

    def __init__(self, *args: Any, pool: Any = None):
        if pool is None:
            list.__init__(self, _flatten_items(args))
            self.pool = None
            self.unmatched = set()
            return
        base = Collection(*args, pool=pool)
        self.pool = pool
        self.unmatched = base.unmatched
        size = pool if isinstance(pool, int) else len(list(pool))
        keep = set(base)
        list.__init__(self, [i for i in range(size) if i not in keep])


class Intersect(Collection):
    """Intersection of sub-collections (reference
    collections.Intersect); ``expand()`` resolves against the pool."""

    def __init__(self, *args: Any, pool: Any = None):
        self._parts = [list(a) if isinstance(a, (list, tuple, range)) else [a] for a in args]
        self.pool = pool
        self.unmatched = set()
        list.__init__(self, [])

    def expand(self, pool: Any = None) -> "Intersect":
        pool = self.pool if pool is None else pool
        resolved = [Collection(*p, pool=pool) for p in self._parts]
        if not resolved:
            return self
        common = list(resolved[0])
        for r in resolved[1:]:
            keep = set(r)
            common = [i for i in common if i in keep]
        list.__init__(self, common)
        return self


class _CBuilder:
    """``c_(...)`` collection constructor that also supports the
    reference's subscript form (plugin hook ``c_getitem``,
    reference plugin.py: ``c[f.a:f.b]`` -> Collection / range
    selection): slices become RangeSel (both endpoints inclusive,
    like tidyselect ``a:b``), plain keys become one-item
    collections."""

    def __call__(self, *items: Any) -> Collection:
        return Collection(items)

    def __getitem__(self, key: Any):
        from .expr import RangeSel

        if isinstance(key, slice):
            return RangeSel(key.start, key.stop)
        if isinstance(key, tuple):
            return Collection(key)
        return Collection([key])


c_ = _CBuilder()


def starts_with(prefix: str) -> SelectHelper:
    # tidyselect matches case-insensitively (reference
    # tests/dplyr/test_tidyselect.py: "Abc"/"abd" both match "ab")
    p = prefix.lower()
    return SelectHelper(
        lambda cols, dt: [c for c in cols if c.lower().startswith(p)],
        f"starts_with({prefix!r})",
    )


def ends_with(suffix: str) -> SelectHelper:
    s = suffix.lower()
    return SelectHelper(
        lambda cols, dt: [c for c in cols if c.lower().endswith(s)],
        f"ends_with({suffix!r})",
    )


def contains(needle: str) -> SelectHelper:
    n = needle.lower()
    return SelectHelper(
        lambda cols, dt: [c for c in cols if n in c.lower()], f"contains({needle!r})"
    )


def matches(pattern: str) -> SelectHelper:
    rx = re.compile(pattern)
    return SelectHelper(
        lambda cols, dt: [c for c in cols if rx.search(c)], f"matches({pattern!r})"
    )


def everything() -> SelectHelper:
    return SelectHelper(lambda cols, dt: list(cols), "everything()")


def last_col(offset: int = 0) -> SelectHelper:
    return SelectHelper(lambda cols, dt: [cols[-1 - offset]], f"last_col({offset})")


def all_of(names: Iterable[str]) -> SelectHelper:
    names = list(names)

    def fn(cols, dt):
        missing = [n for n in names if n not in cols]
        if missing:
            raise KeyError(f"all_of: columns not found: {missing}")
        return list(names)

    return SelectHelper(fn, f"all_of({names!r})")


def any_of(names: Iterable[str]) -> SelectHelper:
    names = list(names)
    return SelectHelper(
        lambda cols, dt: [n for n in names if n in cols], f"any_of({names!r})"
    )


def num_range(prefix: str, range_: Iterable[int] | int, width: int = 0) -> list[str]:
    """Plain name list, 0-based for an int count, like the reference
    (api/dplyr/tidyselect.py:215-226). Inside select() the list resolves
    through the normal string path (unknown names raise there)."""
    if isinstance(range_, int):
        range_ = range(range_)
    return [f"{prefix}{str(i).zfill(width)}" for i in range_]


_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


# the datar type-predicate builders (functions.is_double etc.) dispatch
# on VALUES, not dtype strings — map them by name so where(is_double)
# works with either import (reference tests pass datar.base predicates)
_DTYPE_PREDS = {
    "is_numeric": lambda t: t.split("(")[0] in _NUMERIC,
    "is_double": lambda t: t in ("double", "float"),
    "is_integer": lambda t: t in ("tinyint", "smallint", "int", "bigint"),
    "is_character": lambda t: t == "string",
    "is_string": lambda t: t == "string",
    "is_logical": lambda t: t == "boolean",
    "is_bool": lambda t: t == "boolean",
}


def where(pred) -> SelectHelper:
    """``where(is_numeric)`` etc: predicate over (name, dtype)."""
    named = _DTYPE_PREDS.get(getattr(pred, "__name__", ""))

    def fn(cols, dt):
        out = []
        for c in cols:
            t = dt.get(c, "")
            if named is not None:
                keep = named(t)
            elif callable(pred):
                try:
                    keep = pred(t)
                except TypeError:
                    keep = pred(c, t)
            else:
                keep = False
            if keep:
                out.append(c)
        return out

    return SelectHelper(fn, "where(...)")


def is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC


def is_character(dtype: str) -> bool:
    return dtype == "string"


def _expand(item: Any, columns: list[str], dtypes: dict[str, str]) -> tuple[list[str], bool]:
    """Returns (names, excluded)."""
    if isinstance(item, _Excluded):
        names, _ = _expand(item.item, columns, dtypes)
        return names, True
    if isinstance(item, UnaryOp) and item._op in ("~", "-"):
        names, _ = _expand(item._operand, columns, dtypes)
        return names, True
    if isinstance(item, Ref):
        return [item._name], False
    if isinstance(item, str):
        return [item], False
    if item is None:
        # reference vars_select: NULL args are silently skipped
        return [], False
    if isinstance(item, bool):
        raise TypeError("boolean is not a valid column selection")
    if isinstance(item, int):
        if item < 0:
            return [columns[(-item) - 1]], True  # R: -k excludes position k
        return [columns[item - 1]], False  # R 1-based
    if isinstance(item, RangeSel):
        def _pos(endpoint, default):
            if endpoint is None:
                return default
            name = endpoint._name if isinstance(endpoint, Ref) else str(endpoint)
            if name not in columns:
                raise KeyError(f"columns not found: ['{name}']")
            return columns.index(name)
        lo = _pos(item.start, 0)
        hi = _pos(item.stop, len(columns) - 1)
        return columns[lo : hi + 1], False
    if isinstance(item, SelectHelper):
        return item.resolve(columns, dtypes), False
    if isinstance(item, (Collection, list, tuple)):
        out: list[str] = []
        excl = False
        for sub in item:
            names, ex = _expand(sub, columns, dtypes)
            excl = excl or ex
            out.extend(names)
        return out, excl
    if isinstance(item, Call) and item._fname in ("starts_with", "ends_with", "contains", "matches"):
        # allow the function-registry names to double as helpers
        helper = globals()[item._fname](*item._args, **item._kwargs)
        return helper.resolve(columns, dtypes), False
    raise TypeError(f"cannot use {item!r} as a column selection")


def resolve_selection(
    items: Iterable[Any], columns: list[str], dtypes: dict[str, str] | None = None
) -> list[str]:
    dtypes = dtypes or {}
    include: list[str] = []
    exclude: list[str] = []
    saw_include = False
    for item in items:
        names, excluded = _expand(item, columns, dtypes)
        if excluded:
            exclude.extend(names)
        else:
            saw_include = True
            for n in names:
                if n not in include:
                    include.append(n)
    if not saw_include:
        include = [c for c in columns if c not in exclude]
    else:
        include = [c for c in include if c not in exclude]
    unknown = [c for c in include if c not in columns]
    if unknown:
        raise KeyError(f"columns not found: {unknown}")
    return include


# ---------------------------------------------------------------------------
# compat helpers mirroring the reference's internal selection utilities
# (datar_polars/utils.py: vars_select / name_of / is_scalar) — exposed so
# user code ported from the reference keeps working; the engine's own
# verbs use resolve_selection above.
# ---------------------------------------------------------------------------

def vars_select(cols: list, *args: Any, raise_nonexists: bool = True) -> list[int]:
    """0-based indices of the selected columns (reference semantics:
    strings/Refs match by name, ints are positions, None is skipped;
    duplicate pool names error; unknown names raise KeyError unless
    raise_nonexists=False)."""
    if len(set(cols)) != len(cols):
        raise ValueError("Names must be unique")
    out: list[int] = []
    for a in args:
        if a is None:
            continue
        if isinstance(a, int) and not isinstance(a, bool):
            if 0 <= a < len(cols):
                out.append(a)
            elif raise_nonexists:
                raise KeyError(f"index out of range: {a}")
            continue
        name = a._name if isinstance(a, Ref) else str(a)
        if name in cols:
            out.append(cols.index(name))
        elif raise_nonexists:
            raise KeyError(f"columns not found: ['{name}']")
    return out


def name_of(x: Any) -> str | None:
    """Best-effort display name of a selection item. Our named-series
    analogue is a one-entry dict ({name: values}); unnamed vectors
    (plain lists) have no name, like an unnamed pl.Series."""
    if isinstance(x, Ref):
        return x._name
    if x is None:
        return None
    if isinstance(x, dict) and len(x) == 1:
        return next(iter(x))
    if isinstance(x, (list, tuple, range)):
        return None
    return str(x)


def is_scalar(x: Any) -> bool:
    """Reference is_scalar: non-iterables (plus strings/bytes) are
    scalar; an empty list counts as scalar, like numpy.isscalar-adjacent
    reference behavior."""
    if isinstance(x, (str, bytes)):
        return True
    if isinstance(x, (list, tuple, set, range)):
        return len(list(x)) == 0
    try:
        iter(x)
    except TypeError:
        return True
    return False
