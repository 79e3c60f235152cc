"""Eager (driver-side) factors over plain vectors.

The reference represents vector factors as polars Categorical/Enum
Series (``api/forcats.py``, ``api/base/factor.py``); in this engine
frame columns carry factor levels as tibble metadata, and THIS module
supplies the plain-vector dispatch: a ``Factor`` is a list subclass
with ``levels`` and ``ordered`` attributes, so the scalar/list forms
of factor()/as_factor()/levels()/fct_* behave like the reference's
Series forms. Frame-level behavior stays in operators/factor.py.
"""

from __future__ import annotations

import warnings
from statistics import median
from typing import Any, Callable, Iterable

__all__ = [
    "Factor",
    "factor_eager",
    "as_factor_eager",
    "as_ordered_eager",
    "levels_eager",
    "nlevels_eager",
    "droplevels_eager",
    "is_factor_eager",
    "is_ordered_eager",
]


class Factor(list):
    """Vector factor: values plus a levels vector (R semantics)."""

    def __init__(self, values: Iterable, levels: list | None = None, ordered: bool = False):
        vals = list(values)
        super().__init__(vals)
        if levels is None:
            levels = sorted({v for v in vals if v is not None})
        self.levels = list(levels)
        self.ordered = bool(ordered)

    def to_list(self) -> list:
        return list(self)

    def _replace(self, values: Iterable, levels: list) -> "Factor":
        return Factor(values, levels=levels, ordered=self.ordered)


def _as_values(x: Any) -> list:
    if isinstance(x, (list, tuple, range)):
        return list(x)
    return [x]


def factor_eager(x: Any = None, levels: list | None = None, ordered: bool = False) -> Factor:
    """R factor(): default levels are the SORTED unique values."""
    vals = [] if x is None else _as_values(x)
    return Factor(vals, levels=levels, ordered=ordered)


def as_factor_eager(x: Any) -> Factor:
    """forcats as_factor: levels in FIRST-APPEARANCE order."""
    if isinstance(x, Factor):
        return x
    vals = _as_values(x)
    seen: list = []
    for v in vals:
        if v is not None and v not in seen:
            seen.append(v)
    return Factor(vals, levels=seen)


def as_ordered_eager(x: Any) -> Factor:
    out = as_factor_eager(x)
    return Factor(list(out), levels=out.levels, ordered=True)


def levels_eager(x: Any) -> list | None:
    return list(x.levels) if isinstance(x, Factor) else None


def nlevels_eager(x: Any) -> int:
    return len(x.levels) if isinstance(x, Factor) else 0


def droplevels_eager(x: Factor) -> Factor:
    observed = {v for v in x if v is not None}
    return x._replace(list(x), [l for l in x.levels if l in observed])


def is_factor_eager(x: Any) -> bool:
    return isinstance(x, Factor)


def is_ordered_eager(x: Any) -> bool:
    return isinstance(x, Factor) and x.ordered


# ---- eager forcats subset (vector dispatch for the fct_* verbs) -----------

def fct_relevel_vec(x: Any, *first: Any, after: int = 0) -> Factor:
    fx = as_factor_eager(x)
    levels = list(fx.levels)
    if len(first) == 1 and callable(first[0]) and not isinstance(first[0], str):
        first = tuple(first[0](levels))
    unknown = [l for l in first if l not in levels]
    if unknown:
        warnings.warn(f"fct_relevel: unknown levels skipped: {unknown}")
    moved = [l for l in first if l in levels]
    rest = [l for l in levels if l not in moved]
    return fx._replace(list(fx), rest[:after] + moved + rest[after:])


def fct_reorder_vec(x: Any, by: Any, _fun: Callable = median, _desc: bool = False) -> Factor:
    fx = as_factor_eager(x)
    bys = _as_values(by)
    if len(bys) != len(fx):
        raise ValueError(
            f"fct_reorder: `x` (size {len(fx)}) and `by` (size {len(bys)}) must match"
        )
    stats: dict = {}
    for v, b in zip(fx, bys):
        if v is not None:
            stats.setdefault(v, []).append(b)
    order = sorted(stats, key=lambda l: _fun(stats[l]), reverse=_desc)
    order += [l for l in fx.levels if l not in order]
    return fx._replace(list(fx), order)


def fct_rev_vec(x: Any) -> Factor:
    fx = as_factor_eager(x)
    return fx._replace(list(fx), list(reversed(fx.levels)))


def fct_relabel_vec(x: Any, fn: Any, *args: Any, **kwargs: Any) -> Factor:
    if not callable(fn):
        raise TypeError("fct_relabel: `fn` must be callable")
    fx = as_factor_eager(x)
    new_levels = list(fn(list(fx.levels), *args, **kwargs))
    mapping = dict(zip(fx.levels, new_levels))
    vals = [mapping.get(v, v) for v in fx]
    return fx._replace(vals, new_levels)


def fct_drop_vec(x: Any) -> Factor:
    return droplevels_eager(as_factor_eager(x))


def fct_c_vec(*factors: Any) -> Factor:
    vals: list = []
    levels: list = []
    for fa in factors:
        fx = as_factor_eager(fa)
        vals.extend(fx)
        for l in fx.levels:
            if l not in levels:
                levels.append(l)
    return Factor(vals, levels=levels)


def fct_cross_vec(*xs: Any, sep: str = ":") -> Factor:
    fs = [as_factor_eager(x) for x in xs]
    if len({len(fx) for fx in fs}) > 1:
        raise ValueError("fct_cross: inputs must have the same length")
    vals = [
        None if any(v is None for v in row) else sep.join(str(v) for v in row)
        for row in zip(*fs)
    ]
    seen: list = []
    for v in vals:
        if v is not None and v not in seen:
            seen.append(v)
    return Factor(vals, levels=seen)
