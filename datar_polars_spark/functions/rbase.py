"""R-base vector constructors — driver-side list helpers.

Reference: ``api/base/seq.py`` (seq:473, seq_len:58, seq_along:39,
rep:78, rev:146, sort:297, order:378, sample:160). These build plain
Python lists for use in ``tibble()`` / ``add_column()`` / verb
parameters; the distributed analogues are ``F.sequence`` + explode
(used by ``uncount``/``full_seq``) and the window functions in
``vectors.py`` (rev/seq_along as expressions).
"""

from __future__ import annotations

import random as _random
from typing import Any, Iterable

__all__ = [
    "seq",
    "seq_len",
    "length",
    "rep",
    "rev_list",
    "sort_list",
    "order_list",
    "sample_list",
    "set_seed",
    "intersect",
    "union",
    "setdiff",
    "setequal",
    "append_",
    "make_names",
    "make_unique",
    "identity_",
]

_rng = _random.Random()


# ---- vector set operations (reference api/base/sets.py:32-240) ------------
# Dual dispatch: plain iterables -> list results on the driver; any
# expression argument -> a deferred Call compiled to the per-row array
# set ops in vectors.py (array_intersect / array_union / array_except —
# JVM-side, no shuffle).

def _any_expr(*xs: Any) -> bool:
    from ..plans.expr import Expr

    return any(isinstance(x, Expr) for x in xs)


def _defer(fname: str, x: Any, y: Any):
    from ..plans.expr import Call

    return Call(fname, (x, y), {})


def intersect(x: Any, y: Any) -> Any:
    """Unique x values also in y, in x's first-seen order."""
    if _any_expr(x, y):
        return _defer("vec_intersect", x, y)
    xl, ys = list(x), set(y)
    return sorted(set(xl) & ys, key=xl.index)


def union(x: Any, y: Any) -> Any:
    """Unique values of x then y, first-seen order."""
    if _any_expr(x, y):
        return _defer("vec_union", x, y)
    seen: set = set()
    out: list = []
    for v in list(x) + list(y):
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def setdiff(x: Any, y: Any) -> Any:
    """Values of x not in y (reference keeps x's duplicates)."""
    if _any_expr(x, y):
        return _defer("vec_setdiff", x, y)
    ys = set(y)
    return [v for v in x if v not in ys]


def setequal(x: Any, y: Any) -> Any:
    if _any_expr(x, y):
        return _defer("vec_setequal", x, y)
    return set(x) == set(y)


def append_(x: Any, values: Any, after: int | None = None) -> list:
    """Insert values into x after position `after` (R append)."""
    xl = list(x)
    vl = list(values) if isinstance(values, (list, tuple)) else [values]
    if after is None:
        after = len(xl)
    return xl[:after] + vl + xl[after:]


def set_seed(seed: int) -> None:
    _rng.seed(seed)


def seq(from_: float = 1, to: float | None = None, by: float | None = None,
        length_out: int | None = None) -> list:
    """R seq(): from/to/by or from/to/length_out (1-based inclusive)."""
    if to is None:
        from_, to = 1, from_
    if length_out is not None:
        if length_out == 1:
            return [from_]
        by = (to - from_) / (length_out - 1)
        return [from_ + i * by for i in range(length_out)]
    if by is None:
        by = 1 if to >= from_ else -1
    if by == 0:
        if to != from_:
            raise ValueError("seq: invalid '(to - from)/by' (by must be nonzero)")
        return [int(from_)] if float(from_).is_integer() else [from_]
    out, v, i = [], from_, 0
    while (by > 0 and v <= to + 1e-12) or (by < 0 and v >= to - 1e-12):
        out.append(v)
        i += 1
        v = from_ + i * by
    if all(float(x).is_integer() for x in out):
        return [int(x) for x in out]
    return out


def seq_len(n: Any) -> Any:
    """0-based like the reference (api/base/seq.py:58-72: range(0, n) —
    it deviates from R's 1..n on purpose). An expression argument
    defers to the per-row range-array compiler in vectors.py."""
    if _any_expr(n):
        from ..plans.expr import Call

        return Call("seq_len", (n,), {})
    return list(range(int(n)))


def rep(x: Any, times: int | list[int] = 1, length: int | None = None, each: int = 1) -> list:
    """R rep(): recycle a value/vector `times` times, each element
    repeated `each` times; vector `times` repeats element-wise;
    ``length`` recycles/truncates the result to that length."""
    xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
    xs = [v for v in xs for _ in range(each)]
    if isinstance(times, (list, tuple)):
        if len(times) != len(xs):
            raise ValueError("times vector must match length of x")
        out = [v for v, t in zip(xs, times) for _ in range(t)]
    else:
        out = xs * times
    if length is not None:
        while len(out) < length:
            out.extend(out[: length - len(out)])
        out = out[:length]
    return out


def length(x: Any) -> int:
    """R length(): scalars (including strings) are length-1 vectors."""
    if isinstance(x, (str, bytes)) or not hasattr(x, "__iter__"):
        return 1
    return len(list(x))


def rev_list(x: Iterable) -> list:
    return list(x)[::-1]


def sort_list(x: Iterable, decreasing: bool = False) -> list:
    xs = [v for v in x if v is not None]
    return sorted(xs, reverse=decreasing)


def order_list(x: Iterable, decreasing: bool = False) -> list[int]:
    """1-based argsort (R order())."""
    xs = list(x)
    idx = sorted(range(len(xs)), key=lambda i: (xs[i] is None, xs[i]),
                 reverse=decreasing)
    return [i + 1 for i in idx]


def sample_list(x: Iterable | int, size: int | None = None,
                replace: bool = False, seed: int | None = None) -> list:
    """R sample(): from a vector or 1..n."""
    rng = _random.Random(seed) if seed is not None else _rng
    xs = list(range(1, x + 1)) if isinstance(x, int) else list(x)
    if size is None:
        size = len(xs)
    if replace:
        return [rng.choice(xs) for _ in range(size)]
    return rng.sample(xs, size)


def make_names(names, unique: bool = False) -> list[str]:
    """R make.names: syntactically valid names — invalid chars become
    '.', names not starting with a letter/dot get an 'X' prefix
    (datar-core helper listed in the reference API audit)."""
    import re as _re

    if isinstance(names, str):
        names = [names]
    out = []
    for n in names:
        n = str(n)
        n = _re.sub(r"[^A-Za-z0-9._]", ".", n)
        if not _re.match(r"^[A-Za-z.]", n) or _re.match(r"^\.\d", n):
            n = "X" + n
        out.append(n)
    return make_unique(out) if unique else out


def make_unique(names) -> list[str]:
    """R make.unique: append .1, .2, ... to later duplicates (first
    occurrence keeps the bare name)."""
    seen: dict[str, int] = {}
    out = []
    for n in (str(x) for x in names):
        if n in seen:
            seen[n] += 1
            out.append(f"{n}.{seen[n]}")
        else:
            seen[n] = 0
            out.append(n)
    return out


def identity_(x):
    """R identity()."""
    return x
