"""Eager scalar/list dispatch for numeric functions.

The reference registers every base function for BOTH ``pl.Expr`` and
plain objects (e.g. ``api/base/verbs.py``: ``sum_([1,2,3]) == 6``,
exercised by ``tests/base/test_verbs.py``). Our builders normally
return deferred Call nodes; this module supplies driver-side Python
implementations used by ``builder()`` when NO argument contains a
deferred expression — so ``sum_(f.x)`` still compiles to a Spark
aggregate while ``sum_([1, 2, 3])`` returns ``6`` immediately.
"""

from __future__ import annotations

import cmath as _cmath
import math
import statistics
from typing import Any, Callable, Iterable


def _eager_mod(x, y=None):
    """2-arg: remainder. 1-arg: R Mod — absolute value / complex
    magnitude (reference api/base/arithm.py:176-189)."""
    if y is None:
        return _unary(abs)(x)
    return _unary(lambda v: v % y)(x)


def _eager_as_complex(x):
    def one(v):
        try:
            return complex(v)
        except (TypeError, ValueError):
            return None

    return _unary(one)(x)

__all__ = ["EAGER_IMPLS", "has_deferred"]


def has_deferred(args: tuple, kwargs: dict) -> bool:
    from ..plans.expr import Expr

    def walk(x: Any) -> bool:
        if isinstance(x, Expr):
            return True
        if isinstance(x, (list, tuple, set)):
            return any(walk(v) for v in x)
        if isinstance(x, dict):
            return any(walk(v) for v in x.values())
        return False

    return walk(args) or walk(kwargs)


def _vals(x: Any, na_rm: bool) -> list | None:
    """Flatten to a list of values; None result means the NA answer."""
    xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
    clean = [v for v in xs if v is not None and not (isinstance(v, float) and math.isnan(v))]
    if len(clean) != len(xs) and not na_rm:
        return None
    return clean


def _agg(fn: Callable[[list], Any]):
    def run(x: Any, na_rm: bool = False):
        vs = _vals(x, na_rm)
        return None if vs is None else fn(vs)

    return run


def _unary(fn: Callable[[Any], Any]):
    def run(x: Any):
        if isinstance(x, (list, tuple, range)):
            return [None if v is None else fn(v) for v in x]
        return None if x is None else fn(x)

    return run


def _prod(vs: Iterable) -> float:
    out = 1
    for v in vs:
        out *= v
    return out


def _round(x: Any, digits: int = 0):
    return _unary(lambda v: round(v + 0.0, digits))(x)


def _log(x: Any, base: float = math.e):
    return _unary(lambda v: math.log(v, base))(x)


def _signif(x: Any, digits: int = 6):
    def one(v: float) -> float:
        if v == 0:
            return 0.0
        return round(v, -int(math.floor(math.log10(abs(v)))) + (digits - 1))

    return _unary(one)(x)


EAGER_IMPLS: dict[str, Callable] = {
    "sum": _agg(sum),
    "mean": _agg(statistics.fmean),
    "median": _agg(statistics.median),
    "min": _agg(min),
    "max": _agg(max),
    "prod": _agg(_prod),
    "sd": _agg(lambda vs: statistics.stdev(vs) if len(vs) > 1 else None),
    "var": _agg(lambda vs: statistics.variance(vs) if len(vs) > 1 else None),
    "abs": _unary(abs),
    "sqrt": _unary(math.sqrt),
    "exp": _unary(math.exp),
    "expm1": _unary(math.expm1),
    "log1p": _unary(math.log1p),
    "log": _log,
    "log2": _unary(math.log2),
    "log10": _unary(math.log10),
    "floor": _unary(lambda v: float(math.floor(v))),
    "ceiling": _unary(lambda v: float(math.ceil(v))),
    "trunc": _unary(lambda v: float(math.trunc(v))),
    "sign": _unary(lambda v: float((v > 0) - (v < 0))),
    "round": _round,
    "signif": _signif,
}


# ---- conditional / positional scalar dispatch (reference
# tests/base/test_funs.py, tests/dplyr/test_funs.py) ----------------------

def _if_else(condition, true, false, missing=None):
    """Vectorized over list/tuple/range inputs (reference
    tests/dplyr/test_if_else.py): NA conditions yield ``missing``,
    branch vectors must match the condition length (length-1 recycles,
    like dplyr's size-checking)."""
    if isinstance(condition, (list, tuple, range)):
        conds = list(condition)
        n = len(conds)

        def _branch(v, name):
            if isinstance(v, (list, tuple, range)):
                vals = list(v)
                if len(vals) == 1:
                    return vals * n
                if len(vals) != n:
                    raise ValueError(
                        f"if_else: `{name}` must be size {n} or 1, "
                        f"not {len(vals)}"
                    )
                return vals
            return [v] * n

        tv = _branch(true, "true")
        fv = _branch(false, "false")
        mv = _branch(missing, "missing")
        return [
            (mv[i] if c is None else (tv[i] if c else fv[i]))
            for i, c in enumerate(conds)
        ]
    if condition is None:
        return missing
    return true if condition else false


def _eager_random(draw):
    """Eager R random generators over an explicit n (reference
    api/base/random.py object dispatch: rnorm(100) -> 100 draws)."""

    name = draw.__name__.replace("_draw_", "")

    def run(n=None, *args, seed=None, **kwargs):
        import random as _random

        if n is None:
            kw = dict(kwargs)
            if seed is not None:
                kw["seed"] = seed
            return _no_x(name, **kw)
        if seed is not None:
            rng = _random.Random(seed)
        else:
            # set_seed() threads through the shared module RNG
            from .rbase import _rng as rng
        return [draw(rng, *args, **kwargs) for _ in range(int(n))]

    return run


def _draw_rnorm(rng, mean=0.0, sd=1.0):
    return rng.gauss(mean, sd)


def _draw_runif(rng, min=0.0, max=1.0):
    return rng.uniform(min, max)


def _draw_rexp(rng, rate=1.0):
    return rng.expovariate(rate)


def _draw_rpois(rng, lambda_=1.0):
    # Knuth's method — lambda is small in test usage
    import math as _m

    L = _m.exp(-lambda_)
    k, p = 0, 1.0
    while True:
        p *= rng.random()
        if p <= L:
            return k
        k += 1


def _draw_rbinom(rng, size=1, prob=0.5):
    return sum(1 for _ in range(int(size)) if rng.random() < prob)


def _draw_rcauchy(rng, location=0.0, scale=1.0):
    import math as _m

    return location + scale * _m.tan(_m.pi * (rng.random() - 0.5))


def _draw_rchisq(rng, df=1.0):
    return sum(rng.gauss(0.0, 1.0) ** 2 for _ in range(int(df)))


def _no_x(name, **kw):
    """Frame-order form (no x): fall back to the deferred Call node."""
    from .registry import Call

    return Call(name, (), kw)


def _which_extreme(x, *, is_max: bool):
    """1-based index of the min/max, NA/NaN skipped; None when nothing
    survives the filter (R returns integer(0)). First occurrence wins
    ties, and string vectors work (no unary minus on values)."""
    xs = x if isinstance(x, (list, tuple, range)) else [x]
    ok = [
        (v, i + 1)
        for i, v in enumerate(xs)
        if v is not None and not (isinstance(v, float) and math.isnan(v))
    ]
    if not ok:
        return None
    if is_max:
        return max(ok, key=lambda p: (p[0], -p[1]))[1]
    return min(ok, key=lambda p: (p[0], p[1]))[1]


def _eager_rank_method(method):
    """dplyr vector ranks: NA -> None, ties per method."""

    def run(x):
        xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
        ok = [
            (v, i)
            for i, v in enumerate(xs)
            if v is not None and not (isinstance(v, float) and math.isnan(v))
        ]
        n = len(ok)
        out = [None] * len(xs)
        by_val = sorted(ok)
        if method == "dense":
            seen = {}
            for v, i in by_val:
                if v not in seen:
                    seen[v] = len(seen) + 1
            for v, i in ok:
                out[i] = seen[v]
            return out
        # min rank of each value
        minrank = {}
        for pos, (v, i) in enumerate(by_val):
            minrank.setdefault(v, pos + 1)
        if method == "min":
            for v, i in ok:
                out[i] = minrank[v]
            return out
        if method == "first":
            for pos, (v, i) in enumerate(by_val):
                out[i] = pos + 1
            return out
        if method == "percent":
            for v, i in ok:
                out[i] = (minrank[v] - 1) / (n - 1) if n > 1 else None
            return out
        if method == "cume":
            import collections

            counts = collections.Counter(v for v, _ in ok)
            cum = {}
            acc = 0
            for v in sorted(counts):
                acc += counts[v]
                cum[v] = acc
            for v, i in ok:
                out[i] = cum[v] / n
            return out
        raise ValueError(method)

    return run


def _eager_ntile(x, n=1):
    xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
    ranks = _eager_rank_method("first")(xs)
    n_ok = sum(1 for r in ranks if r is not None)
    if n_ok == 0:
        return [None] * len(xs)
    base, rem = divmod(n_ok, int(n))
    cut = rem * (base + 1)
    out = []
    for r in ranks:
        if r is None:
            out.append(None)
        elif base == 0 or r <= cut:
            out.append((r - 1) // (base + 1) + 1)
        else:
            out.append(rem + (r - cut - 1) // base + 1)
    return out


def _shift_eager(is_lead):
    """Eager lead/lag over plain vectors (reference
    tests/dplyr/test_lead_lag.py): scalars become length-1 vectors,
    out-of-range positions take ``default``."""

    def run(x, n=1, default=None, order_by=None):
        if isinstance(n, bool) or not isinstance(n, int):
            raise ValueError("`n` must be a nonnegative integer scalar")
        xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
        m = len(xs)
        if is_lead:
            return [xs[i + n] if i + n < m else default for i in range(m)]
        return [xs[i - n] if i - n >= 0 else default for i in range(m)]

    return run


def _case_when_eager(*args):
    """Eager case_when over plain vectors (reference
    tests/dplyr/test_if_else.py): flat (cond, value) pairs, first
    match wins, NA conditions don't match, unmatched yields None."""
    if len(args) < 2:
        raise TypeError("case_when requires at least one condition/value pair")
    if len(args) % 2:
        raise ValueError("case_when arguments must be paired")
    pairs = list(zip(args[::2], args[1::2]))
    vec_lens = [
        len(a)
        for a in args
        if isinstance(a, (list, tuple, range))
    ]
    n = max(vec_lens) if vec_lens else 1
    def _vec(v):
        if isinstance(v, (list, tuple, range)):
            vals = list(v)
            return vals * n if len(vals) == 1 and n > 1 else vals
        return [v] * n
    out = [None] * n
    decided = [False] * n
    for cond, val in pairs:
        cv, vv = _vec(cond), _vec(val)
        for i in range(n):
            if not decided[i] and i < len(cv) and cv[i]:
                out[i] = vv[i] if i < len(vv) else None
                decided[i] = True
    return out


def _case_match_eager(*args, _default=None, _dtypes=None):
    """Eager case_match (reference tests/dplyr/test_if_else.py):
    x matched against 'from' sets, position-wise 'to' values,
    _default fallback, optional _dtypes cast."""
    if len(args) < 3:
        raise ValueError("case_match requires x and at least one from/to pair")
    if (len(args) - 1) % 2:
        raise ValueError("case_match from/to arguments must be paired")
    x = args[0]
    scalar_in = not isinstance(x, (list, tuple, range))
    xs = [x] if scalar_in else list(x)
    n = len(xs)
    def _vec(v):
        if isinstance(v, (list, tuple, range)):
            vals = list(v)
            return vals * n if len(vals) == 1 and n > 1 else vals
        return [v] * n
    dv = _vec(_default)
    out = list(dv[:n]) if len(dv) >= n else dv + [None] * (n - len(dv))
    decided = [False] * n
    for frm, to in zip(args[1::2], args[2::2]):
        fset = list(frm) if isinstance(frm, (list, tuple, range)) else [frm]
        tv = _vec(to)
        for i, v in enumerate(xs):
            if not decided[i] and v in fset:
                out[i] = tv[i] if i < len(tv) else None
                decided[i] = True
    if _dtypes is not None:
        out = [None if v is None else _dtypes(v) for v in out]
    return out


def _coalesce(*args):
    """Elementwise when any argument is a vector (R semantics:
    coalesce(c(NA,1), 1) == c(1,1)); scalar first-non-null otherwise."""
    if any(isinstance(a, (list, tuple, range)) for a in args):
        n = max(len(a) for a in args if isinstance(a, (list, tuple, range)))
        cols = [
            list(a) if isinstance(a, (list, tuple, range)) else [a] * n
            for a in args
        ]
        return [
            next((c[i] for c in cols if c[i] is not None), None) for i in range(n)
        ]
    for a in args:
        if a is not None:
            return a
    return None


def _na_if(x, y):
    if isinstance(x, (list, tuple, range)):
        xs = list(x)
        ys = list(y) if isinstance(y, (list, tuple, range)) else [y] * len(xs)
        return [None if a == b else a for a, b in zip(xs, ys)]
    return None if x == y else x


def _nth_scalar(x, n, order_by=None, default=None):
    xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
    if order_by is not None:
        xs = [v for _, v in sorted(zip(list(order_by), xs), key=lambda p: p[0])]
    n = int(n)
    if -len(xs) <= n < len(xs):
        return xs[n]
    return default


def _first_scalar(x, order_by=None, default=None, na_rm: bool = False):
    return _nth_scalar(x, 0, order_by, default)


def _last_scalar(x, order_by=None, default=None, na_rm: bool = False):
    return _nth_scalar(x, -1, order_by, default)


def _between(x, left, right, inclusive: str = "both"):
    def one(v):
        if v is None:
            return None
        lo = v >= left if inclusive in ("both", "left") else v > left
        hi = v <= right if inclusive in ("both", "right") else v < right
        return bool(lo and hi)

    if isinstance(x, (list, tuple, range)):
        return [one(v) for v in x]
    return one(x)


def _seq_along(x=None):
    if x is None:
        # bare seq_along() inside a verb == row counter: stay deferred
        from ..plans.expr import Call

        return Call("seq_along", (), {})
    if isinstance(x, (str, bytes)) or not hasattr(x, "__iter__"):
        return [1]
    return list(range(1, len(list(x)) + 1))


EAGER_IMPLS.update(
    {
        "seq_along": _seq_along,
        # R rev: vectors reverse, scalars pass through (reference
        # tests/base/test_seq.py::test_rev_scalar)
        "rev": lambda x: (
            list(reversed(x)) if isinstance(x, (list, tuple, range)) else x
        ),
        "if_else": _if_else,
        "ifelse": _if_else,
        "case_when": _case_when_eager,
        # R which family over plain vectors (reference
        # tests/base/test_which.py; 1-based, NAs/falsy skipped). The
        # table-level forms are the which_/which_min_/which_max_ verbs.
        "which": lambda x: [
            i + 1
            for i, v in enumerate(
                x if isinstance(x, (list, tuple, range)) else [x]
            )
            if v
        ],
        # guard on the FILTERED pairs being non-empty (an all-NaN input
        # passes an is-not-None check but leaves min() an empty sequence
        # — round-2 ADVICE); which_max keys on value with a negated
        # index tiebreak instead of negating v, so strings work too
        "which_min": lambda x: _which_extreme(x, is_max=False),
        "which_max": lambda x: _which_extreme(x, is_max=True),
        "lead": _shift_eager(True),
        "lag": _shift_eager(False),
        # eager rank family over plain vectors (reference
        # tests/dplyr/test_rank.py; NA ranks as None, like dplyr)
        # row_number()/ntile() with NO x are frame-order ops -> deferred
        "row_number": lambda x=None: (
            _eager_rank_method("first")(x) if x is not None else _no_x("row_number")
        ),
        "min_rank": _eager_rank_method("min"),
        "dense_rank": _eager_rank_method("dense"),
        "percent_rank": _eager_rank_method("percent"),
        "cume_dist": _eager_rank_method("cume"),
        "rnorm": _eager_random(_draw_rnorm),
        "runif": _eager_random(_draw_runif),
        "rexp": _eager_random(_draw_rexp),
        "rpois": _eager_random(_draw_rpois),
        "rbinom": _eager_random(_draw_rbinom),
        "rcauchy": _eager_random(_draw_rcauchy),
        "rchisq": _eager_random(_draw_rchisq),
        "ntile": lambda x=None, n=1: (
            _eager_ntile(x, n) if x is not None else _no_x("ntile", n=n)
        ),
        "case_match": _case_match_eager,
        "coalesce": _coalesce,
        "na_if": _na_if,
        "nth": _nth_scalar,
        "first": _first_scalar,
        "last": _last_scalar,
        "between": _between,
    }
)


# ---- type predicates, scalar/list dispatch (reference
# tests/base/test_asis.py; api/base/types.py object registrations) --------

def _elementwise_or_scalar(fn):
    def run(x):
        if isinstance(x, (list, tuple, range)):
            return [fn(v) for v in x]
        return fn(x)

    return run


def _isna_one(v) -> bool:
    return v is None or (isinstance(v, float) and math.isnan(v))


def _all_of_type(x, ok) -> bool:
    xs = x if isinstance(x, (list, tuple, range)) else [x]
    return all(ok(v) for v in xs)


def _num_ok(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


EAGER_IMPLS.update(
    {
        "is_na": _elementwise_or_scalar(_isna_one),
        "is_null": lambda x: x is None,
        "is_finite": _elementwise_or_scalar(
            lambda v: v is not None and _num_ok(v) and math.isfinite(v)
        ),
        "is_infinite": _elementwise_or_scalar(
            lambda v: _num_ok(v) and math.isinf(v)
        ),
        "is_numeric": lambda x: _all_of_type(x, _num_ok),
        "is_integer": lambda x: _all_of_type(
            x, lambda v: isinstance(v, int) and not isinstance(v, bool)
        ),
        "is_double": lambda x: _all_of_type(x, lambda v: isinstance(v, float)),
        "is_character": lambda x: _all_of_type(x, lambda v: isinstance(v, str)),
        "is_logical": lambda x: _all_of_type(x, lambda v: isinstance(v, bool)),
        "is_true": lambda x: x is True,
        "is_false": lambda x: x is False,
        # R is.atomic: scalars are atomic, containers are not
        # (reference tests/base/test_types.py:159-167)
        "is_atomic": lambda x: not isinstance(x, (dict, set, list, tuple, range)),
    }
)


def _diff_eager(x, lag: int = 1, differences: int = 1):
    """Length-preserving lagged differences (reference keeps leading
    NULLs, unlike R's shorter vector). Scalar -> None."""
    if not isinstance(x, (list, tuple, range)):
        return None
    xs = list(x)
    for _ in range(differences):
        xs = [None] * lag + [
            None if xs[i] is None or xs[i - lag] is None else xs[i] - xs[i - lag]
            for i in range(lag, len(xs))
        ]
    return xs


EAGER_IMPLS["diff"] = _diff_eager


def _scale_eager(x, center: bool = True, scale: bool = True, scale_=None):
    if scale_ is not None:
        scale = scale_
    xs = [float(v) for v in x]
    out = xs
    if center:
        m = sum(out) / len(out)
        out = [v - m for v in out]
    if scale:
        n = len(out)
        if center:
            m2 = sum(out) / n
            s = math.sqrt(sum((v - m2) ** 2 for v in out) / (n - 1))
        else:
            s = math.sqrt(sum(v * v for v in out) / (n - 1))
        out = [v / s for v in out]
    return out


def _weighted_mean_eager(x, w=None, na_rm: bool = False):
    xs = list(x)
    ws = list(w) if w is not None else [1.0] * len(xs)
    pairs = [(a, b) for a, b in zip(xs, ws) if not (na_rm and _isna_one(a))]
    if any(_isna_one(a) for a, _ in pairs):
        return None
    tw = sum(b for _, b in pairs)
    return sum(a * b for a, b in pairs) / tw


def _quantile_eager(x, probs=(0.0, 0.25, 0.5, 0.75, 1.0), na_rm: bool = False):
    """R type-7 linear interpolation (the reference/polars default)."""
    xs = sorted(v for v in x if not (na_rm and _isna_one(v)))
    n = len(xs)

    def one(p: float) -> float:
        h = (n - 1) * p
        lo = int(math.floor(h))
        hi = min(lo + 1, n - 1)
        return xs[lo] + (h - lo) * (xs[hi] - xs[lo])

    if isinstance(probs, (list, tuple)):
        return [one(float(p)) for p in probs]
    return one(float(probs))


def _cov_eager(x, y=None, ddof: int = 1):
    from ..tibble import Tibble

    if isinstance(x, Tibble):
        # frame form (reference api/base/stats.py): pairwise covariance
        # matrix of the numeric columns; `y` is not allowed here
        if y is not None:
            raise ValueError("cov on a data frame does not take `y`")
        num = [
            c
            for c, t in x.dtypes
            if t in ("tinyint", "smallint", "int", "bigint", "float", "double")
        ]
        pdf = x.collect()[num]
        return pdf.cov(ddof=ddof)
    if y is None:
        raise ValueError("cov on a plain vector requires `y`")
    xs, ys = [float(v) for v in x], [float(v) for v in y]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    return sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / (n - ddof)


EAGER_IMPLS.update(
    {
        "scale": _scale_eager,
        "weighted_mean": _weighted_mean_eager,
        "quantile": _quantile_eager,
        "cov": _cov_eager,
    }
)


# ---- special functions, scalar/list dispatch (reference
# tests/base/test_special.py; api/base/special.py) ------------------------

def _binary(fn):
    def run(a, b):
        a_l = isinstance(a, (list, tuple, range))
        b_l = isinstance(b, (list, tuple, range))
        if a_l or b_l:
            al = list(a) if a_l else [a] * len(list(b))
            bl = list(b) if b_l else [b] * len(al)
            return [fn(x, y) for x, y in zip(al, bl)]
        return fn(a, b)

    return run


def _beta(a: float, b: float) -> float:
    return math.exp(math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b))


def _lbeta(a: float, b: float) -> float:
    return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)


def _choose(n: float, k: float) -> float:
    # R choose: real n via gamma; integer n uses exact comb
    if float(k).is_integer():
        k = int(k)
        if k < 0:
            return 0.0
        if float(n).is_integer():
            return float(math.comb(int(n), k)) if int(n) >= 0 else (
                (-1) ** k * math.comb(k - int(n) - 1, k)
            )
        out = 1.0
        for i in range(k):
            out *= (n - i) / (k - i)
        return out
    return math.exp(_lchoose(n, k))


def _lchoose(n: float, k: float) -> float:
    return math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)


EAGER_IMPLS.update(
    {
        "gamma": _unary(math.gamma),
        "lgamma": _unary(math.lgamma),
        "factorial": _unary(lambda v: float(math.gamma(v + 1))),
        "lfactorial": _unary(lambda v: math.lgamma(v + 1)),
        "beta": _binary(_beta),
        "lbeta": _binary(_lbeta),
        "choose": _binary(_choose),
        "lchoose": _binary(_lchoose),
    }
)

# digamma/bessel families: scipy preferred, mpmath fallback (same
# backend chain as the deferred compilers in special.py)
def _psi_eager(deriv_default):
    def call(x, deriv=None):
        from .special import psi_scalar_fn

        d = deriv_default if deriv is None else int(deriv)
        fn = psi_scalar_fn(d)
        if fn is None:
            raise NotImplementedError(
                "digamma family requires scipy or mpmath; neither is installed"
            )
        return _unary(fn)(x)

    return call


def _bessel_eager(kind):
    def call(x, nu=0.0, expon_scaled=False):
        from .special import bessel_scalar_fn

        fn = bessel_scalar_fn(kind, float(nu), bool(expon_scaled))
        if fn is None:
            raise NotImplementedError(
                f"bessel_{kind} requires scipy or mpmath; neither is installed"
            )
        return _unary(fn)(x)

    return call


EAGER_IMPLS.update(
    {
        "digamma": lambda x: _psi_eager(0)(x),
        "trigamma": lambda x: _psi_eager(1)(x),
        "psigamma": lambda x, deriv=0: _psi_eager(0)(x, deriv),
        "bessel_i": _bessel_eager("i"),
        "bessel_j": _bessel_eager("j"),
        "bessel_k": _bessel_eager("k"),
        "bessel_y": _bessel_eager("y"),
    }
)


# ---- column reorderers / set queries on plain vectors ---------------------
# (reference registers object dispatches for each: api/base/seq.py,
# api/base/verbs.py:269, api/base/sets.py:163)

def _eager_sort(x, decreasing=False, na_last=True):
    xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
    nulls = [v for v in xs if v is None or (isinstance(v, float) and math.isnan(v))]
    vals = sorted(
        (v for v in xs if not (v is None or (isinstance(v, float) and math.isnan(v)))),
        reverse=bool(decreasing),
    )
    return vals + nulls if na_last else nulls + vals


def _eager_order(x, decreasing=False, na_last=True):
    xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
    isna = lambda v: v is None or (isinstance(v, float) and math.isnan(v))
    nn = [i for i in range(len(xs)) if not isna(xs[i])]
    na = [i for i in range(len(xs)) if isna(xs[i])]
    nn.sort(key=lambda i: xs[i], reverse=bool(decreasing))
    return nn + na if na_last else na + nn


def _eager_rank(x, na_last=True, ties_method="average"):
    xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
    isna = lambda v: v is None or (isinstance(v, float) and math.isnan(v))
    order = sorted((i for i in range(len(xs)) if not isna(xs[i])), key=lambda i: xs[i])
    out: list = [None] * len(xs)
    pos = 0
    while pos < len(order):
        end = pos
        while end + 1 < len(order) and xs[order[end + 1]] == xs[order[pos]]:
            end += 1
        ranks = list(range(pos + 1, end + 2))
        for j, i in enumerate(order[pos : end + 1]):
            if ties_method == "min":
                out[i] = ranks[0]
            elif ties_method == "max":
                out[i] = ranks[-1]
            elif ties_method in ("first", "random"):
                out[i] = ranks[j]
            else:
                out[i] = sum(ranks) / len(ranks)
        pos = end + 1
    return out


def _eager_unique(x):
    seen, out = set(), []
    for v in x if isinstance(x, (list, tuple, range)) else [x]:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def _eager_any_na(x):
    xs = x if isinstance(x, (list, tuple, range)) else [x]
    return any(v is None or (isinstance(v, float) and math.isnan(v)) for v in xs)


def _eager_outer(x, y, fun="*"):
    ops = {
        "*": lambda a, b: a * b,
        "+": lambda a, b: a + b,
        "-": lambda a, b: a - b,
        "/": lambda a, b: a / b,
    }
    op = ops[fun] if isinstance(fun, str) else fun
    xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
    ys = list(y) if isinstance(y, (list, tuple, range)) else [y]
    return [[op(a, b) for b in ys] for a in xs]


def _eager_sample(x, size=None, replace=False, prob=None, seed=None):
    import random as _random

    xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
    rng = _random.Random(seed) if seed is not None else _random
    n = len(xs) if size is None else int(size)
    if replace:
        return rng.choices(xs, weights=prob, k=n)
    return rng.sample(xs, min(n, len(xs)))


def _eager_n_distinct(x, na_rm: bool = False):
    xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
    isna = lambda v: v is None or (isinstance(v, float) and math.isnan(v))
    vals = [v for v in xs if not isna(v)]
    base = len(set(vals))
    if na_rm:
        return base
    return base + (1 if len(vals) != len(xs) else 0)


def _eager_recode(*args, _default=None, _missing=None, **kwargs):
    """Dict / kwarg / (old, new) pair replacement on plain vectors
    (reference test_recode.py; the column compiler handles Columns).
    Unmatched values coerce to str when any replacement is a str.
    First positional arg is the data — taken from *args so a column
    named 'x' recoded by kwarg never collides with a parameter name."""
    x, args = args[0], args[1:]
    # reference convention (_args_to_recodings, recode.py:17-37):
    # positional non-dict args map {index: replacement} — the index is
    # matched against the VALUES of x; dicts/kwargs merge directly.
    # (The deferred column path keeps R's 1-based convention.)
    mapping: dict = {}
    i = 0
    for a in args:
        if isinstance(a, dict):
            mapping.update(a)
        else:
            mapping[i] = a
        i += 1
    mapping.update(kwargs)
    # the None KEY is the missing-marker slot (reference recode.py:90
    # values.pop(None, None)); None VALUES stay as recode-to-null
    if _missing is None:
        _missing = mapping.pop(None, None)
    else:
        mapping.pop(None, None)  # dead branch: x == null never matches
    if not mapping and _default is None and _missing is None:
        raise ValueError("recode: no replacements provided")
    coerce = any(isinstance(v, str) for v in mapping.values()) or isinstance(
        _default, str
    )
    xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
    out = []
    for v in xs:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            out.append(_missing)
        elif v in mapping:
            out.append(mapping[v])
        elif str(v) in mapping:
            out.append(mapping[str(v)])
        elif _default is not None:
            out.append(_default)
        else:
            out.append(str(v) if coerce else v)
    return out if isinstance(x, (list, tuple, range)) else out[0]


EAGER_IMPLS.update(
    {
        "n_distinct": _eager_n_distinct,
        "recode": _eager_recode,
        "sort": _eager_sort,
        "sample": _eager_sample,
        "order": _eager_order,
        "rank": _eager_rank,
        "unique": _eager_unique,
        "any_na": _eager_any_na,
        "outer": _eager_outer,
    }
)


# ---- trig family, scalar/list dispatch (reference tests/base/test_trig.py
# scalar + Series registrations; the deferred compilers live in math.py) ---

def _safe(fn):
    """R semantics: out-of-domain -> NaN (math.* raises ValueError)."""

    def run(v):
        try:
            return fn(v)
        except (ValueError, OverflowError):
            return float("nan")

    return run


EAGER_IMPLS.update(
    {
        "sin": _unary(math.sin),
        "cos": _unary(math.cos),
        "tan": _unary(math.tan),
        "asin": _unary(_safe(math.asin)),
        "acos": _unary(_safe(math.acos)),
        "atan": _unary(math.atan),
        "sinh": _unary(math.sinh),
        "cosh": _unary(math.cosh),
        "tanh": _unary(math.tanh),
        "asinh": _unary(math.asinh),
        "acosh": _unary(_safe(math.acosh)),
        "atanh": _unary(_safe(math.atanh)),
        "sinpi": _unary(lambda v: math.sin(math.pi * v)),
        "cospi": _unary(lambda v: math.cos(math.pi * v)),
        "tanpi": _unary(lambda v: math.tan(math.pi * v)),
        "atan2": _binary(math.atan2),
    }
)


# ---- string family, scalar/list dispatch (reference test_string.py /
# test_string_ext.py *_scalar forms; column compilers live in strings.py) --

def _nchar_one(s):
    if s.endswith("\0"):
        raise ValueError("invalid zero-byte character")
    return len(s.replace("\0", ""))


def _str_elementwise(fn):
    def run(x, *a, **k):
        if isinstance(x, (list, tuple, range)):
            return [None if v is None else fn(str(v), *a, **k) for v in x]
        return None if x is None else fn(str(x), *a, **k)

    return run


def _re_flags(ignore_case: bool):
    import re as _re

    return _re.IGNORECASE if ignore_case else 0


def _eager_grepl(pattern, x, ignore_case=False, fixed=False):
    import re as _re

    def one(s):
        if fixed:
            return (pattern.lower() in s.lower()) if ignore_case else (pattern in s)
        return _re.search(pattern, s, _re_flags(ignore_case)) is not None

    return _str_elementwise(one)(x)


def _eager_gsub(pattern, replacement, x, ignore_case=False, fixed=False):
    import re as _re

    def one(s):
        if fixed:
            return s.replace(pattern, replacement)
        return _re.sub(pattern, replacement, s, flags=_re_flags(ignore_case))

    return _str_elementwise(one)(x)


def _eager_sub(pattern, replacement, x, ignore_case=False, fixed=False):
    import re as _re

    def one(s):
        if fixed:
            return s.replace(pattern, replacement, 1)
        return _re.sub(pattern, replacement, s, count=1, flags=_re_flags(ignore_case))

    return _str_elementwise(one)(x)


def _eager_chartr(old, new, x):
    return _str_elementwise(lambda s: s.translate(str.maketrans(old, new)))(x)


def _eager_sprintf(fmt, *args):
    vecs = [a for a in args if isinstance(a, (list, tuple, range))]
    if not vecs and not isinstance(fmt, (list, tuple, range)):
        return fmt % tuple(args)
    n = max(
        [len(v) for v in vecs]
        + ([len(fmt)] if isinstance(fmt, (list, tuple, range)) else [1])
    )
    fmts = list(fmt) if isinstance(fmt, (list, tuple, range)) else [fmt] * n
    cols = [
        list(a) if isinstance(a, (list, tuple, range)) else [a] * n for a in args
    ]
    return [fmts[i] % tuple(c[i] for c in cols) for i in range(n)]


def _eager_substr(x, start, stop):
    # reference semantics: 0-indexed start, exclusive stop
    return _str_elementwise(lambda s: s[int(start):int(stop)])(x)


def _eager_strsplit(x, split, fixed=True):
    import re as _re

    def one(s):
        return s.split(split) if fixed else _re.split(split, s)

    return _str_elementwise(one)(x)


EAGER_IMPLS.update(
    {
        "toupper": _str_elementwise(str.upper),
        "tolower": _str_elementwise(str.lower),
        # R zero-byte semantics (reference api/base/string.py:84-97):
        # embedded NULs don't count; a trailing NUL is invalid
        "nchar": _str_elementwise(_nchar_one),
        "nzchar": _str_elementwise(lambda s: len(s) > 0),
        "trimws": _str_elementwise(str.strip),
        "startswith": lambda x, prefix: _str_elementwise(
            lambda s: s.startswith(prefix)
        )(x),
        "endswith": lambda x, suffix: _str_elementwise(
            lambda s: s.endswith(suffix)
        )(x),
        "strtoi": lambda x, base=10: _str_elementwise(
            lambda s: int(s, int(base))
        )(x),
        "grepl": _eager_grepl,
        "gsub": _eager_gsub,
        "sub": _eager_sub,
        "chartr": _eager_chartr,
        "sprintf": _eager_sprintf,
        "substr": _eager_substr,
        "substring": _eager_substr,
        "strsplit": _eager_strsplit,
        "paste": lambda *xs, sep=" ", collapse=None: _eager_paste(xs, sep, collapse),
        "paste0": lambda *xs, collapse=None: _eager_paste(xs, "", collapse),
    }
)


def _eager_paste(xs, sep, collapse=None):
    vecs = [x for x in xs if isinstance(x, (list, tuple, range))]
    if not vecs:
        out = sep.join(str(x) for x in xs)
        return out
    n = max(len(v) for v in vecs)
    cols = [list(x) if isinstance(x, (list, tuple, range)) else [x] * n for x in xs]
    out = [sep.join(str(c[i]) for c in cols) for i in range(n)]
    if collapse is not None:
        return str(collapse).join(out)
    return out


# ---- casts / cumulative / elementwise families (reference object
# dispatches: api/base/asis.py, test_cum.py, arithm pmin/pmax) -------------

def _cast(fn):
    def run(x):
        if isinstance(x, (list, tuple, range)):
            return [None if _isna_one(v) else fn(v) for v in x]
        return None if _isna_one(x) else fn(x)

    return run


def _as_logical_one(v):
    if isinstance(v, str):
        u = v.upper()
        if u in ("TRUE", "T"):
            return True
        if u in ("FALSE", "F"):
            return False
        return None
    return bool(v)


def _cum(fn):
    def run(x):
        xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
        out, acc = [], None
        for v in xs:
            if v is None:
                out.append(None)
                continue
            acc = v if acc is None else fn(acc, v)
            out.append(acc)
        return out if isinstance(x, (list, tuple, range)) else out[0]

    return run


def _cummean(x):
    xs = list(x) if isinstance(x, (list, tuple, range)) else [x]
    out, s, n = [], 0.0, 0
    for v in xs:
        if v is None:
            out.append(None)
            continue
        s += v
        n += 1
        out.append(s / n)
    return out if isinstance(x, (list, tuple, range)) else out[0]


def _pairwise(fn):
    def run(*args, na_rm: bool = False):
        if not args:
            # reference: pmin()/pmax() with no inputs return NULL
            return None
        vecs = [a for a in args if isinstance(a, (list, tuple, range))]
        if not vecs:
            vals = [a for a in args if a is not None or not na_rm]
            if any(v is None for v in vals):
                return None
            return fn(vals)
        n = max(len(v) for v in vecs)
        cols = [
            list(a) if isinstance(a, (list, tuple, range)) else [a] * n
            for a in args
        ]
        out = []
        for i in range(n):
            vals = [c[i] for c in cols]
            if na_rm:
                vals = [v for v in vals if v is not None]
            if not vals or any(v is None for v in vals):
                out.append(None)
            else:
                out.append(fn(vals))
        return out

    return run


def _eager_match(x, table, nomatch=None):
    tbl = list(table)
    def one(v):
        try:
            return tbl.index(v) + 1
        except ValueError:
            return nomatch
    if isinstance(x, (list, tuple, range)):
        return [one(v) for v in x]
    return one(x)


def _eager_duplicated(x):
    seen, out = set(), []
    for v in x if isinstance(x, (list, tuple, range)) else [x]:
        out.append(v in seen)
        seen.add(v)
    return out


EAGER_IMPLS.update(
    {
        "as_character": _cast(str),
        "as_string": _cast(str),
        "as_double": _cast(float),
        "as_numeric": _cast(float),
        "as_integer": _cast(lambda v: int(float(v))),
        "as_int": _cast(lambda v: int(float(v))),
        "as_logical": _cast(_as_logical_one),
        "as_bool": _cast(_as_logical_one),
        "as_null": lambda *a: None,
        "all": lambda x, na_rm=False: (
            None if not na_rm and any(_isna_one(v) for v in x) else
            all(v for v in x if not _isna_one(v))
        ),
        "any": lambda x, na_rm=False: (
            None if not na_rm and any(_isna_one(v) for v in x)
            and not any(v for v in x if not _isna_one(v)) else
            any(v for v in x if not _isna_one(v))
        ),
        "cumsum": _cum(lambda a, b: a + b),
        "cumprod": _cum(lambda a, b: a * b),
        "cummax": _cum(max),
        "cummin": _cum(min),
        "cumall": _cum(lambda a, b: bool(a and b)),
        "cumany": _cum(lambda a, b: bool(a or b)),
        "cummean": _cummean,
        "pmin": _pairwise(min),
        "pmax": _pairwise(max),
        "mod": _eager_mod,
        "arg": _unary(lambda v: _cmath.phase(v)),
        "conj": _unary(lambda v: v.conjugate() if isinstance(v, complex) else v),
        "re_": _unary(lambda v: complex(v).real),
        "im": _unary(lambda v: complex(v).imag),
        "as_complex": _eager_as_complex,
        "complex_": lambda real=0.0, imaginary=0.0: (
            [complex(r, i) for r, i in zip(real, imaginary)]
            if isinstance(real, (list, tuple))
            else complex(real, imaginary)
        ),
        "is_complex": lambda x: isinstance(x, complex),
        "near": lambda x, y, tol=1.5e-8: _unary(lambda v: abs(v - y) < tol)(x),
        "match": _eager_match,
        "is_element": lambda x, table: (
            [v in set(table) for v in x]
            if isinstance(x, (list, tuple, range))
            else x in set(table)
        ),
        "isin": lambda x, table: (
            [v in set(table) for v in x]
            if isinstance(x, (list, tuple, range))
            else x in set(table)
        ),
        "duplicated": _eager_duplicated,
        "lengths": lambda x: [
            len(v) if isinstance(v, (list, tuple, str)) else 1 for v in x
        ]
        if isinstance(x, (list, tuple, range))
        else [1],
    }
)
