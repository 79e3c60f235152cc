"""Conditional / recoding functions.

Covers reference ``api/dplyr/if_else.py`` (if_else/case_when/case_match),
``api/dplyr/funs.py:184-248`` (coalesce/na_if/between/near),
``api/dplyr/recode.py:41-206`` (recode). dplyr NA rule: a NULL condition
takes the `missing` branch if given, else yields NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .registry import register


@register("if_else", "ifelse")
def _if_else(ctx, cond, true, false, missing=None):
    c = ctx.col(cond)
    t = ctx.col(true)
    fa = ctx.col(false)
    out = F.when(c, t).when(~c, fa)
    if missing is not None:
        out = out.otherwise(ctx.col(missing))
    return out


@register("case_when")
def _case_when(ctx, *args, _default=None):
    """``case_when(cond1, val1, cond2, val2, ...)`` — first match wins.
    The reference also accepts pre-paired tuples
    (``case_when((cond1, val1), (cond2, val2), ...)``); both spellings
    may mix (tests/base/test_funs.py case_when cases)."""
    if any(isinstance(a, tuple) and len(a) == 2 for a in args):
        flat: list = []
        for a in args:
            if isinstance(a, tuple) and len(a) == 2:
                flat.extend(a)
            else:
                flat.append(a)
        args = tuple(flat)
    if len(args) % 2 != 0:
        raise ValueError("case_when requires condition/value pairs")
    out = None
    for i in range(0, len(args), 2):
        cond = args[i]
        val = ctx.col(args[i + 1])
        if cond is True:
            condc = F.lit(True)
        else:
            condc = ctx.col(cond)
        out = F.when(condc, val) if out is None else out.when(condc, val)
    if _default is not None:
        out = out.otherwise(ctx.col(_default))
    return out


@register("case_match")
def _case_match(ctx, x, *args, _default=None):
    """``case_match(f.x, [vals], repl, ...)`` value-matching switch."""
    col = ctx.col(x)
    out = None
    for i in range(0, len(args), 2):
        vals = ctx.eval(args[i])
        repl = ctx.col(args[i + 1])
        if not isinstance(vals, (list, tuple)):
            vals = [vals]
        if any(v is None for v in vals):
            nonnull = [v for v in vals if v is not None]
            cond = col.isNull() | col.isin(nonnull) if nonnull else col.isNull()
        else:
            cond = col.isin(list(vals))
        out = F.when(cond, repl) if out is None else out.when(cond, repl)
    if _default is not None:
        out = out.otherwise(ctx.col(_default))
    return out


@register("coalesce")
def _coalesce(ctx, *xs):
    return F.coalesce(*[ctx.col(x) for x in xs])


@register("na_if")
def _na_if(ctx, x, y):
    col = ctx.col(x)
    return F.when(col.eqNullSafe(ctx.col(y)), F.lit(None)).otherwise(col)


@register("between")
def _between(ctx, x, left, right, inclusive: str = "both"):
    col = ctx.col(x)
    l, r = ctx.col(left), ctx.col(right)
    lo = col >= l if inclusive in ("both", "left") else col > l
    hi = col <= r if inclusive in ("both", "right") else col < r
    return lo & hi


@register("near")
def _near(ctx, x, y, tol: float = 1.5e-8):
    return F.abs(ctx.col(x) - ctx.col(y)) < F.lit(tol)


@register("recode")
def _recode(ctx, x, /, *args, _default=None, _missing=None, **kwargs):
    """Replacement mapping follows the reference's ``_args_to_recodings``
    (recode.py:17-37): positional args become ``{0: arg0, 1: arg1, ...}``
    matched against the VALUES of x (0-based — same convention as the
    eager vector path, round-2 ADVICE alignment); dict args and kwargs
    merge in directly. The ``None`` KEY is the missing-marker slot
    (recode.py:90 ``values.pop(None, None)``); ``None`` VALUES are
    genuine recode-to-null branches. ``x`` is positional-only so a
    column literally named ``x`` can still be recoded by keyword."""
    col = ctx.col(x)
    values: dict = {}
    for i, a in enumerate(args):
        if isinstance(a, dict):
            values.update(a)
        else:
            values[i] = a
    values.update(kwargs)
    if _missing is None:
        _missing = values.pop(None, None)
    else:
        values.pop(None, None)  # x == null never matches: dead branch
    if not values and _default is None and _missing is None:
        raise ValueError("recode: no replacements provided")
    # R coerces the result to the replacement type: with any string
    # replacement, every branch (and unmatched fallthrough) goes string
    repls = [v for v in values.values() if v is not None] + (
        [] if _default is None else [_default]
    )
    coerce = any(isinstance(r, str) for r in repls)

    def branch(v):
        c = ctx.col(v)
        return c.cast("string") if coerce else c

    out = None
    if _missing is not None:
        out = F.when(col.isNull(), branch(_missing))
    for old, new in values.items():
        cond = col == F.lit(old)
        out = F.when(cond, branch(new)) if out is None else out.when(cond, branch(new))
    if _default is not None:
        fallthrough = branch(_default)
    elif coerce:
        fallthrough = col.cast("string")
    else:
        fallthrough = col
    if out is None:
        return fallthrough
    return out.otherwise(fallthrough)


@register("is_na")
def _is_na(ctx, x):
    col = ctx.col(x)
    from ..plans.expr import Ref

    if isinstance(x, Ref):
        dtype = dict(ctx.tibble.dtypes).get(x._name)
        if dtype in ("double", "float"):
            return col.isNull() | F.isnan(col)
    return col.isNull()


@register("nan_to_null")
def _nan_to_null(ctx, x):
    col = ctx.col(x)
    return F.when(F.isnan(col), F.lit(None)).otherwise(col)
