"""Factor (R categorical) subsystem + forcats API.

Reference: ``api/base/factor.py`` (458 LoC) + ``api/forcats.py``
(1493 LoC). Spark has no categorical dtype (SURVEY §1.1), so a factor
is a **StringType column + an ordered ``levels`` list in the Tibble's
metadata**. Level-order-sensitive operations (arrange/desc on factors)
compile to ``array_position(lit(levels), col)`` — see
``operators/core.py:_sort_key``. Pure level permutations are
zero-cost metadata edits; ``fct_infreq``/``fct_reorder`` run one
aggregate query to compute the order (as the reference does,
``api/forcats.py:369-430,543-630``).

API shape note: in R these operate on vectors inside mutate; here they
are verbs taking (tibble, column) and returning a new Tibble, because
level metadata lives on the table wrapper.
"""

from __future__ import annotations

import random
from typing import Any

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.context import ORDER_COL, EvalContext
from ..plans.expr import Ref
from ..plans.verb import verb
from ..tibble import Tibble

__all__ = [
    "factor_",
    "levels_",
    "nlevels",
    "is_factor",
    "droplevels",
    "fct_drop",
    "fct_relevel",
    "fct_inorder",
    "fct_infreq",
    "fct_inseq",
    "fct_rev",
    "fct_shift",
    "fct_shuffle",
    "fct_reorder",
    "fct_recode",
    "recode_factor",
    "fct_collapse",
    "fct_lump",
    "fct_lump_n",
    "fct_lump_min",
    "fct_lump_prop",
    "fct_lump_lowfreq",
    "fct_other",
    "lvls_reorder",
    "lvls_revalue",
    "lvls_expand",
    "fct_relabel",
    "fct_reorder2",
    "fct_match",
    "fct_unify",
    "fct_c",
    "as_factor",
    "as_ordered",
    "ordered_",
    "is_ordered",
    "set_levels",
    "fct_anon",
    "fct_expand",
    "fct_explicit_na",
    "fct_cross",
    "fct_count",
    "fct_unique",
    "lvls_union",
    "cut_",
]


def _name_of(x: Any) -> str:
    return x._name if isinstance(x, Ref) else str(x)


def _with_levels(td: Tibble, col: str, levels: list) -> Tibble:
    lv = dict(td.levels)
    lv[col] = list(levels)
    # with_df propagates group_drop (and any future metadata) — a bare
    # Tibble() here would silently reset group_by(_drop=False)
    return td.with_df(td.df, levels=lv)


def _observed_levels(td: Tibble, col: str) -> list[str]:
    rows = (
        td.df.select(col)
        .filter(F.col(col).isNotNull())
        .distinct()
        .orderBy(col)
        .collect()
    )
    return [r[0] for r in rows]


# --------------------------------------------------------------------------
# construction / inspection (reference api/base/factor.py:93-343)
# --------------------------------------------------------------------------

@verb
def factor_(td: Tibble, col: Any, levels: list | None = None, ordered: bool = False) -> Tibble:
    """Declare a string column as a factor. Values outside ``levels``
    become NA (R factor semantics)."""
    cname = _name_of(col)
    if levels is None:
        levels = _observed_levels(td, cname)
    df = td.df.withColumn(
        cname,
        F.when(F.col(cname).isin([str(l) for l in levels]), F.col(cname)),
    )
    out = _with_levels(td.with_df(df), cname, levels)
    if ordered:
        out.ordered_factors = set(out.ordered_factors) | {cname}
    return out


@verb
def ordered_(td: Tibble, col: Any, levels: list | None = None) -> Tibble:
    """Ordered-factor constructor: factor_(ordered=True) (reference
    ``api/base/factor.py:192-216``)."""
    return factor_(td, col, levels=levels, ordered=True)


@verb
def levels_(td: Tibble, col: Any) -> list | None:
    return td.levels.get(_name_of(col))


@verb
def nlevels(td: Tibble, col: Any) -> int:
    return len(td.levels.get(_name_of(col), []))


@verb
def is_factor(td: Tibble, col: Any) -> bool:
    return _name_of(col) in td.levels


@verb
def droplevels(td: Tibble, col: Any = None, only: list | None = None) -> Tibble:
    """Drop levels not present in the data (one distinct per column).
    ``only`` restricts dropping to those levels (reference forcats
    fct_drop(only=))."""
    cols = [_name_of(col)] if col is not None else list(td.levels)
    out = td
    for c in cols:
        observed = set(_observed_levels(td, c))
        keep = [
            l
            for l in td.levels.get(c, [])
            if l in observed or (only is not None and l not in only)
        ]
        out = _with_levels(out, c, keep)
    return out


fct_drop = droplevels


# --------------------------------------------------------------------------
# level reordering (metadata permutations; reference api/forcats.py:298-630)
# --------------------------------------------------------------------------

@verb
def fct_relevel(td: Tibble, col: Any, *first, after: int = 0) -> Tibble:
    cname = _name_of(col)
    levels = list(td.levels.get(cname, _observed_levels(td, cname)))
    if len(first) == 1 and callable(first[0]) and not isinstance(first[0], str):
        # callable form: fn(levels) returns the levels to move first
        # (reference test_relevel_callable)
        first = tuple(first[0](levels))
    moved = [l for l in first if l in levels]
    rest = [l for l in levels if l not in moved]
    new = rest[:after] + moved + rest[after:]
    return _with_levels(td, cname, new)


@verb
def fct_inorder(td: Tibble, col: Any) -> Tibble:
    """Levels in first-appearance order."""
    cname = _name_of(col)
    td2 = td.ensure_order()
    rows = (
        td2.df.filter(F.col(cname).isNotNull())
        .groupBy(cname)
        .agg(F.min(ORDER_COL).alias("__first__"))
        .orderBy("__first__")
        .select(cname)
        .collect()
    )
    return _with_levels(td, cname, [r[0] for r in rows])


@verb
def fct_infreq(td: Tibble, col: Any) -> Tibble:
    """Levels by descending frequency (one count query)."""
    cname = _name_of(col)
    rows = (
        td.df.filter(F.col(cname).isNotNull())
        .groupBy(cname)
        .count()
        .orderBy(F.col("count").desc(), F.col(cname).asc())
        .select(cname)
        .collect()
    )
    return _with_levels(td, cname, [r[0] for r in rows])


@verb
def fct_inseq(td: Tibble, col: Any) -> Tibble:
    cname = _name_of(col)
    levels = td.levels.get(cname, _observed_levels(td, cname))
    def _key(v):
        try:
            return (0, float(v))
        except (TypeError, ValueError):
            return (1, v)
    return _with_levels(td, cname, sorted(levels, key=_key))


@verb
def fct_rev(td: Tibble, col: Any) -> Tibble:
    cname = _name_of(col)
    levels = td.levels.get(cname, _observed_levels(td, cname))
    return _with_levels(td, cname, list(reversed(levels)))


@verb
def fct_shift(td: Tibble, col: Any, n: int = 1) -> Tibble:
    cname = _name_of(col)
    levels = list(td.levels.get(cname, _observed_levels(td, cname)))
    n = n % len(levels) if levels else 0
    return _with_levels(td, cname, levels[n:] + levels[:n])


@verb
def fct_shuffle(td: Tibble, col: Any, seed: int | None = None) -> Tibble:
    cname = _name_of(col)
    levels = list(td.levels.get(cname, _observed_levels(td, cname)))
    rng = random.Random(seed)
    rng.shuffle(levels)
    return _with_levels(td, cname, levels)


@verb
def fct_reorder(
    td: Tibble,
    col: Any,
    by: Any,
    fn: Any = "median",
    desc: bool = False,
    _fun: Any = None,
    _desc: bool | None = None,
) -> Tibble:
    """Reorder levels by a summary of a second variable (one agg query;
    reference api/forcats.py:543-630). ``_fun``/``_desc`` are the
    reference kwarg spellings; ``fn`` also accepts the datar builders
    (``max_``, ``mean``, ...) besides name strings."""
    if _fun is not None:
        fn = _fun
    if _desc is not None:
        desc = _desc
    if callable(fn):
        fn = getattr(fn, "__name__", "").rstrip("_") or "median"
    cname, bname = _name_of(col), _name_of(by)
    aggfns = {"median": F.median, "mean": F.mean, "min": F.min, "max": F.max, "sum": F.sum}
    agg = aggfns[fn](F.col(bname)).alias("__stat__")
    rows = (
        td.df.filter(F.col(cname).isNotNull())
        .groupBy(cname)
        .agg(agg)
        .orderBy(F.col("__stat__").desc() if desc else F.col("__stat__").asc())
        .select(cname)
        .collect()
    )
    return _with_levels(td, cname, [r[0] for r in rows])


# --------------------------------------------------------------------------
# level recoding / lumping (data rewrite + metadata; api/forcats.py:699-1130)
# --------------------------------------------------------------------------

@verb
def fct_recode(td: Tibble, col: Any, **mapping: str) -> Tibble:
    """``fct_recode(f.g, new_name="old_name", ...)``."""
    cname = _name_of(col)
    levels = list(td.levels.get(cname, _observed_levels(td, cname)))
    rev = {old: new for new, old in mapping.items()}
    colr = F.col(cname)
    expr = colr
    for old, new in rev.items():
        expr = F.when(colr == old, F.lit(new)).otherwise(expr)
    df = td.df.withColumn(cname, expr)
    new_levels = list(dict.fromkeys(rev.get(l, l) for l in levels))
    return _with_levels(td.with_df(df), cname, new_levels)


@verb
def recode_factor(
    td: Tibble,
    col: Any,
    *args: Any,
    _default: Any = None,
    _missing: Any = None,
    **kwargs: str,
) -> Tibble:
    """recode + make the result a factor whose levels follow the
    replacement order (reference ``api/dplyr/recode.py:152-206``). A
    dict positional maps original values directly; ``_default`` catches
    unmatched values, ``_missing`` catches NULL."""
    mapping: dict = {}
    for a in args:
        if isinstance(a, dict):
            mapping.update(a)
        elif a is not None:
            raise TypeError("recode_factor: positional args must be dicts")
    mapping.update(kwargs)
    if not mapping:
        raise ValueError("recode_factor: no replacements provided")
    cname = _name_of(col)
    colr = F.col(cname)
    fallthrough = (
        F.lit(_default) if _default is not None else colr.cast("string")
    )
    expr = F.when(colr.isNull(), F.lit(_missing)) if _missing is not None else None
    for old, new in mapping.items():
        cond = colr == F.lit(old)
        expr = F.when(cond, F.lit(new)) if expr is None else expr.when(cond, F.lit(new))
    expr = expr.otherwise(fallthrough)
    df = td.df.withColumn(cname, expr)
    out = td.with_df(df)
    observed = _observed_levels(out, cname)
    new_levels = list(dict.fromkeys(mapping.values()))
    for extra in (_default, _missing):  # reference level order: repl, default, missing
        if extra is not None and extra not in new_levels:
            new_levels.append(extra)
    new_levels += [l for l in observed if l not in new_levels]
    return _with_levels(out, cname, new_levels)


@verb
def fct_collapse(td: Tibble, col: Any, other_level: str | None = None, **groups: list) -> Tibble:
    cname = _name_of(col)
    levels = list(td.levels.get(cname, _observed_levels(td, cname)))
    colr = F.col(cname)
    expr = colr if other_level is None else F.lit(other_level)
    mapped = set()
    for new, olds in groups.items():
        olds = [olds] if isinstance(olds, str) else list(olds)
        mapped |= set(olds)
        expr = F.when(colr.isin(olds), F.lit(new)).otherwise(expr)
    if other_level is None:
        pass
    else:
        expr = F.when(colr.isNull(), F.lit(None)).otherwise(expr)
    df = td.df.withColumn(cname, expr)
    new_levels = list(dict.fromkeys(
        [new for new in groups] + [l for l in levels if l not in mapped]
    ))
    if other_level is not None:
        new_levels = list(groups.keys()) + ([other_level] if other_level else [])
    return _with_levels(td.with_df(df), cname, new_levels)


def _lump(td: Tibble, cname: str, keep_expr, other_level: str) -> Tibble:
    """Shared lump machinery: one count query -> keep-set -> when/otherwise.

    ``other_level`` is only appended to the level list when something was
    actually lumped (R forcats keeps the factor unchanged otherwise)."""
    counts = td.df.filter(F.col(cname).isNotNull()).groupBy(cname).count()
    observed = [r[0] for r in counts.select(cname).collect()]
    keep = [r[0] for r in keep_expr(counts).collect()]
    if set(observed) <= set(keep):
        return td
    colr = F.col(cname)
    df = td.df.withColumn(
        cname,
        F.when(colr.isin(keep) | colr.isNull(), colr).otherwise(F.lit(other_level)),
    )
    levels = td.levels.get(cname, sorted(keep))
    new_levels = [l for l in levels if l in keep] + [other_level]
    return _with_levels(td.with_df(df), cname, new_levels)


@verb
def fct_lump_n(td: Tibble, col: Any, n: int, other_level: str = "Other") -> Tibble:
    cname = _name_of(col)
    return _lump(
        td,
        cname,
        lambda c: c.orderBy(F.col("count").desc(), F.col(cname).asc()).limit(n).select(cname),
        other_level,
    )


@verb
def fct_lump_min(td: Tibble, col: Any, min: int, other_level: str = "Other") -> Tibble:
    cname = _name_of(col)
    return _lump(
        td, cname, lambda c: c.filter(F.col("count") >= min).select(cname), other_level
    )


@verb
def fct_lump_prop(td: Tibble, col: Any, prop: float, other_level: str = "Other") -> Tibble:
    cname = _name_of(col)

    def keep(c):
        rows = c.collect()
        total = sum(r["count"] for r in rows) or 1
        kept = [r[cname] for r in rows if r["count"] / total >= prop]
        # R forcats: lumping a single level is pointless — keep as-is
        if len(rows) - len(kept) <= 1:
            kept = [r[cname] for r in rows]
        spark = td.df.sparkSession
        return spark.createDataFrame([(k,) for k in kept], [cname])

    return _lump(td, cname, keep, other_level)


@verb
def fct_other(td: Tibble, col: Any, keep: list | None = None, drop: list | None = None, other_level: str = "Other") -> Tibble:
    if (keep is None) == (drop is None):
        raise ValueError("fct_other: supply exactly one of `keep` or `drop`")
    cname = _name_of(col)
    colr = F.col(cname)
    levels = td.levels.get(cname, _observed_levels(td, cname))
    if keep is not None:
        cond = colr.isin(list(keep)) | colr.isNull()
        new_levels = [l for l in levels if l in keep] + [other_level]
    else:
        cond = ~colr.isin(list(drop or [])) | colr.isNull()
        new_levels = [l for l in levels if l not in (drop or [])] + [other_level]
    df = td.df.withColumn(cname, F.when(cond, colr).otherwise(F.lit(other_level)))
    return _with_levels(td.with_df(df), cname, new_levels)


@verb
def fct_anon(td: Tibble, col: Any, prefix: str = "") -> Tibble:
    cname = _name_of(col)
    levels = td.levels.get(cname, _observed_levels(td, cname))
    width = len(str(len(levels)))
    mapping = {l: f"{prefix}{str(i + 1).zfill(width)}" for i, l in enumerate(levels)}
    colr = F.col(cname)
    expr = colr
    for old, new in mapping.items():
        expr = F.when(colr == old, F.lit(new)).otherwise(expr)
    df = td.df.withColumn(cname, expr)
    return _with_levels(td.with_df(df), cname, sorted(mapping.values()))


# --------------------------------------------------------------------------
# level sets (api/forcats.py:1158-1300)
# --------------------------------------------------------------------------

@verb
def fct_expand(td: Tibble, col: Any, *extra: str, after: int | None = None) -> Tibble:
    cname = _name_of(col)
    levels = list(td.levels.get(cname, _observed_levels(td, cname)))
    new = [l for l in extra if l not in levels]
    if after is None:
        return _with_levels(td, cname, levels + new)
    return _with_levels(td, cname, levels[:after] + new + levels[after:])


@verb
def fct_explicit_na(td: Tibble, col: Any, na_level: str = "(Missing)") -> Tibble:
    """NA values become an explicit level; the level is only added when
    missing values actually exist (R forcats leaves the factor alone
    otherwise)."""
    cname = _name_of(col)
    levels = list(td.levels.get(cname, _observed_levels(td, cname)))
    if td.df.filter(F.col(cname).isNull()).limit(1).count() == 0:
        return _with_levels(td, cname, levels)
    df = td.df.withColumn(cname, F.coalesce(F.col(cname), F.lit(na_level)))
    return _with_levels(td.with_df(df), cname, levels + [na_level])


@verb
def fct_cross(td: Tibble, col1: Any, col2: Any, sep: str = ":",
              name: str = "fct_cross", keep_empty: bool = False) -> Tibble:
    """Cross two factors element-wise. NULL in either input yields NULL
    (concat_ws would silently drop it). ``keep_empty=True`` keeps the
    full level product; the default keeps only observed combinations
    (reference ``forcats.py:1266``)."""
    c1, c2 = _name_of(col1), _name_of(col2)
    l1 = td.levels.get(c1, _observed_levels(td, c1))
    l2 = td.levels.get(c2, _observed_levels(td, c2))
    crossed = F.when(
        F.col(c1).isNull() | F.col(c2).isNull(), F.lit(None)
    ).otherwise(F.concat_ws(sep, F.col(c1), F.col(c2)))
    df = td.df.withColumn(name, crossed)
    grid = [f"{a}{sep}{b}" for b in l2 for a in l1]
    if keep_empty:
        levels = grid
    else:
        seen = set(
            r[0]
            for r in df.select(name).filter(F.col(name).isNotNull()).distinct().collect()
        )
        levels = [l for l in grid if l in seen]
    return _with_levels(td.with_df(df), name, levels)


def lvls_union(tds: list[Tibble], col: Any) -> list[str]:
    cname = _name_of(col)
    out: list[str] = []
    for td in tds:
        for l in td.levels.get(cname, []):
            if l not in out:
                out.append(l)
    return out


# --------------------------------------------------------------------------
# queries (api/forcats.py:1417-1493)
# --------------------------------------------------------------------------

@verb
def lvls_reorder(td: Tibble, col: Any, idx: list[int]) -> Tibble:
    """Permute levels by 0-based index (reference ``forcats.py:202``)."""
    cname = _name_of(col)
    levels = td.levels.get(cname, _observed_levels(td, cname))
    return _with_levels(td, cname, [levels[i] for i in idx])


@verb
def lvls_revalue(td: Tibble, col: Any, new_levels: list[str]) -> Tibble:
    """Replace level values positionally (reference ``forcats.py:229``)."""
    cname = _name_of(col)
    levels = td.levels.get(cname, _observed_levels(td, cname))
    if len(new_levels) != len(levels):
        raise ValueError("new_levels must match the number of levels")
    mapping = dict(zip(levels, new_levels))
    expr = F.col(cname)
    for old, new in mapping.items():
        expr = F.when(F.col(cname) == old, F.lit(new)).otherwise(expr)
    df = td.df.withColumn(cname, expr)
    # collapse duplicates in level order
    out_levels = list(dict.fromkeys(new_levels))
    return _with_levels(td.with_df(df), cname, out_levels)


@verb
def lvls_expand(td: Tibble, col: Any, new_levels: list[str]) -> Tibble:
    """Superset the level list (reference ``forcats.py:257``)."""
    cname = _name_of(col)
    levels = td.levels.get(cname, _observed_levels(td, cname))
    missing = [l for l in levels if l not in new_levels]
    if missing:
        raise ValueError(f"new_levels must include existing levels: {missing}")
    return _with_levels(td, cname, list(new_levels))


@verb
def fct_relabel(td: Tibble, col: Any, fn) -> Tibble:
    """Relabel levels with a python function over the level strings
    (reference ``forcats.py:1130``) — driver-side on the level list,
    one when-chain on the data."""
    cname = _name_of(col)
    levels = td.levels.get(cname, _observed_levels(td, cname))
    # reference passes the WHOLE level list to fn; a same-length list
    # result is a positional relabel. Per-level callables also accepted.
    try:
        out = fn(list(levels))
        if isinstance(out, (list, tuple)) and len(out) == len(levels):
            return lvls_revalue(td, col, list(out))
    except TypeError:
        pass
    return lvls_revalue(td, col, [fn(l) for l in levels])


@verb
def fct_reorder2(
    td: Tibble, col: Any, x: Any, y: Any, fn: str = "last2", desc: bool = True
) -> Tibble:
    """Reorder levels by ``y`` at the maximum ``x`` per level (the
    forcats default ``last2``) — one distributed max_by aggregation."""
    cname = _name_of(col)
    xn, yn = _name_of(x), _name_of(y)
    rows = (
        td.df.filter(F.col(cname).isNotNull())
        .groupBy(cname)
        .agg(F.max_by(F.col(yn), F.col(xn)).alias("__k__"))
        .orderBy(F.col("__k__").desc() if desc else F.col("__k__").asc())
        .select(cname)
        .collect()
    )
    ordered = [r[0] for r in rows]
    levels = td.levels.get(cname, _observed_levels(td, cname))
    ordered += [l for l in levels if l not in ordered]
    return _with_levels(td, cname, ordered)


@verb
def fct_lump(td: Tibble, col: Any, n: int | None = None, prop: float | None = None,
             other_level: str = "Other") -> Tibble:
    """Generic lump dispatcher (reference ``forcats.py:850``)."""
    if n is not None and prop is not None:
        raise ValueError("fct_lump: supply at most one of `n` and `prop`")
    if n is not None:
        return fct_lump_n(td, col, n, other_level=other_level)
    if prop is not None:
        return fct_lump_prop(td, col, prop, other_level=other_level)
    return fct_lump_lowfreq(td, col, other_level=other_level)


@verb
def fct_lump_lowfreq(td: Tibble, col: Any, other_level: str = "Other") -> Tibble:
    """Lump the least-frequent levels while 'Other' stays the smallest
    level (reference ``forcats.py:1048``)."""
    cname = _name_of(col)
    counts = (
        td.df.filter(F.col(cname).isNotNull())
        .groupBy(cname)
        .count()
        .orderBy(F.col("count").desc(), F.col(cname).asc())
        .collect()
    )
    vals = [(r[0], r[1]) for r in counts]
    # forcats lump_cutoff: walking counts in descending order, keep
    # levels until one exceeds the total of everything after it — the
    # lumped remainder is then guaranteed smaller than every kept level
    left = sum(c for _, c in vals)
    keep_n = len(vals)
    for i, (_, c) in enumerate(vals):
        left -= c
        if c > left:
            keep_n = i + 1
            break
    keep = [v for v, _ in vals[:keep_n]]
    return _lump(td, cname, lambda c: c.filter(F.col(cname).isin(keep)).select(cname), other_level)


@verb
def fct_match(td: Tibble, col: Any, lvls) -> Tibble:
    """Boolean column ``__fct_match__``: is the value in lvls (errors on
    unknown levels, reference ``forcats.py:1458``). A scalar level is a
    1-element list (reference test_match_scalar)."""
    cname = _name_of(col)
    if isinstance(lvls, str):
        lvls = [lvls]
    levels = td.levels.get(cname, _observed_levels(td, cname))
    unknown = [l for l in lvls if l not in levels]
    if unknown:
        raise ValueError(f"levels not present in factor: {unknown}")
    return td.with_df(
        td.df.withColumn("__fct_match__", F.col(cname).isin(list(lvls)))
    )


def fct_unify(tds: list[Tibble], col: Any) -> list[Tibble]:
    """Give every tibble the union of levels (reference ``forcats.py:1221``)."""
    cname = _name_of(col)
    union = lvls_union(tds, col)
    return [_with_levels(t, cname, list(union)) for t in tds]


def fct_c(tds: list[Tibble], col: Any) -> Tibble:
    """Concatenate factors: row-bind the tibbles with the union of
    levels in first-seen order (reference ``forcats.py:1237``)."""
    from .bind import bind_rows

    cname = _name_of(col)
    union = lvls_union(tds, col)
    out = bind_rows(*tds)
    return _with_levels(out, cname, list(union))


@verb
def as_factor(td: Tibble, col: Any) -> Tibble:
    return factor_(td, col)


@verb
def as_ordered(td: Tibble, col: Any) -> Tibble:
    # keep an existing factor's declared level order
    existing = td.levels.get(_name_of(col))
    return factor_(td, col, levels=existing, ordered=True)


@verb
def is_ordered(td: Tibble, col: Any) -> bool:
    """True for factors declared ordered (reference api/base/types.py)."""
    return _name_of(col) in td.ordered_factors


@verb
def set_levels(td: Tibble, col: Any, levels: list[str]) -> Tibble:
    cname = _name_of(col)
    return _with_levels(td, cname, list(levels))


@verb
def fct_count(td: Tibble, col: Any, sort: bool = False, prop: bool = False) -> Tibble:
    cname = _name_of(col)
    levels = td.levels.get(cname, None)
    counts = td.df.groupBy(cname).agg(F.count(F.lit(1)).alias("n"))
    if levels is not None:
        # include zero-count levels (R keeps them); the NA count row can
        # never match the level grid, so re-attach it after the join
        spark = td.df.sparkSession
        lv = spark.createDataFrame([(l,) for l in levels], [cname])
        grid = lv.join(counts, on=cname, how="left").fillna(0, subset=["n"])
        counts = grid.unionByName(counts.filter(F.col(cname).isNull()))
        order = F.array_position(F.lit(levels), F.col(cname))
    else:
        order = F.col(cname)
    out = counts.withColumnRenamed(cname, "f")
    if prop:
        total = td.df.count()
        out = out.withColumn("p", F.col("n") / F.lit(total))
    out = out.orderBy(F.col("n").desc() if sort else order.asc_nulls_last())
    result = Tibble(out)
    return result


@verb
def fct_unique(td: Tibble, col: Any) -> list:
    cname = _name_of(col)
    levels = td.levels.get(cname)
    if levels is not None:
        return list(levels)
    return _observed_levels(td, cname)


# --------------------------------------------------------------------------
# binning (reference api/base/factor.py:403-458)
# --------------------------------------------------------------------------

@verb
def cut_(
    td: Tibble,
    col: Any,
    new: str,
    breaks: list | int,
    labels: list | None = None,
    right: bool = True,
    include_lowest: bool = False,
) -> Tibble:
    """Bin a numeric column into a factor. Fixed breaks -> when-chain;
    integer breaks -> equal-width bins from one min/max query."""
    cname = _name_of(col)
    colr = F.col(cname)
    if isinstance(breaks, int):
        lo, hi = td.df.agg(F.min(colr), F.max(colr)).first()
        step = (hi - lo) / breaks
        breaks = [lo + i * step for i in range(breaks + 1)]
        include_lowest = True
    if labels is None:
        labels = []
        for i in range(len(breaks) - 1):
            l, r = breaks[i], breaks[i + 1]
            labels.append(f"({l:g},{r:g}]" if right else f"[{l:g},{r:g})")
    expr = F.lit(None).cast("string")
    for i in range(len(breaks) - 1):
        lo_b, hi_b = breaks[i], breaks[i + 1]
        if right:
            cond = (colr > lo_b) & (colr <= hi_b)
            if i == 0 and include_lowest:
                cond = cond | (colr == lo_b)
        else:
            cond = (colr >= lo_b) & (colr < hi_b)
            if i == len(breaks) - 2 and include_lowest:
                cond = cond | (colr == hi_b)
        expr = F.when(cond, F.lit(labels[i])).otherwise(expr)
    df = td.df.withColumn(new, expr)
    return _with_levels(td.with_df(df), new, list(labels))


# ---------------------------------------------------------------------------
# plain-vector dispatch (reference registers every factor fn for both
# Series and Expr; here vector factors are functions.factor_eager.Factor
# and the frame verbs above keep the column/metadata behavior)
# ---------------------------------------------------------------------------

from functools import wraps as _wraps

from ..functions import factor_eager as _fe

_VEC_TYPES = (list, tuple, range, str, int, float, bool)


def _vec_dispatch(vec_fn, verb_fn):
    @_wraps(verb_fn)
    def wrapper(*args, **kwargs):
        if args and isinstance(args[0], (_fe.Factor, *_VEC_TYPES)) and not (
            isinstance(args[0], (list, tuple))
            and args[0]
            and isinstance(args[0][0], Tibble)
        ):
            return vec_fn(*args, **kwargs)
        return verb_fn(*args, **kwargs)

    return wrapper


factor_ = _vec_dispatch(_fe.factor_eager, factor_)
as_factor = _vec_dispatch(_fe.as_factor_eager, as_factor)
as_ordered = _vec_dispatch(_fe.as_ordered_eager, as_ordered)
levels_ = _vec_dispatch(_fe.levels_eager, levels_)
nlevels = _vec_dispatch(_fe.nlevels_eager, nlevels)
droplevels = _vec_dispatch(_fe.droplevels_eager, droplevels)
is_factor = _vec_dispatch(_fe.is_factor_eager, is_factor)
is_ordered = _vec_dispatch(_fe.is_ordered_eager, is_ordered)
fct_relevel = _vec_dispatch(_fe.fct_relevel_vec, fct_relevel)
fct_reorder = _vec_dispatch(_fe.fct_reorder_vec, fct_reorder)
fct_relabel = _vec_dispatch(_fe.fct_relabel_vec, fct_relabel)
fct_rev = _vec_dispatch(_fe.fct_rev_vec, fct_rev)
fct_drop = _vec_dispatch(_fe.fct_drop_vec, fct_drop)
fct_cross = _vec_dispatch(_fe.fct_cross_vec, fct_cross)


_fct_c_verb = fct_c


@_wraps(_fct_c_verb)
def _fct_c_dispatch(*args, **kwargs):
    if not args or (
        isinstance(args[0], (_fe.Factor, *_VEC_TYPES))
        and not (
            isinstance(args[0], (list, tuple))
            and args[0]
            and isinstance(args[0][0], Tibble)
        )
    ):
        return _fe.fct_c_vec(*args, **kwargs)
    return _fct_c_verb(*args, **kwargs)


fct_c = _fct_c_dispatch
