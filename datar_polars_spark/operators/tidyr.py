"""tidyr reshaping verbs (reference ``api/tidyr.py``).

Distributed re-expressions of the reference's semantics; the
driver-loop escape hatches in the reference (``uncount`` row loop at
``api/tidyr.py:1531-1566``, ``expand``'s itertools.product at
``745-755``) become ``explode(sequence(...))`` and crossJoins here.
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..plans.context import ORDER_COL, EvalContext
from ..plans.expr import Call, Expr, Ref
from ..plans.selection import resolve_selection
from ..plans.verb import verb, verb2
from ..tibble import Tibble, ensure_tibble
from .core import _ordered_select, mutate

__all__ = [
    "pivot_longer",
    "pivot_wider",
    "separate",
    "unite",
    "extract",
    "separate_rows",
    "uncount",
    "drop_na",
    "replace_na",
    "fill",
    "nest",
    "unnest",
    "chop",
    "unchop",
    "pack",
    "unpack",
    "expand",
    "expand_grid",
    "nesting",
    "crossing",
    "complete",
    "full_seq",
]

_FLOATY = ("double", "float")


def _sel(td: Tibble, items) -> list[str]:
    if items is None:
        return list(td.columns)
    if not isinstance(items, (list, tuple)):
        items = [items]
    return resolve_selection(items, td.columns, dict(td.dtypes))


def _name_of(x: Any) -> str:
    return x._name if isinstance(x, Ref) else str(x)


# --------------------------------------------------------------------------
# pivots (reference api/tidyr.py:257-442)
# --------------------------------------------------------------------------

@verb
def pivot_longer(
    td: Tibble,
    cols: Any,
    names_to: str | list[str] = "name",
    values_to: str = "value",
    names_prefix: str | None = None,
    names_sep: str | None = None,
    names_pattern: str | None = None,
    values_drop_na: bool = False,
) -> Tibble:
    value_cols = _sel(td, cols)
    id_cols = [c for c in td.columns if c not in value_cols]
    df = td.df
    has_order = td.has_order
    hidden = [c for c in df.columns if c.startswith("__datar_")]
    # common value type: promote numerics to double when mixed
    dtypes = dict(td.dtypes)
    vtypes = {dtypes[c] for c in value_cols}
    if len(vtypes) > 1:
        df = reduce(lambda d, c: d.withColumn(c, F.col(c).cast("double")), value_cols, df)
    long = df.unpivot(
        [*id_cols, *hidden], value_cols, "__datar_name__", values_to
    )
    # R-interleaved row order: (original row, position of source column)
    if has_order:
        idx = F.array_position(
            F.lit([str(c) for c in value_cols]), F.col("__datar_name__")
        )
        long = (
            long.withColumn(
                "__datar_ro_new__",
                F.struct(F.col(ORDER_COL).alias("p"), idx.alias("s")),
            )
            .drop(ORDER_COL)
            .withColumnRenamed("__datar_ro_new__", ORDER_COL)
        )
    name_col: Column = F.col("__datar_name__")
    if names_prefix:
        name_col = F.regexp_replace(name_col, f"^{names_prefix}", "")
    if isinstance(names_to, str) and names_sep is None and names_pattern is None:
        long = long.withColumn(names_to, name_col).drop("__datar_name__")
        out_cols = [*id_cols, names_to, values_to]
    elif names_pattern is not None:
        # regex capture groups -> one target column each (tidyr
        # names_pattern; reference api/tidyr.py:264)
        targets = names_to if isinstance(names_to, (list, tuple)) else [names_to]
        for i, t in enumerate(targets):
            long = long.withColumn(
                t, F.regexp_extract(name_col, names_pattern, i + 1)
            )
        long = long.drop("__datar_name__")
        out_cols = [*id_cols, *targets, values_to]
    else:
        targets = names_to if isinstance(names_to, (list, tuple)) else [names_to]
        parts = F.split(name_col, names_sep)
        for i, t in enumerate(targets):
            long = long.withColumn(t, F.get(parts, i))
        long = long.drop("__datar_name__")
        out_cols = [*id_cols, *targets, values_to]
    if values_drop_na:
        long = long.filter(F.col(values_to).isNotNull())
    return td.with_df(_ordered_select(long, out_cols))


@verb
def pivot_wider(
    td: Tibble,
    id_cols: Any = None,
    names_from: Any = "name",
    values_from: Any = "value",
    values_fn: Any = "first",
    values_fill: Any = None,
    names_prefix: str = "",
    names_sep: str = "_",
) -> Tibble:
    names_col = _name_of(names_from)
    value_cols = _sel(td, values_from) if not isinstance(values_from, (str, Ref)) else [
        _name_of(values_from)
    ]
    if id_cols is None:
        ids = [c for c in td.columns if c != names_col and c not in value_cols]
    else:
        ids = _sel(td, id_cols)

    aggfns = {
        "first": lambda c: F.first(c, ignorenulls=False),
        "sum": F.sum,
        "mean": F.mean,
        "min": F.min,
        "max": F.max,
        "count": F.count,
    }
    if isinstance(values_fn, str):
        fn = aggfns[values_fn]
    elif getattr(values_fn, "__name__", "").rstrip("_") in aggfns:
        # datar builder passed directly (reference: values_fn=mean)
        fn = aggfns[getattr(values_fn, "__name__").rstrip("_")]
    else:
        fn = values_fn

    df = td.df
    gb = df.groupBy(*ids) if ids else df.groupBy()
    if len(value_cols) == 1:
        out = gb.pivot(names_col).agg(fn(F.col(value_cols[0])))
        new_cols = [c for c in out.columns if c not in ids]
        if names_prefix:
            for c in new_cols:
                out = out.withColumnRenamed(c, names_prefix + c)
    else:
        out = gb.pivot(names_col).agg(
            *[fn(F.col(v)).alias(v) for v in value_cols]
        )
        if names_prefix:
            for c in out.columns:
                if c not in ids:
                    out = out.withColumnRenamed(c, names_prefix + c)
    if values_fill is not None:
        out = out.fillna(values_fill)
    return Tibble(out, groups=[g for g in td.group_vars if g in out.columns], levels=td.levels)


# --------------------------------------------------------------------------
# string-splitting reshapes (reference api/tidyr.py:450-659, 1442-1492)
# --------------------------------------------------------------------------

_PY_TO_SPARK_T = {int: "long", float: "double", str: "string", bool: "boolean"}


def _convert_cast(val: Column, target: str, convert: Any) -> Column:
    """``convert`` is the reference's bool-or-dict: True casts every
    piece to long; {col: python_type} casts per target column."""
    if isinstance(convert, dict):
        t = convert.get(target)
        return val.cast(_PY_TO_SPARK_T[t]) if t is not None else val
    if convert:
        return val.cast("long")
    return val


@verb
def separate(
    td: Tibble,
    col: Any,
    into: list,
    sep: str = "[^0-9A-Za-z]+",
    remove: bool = True,
    convert: bool = False,
    extra: str = "warn",
    fill: str = "warn",
) -> Tibble:
    cname = _name_of(col)
    if not isinstance(into, (list, tuple)):
        into = [into]
    n_into = len(into)
    df = td.df
    if extra == "merge":
        parts = F.split(F.col(cname), sep, n_into)
    else:
        parts = F.split(F.col(cname), sep)
    df = df.withColumn("__datar_parts__", parts)
    n_parts = F.size(F.col("__datar_parts__"))
    for i, target in enumerate(into):
        if target is None:
            continue
        t = _name_of(target)
        if fill == "left":
            # pad missing pieces on the left
            val = F.when(
                n_parts >= n_into, F.get(F.col("__datar_parts__"), i)
            ).otherwise(F.get(F.col("__datar_parts__"), i - (F.lit(n_into) - n_parts)))
        else:
            val = F.get(F.col("__datar_parts__"), i)
        val = _convert_cast(val, t, convert)
        df = df.withColumn(t, val)
    df = df.drop("__datar_parts__")
    if remove and cname not in {(_name_of(t) if t is not None else None) for t in into}:
        df = df.drop(cname)
    new = [(_name_of(t) if t is not None else None) for t in into]
    out_cols = []
    for c in td.columns:
        if c == cname:
            out_cols.extend([t for t in new if t])
            if not remove:
                out_cols.append(cname)
        elif c not in new:
            out_cols.append(c)
    return td.with_df(_ordered_select(df, out_cols))


@verb
def unite(td: Tibble, col: str, *columns: Any, sep: str = "_", remove: bool = True, na_rm: bool = False) -> Tibble:
    cols = _sel(td, list(columns)) if columns else list(td.columns)
    df = td.df
    if na_rm:
        merged = F.concat_ws(sep, *[F.col(c).cast("string") for c in cols])
    else:
        # R semantics: NA unites as the literal string "NA"
        merged = F.concat_ws(
            sep, *[F.coalesce(F.col(c).cast("string"), F.lit("NA")) for c in cols]
        )
    df = df.withColumn(col, merged)
    out_cols = []
    placed = False
    for c in td.columns:
        if c in cols:
            if not placed:
                out_cols.append(col)
                placed = True
            if not remove:
                out_cols.append(c)
        else:
            out_cols.append(c)
    return td.with_df(_ordered_select(df, out_cols))


@verb
def extract(
    td: Tibble,
    col: Any,
    into: list,
    regex: str = r"(\w+)",
    remove: bool = True,
    convert: bool = False,
) -> Tibble:
    cname = _name_of(col)
    df = td.df
    matched = F.col(cname).rlike(regex)
    # duplicate names in `into` concatenate their matched groups in
    # order (reference tests/tidyr test_extract_concat_dup_names)
    groups_by_target: dict[str, list[int]] = {}
    for i, target in enumerate(into):
        if target is None:
            continue
        groups_by_target.setdefault(_name_of(target), []).append(i + 1)
    for t, idxs in groups_by_target.items():
        parts = [F.regexp_extract(F.col(cname), regex, i) for i in idxs]
        val = F.when(matched, parts[0] if len(parts) == 1 else F.concat(*parts))
        if convert:
            val = val.cast("long")
        df = df.withColumn(t, val)
    if remove:
        df = df.drop(cname)
    new = [(_name_of(t) if t is not None else None) for t in into]
    out_cols = []
    for c in td.columns:
        if c == cname:
            out_cols.extend(dict.fromkeys(t for t in new if t))
            if not remove:
                out_cols.append(cname)
        elif c not in new:
            out_cols.append(c)
    return td.with_df(_ordered_select(df, out_cols))


@verb
def separate_rows(td: Tibble, *cols: Any, sep: str = "[^0-9A-Za-z]+", convert: bool = False) -> Tibble:
    names = _sel(td, list(cols))
    df = td.df
    if len(names) == 1:
        c = names[0]
        df = df.withColumn(c, F.explode(F.split(F.col(c), sep)))
        df = df.withColumn(c, _convert_cast(F.col(c), c, convert))
    else:
        zipped = F.arrays_zip(*[F.split(F.col(c), sep).alias(c) for c in names])
        df = df.withColumn("__datar_z__", F.explode(zipped))
        for c in names:
            df = df.withColumn(c, _convert_cast(F.col("__datar_z__")[c], c, convert))
        df = df.drop("__datar_z__")
    return td.with_df(_ordered_select(df, td.columns))


@verb
def uncount(td: Tibble, weights: Any, _remove: bool = True, _id: str | None = None) -> Tibble:
    """Row replication — explode(sequence(1, w)), distributed (the
    reference loops on the driver, api/tidyr.py:1531-1566). ``_id``
    is the 0-based ORIGINATING ROW index, like the reference's
    ``row_copy[_id] = i`` — computed with the two-pass distributed
    row_number, not a single-partition window. Non-integral float
    weights raise, as in the reference (one extra tiny agg job, only
    for float weight columns)."""
    if isinstance(weights, str):
        # reference accepts a column NAME; a bare string is never a
        # meaningful literal weight
        if weights not in td.columns:
            raise ValueError(f"`weights` column not found: {weights!r}")
        weights = Ref(weights)
    if isinstance(weights, Ref) and weights._name not in td.columns:
        raise ValueError(f"`weights` column not found: {weights._name!r}")
    if _id:
        td = td.ensure_order()
    ctx = EvalContext(td, "eval")
    w_raw = ctx.col(weights)
    w_type = dict(td.df.select(w_raw.alias("__w__")).dtypes)["__w__"]
    if w_type in ("float", "double"):
        bad = td.df.select(w_raw.alias("__w__")).filter(
            F.col("__w__") != F.floor("__w__")
        )
        if bad.limit(1).count() > 0:
            raise ValueError("`weights` must evaluate to integer.")
    w = w_raw.cast("long")
    df = td.df
    out_cols = list(td.columns)
    if _id:
        df = df.withColumn(_id, ctx.row_number_over() - 1)
        out_cols.append(_id)
    df = df.withColumn(
        "__datar_rep__",
        F.explode(
            F.when(w > 0, F.sequence(F.lit(1).cast("long"), w)).otherwise(
                F.array().cast("array<long>")
            )
        ),
    )
    if _remove and isinstance(weights, Ref) and weights._name in out_cols:
        out_cols.remove(weights._name)
    df = df.drop("__datar_rep__")
    return td.with_df(_ordered_select(df, out_cols))


# --------------------------------------------------------------------------
# NA handling (reference api/tidyr.py:65-249)
# --------------------------------------------------------------------------

def _na_cond(dtypes: dict, c: str) -> Column:
    cond = F.col(c).isNull()
    if dtypes.get(c) in _FLOATY:
        cond = cond | F.isnan(F.col(c))
    return cond


@verb
def drop_na(td: Tibble, *cols: Any, how: str = "any", _how: str | None = None) -> Tibble:
    """``_how`` is the reference's kwarg spelling (api/tidyr.py drop_na)."""
    how = _how or how
    names = _sel(td, list(cols)) if cols else td.columns
    dtypes = dict(td.dtypes)
    conds = [_na_cond(dtypes, c) for c in names]
    bad = reduce(lambda a, b: a | b, conds) if how == "any" else reduce(
        lambda a, b: a & b, conds
    )
    return td.with_df(td.df.filter(~bad))


_NUMERIC_T = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal", "long", "short", "byte")


def _lit_compatible(dtype: str, v: Any) -> bool:
    if isinstance(v, bool):
        return dtype == "boolean"
    if isinstance(v, (int, float)):
        return any(dtype.startswith(t) for t in _NUMERIC_T)
    if isinstance(v, str):
        return dtype == "string"
    return True


def replace_na(*args: Any, **kwargs: Any):
    """replace: scalar (all columns) or {col: value}; kwargs also
    accepted. Plain-vector dispatch (reference tidyr.py object
    registration): replace_na([1, None], 0) -> [1, 0]."""
    import math as _math

    if args and isinstance(args[0], (list, tuple, range)):
        data = list(args[0])
        repl = args[1] if len(args) > 1 else None
        if repl is None:
            return data
        return [
            repl
            if (v is None or (isinstance(v, float) and _math.isnan(v)))
            else v
            for v in data
        ]
    return _replace_na_verb(*args, **kwargs)


@verb
def _replace_na_verb(td: Tibble, replace: Any = None, **kwargs: Any) -> Tibble:
    df = td.df
    dtypes = dict(td.dtypes)
    mapping: dict[str, Any] = {}
    if isinstance(replace, dict):
        mapping.update({_name_of(k): v for k, v in replace.items()})
    mapping.update(kwargs)
    if replace is not None and not isinstance(replace, dict):
        # scalar applies to every TYPE-COMPATIBLE column (a numeric
        # default must not poison string columns with a cast error)
        for c in td.columns:
            if _lit_compatible(dtypes.get(c, ""), replace):
                mapping.setdefault(c, replace)
    for c, v in mapping.items():
        col = F.col(c)
        cond = _na_cond(dtypes, c)
        df = df.withColumn(c, F.when(cond, F.lit(v)).otherwise(col))
    return td.with_df(df)


@verb
def fill(td: Tibble, *cols: Any, _direction: str = "down") -> Tibble:
    names = _sel(td, list(cols)) if cols else td.columns
    td = td.ensure_order()
    dtypes = dict(td.dtypes)
    df = td.df
    gvars = list(td.group_vars)
    base = Window.partitionBy(*gvars) if gvars else Window.partitionBy()
    w_down = base.orderBy(F.col(ORDER_COL).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_up = base.orderBy(F.col(ORDER_COL).asc()).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )

    def one_pass(df, c, direction):
        col = F.col(c)
        if dtypes.get(c) in _FLOATY:
            col = F.when(F.isnan(col), F.lit(None)).otherwise(col)
        if direction == "down":
            return df.withColumn(c, F.last(col, ignorenulls=True).over(w_down))
        return df.withColumn(c, F.first(col, ignorenulls=True).over(w_up))

    for c in names:
        if _direction == "down":
            df = one_pass(df, c, "down")
        elif _direction == "up":
            df = one_pass(df, c, "up")
        elif _direction == "downup":
            df = one_pass(one_pass(df, c, "down"), c, "up")
        else:  # updown
            df = one_pass(one_pass(df, c, "up"), c, "down")
    return td.with_df(df)


# --------------------------------------------------------------------------
# nesting (reference api/tidyr.py:951-1387)
# --------------------------------------------------------------------------

@verb
def nest(td: Tibble, _data_name: str = "data", **cols: Any) -> Tibble:
    """nest(td, data=f[...]) — collapse selected cols into an
    array<struct> column per group of the remaining columns."""
    if cols:
        name, selection = next(iter(cols.items()))
        nested_cols = _sel(td, selection)
    else:
        name = _data_name
        nested_cols = [c for c in td.columns if c not in td.group_vars]
    keys = [c for c in td.columns if c not in nested_cols]
    df = td.df
    aggs = [F.collect_list(F.struct(*nested_cols)).alias(name)]
    if td.has_order:
        aggs.append(F.min(ORDER_COL).alias(ORDER_COL))
    out = df.groupBy(*keys).agg(*aggs)
    return Tibble(out, groups=td.group_vars, levels=td.levels)


@verb
def unnest(td: Tibble, *cols: Any, keep_empty: bool = False) -> Tibble:
    names = _sel(td, list(cols))
    df = td.df
    dtypes = dict(df.dtypes)
    plain_arrays = [
        c
        for c in names
        if dtypes.get(c, "").startswith("array")
        and not dtypes.get(c, "").startswith("array<struct")
    ]
    if len(plain_arrays) > 1:
        # parallel list columns unnest TOGETHER, element-wise (tidyr
        # unchop semantics; reference test_unnest_multiple_columns) —
        # one zip-explode, not a cartesian chain of explodes
        explode_fn = F.explode_outer if keep_empty else F.explode
        zipped = F.arrays_zip(*[F.col(c).alias(c) for c in plain_arrays])
        df = df.withColumn("__datar_uz__", explode_fn(zipped))
        for c in plain_arrays:
            df = df.withColumn(c, F.col("__datar_uz__")[c])
        df = df.drop("__datar_uz__")
        dtypes = dict(df.dtypes)
        names = [c for c in names if c not in plain_arrays]
    for c in names:
        dt = dtypes.get(c, "")
        explode_fn = F.explode_outer if keep_empty else F.explode
        if dt.startswith("array<struct"):
            df = df.withColumn(c, explode_fn(F.col(c)))
            inner = df.select(f"{c}.*").columns
            for field in inner:
                df = df.withColumn(field, F.col(f"{c}.{field}"))
            df = df.drop(c)
        elif dt.startswith("array"):
            df = df.withColumn(c, explode_fn(F.col(c)))
        elif dt.startswith("struct"):
            inner = df.select(f"{c}.*").columns
            for field in inner:
                df = df.withColumn(field, F.col(f"{c}.{field}"))
            df = df.drop(c)
    out_cols = [c for c in df.columns if not c.startswith("__datar_")]
    return td.with_df(_ordered_select(df, out_cols))


@verb
def chop(td: Tibble, cols: Any) -> Tibble:
    names = _sel(td, cols)
    keys = [c for c in td.columns if c not in names]
    aggs = [F.collect_list(F.col(c)).alias(c) for c in names]
    if td.has_order:
        aggs.append(F.min(ORDER_COL).alias(ORDER_COL))
    out = td.df.groupBy(*keys).agg(*aggs)
    return Tibble(out, groups=td.group_vars, levels=td.levels)


@verb
def unchop(td: Tibble, cols: Any, keep_empty: bool = False) -> Tibble:
    return unnest(td, cols, keep_empty=keep_empty)


@verb
def pack(td: Tibble, **cols: Any) -> Tibble:
    # one projection, no intermediate drop: Spark's drop() resolves
    # case-insensitively, so drop("Y") after withColumn("y", ...) would
    # silently remove the packed column too
    packed_away: list[str] = []
    exprs: dict[str, Column] = {}
    for name, selection in cols.items():
        names = _sel(td, selection)
        exprs[name] = F.struct(*[F.col(c) for c in names])
        packed_away.extend(names)
    keep = [c for c in td.columns if c not in packed_away]
    hidden = [c for c in td.df.columns if c.startswith("__datar_")]
    df = td.df.select(
        *keep, *[exprs[n].alias(n) for n in exprs], *hidden
    )
    return td.with_df(df)


@verb
def unpack(td: Tibble, cols: Any, names_sep: str | None = None) -> Tibble:
    # single projection (no withColumn-then-drop: Spark's drop()
    # resolves case-insensitively, so drop("z") would remove a freshly
    # unpacked field "Z" as well)
    names = set(_sel(td, cols))
    df = td.df
    proj: list[Column] = []
    for c in td.columns:
        if c not in names:
            proj.append(F.col(c))
            continue
        for field in df.select(f"{c}.*").columns:
            new_name = f"{c}{names_sep}{field}" if names_sep else field
            proj.append(F.col(f"{c}.{field}").alias(new_name))
    hidden = [c for c in df.columns if c.startswith("__datar_")]
    return td.with_df(df.select(*proj, *hidden))


# --------------------------------------------------------------------------
# grids (reference api/tidyr.py:667-943) — crossJoins, not driver loops
# --------------------------------------------------------------------------

@verb
def expand(td: Tibble, *cols: Any) -> Tibble:
    """Cross product of per-unit uniques in FIRST-SEEN order (reference
    api/tidyr.py:667-760: unique(maintain_order), factor columns expand
    to their FULL level set, full_seq(col, by) expands to the complete
    range). Distributed: each unit keeps min(order) as its sort key;
    the product order is reassigned without a global window."""
    td = td.ensure_order()
    spark = td.df.sparkSession
    frames = []
    rank_cols = []
    for i, c in enumerate(cols):
        rk = f"__datar_xrk{i}__"
        rank_cols.append(rk)
        if isinstance(c, _Nesting):
            names = [_name_of(x) for x in c.items]
            frames.append(
                td.df.groupBy(*names).agg(F.min(ORDER_COL).alias(rk))
            )
        elif isinstance(c, Call) and c._fname == "full_seq":
            name = _name_of(c._args[0])
            by = c._args[1] if len(c._args) > 1 else 1
            lo, hi = td.df.agg(
                F.min(name).alias("a"), F.max(name).alias("b")
            ).first()
            frames.append(
                spark.range(0, 1)
                .select(
                    F.explode(
                        F.sequence(F.lit(lo), F.lit(hi), F.lit(by))
                    ).alias(name)
                )
                .withColumn(rk, F.col(name))
            )
        else:
            name = _name_of(c)
            if name in td.levels:
                frames.append(
                    spark.createDataFrame(
                        [(v, j) for j, v in enumerate(td.levels[name])],
                        [name, rk],
                    )
                )
            else:
                frames.append(
                    td.df.groupBy(name).agg(F.min(ORDER_COL).alias(rk))
                )
    out = reduce(lambda a, b: a.crossJoin(b), frames)
    res = Tibble(out, levels=td.levels).reassign_order(
        *[F.col(rk).asc_nulls_last() for rk in rank_cols]
    )
    return res.with_df(res.df.drop(*rank_cols))


class _Nesting:
    def __init__(self, *items):
        self.items = items


def nesting(*items: Any) -> _Nesting:
    return _Nesting(*items)


def expand_grid(spark=None, **kwargs: Any) -> Tibble:
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    frames = []
    for name, values in kwargs.items():
        frames.append(spark.createDataFrame([(v,) for v in values], [name]))
    out = reduce(lambda a, b: a.crossJoin(b), frames)
    return Tibble(out)


@verb
def crossing(td: Tibble, *cols: Any) -> Tibble:
    return expand(td, *cols)


@verb
def complete(td: Tibble, *cols: Any, fill: dict | None = None) -> Tibble:
    grid = expand(td, *cols)
    key_names = [c for c in grid.columns]
    tdf = td.df.drop(ORDER_COL) if ORDER_COL in td.df.columns else td.df
    out = grid.df.join(tdf, on=key_names, how="left")
    result = Tibble(out, groups=td.group_vars, levels=td.levels)
    result.order_stable = False
    if fill:
        result = replace_na(result, {k: v for k, v in fill.items()})
    return result


def full_seq(spark, from_: int = 1, to: int | None = None, by: int = 1, col: str = "x"):
    """Three dispatches like the reference: ``full_seq(f.col, period)``
    inside expand() defers to a range unit; ``full_seq([1, 4, 2], 1)``
    fills a plain vector's range eagerly (reference ``api/tidyr.py``
    full_seq on vectors); ``full_seq(spark, a, b)`` builds a one-column
    range frame."""
    if isinstance(spark, Expr):
        period = from_ if to is None else by
        return Call("full_seq", (spark, period), {})
    if isinstance(spark, (list, tuple, range)):
        vals = [v for v in spark if v is not None]
        period = from_
        lo, hi = min(vals), max(vals)
        n = int(round((hi - lo) / period))
        out = [lo + i * period for i in range(n + 1)]
        if all(float(v).is_integer() for v in out):
            out = [int(v) for v in out]
        return out
    df = spark.range(0).sql_ctx.sparkSession.createDataFrame([(from_, to)], ["a", "b"])
    out = df.select(
        F.explode(F.sequence(F.col("a"), F.col("b"), F.lit(by))).alias(col)
    )
    return Tibble(out)
