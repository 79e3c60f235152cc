"""Tibble construction / row-column surgery verbs.

Reference: ``api/tibble.py`` — ``tribble`` (243), ``tibble_row`` (295),
``enframe``/``deframe`` (354-423), ``add_row``/``add_column`` (459-545),
rownames family (582-687). Row identity maps to the hidden order
column; positional splicing (``_before``/``_after``) rewrites it so the
appended rows land at the requested position without a global sort.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..plans.context import ORDER_COL
from ..plans.expr import Ref
from ..plans.verb import verb
from ..tibble import Tibble, from_pandas, tibble

__all__ = [
    "tribble",
    "tibble_row",
    "enframe",
    "deframe",
    "add_row",
    "add_column",
    "rowid_to_column",
    "rownames_to_column",
    "remove_rownames",
    "has_rownames",
    "rownames",
    "set_rownames",
    "set_colnames",
    "column_to_rownames",
    "as_tibble",
    "lazy_",
    "collect_",
    "cache_",
    "explain_",
    "unpersist_",
    "group_by_drop_default",
]


def _spark() -> SparkSession:
    return SparkSession.getActiveSession()


def tribble(*args: Any, _name_repair: Any = "minimal") -> Tibble:
    """Row-wise constructor: ``tribble(f.x, f.y, 1, "a", 2, "b")``.
    Leading ``Ref``s name the columns; the rest fill rows left-to-right.
    Duplicate headers follow the tibble name-repair protocol (under
    "minimal" Spark keeps the first occurrence, like the reference's
    polars backend)."""
    from ..tibble import repair_names

    cols: list[str] = []
    i = 0
    while i < len(args) and isinstance(args[i], Ref):
        cols.append(args[i]._name)
        i += 1
    if not cols:
        raise ValueError("tribble needs leading f.<name> column headers")
    vals = args[i:]
    if len(vals) % len(cols) != 0:
        raise ValueError("tribble values are not a multiple of column count")
    import pandas as pd

    rows = [list(vals[j : j + len(cols)]) for j in range(0, len(vals), len(cols))]
    repaired = repair_names(cols, _name_repair)
    keep = []
    seen: set[str] = set()
    for idx, name in enumerate(repaired):
        if name in seen:
            continue
        seen.add(name)
        keep.append((idx, name))
    pdf = pd.DataFrame(
        {name: [r[idx] for r in rows] for idx, name in keep}
    )
    return from_pandas(_spark(), pdf)


def tibble_row(**kwargs: Any) -> Tibble:
    """Single-row constructor; every value must be scalar (or a
    length-1 list, whose element may itself be a list -> one array
    cell, reference test_list_wrapped)."""
    for k, v in kwargs.items():
        if isinstance(v, (list, tuple)) and len(v) != 1:
            raise ValueError(f"tibble_row: column {k!r} must be length 1")
    if not kwargs:
        # 1 row x 0 cols (reference tibble_row() empty case)
        return Tibble(_spark().range(1).drop("id"))
    # keep every column a one-row LIST so a nested value stays one
    # array cell instead of exploding into rows
    return tibble(
        _spark(),
        **{
            k: (list(v) if isinstance(v, (list, tuple)) else [v])
            for k, v in kwargs.items()
        },
    )


def enframe(x: Any, name: str | None = "name", value: str | None = "value") -> Tibble:
    """Vector/dict -> two-column (name, value) table; ``name=None``
    drops the name column (reference api/tibble.py:354-423: value=None
    errors, None input -> empty frame, 2-D input rejected)."""
    import pandas as pd

    if value is None:
        raise ValueError("enframe: `value` can't be None")
    if x is None:
        cols = {} if name is None else {name: []}
        cols[value] = []
        return from_pandas(_spark(), pd.DataFrame(cols))
    if getattr(x, "ndim", 1) > 1:
        raise ValueError("enframe: `x` must be one-dimensional")
    if isinstance(x, dict):
        names, vals = list(x.keys()), list(x.values())
    else:
        vals = list(x)
        names = list(range(1, len(vals) + 1))
    # mixed scalar/list values can't share a Spark column: promote the
    # scalars to one-element lists (the reference keeps a pl.Object
    # column; arrays-of-structs is our documented Object replacement)
    if any(isinstance(v, (list, tuple)) for v in vals) and not all(
        isinstance(v, (list, tuple)) for v in vals
    ):
        vals = [list(v) if isinstance(v, (list, tuple)) else [v] for v in vals]
    cols = {} if name is None else {name: names}
    cols[value] = vals
    return from_pandas(_spark(), pd.DataFrame(cols))


@verb
def deframe(td: Tibble):
    """Two-column table -> driver dict (one column -> list)."""
    cols = td.columns
    pdf = td.collect()
    if len(cols) == 1:
        return pdf[cols[0]].tolist()
    return dict(zip(pdf[cols[0]], pdf[cols[1]]))


@verb
def add_row(td: Tibble, _before: int | None = None, _after: int | None = None, **kwargs: Any) -> Tibble:
    """Append a row (or rows) at a position (default: end). The new
    rows' order keys are spliced between the neighbours' keys, so no
    global renumbering happens."""
    if _before is not None and _after is not None:
        raise ValueError("add_row: specify only one of _before and _after")
    extra = [k for k in kwargs if k not in td.columns]
    if extra:
        raise ValueError(f"add_row: columns not in data: {extra}")
    t = td.ensure_order()
    if kwargs:
        new = tibble(t.df.sparkSession, **kwargs)
    else:
        # add_row() with no values appends one all-null row
        new = Tibble(
            t.df.sparkSession.range(1).select(
                *[F.lit(None).alias(c) for c in td.columns],
                F.lit(0).cast("long").alias(ORDER_COL),
            )
        )

    n = t.nrow()
    if _before is not None:
        pos = _before - 1  # 1-based -> insert before that row
    elif _after is not None:
        pos = _after
    else:
        pos = n
    # order keys are arbitrary longs from monotonically_increasing_id;
    # renumber to a compact 0..n-1 rank so splicing at an integer
    # position is safe, then shift rows at/after the insertion point
    from pyspark.sql import Window

    d = t.df.withColumn(
        ORDER_COL,
        (F.row_number().over(Window.orderBy(F.col(ORDER_COL).asc())) - 1).cast("long"),
    )
    d = d.withColumn(
        ORDER_COL,
        F.when(F.col(ORDER_COL) >= pos, F.col(ORDER_COL) + 1_000_000).otherwise(
            F.col(ORDER_COL)
        ),
    )
    # the freshly-built tibble carries a sequential 0..k-1 order column
    # (from_pandas assigns range(k)); shift it to the insertion point —
    # monotonically_increasing_id is NOT sequential across partitions,
    # so multi-row inserts must reuse that sequential key
    new_df = new.df.withColumn(ORDER_COL, (F.col(ORDER_COL) + pos).cast("long"))
    for c in t.columns:
        if c not in new_df.columns:
            new_df = new_df.withColumn(c, F.lit(None))
    new_df = new_df.select(*t.columns, ORDER_COL)
    return td.with_df(d.unionByName(new_df))


@verb
def add_column(td: Tibble, _before: Any = None, _after: Any = None, **kwargs: Any) -> Tibble:
    """Add columns (from scalars or driver vectors) at a position."""
    if _before is not None and _after is not None:
        raise ValueError("add_column: specify only one of _before and _after")
    dup = [k for k in kwargs if k in td.columns]
    if dup:
        raise ValueError(f"add_column: columns already exist: {dup}")
    nrow = None
    for k, v in kwargs.items():
        if isinstance(v, (list, tuple, range)) and len(v) not in (1,):
            nrow = td.nrow() if nrow is None else nrow
            if len(v) != nrow:
                raise ValueError(
                    f"add_column: column {k!r} has length {len(v)}, "
                    f"data has {nrow} rows"
                )
    t = td.ensure_order()
    d = t.df
    names = list(kwargs)
    for k, v in kwargs.items():
        if isinstance(v, (list, tuple, range)):
            v = list(v)
            if len(v) == 1:
                d = d.withColumn(k, F.lit(v[0]))
            else:
                # zip-join the vector by row position
                import pandas as pd

                vec = from_pandas(d.sparkSession, pd.DataFrame({k: v}))
                from pyspark.sql import Window

                left = d.withColumn(
                    "__pos__", F.row_number().over(Window.orderBy(F.col(ORDER_COL).asc()))
                )
                right = vec.df.withColumn(
                    "__pos__", F.row_number().over(Window.orderBy(F.col(ORDER_COL).asc()))
                ).drop(ORDER_COL)
                d = left.join(right, "__pos__", "left").drop("__pos__")
        else:
            d = d.withColumn(k, F.lit(v))
    cols = [c for c in d.columns if c not in names or c.startswith("__datar_")]
    visible = [c for c in cols if not c.startswith("__datar_")]
    anchor = None
    if _before is not None:
        anchor = _before._name if isinstance(_before, Ref) else str(_before)
        if anchor not in visible:
            raise KeyError(f"add_column: column {anchor!r} not found")
        idx = visible.index(anchor)
    elif _after is not None:
        anchor = _after._name if isinstance(_after, Ref) else str(_after)
        if anchor not in visible:
            raise KeyError(f"add_column: column {anchor!r} not found")
        idx = visible.index(anchor) + 1
    else:
        idx = len(visible)
    ordered = visible[:idx] + names + visible[idx:]
    hidden = [c for c in d.columns if c.startswith("__datar_")]
    return td.with_df(d.select(*ordered, *hidden))


@verb
def rowid_to_column(td: Tibble, var: str = "rowid") -> Tibble:
    """1..n row-id column in frame order (reference ``api/tibble.py:610-665``)."""
    from pyspark.sql import Window

    if var in td.columns:
        raise ValueError(f"rowid_to_column: column {var!r} already exists")
    t = td.ensure_order()
    d = t.df.withColumn(
        var, F.row_number().over(Window.orderBy(F.col(ORDER_COL).asc()))
    )
    visible = [c for c in d.columns if not c.startswith("__datar_") and c != var]
    hidden = [c for c in d.columns if c.startswith("__datar_")]
    return td.with_df(d.select(var, *visible, *hidden))


@verb
def rownames_to_column(td: Tibble, var: str = "rowname") -> Tibble:
    """R rownames are "1".."n" strings when none were set — a string
    rowid column; explicit rownames metadata (set_rownames) maps in by
    position (reference ``api/tibble.py:582-640``)."""
    out = rowid_to_column(td, var=var)
    if td.rownames is not None:
        mapping = F.array(*[F.lit(str(v)) for v in td.rownames])
        d = out.df.withColumn(var, F.get(mapping, F.col(var) - 1))
        res = out.with_df(d)
        res.rownames = None
        return res
    return out.with_df(out.df.withColumn(var, F.col(var).cast("string")))


@verb
def remove_rownames(td: Tibble) -> Tibble:
    if td.rownames is None:
        return td
    out = td.with_df(td.df)
    out.rownames = None
    return out


@verb
def has_rownames(td: Tibble) -> bool:
    return td.rownames is not None


@verb
def rownames(td: Tibble) -> list | None:
    """The stored rownames, or None (reference ``verbs.py:118-128``:
    R frames without explicit rownames report implicit "1".."n"; the
    reference returns the stored list / None — matched here)."""
    return td.rownames


@verb
def set_rownames(td: Tibble, names: list) -> Tibble:
    """Attach rownames metadata (reference ``verbs.py:159-172``).
    Driver-side list — intended for small lookup frames, not the fact
    table (documented; the reference stores the same way)."""
    out = td.with_df(td.df)
    out.rownames = list(names)
    return out


@verb
def set_colnames(td: Tibble, names: list) -> Tibble:
    """Rename every visible column positionally (reference
    ``verbs.py:134-143``)."""
    old = td.columns
    names = list(names)
    if len(names) != len(old):
        raise ValueError(
            f"Length of new names ({len(names)}) must match "
            f"number of columns ({len(old)})."
        )
    d = td.df
    for o, n in zip(old, names):
        if o != n:
            d = d.withColumnRenamed(o, n)
    lv = {names[old.index(k)] if k in old else k: v for k, v in td.levels.items()}
    out = td.with_df(d, groups=[names[old.index(g)] if g in old else g for g in td.group_vars])
    out.levels = lv
    return out


@verb
def column_to_rownames(td: Tibble, var: str = "rowname") -> Tibble:
    """Move a column into rownames metadata (reference
    ``api/tibble.py:663-694``). Collects the column to the driver —
    rownames are inherently a driver-side concept; errors if rownames
    already set, like the reference."""
    if td.rownames is not None:
        raise ValueError("`_data` must be a data frame without row names.")
    if var not in td.columns:
        raise KeyError(f"Column `{var}` does not exist.")
    from .core import pull

    values = [str(v) for v in pull(td, var)]
    out = td.with_df(td.df.drop(var))
    out.rownames = values
    return out


def as_tibble(
    data: Any, spark: SparkSession | None = None, name_repair: Any = "minimal"
) -> Tibble:
    """Coerce a Spark DataFrame / dict / pandas frame to a Tibble
    (reference ``tibble.py:211-253``). ``name_repair`` matters here:
    Spark DataFrames CAN carry duplicate column names (e.g. after a
    join) — "unique" repairs them positionally via ``toDF``."""
    import pandas as pd

    from ..tibble import ensure_tibble, repair_names

    if isinstance(data, Tibble):
        out = data
    elif isinstance(data, dict):
        out = tibble(spark or _spark(), **data)
    elif isinstance(data, list) and data and all(
        isinstance(r, dict) for r in data
    ):
        # row-oriented records (reference as_tibble on a list of dicts)
        out = from_pandas(spark or _spark(), pd.DataFrame(data))
    elif isinstance(data, pd.DataFrame):
        out = from_pandas(spark or _spark(), data)
    else:
        out = ensure_tibble(data)
    if name_repair != "minimal":
        cols = list(out.df.columns)
        visible = [c for c in cols if not c.startswith("__datar_")]
        repaired = repair_names(visible, name_repair)
        it = iter(repaired)
        newcols = [next(it) if not c.startswith("__datar_") else c for c in cols]
        if newcols != cols:
            out = out.with_df(out.df.toDF(*newcols))
    return out


@verb
def lazy_(td: Tibble) -> Tibble:
    """No-op: Spark frames are always lazy (reference ``api/misc.py:29``)."""
    return td


@verb
def collect_(td: Tibble):
    """Materialize to pandas in frame order (reference ``api/misc.py:74``)."""
    return td.collect()


@verb
def group_by_drop_default(td: Tibble) -> bool:
    """The tibble's current _drop setting (dplyr helper of the same name)."""
    return td.group_drop


@verb
def cache_(td: Tibble, storage_level: str | None = None) -> Tibble:
    """Persist the frame across actions (Spark's cache/persist).
    Multi-stage pipelines that trigger several jobs (dedup's candidate
    generation, packing's offset pass, repeated downstream counts)
    otherwise re-evaluate the whole upstream plan per action."""
    if storage_level:
        from pyspark import StorageLevel

        td.df.persist(getattr(StorageLevel, storage_level))
    else:
        td.df.cache()
    return td


@verb
def unpersist_(td: Tibble, blocking: bool = False) -> Tibble:
    """Release a cached frame's storage."""
    td.df.unpersist(blocking)
    return td


@verb
def explain_(td: Tibble, mode: str = "formatted") -> Tibble:
    """Print the physical plan (thin sugar over DataFrame.explain).
    Modes: 'simple', 'extended', 'codegen', 'cost', 'formatted'.
    Returns the tibble unchanged so it chains mid-pipeline — drop an
    ``>> explain_()`` into any pipeline to check pushdown/pruning/
    broadcast decisions before running it at scale."""
    td.df.explain(mode=mode)
    return td
