"""Long-tail base verbs: contingency tables, completeness, picks.

Reference: ``api/base/table.py:21-102`` (table/tabulate),
``api/base/verbs.py:294-303`` (complete_cases), ``api/dplyr/pick.py``
(pick), ``api/base/which.py`` (which/which_min/which_max),
``api/dplyr/order_by.py:26-145`` (with_order).
"""

from __future__ import annotations

from functools import reduce
from operator import and_
from typing import Any

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.context import ORDER_COL
from ..plans.expr import Ref
from ..plans.verb import verb
from ..tibble import Tibble

__all__ = [
    "freq_items",
    "table_",
    "tabulate",
    "complete_cases",
    "pick",
    "which_",
    "which_min_",
    "which_max_",
    "t_",
    "diag_",
    "max_col",
    "nrow",
    "ncol",
    "dim",
    "colnames",
    "col_sums",
    "col_means",
    "col_sds",
    "col_medians",
]

# ---- vertical (per-column) aggregations -----------------------------------
# Reference api/base/stats.py:31-184 returns one value per column from an
# eager scan. Here each family is ONE Spark agg job over every selected
# column at once (map-side partial aggregation — a single pass whatever
# the column count), returning {column: value}.

_NUMERIC_PREFIXES = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")


def _numeric_cols(td: Tibble, cols: tuple) -> list[str]:
    if cols:
        return [c._name if isinstance(c, Ref) else str(c) for c in cols]
    return [c for c, t in td.dtypes if t.startswith(_NUMERIC_PREFIXES)]


def _col_agg(td: Tibble, cols: tuple, aggfn) -> dict[str, Any]:
    names = _numeric_cols(td, cols)
    if not names:
        return {}
    row = td.df.agg(*[aggfn(F.col(c)).alias(c) for c in names]).first()
    return {c: row[c] for c in names}


@verb
def col_sums(td: Tibble, *cols: Any, na_rm: bool = True) -> dict[str, Any]:
    return _col_agg(td, cols, F.sum)


@verb
def col_means(td: Tibble, *cols: Any, na_rm: bool = True) -> dict[str, Any]:
    return _col_agg(td, cols, F.avg)


@verb
def col_sds(td: Tibble, *cols: Any, na_rm: bool = True) -> dict[str, Any]:
    return _col_agg(td, cols, F.stddev_samp)


@verb
def col_medians(td: Tibble, *cols: Any, na_rm: bool = True) -> dict[str, Any]:
    return _col_agg(td, cols, F.median)


def _name_of(x: Any) -> str:
    return x._name if isinstance(x, Ref) else str(x)


@verb
def table_(td: Tibble, x: Any, y: Any = None) -> Tibble:
    """1-2 variable contingency counts, long form (x[, y], n); zero
    combinations included for the 2-var case (R table semantics)."""
    xn = _name_of(x)
    if y is None:
        out = (
            td.df.groupBy(xn)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col(xn).asc_nulls_last())
        )
        return Tibble(out)
    yn = _name_of(y)
    counts = td.df.groupBy(xn, yn).agg(F.count(F.lit(1)).alias("n"))
    grid = (
        td.df.select(xn).distinct().crossJoin(td.df.select(yn).distinct())
    )
    out = (
        grid.join(counts, [xn, yn], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .orderBy(F.col(xn).asc_nulls_last(), F.col(yn).asc_nulls_last())
    )
    return Tibble(out)


@verb
def tabulate(td: Tibble, x: Any, nbins: int | None = None) -> list[int]:
    """Counts of integer values 1..nbins (R tabulate)."""
    xn = _name_of(x)
    if nbins is None:
        nbins = td.df.agg(F.max(xn)).first()[0] or 0
    rows = (
        td.df.filter((F.col(xn) >= 1) & (F.col(xn) <= nbins))
        .groupBy(xn)
        .count()
        .collect()
    )
    got = {r[0]: r[1] for r in rows}
    return [got.get(i, 0) for i in range(1, nbins + 1)]


@verb
def complete_cases(td: Tibble) -> Tibble:
    """Rows with no NA (null or NaN) in any column."""
    conds = []
    for cname, dtype in td.dtypes:
        c = F.col(cname).isNotNull()
        if dtype in ("double", "float"):
            c = c & ~F.isnan(F.col(cname))
        conds.append(c)
    return td.with_df(td.df.filter(reduce(and_, conds)))


@verb
def pick(td: Tibble, *cols: Any) -> Tibble:
    """Sub-table of the selection (group vars retained) — reference
    ``api/dplyr/pick.py:17-33``."""
    from ..plans.selection import resolve_selection

    if not cols:
        raise ValueError("pick: must supply at least one column selector")

    sel = resolve_selection(list(cols), td.columns, dict(td.dtypes))
    keep = list(dict.fromkeys([*td.group_vars, *sel]))
    hidden = [c for c in td.df.columns if c.startswith("__datar_")]
    return td.with_df(td.df.select(*keep, *hidden))


@verb
def which_(td: Tibble, cond: Any) -> list[int]:
    """1-based positions (frame order) where the condition holds."""
    from ..plans.context import EvalContext

    t = td.ensure_order()
    ctx = EvalContext(t, mode="eval")
    w = Window.orderBy(F.col(ORDER_COL).asc())
    d = t.df.withColumn("__pos__", F.row_number().over(w))
    rows = d.filter(ctx.col(cond)).orderBy(ORDER_COL).select("__pos__").collect()
    return [r[0] for r in rows]


@verb
def which_min_(td: Tibble, col: Any) -> int | None:
    """1-based position of the minimum (first on ties, frame order);
    NAs are ignored (R which.min). None when all values are NA."""
    t = td.ensure_order()
    w = Window.orderBy(F.col(ORDER_COL).asc())
    d = t.df.withColumn("__pos__", F.row_number().over(w))
    cn = _name_of(col)
    row = (
        d.filter(F.col(cn).isNotNull())
        .agg(F.min_by("__pos__", F.struct(F.col(cn), F.col("__pos__"))))
        .first()
    )
    return row[0] if row else None


@verb
def which_max_(td: Tibble, col: Any) -> int | None:
    """1-based position of the maximum (first on ties); NAs ignored."""
    t = td.ensure_order()
    w = Window.orderBy(F.col(ORDER_COL).asc())
    d = t.df.withColumn("__pos__", F.row_number().over(w))
    cn = _name_of(col)
    row = (
        d.filter(F.col(cn).isNotNull())
        .agg(
            # max of (value, -pos): largest value, earliest position on ties
            F.max_by("__pos__", F.struct(F.col(cn), (-F.col("__pos__")).alias("t")))
        )
        .first()
    )
    return row[0] if row else None


@verb
def t_(td: Tibble) -> Tibble:
    """Transpose (reference ``verbs.py:360``) — a small-matrix helper:
    collects to the driver, transposes in pandas, re-distributes.
    Column names become V1..Vn as in R's t() on unnamed matrices."""
    import pandas as pd

    from ..tibble import from_pandas

    pdf = td.collect()
    tp = pdf.T.reset_index(drop=True)
    tp.columns = [f"V{i + 1}" for i in range(tp.shape[1])]
    return from_pandas(td.df.sparkSession, tp)


def diag_(td: Tibble | list | tuple) -> Any:
    """Matrix diagonal (reference ``verbs.py:315``) — driver-side.
    On a plain vector, builds the diagonal matrix like R's diag()
    (reference tests/base/test_verbs.py TestDiag); on a frame,
    extracts the diagonal values."""
    if isinstance(td, (list, tuple)):
        import numpy as np

        return np.diag(td)
    pdf = td.collect()
    k = min(len(pdf), len(pdf.columns))
    return [pdf.iloc[i, i] for i in range(k)]


@verb
def max_col(td: Tibble, *cols: Any) -> Tibble:
    """1-based index of the largest value across the selected columns,
    per row (reference ``verbs.py:402``) — distributed via
    array_position(array_max), no driver loop."""
    names = [_name_of(c) for c in cols] if cols else td.columns
    arr = F.array(*[F.col(c).cast("double") for c in names])
    idx = F.array_position(arr, F.array_max(arr)).cast("long")
    return td.with_df(td.df.withColumn("max_col", idx))


@verb
def nrow(td: Tibble) -> int:
    return td.nrow()


@verb
def ncol(td: Tibble) -> int:
    return td.ncol()


@verb
def dim(td: Tibble) -> tuple[int, int]:
    return (td.nrow(), td.ncol())


@verb
def colnames(td: Tibble) -> list[str]:
    return td.columns


@verb
def freq_items(td: Tibble, *cols: Any, support: float = 0.01) -> Tibble:
    """Approximate frequent items per column (r3 sketch extension):
    wraps Spark's single-pass Karp/Papadimitriou/Shenker sketch
    (``DataFrame.stat.freqItems``) — every value with frequency >=
    ``support`` is guaranteed present (false positives possible, the
    standard KPS contract). One narrow pass, no shuffle of the raw
    values; the result is one row of array columns, driver-sized.

    At 100 TB this is THE way to find heavy hitters (hot join keys to
    salt, dominant domains/languages to cap) without a groupBy over
    the full key space."""
    names = [c._name if isinstance(c, Ref) else str(c) for c in cols]
    if not names:
        raise ValueError("freq_items: select at least one column")
    out = td.df.stat.freqItems(names, support)
    return Tibble(out)


# pick() as a mutate value: compile the selection to a struct column
# (reference pick.py returns a sub-frame; a struct is the Spark
# analogue — one JVM expression, no data movement)
from ..functions.registry import register as _register


@_register("pick_struct")
def _pick_struct(ctx, *cols, **kwargs):
    from ..plans.selection import resolve_selection

    if not cols:
        raise ValueError("pick() must supply at least one selector")
    td = ctx.tibble
    sel = resolve_selection(list(cols), td.columns, dict(td.dtypes))
    if not sel:
        raise ValueError("pick() selected no columns")
    return F.struct(*[F.col(c) for c in sel])
