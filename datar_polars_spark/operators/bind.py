"""bind_rows / bind_cols and table-level set operations.

Reference: ``api/dplyr/bind.py:38-134``, ``api/dplyr/sets.py`` and the
keyed DML family ``api/dplyr/rows.py:81-349``.
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import functions as F

from ..plans.cache import register_internal_cache
from ..plans.context import ORDER_COL
from ..plans.verb import verb, verb2
from ..tibble import Tibble, ensure_tibble

__all__ = [
    "bind_rows",
    "bind_cols",
    "union_",
    "union_all",
    "intersect_",
    "setdiff_",
    "symdiff",
    "setequal",
    "rows_insert",
    "rows_append",
    "rows_update",
    "rows_patch",
    "rows_upsert",
    "rows_delete",
]

_SRC = "__datar_src__"


def _stacked_order(df):
    """Rebuild a total order from (source index, per-source order)."""
    if ORDER_COL not in df.columns:
        return df.drop(_SRC)
    return (
        df.withColumn(
            "__datar_ro_new__",
            F.struct(F.col(_SRC).alias("p"), F.col(ORDER_COL).alias("s")),
        )
        .drop(ORDER_COL, _SRC)
        .withColumnRenamed("__datar_ro_new__", ORDER_COL)
    )


@verb2
def bind_rows(*data: Any, _id: str | None = None, **kwargs: Any) -> Tibble:
    """Diagonal concat: union of columns, missing -> null (reference
    bind.py:38-93)."""
    # _id keys: 0-based integers for positional frames, the names for
    # named frames (reference tests/dplyr/test_bind.py:29-50)
    items: list[tuple[Any, Tibble]] = []
    for i, d in enumerate(data):
        if isinstance(d, (list, tuple)):
            for j, dd in enumerate(d):
                items.append((len(items), ensure_tibble(dd)))
        else:
            items.append((len(items), ensure_tibble(d)))
    for k, d in kwargs.items():
        items.append((k, ensure_tibble(d)))

    frames = []
    for i, (key, td) in enumerate(items):
        df = td.df.withColumn(_SRC, F.lit(i))
        if _id:
            df = df.withColumn(_id, F.lit(key))
        frames.append(df)
    out = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
    out = _stacked_order(out)
    first = items[0][1]
    # factor levels merge as the ORDERED UNION across frames (dict.update
    # would keep only the last frame's list — reference lvls_union rule)
    levels: dict = {}
    for _, td in items:
        for col, lv in td.levels.items():
            merged = levels.get(col, [])
            levels[col] = merged + [l for l in lv if l not in merged]
    # column order: _id first if present, then first-seen order
    cols = []
    if _id:
        cols.append(_id)
    for _, td in items:
        for c in td.columns:
            if c not in cols:
                cols.append(c)
    hidden = [c for c in out.columns if c.startswith("__datar_")]
    out = out.select(*cols, *hidden)
    return Tibble(out, groups=first.group_vars, levels=levels)


def _with_pos(df):
    """0-based dense positional ids, fully distributed (no global
    window): range-sort by the order column, tag rows with
    monotonically-increasing ids ((partition << 33) | offset), count
    rows per partition in one tiny job, and add broadcast cumulative
    offsets. The sorted frame is persisted so both passes see the same
    range boundaries (RangePartitioner samples with a per-compilation
    seed, so an unpersisted recompute could re-bucket rows)."""
    d = (
        df.orderBy(F.col(ORDER_COL).asc())
        .withColumn("__datar_mono__", F.monotonically_increasing_id())
        .persist()
    )
    # nondeterministic recompute (range-partitioner seed): registered
    # as non-evictable; released only by release_internal_caches()
    register_internal_cache(d, safe_to_evict=False)
    pid = F.shiftright(F.col("__datar_mono__"), 33)
    counts = d.groupBy(pid.alias("__p__")).count().collect()
    off, total = {}, 0
    for r in sorted(counts, key=lambda r: r["__p__"]):
        off[r["__p__"]] = total
        total += r["count"]
    pairs = [F.lit(v) for kv in off.items() for v in kv]
    base = F.create_map(*pairs)[pid] if pairs else F.lit(0)
    pos = base + F.col("__datar_mono__").bitwiseAND(F.lit((1 << 33) - 1))
    return d.withColumn("__datar_pos__", pos.cast("long")).drop("__datar_mono__")


@verb2
def bind_cols(*data: Any) -> Tibble:
    """Horizontal concat zip-joined on row position (Spark has no
    positional hstack; reference bind.py:96-134). Positions come from
    the distributed two-pass id assignment above — every frame keeps
    its parallelism; the only shuffle is the positional join itself.
    Plain dicts become one-off tibbles (reference bind_cols(df, {...}))."""
    from ..tibble import tibble as _tibble

    frames = []
    for d in data:
        if isinstance(d, dict):
            spark = ensure_tibble(data[0]).df.sparkSession
            frames.append(_tibble(spark, **d))
        else:
            frames.append(d)
    tds = [ensure_tibble(d).ensure_order() for d in frames]
    out = None
    seen: set[str] = set()
    for i, td in enumerate(tds):
        df = _with_pos(td.df)
        renames = {}
        for c in td.columns:
            name = c
            k = 1
            while name in seen:
                name = f"{c}_{k}"
                k += 1
            seen.add(name)
            if name != c:
                renames[c] = name
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        df = df.drop(ORDER_COL)
        if out is None:
            out = df
        else:
            out = out.join(df, on="__datar_pos__", how="full")
    # the dense position IS the output order (and it's reproducible:
    # it reads from the persisted sorted frames)
    out = out.withColumnRenamed("__datar_pos__", ORDER_COL)
    levels: dict = {}
    for td in tds:
        levels.update(td.levels)
    return Tibble(out, groups=tds[0].group_vars, levels=levels)


def _check_xy(x: Tibble, y: Tibble) -> None:
    if set(x.columns) != set(y.columns):
        raise ValueError(
            f"set operations need identical columns; got {x.columns} vs {y.columns}"
        )


def _bare(td: Tibble):
    return td.df.select(*td.columns)


@verb2
def union_(x: Any, y: Any) -> Tibble:
    x, y = ensure_tibble(x), ensure_tibble(y)
    _check_xy(x, y)
    out = _bare(x).unionByName(_bare(y)).dropDuplicates()
    return Tibble(out, groups=x.group_vars, levels=x.levels)


@verb2
def union_all(x: Any, y: Any) -> Tibble:
    x, y = ensure_tibble(x), ensure_tibble(y)
    _check_xy(x, y)
    out = _bare(x).unionByName(_bare(y))
    return Tibble(out, groups=x.group_vars, levels=x.levels)


@verb2
def intersect_(x: Any, y: Any) -> Tibble:
    x, y = ensure_tibble(x), ensure_tibble(y)
    _check_xy(x, y)
    out = _bare(x).intersect(_bare(y).select(*x.columns))
    return Tibble(out, groups=x.group_vars, levels=x.levels)


@verb2
def setdiff_(x: Any, y: Any) -> Tibble:
    x, y = ensure_tibble(x), ensure_tibble(y)
    _check_xy(x, y)
    out = _bare(x).subtract(_bare(y).select(*x.columns))
    return Tibble(out, groups=x.group_vars, levels=x.levels)


@verb2
def symdiff(x: Any, y: Any) -> Tibble:
    x, y = ensure_tibble(x), ensure_tibble(y)
    _check_xy(x, y)
    a = _bare(x)
    b = _bare(y).select(*x.columns)
    out = a.subtract(b).unionByName(b.subtract(a))
    return Tibble(out, groups=x.group_vars, levels=x.levels)


@verb2
def setequal(x: Any, y: Any) -> bool:
    x, y = ensure_tibble(x), ensure_tibble(y)
    _check_xy(x, y)
    a = _bare(x)
    b = _bare(y).select(*x.columns)
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


# --------------------------------------------------------------------------
# rows_* keyed DML (reference api/dplyr/rows.py:81-349) — compositions of
# semi/anti joins + unionByName, per SURVEY §2.8.
# --------------------------------------------------------------------------

def _key_names(x: Tibble, by: Any) -> list[str]:
    from ..plans.expr import Ref

    if by is None:
        return [x.columns[0]]
    if isinstance(by, (str, Ref)):
        by = [by]
    return [b._name if isinstance(b, Ref) else str(b) for b in by]


@verb2
def rows_insert(
    x: Any, y: Any, by: Any = None, conflict: str = "error", check: bool = True
) -> Tibble:
    """check=False skips the eager conflict scan (a full extra join
    pass at scale) and trusts the caller that keys don't clash."""
    x, y = ensure_tibble(x), ensure_tibble(y)
    keys = _key_names(x, by)
    if conflict == "error":
        if check:
            n_clash = y.df.join(x.df.select(*keys), on=keys, how="left_semi").count()
            if n_clash:
                raise ValueError(f"rows_insert: {n_clash} keys already exist")
        new_rows = y
    else:  # ignore
        new_rows = y.with_df(y.df.join(x.df.select(*keys), on=keys, how="left_anti"))
    from .bind import bind_rows

    return bind_rows(x, new_rows)


@verb2
def rows_append(x: Any, y: Any) -> Tibble:
    x, y = ensure_tibble(x), ensure_tibble(y)
    extra = [c for c in y.columns if c not in x.columns]
    if extra:
        # reference rows.py: y must not carry columns absent from x
        raise ValueError(f"rows_append: columns in y but not x: {extra}")
    return bind_rows(x, y)


def _rows_merge(x: Tibble, y: Tibble, by: Any, patch_only_na: bool, unmatched: str = "error") -> Tibble:
    keys = _key_names(x, by)
    ydf = y.df.select(*y.columns)
    upd_cols = [c for c in y.columns if c not in keys]
    renamed = ydf
    for c in upd_cols:
        renamed = renamed.withColumnRenamed(c, f"__datar_y_{c}")
    joined = x.df.join(renamed, on=keys, how="left")
    out = joined
    for c in upd_cols:
        yc = F.col(f"__datar_y_{c}")
        xc = F.col(c)
        if patch_only_na:
            new = F.coalesce(xc, yc)  # patch: fill only NAs (rows.py:237-251)
        else:
            new = F.coalesce(yc, xc)  # update: y wins when matched
        out = out.withColumn(c, new).drop(f"__datar_y_{c}")
    return x.with_df(out)


@verb2
def rows_update(
    x: Any, y: Any, by: Any = None, unmatched: str = "error", check: bool = True
) -> Tibble:
    """check=False skips the eager unmatched-key scan (one extra join
    pass); unmatched y rows are then silently ignored by the merge."""
    x, y = ensure_tibble(x), ensure_tibble(y)
    if unmatched == "error" and check:
        keys = _key_names(x, by)
        n = y.df.join(x.df.select(*keys), on=keys, how="left_anti").count()
        if n:
            raise ValueError(f"rows_update: {n} keys in y not present in x")
    return _rows_merge(x, y, by, patch_only_na=False)


@verb2
def rows_patch(x: Any, y: Any, by: Any = None, unmatched: str = "error") -> Tibble:
    x, y = ensure_tibble(x), ensure_tibble(y)
    return _rows_merge(x, y, by, patch_only_na=True)


@verb2
def rows_upsert(x: Any, y: Any, by: Any = None) -> Tibble:
    x, y = ensure_tibble(x), ensure_tibble(y)
    keys = _key_names(x, by)
    updated = _rows_merge(x, y, by, patch_only_na=False)
    new_rows = y.with_df(y.df.join(x.df.select(*keys), on=keys, how="left_anti"))
    return bind_rows(updated, new_rows)


@verb2
def rows_delete(
    x: Any, y: Any, by: Any = None, unmatched: str = "error", check: bool = True
) -> Tibble:
    """dplyr default: y keys absent from x are an error (reference
    tests/dplyr/test_rows.py::test_rows_delete_unmatched_error);
    check=False (or unmatched='ignore') skips the eager scan."""
    x, y = ensure_tibble(x), ensure_tibble(y)
    keys = _key_names(x, by)
    if unmatched == "error" and check:
        n = y.df.join(x.df.select(*keys), on=keys, how="left_anti").count()
        if n:
            raise ValueError(f"rows_delete: {n} keys in y missing from x")
    out = x.df.join(y.df.select(*keys).dropDuplicates(), on=keys, how="left_anti")
    return x.with_df(out)
