"""Tibble: a Spark DataFrame + datar metadata wrapper.

The reference subclasses ``pl.DataFrame`` and stores metadata in a
``_datar`` dict (``datar_polars/tibble.py:19-44``): group variables
(``group_by.py:24-52``), rowwise flag, factor levels. Spark DataFrames
are not subclass-friendly, so we wrap by composition. Spark frames are
always lazy, so the reference's Tibble/LazyTibble split collapses into
one class (`lazy()`/`collect()` stay as API no-ops / action boundaries).

Row-order discipline (SURVEY §1.4): dplyr semantics are row-order-
deterministic but Spark frames are unordered. Every Tibble carries a
hidden ``__datar_ro__`` long column:

* assigned at ingest via ``monotonically_increasing_id()`` (narrow, no
  shuffle; ids increase with partition index -> preserves file order);
* after a sort, reassigned with the same function *on the sorted
  frame* — Spark's ``orderBy`` range-partitions, so partition index
  increases with sort order and the new ids form a valid total order
  consistent with the sort, with no single-partition window;
* group-bys propagate ``min(__datar_ro__)`` per group (the analogue of
  the reference's ``maintain_order=True`` at ``summarise.py:239``);
* ``collect()`` sorts by it before handing rows to the driver.

Scale note: the hidden column is 8 bytes/row and never induces a
shuffle on its own; order-sensitive *windows* ordered by it are only
created when the user actually calls an order-sensitive function.
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.context import ORDER_COL

HIDDEN_PREFIX = "__datar_"


class Tibble:
    def __init__(
        self,
        df: DataFrame,
        groups: Sequence[str] = (),
        rowwise: bool = False,
        levels: dict[str, list] | None = None,
        sorted_by: tuple | None = None,
        group_drop: bool = True,
        order_stable: bool = True,
    ):
        # NOTE: the order column is LAZY — assigned only when an
        # order-sensitive operation first needs it. Materializing it at
        # ingest would put a nondeterministic projection between the scan
        # and later filters, blocking Catalyst's predicate pushdown.
        self._df = df
        self.group_vars: tuple[str, ...] = tuple(groups)
        self.rowwise: bool = rowwise
        # factor levels per column (SURVEY §1.1: Spark has no categorical
        # dtype -> string column + levels list in metadata)
        self.levels: dict[str, list] = dict(levels or {})
        # group_by(_drop=False): keep unused factor levels as empty groups
        self.group_drop: bool = group_drop
        # factor columns declared ordered (as_ordered / factor_(ordered=True))
        self.ordered_factors: set[str] = set()
        # True while __datar_ro__ values are reproducible across separate
        # jobs over this lineage (scan-order mono ids on deterministic
        # sources). A range-sort reassignment (arrange) samples partition
        # boundaries with a per-compilation seed, so its ids are only
        # valid within one job -> order_stable=False disables the
        # two-pass distributed window rewrite (it needs a second job).
        self.order_stable: bool = order_stable
        # (column_name, ascending) of the last arrange's FIRST sort key
        # when it is a plain numeric column: lets the two-pass window
        # rewrite derive buckets from key VALUES (cross-job
        # deterministic via quantile boundaries) even though post-sort
        # mono ids are job-local. Reset whenever the column is
        # overwritten or rows are reordered by other means.
        self.sort_meta: tuple[str, bool] | None = None
        # "groups" (plain group_by) | "cube" | "rollup": how summarise
        # builds its aggregation grid (Spark-native multi-dimensional
        # aggregates — absent from the reference, free on Catalyst)
        self.grouping_mode: str = "groups"
        # R-style rownames metadata (set_rownames/column_to_rownames —
        # reference api/base/verbs.py:156-172 stores them in _datar).
        # Driver-side list; meaningful only for small frames.
        self.rownames: list | None = None

    # ---- basic accessors -------------------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def columns(self) -> list[str]:
        return [c for c in self._df.columns if not c.startswith(HIDDEN_PREFIX)]

    @property
    def dtypes(self) -> list[tuple[str, str]]:
        return [
            (n, t) for n, t in self._df.dtypes if not n.startswith(HIDDEN_PREFIX)
        ]

    @property
    def schema(self):
        return self._df.schema

    def nrow(self) -> int:
        return self._df.count()

    def ncol(self) -> int:
        return len(self.columns)

    # ---- metadata-propagating constructors -------------------------------
    def with_df(
        self,
        df: DataFrame,
        *,
        groups: Sequence[str] | None = None,
        rowwise: bool | None = None,
        levels: dict[str, list] | None = None,
        keep_sort_meta: bool = False,
    ) -> "Tibble":
        new_groups = self.group_vars if groups is None else tuple(groups)
        new_groups = tuple(g for g in new_groups if g in df.columns)
        lv = self.levels if levels is None else levels
        lv = {k: v for k, v in lv.items() if k in df.columns}
        out = Tibble(
            df,
            groups=new_groups,
            rowwise=self.rowwise if rowwise is None else rowwise,
            levels=lv,
            group_drop=self.group_drop,
            order_stable=self.order_stable,
        )
        out.ordered_factors = {c for c in self.ordered_factors if c in out.levels}
        out.grouping_mode = self.grouping_mode
        out.rownames = self.rownames
        # sort_meta (last arrange's key) is only valid while frame order
        # still follows the key column's VALUES. A generic df rewrite
        # can't prove that, so the default is to DROP it; call sites
        # that provably preserve both row order and the key's values
        # (filter, select/relocate, mutate-of-other-columns, slice,
        # hidden-column bookkeeping) opt in with keep_sort_meta=True.
        if keep_sort_meta and self.sort_meta and self.sort_meta[0] in df.columns:
            out.sort_meta = self.sort_meta
        return out

    # ---- order helpers ----------------------------------------------------
    @property
    def has_order(self) -> bool:
        return ORDER_COL in self._df.columns

    def ensure_order(self) -> "Tibble":
        """Materialize the hidden order column (ids increase with
        partition index -> preserves scan/file order; narrow, no shuffle)."""
        if self.has_order:
            return self
        return self.with_df(
            self._df.withColumn(ORDER_COL, F.monotonically_increasing_id()),
            keep_sort_meta=True,
        )

    def ensure_pos(self) -> "Tibble":
        """Materialize __datar_pos__: 0-based dense frame positions,
        fully distributed (no global window). Range-sort by the order
        column, tag rows with mono ids ((partition << 33) | offset),
        count rows per partition in one tiny job, add broadcast
        cumulative offsets. Persisted so both passes see the same range
        boundaries (the RangePartitioner samples with a per-compilation
        seed)."""
        from .plans.context import POS_COL

        t = self.ensure_order()
        if POS_COL in t._df.columns:
            return t
        d = (
            t._df.orderBy(F.col(ORDER_COL).asc())
            .withColumn("__datar_mono__", F.monotonically_increasing_id())
            .persist()
        )
        from .plans.cache import register_internal_cache

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
        return t.with_df(
            d.withColumn(POS_COL, pos.cast("long")).drop("__datar_mono__"),
            keep_sort_meta=True,
        )

    def ensure_gid(self) -> "Tibble":
        """Materialize __datar_gid__: 1-based dense group id in key-sorted
        order. The rank window runs over the DISTINCT keys only (group
        cardinality, not row count — tiny), then broadcast-joins back, so
        the fact table never funnels through one task the way
        ``dense_rank().over(Window.orderBy(keys))`` would."""
        GID = "__datar_gid__"
        if GID in self._df.columns:
            return self
        gvars = list(self.group_vars)
        if not gvars:
            return self.with_df(
                self._df.withColumn(GID, F.lit(1)), keep_sort_meta=True
            )
        from pyspark.sql import Window

        keys = (
            self._df.select(*gvars)
            .distinct()
            .withColumn(
                GID,
                F.dense_rank().over(
                    Window.orderBy(*[F.col(g).asc_nulls_last() for g in gvars])
                ),
            )
        )
        joined = self._df.join(
            F.broadcast(keys),
            [self._df[g].eqNullSafe(keys[g]) for g in gvars],
            "left",
        )
        # keep the left copy of each key column
        for g in gvars:
            joined = joined.drop(keys[g])
        return self.with_df(joined, keep_sort_meta=True)

    def reassign_order(
        self, *sort_keys: Column, first_key: tuple[str, bool] | None = None
    ) -> "Tibble":
        """Global sort + distributed order-id reassignment (no global
        window). ``first_key=(name, asc)`` records the first sort key
        when it's a plain column — lets downstream two-pass windows
        bucket on key values (plans/context.py:_key_bucket)."""
        d = self._df.orderBy(*sort_keys)
        if ORDER_COL in d.columns:
            d = d.drop(ORDER_COL)
        d = d.withColumn(ORDER_COL, F.monotonically_increasing_id())
        out = self.with_df(d)
        out.order_stable = False
        out.sort_meta = first_key
        return out

    # ---- actions ----------------------------------------------------------
    def collect(self):
        """Materialize to pandas in frame order, hidden columns dropped."""
        d = self._df
        if self.has_order:
            # nulls last: synthetic rows (e.g. _drop=False empty groups)
            # sort after real data
            d = d.orderBy(F.col(ORDER_COL).asc_nulls_last())
        return d.select(*self.columns).toPandas()

    def rows(self) -> list[tuple]:
        pdf = self.collect()
        return list(pdf.itertuples(index=False, name=None))

    def show(self, n: int = 20, truncate: bool = False) -> None:
        d = self._df.orderBy(ORDER_COL) if self.has_order else self._df
        d.select(*self.columns).show(n, truncate)

    def lazy(self) -> "Tibble":
        return self

    def cache(self) -> "Tibble":
        return self.with_df(self._df.cache(), keep_sort_meta=True)

    @property
    def _datar(self) -> dict:
        """Reference-compat metadata view (``Tibble._datar`` dict in
        the reference): derived from this wrapper's typed attributes."""
        return {
            "backend": "spark",
            "groups": list(self.group_vars) or None,
            "rownames": self.rownames,
            "levels": dict(self.levels) or None,
        }

    @property
    def shape(self) -> tuple[int, int]:
        """(nrow, ncol) — triggers a count job, like the reference's
        eager .shape on a collected frame."""
        return self.nrow(), self.ncol()

    def get_column(self, name: str) -> list:
        """Column values as a driver list (reference Tibble.get_column;
        missing columns raise KeyError — the ColumnNotFoundError
        analogue)."""
        if name not in self.columns:
            raise KeyError(f"column {name!r} not found")
        return self[name]

    def __getattr__(self, name: str):
        # dot access to columns (reference df.x). Only reached when
        # normal attribute lookup fails; hidden/underscore names never
        # resolve to columns.
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            cols = object.__getattribute__(self, "_df").columns
        except Exception:
            raise AttributeError(name)
        if name in cols and not name.startswith(HIDDEN_PREFIX):
            return self[name]
        raise AttributeError(name)

    def __getitem__(self, name):
        # df[:, i] / df[:, [i, j]] / df[:, a:b]: positional column
        # access (reference subsetting tests). A bare string stays the
        # column-values form.
        if isinstance(name, tuple) and len(name) == 2:
            rows, cols = name
            if not (isinstance(rows, slice) and rows == slice(None)):
                raise TypeError("only full-row slices (df[:, cols]) are supported")
            visible = self.columns
            if isinstance(cols, int):
                return self[visible[cols]]
            if isinstance(cols, slice):
                picked = visible[cols]
            else:
                picked = [visible[c] if isinstance(c, int) else str(c) for c in cols]
            hidden = [c for c in self._df.columns if c.startswith(HIDDEN_PREFIX)]
            return self.with_df(
                self._df.select(*picked, *hidden), keep_sort_meta=True
            )
        d = self._df.orderBy(ORDER_COL) if self.has_order else self._df
        pdf = d.select(name).toPandas()
        return pdf[name].tolist()

    def __repr__(self) -> str:
        g = f" groups={list(self.group_vars)}" if self.group_vars else ""
        rw = " rowwise" if self.rowwise else ""
        return f"<Tibble [{len(self.columns)} cols]{g}{rw}>"

    # piping: VerbCall defines __rrshift__; this covers Tibble >> verbcall
    def __rshift__(self, other: Any):
        rr = getattr(other, "__rrshift__", None)
        if rr is None:
            return NotImplemented
        return rr(self)


def reconstruct_tibble(data: Any, old: "Tibble | None" = None) -> Tibble:
    """Wrap a frame and carry metadata forward (reference
    ``datar_polars/tibble.py`` reconstruct_tibble): plain frames get
    clean metadata; a Tibble keeps its own; when ``old`` is given, its
    metadata fills in wherever ``data`` carries none (data's own
    metadata takes priority)."""
    out = data if isinstance(data, Tibble) else ensure_tibble(data)
    if out is data:
        # copy-construct so the input is never mutated
        res = out.with_df(out.df, keep_sort_meta=True)
        res.rownames = out.rownames
    else:
        res = out
    if old is not None:
        if not res.group_vars and old.group_vars:
            res.group_vars = tuple(
                g for g in old.group_vars if g in res.df.columns
            )
        if res.rownames is None and old.rownames is not None:
            res.rownames = old.rownames
        if not res.levels and old.levels:
            res.levels = {
                k: v for k, v in old.levels.items() if k in res.df.columns
            }
    return res


def ensure_tibble(data: Any) -> Tibble:
    if isinstance(data, Tibble):
        return data
    if isinstance(data, DataFrame):
        return Tibble(data)
    raise TypeError(f"expected Tibble or Spark DataFrame, got {type(data)}")


def from_pandas(spark: SparkSession, pdf) -> Tibble:
    """pandas NaN in object/float columns becomes a true Spark null —
    pandas uses NaN as its missing marker, and the reference treats NaN
    as NA anyway (``api/tidyr.py:78-101``). All-null columns (untyped
    NA vectors, reference ``api/dplyr/join.py:95-100``) default to
    double — Spark can't infer a type from pure nulls."""
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pdf.copy()
    if len(pdf) == 0:
        # no rows -> no type evidence for inference; build the schema
        # from the pandas dtypes (object -> string, everything numeric
        # keeps its width)
        from pyspark.sql.types import (
            BooleanType,
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
            TimestampType,
        )

        def _sparktype(dt):
            s = str(dt)
            if s.startswith("int") or s.startswith("uint"):
                return LongType()
            if s.startswith("float"):
                return DoubleType()
            if s.startswith("bool"):
                return BooleanType()
            if s.startswith("datetime"):
                return TimestampType()
            return StringType()

        fields = [StructField(c, _sparktype(pdf[c].dtype)) for c in pdf.columns]
        fields.append(StructField(ORDER_COL, LongType()))
        df = spark.createDataFrame([], StructType(fields))
        return Tibble(df)
    all_null = [c for c in pdf.columns if pdf[c].isna().all()]
    # columns whose every value is an empty list carry no element-type
    # evidence either — default to array<double> (mirrors the all-null
    # rule below; reference unchop-empty cases)
    all_empty_arr = [
        c
        for c in pdf.columns
        if c not in all_null
        and len(pdf)
        and all(
            isinstance(v, (list, tuple)) and len(v) == 0 for v in pdf[c]
        )
    ]
    pdf[ORDER_COL] = range(len(pdf))
    for c in pdf.columns:
        # datetime64 columns convert natively (NaT -> null); object-ifying
        # them would leave pandas Timestamps Spark can't infer
        if not str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype(object).where(pd.notnull(pdf[c]), None)
    df = spark.createDataFrame(pdf.drop(columns=all_null + all_empty_arr))
    for c in all_null:
        df = df.withColumn(c, F.lit(None).cast("double"))
    for c in all_empty_arr:
        df = df.withColumn(c, F.array().cast("array<double>"))
    order = [c for c in pdf.columns if c != ORDER_COL] + [ORDER_COL]
    return Tibble(df.select(*order))


def repair_names(names: list[str], how="check_unique") -> list[str]:
    """tibble _name_repair protocol (reference ``api/tibble.py`` /
    tests/tibble name-repair cases): "check_unique" errors on
    duplicates, "unique" suffixes them x__0/x__1, "minimal" keeps them,
    "universal" additionally makes them syntactic, and a list is a
    positional rename."""
    if isinstance(how, (list, tuple)):
        if len(how) != len(names):
            raise ValueError(
                f"_name_repair: {len(how)} names for {len(names)} columns"
            )
        return [str(n) for n in how]
    if how == "minimal":
        return list(names)
    if how == "check_unique":
        seen = set()
        for n in names:
            if n in seen:
                raise ValueError(f"tibble: duplicate column name {n!r}")
            seen.add(n)
        return list(names)
    if how in ("unique", "universal"):
        from .functions.rbase import make_names

        counts: dict[str, int] = {}
        for n in names:
            counts[n] = counts.get(n, 0) + 1
        idx: dict[str, int] = {}
        out = []
        for n in names:
            if counts[n] > 1:
                k = idx.get(n, 0)
                idx[n] = k + 1
                out.append(f"{n}__{k}")
            else:
                out.append(n)
        return make_names(out) if how == "universal" else out
    raise ValueError(f"unknown _name_repair: {how!r}")


def tibble(
    spark: SparkSession = None,
    /,
    *args,
    _rows: int | None = None,
    _name_repair="check_unique",
    **columns,
) -> Tibble:
    """Construct a Tibble from python vectors/scalars (reference
    ``api/tibble.py:45-208``). Length-1 values are recycled; expression
    values (``b=f.a * 2``) are deferred — evaluated against the columns
    to their left, preserving argument order; ``_rows`` makes an empty
    n-row frame; ``_name_repair`` follows the reference protocol.
    Positional args (reference tibble(*args)): a dict contributes its
    items, a Tibble splices its columns, a plain vector becomes an
    unnamed column (auto-named V{i}); name repair then applies across
    the combined name list — under "minimal", Spark cannot hold
    duplicate names, so the first occurrence wins (the reference's
    polars backend collapses dupes the same way)."""
    import pandas as pd

    from .plans.expr import Expr

    if spark is None:
        spark = SparkSession.getActiveSession()
    if args and isinstance(args[0], SparkSession):
        # tolerate tibble(spark_session, ...) routed through *args
        spark, args = args[0], args[1:]
    if args:
        pairs: list[tuple[str, Any]] = []
        for i, a in enumerate(args):
            if isinstance(a, Tibble):
                for c in a.columns:
                    pairs.append((c, a[c]))
            elif isinstance(a, dict):
                pairs.extend(a.items())
            else:
                pairs.append((f"V{i}", a))
        pairs.extend(columns.items())
        repaired = repair_names([n for n, _ in pairs], _name_repair)
        merged: dict[str, Any] = {}
        for (_, v), n in zip(pairs, repaired):
            if n in merged:
                continue  # "minimal" keeps the first duplicate
            merged[n] = v
        columns = merged
        _name_repair = "check_unique"  # already applied
    if not columns:
        df = spark.range(_rows or 0).drop("id")
        return Tibble(df)
    exprs = {k: v for k, v in columns.items() if isinstance(v, Expr)}
    literals = {k: v for k, v in columns.items() if k not in exprs}
    # vctrs common-size rule: lengths other than 1 must agree (0 rows is
    # a legal common size — tibble(x=[]) builds an empty frame)
    sizes = {
        len(v) for v in literals.values() if isinstance(v, (list, tuple, range))
    }
    candidates = sizes - {1}
    if len(candidates) > 1:
        raise ValueError(
            f"tibble columns have incompatible lengths: {sorted(candidates)}"
        )
    n = candidates.pop() if candidates else 1
    data = {}
    for k, v in literals.items():
        if isinstance(v, (list, tuple, range)):
            v = list(v)
            if len(v) == 1 and n != 1:
                v = v * n
            elif len(v) != n:
                raise ValueError(
                    f"tibble column {k!r}: length {len(v)} incompatible with {n}"
                )
            data[k] = v
        else:
            data[k] = [v] * n
    pdf = pd.DataFrame(data)
    if n == 0:
        # empty columns carry no type evidence; default to double (the
        # reference's polars backend lands on Float64 the same way)
        pdf = pdf.astype("float64")
    out = from_pandas(spark, pdf)
    if exprs:
        from .operators.core import mutate, select
        from .plans.expr import Ref

        out = mutate(out, **exprs)
        out = select(out, *[Ref(k) for k in columns])
    if _name_repair != "check_unique":  # kwargs are unique by construction
        repaired = repair_names(out.columns, _name_repair)
        d = out.df
        for old, new in zip(out.columns, repaired):
            if old != new:
                d = d.withColumnRenamed(old, new)
        out = out.with_df(d)
    return out
