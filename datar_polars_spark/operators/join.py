"""Join verbs (reference ``api/dplyr/join.py``).

All reference joins are equi-joins; Catalyst picks broadcast vs
sort-merge vs shuffled-hash per side statistics (AQE re-plans at
runtime), so no join-strategy code lives here. ``nest_join`` — a
per-row driver loop in the reference (``join.py:239-250``) — is
re-expressed distributed as ``collect_list(struct)`` + left join.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from ..plans.context import ORDER_COL
from ..plans.expr import Ref
from ..plans.verb import verb, verb2
from ..tibble import Tibble, ensure_tibble

__all__ = [
    "inner_join",
    "left_join",
    "right_join",
    "full_join",
    "semi_join",
    "anti_join",
    "cross_join",
    "nest_join",
    "salted_join",
    "asof_join",
    "range_join",
    "overlap_join",
]

_Y_ORDER = "__datar_ro_y__"


def _resolve_by(x: Tibble, y: Tibble, by: Any) -> tuple[list[str], list[str]]:
    """None -> natural join on common columns (reference join.py:29-46)."""
    if by is None:
        common = [c for c in x.columns if c in set(y.columns)]
        if not common:
            raise ValueError("no common columns to join by")
        return common, common
    if isinstance(by, dict):
        return list(by.keys()), list(by.values())
    if isinstance(by, (str, Ref)):
        by = [by]
    names = [b._name if isinstance(b, Ref) else str(b) for b in by]
    return names, names


def _prep_sides(x: Tibble, y: Tibble, left_on: list[str], right_on: list[str],
                suffix: tuple[str, str], keep: bool):
    xdf = x.df
    ydf = y.df.withColumnRenamed(ORDER_COL, _Y_ORDER)
    # rename right keys to the left names so Spark's name-based `on`
    # coalesces key columns (dplyr default keep=False)
    left_keys = list(left_on)
    if not keep:
        for lk, rk in zip(left_on, right_on):
            if rk != lk:
                ydf = ydf.withColumnRenamed(rk, lk)
        right_keys = list(left_on)
    else:
        # keep=True with equal names: both key columns survive, so
        # suffix them like dplyr's k.x/k.y (reference join.py:62-73)
        left_keys, right_keys = [], []
        for lk, rk in zip(left_on, right_on):
            if rk == lk:
                xdf = xdf.withColumnRenamed(lk, lk + suffix[0])
                ydf = ydf.withColumnRenamed(rk, rk + suffix[1])
                left_keys.append(lk + suffix[0])
                right_keys.append(rk + suffix[1])
            else:
                left_keys.append(lk)
                right_keys.append(rk)
    # suffix non-key clashes (reference join.py:62-73)
    xkeys = set(left_keys)
    ykeys = set(right_keys)
    xcols = [c for c in xdf.columns if not c.startswith("__datar_")]
    ycols = [c for c in ydf.columns if not c.startswith("__datar_")]
    clashes = (set(xcols) - xkeys) & (set(ycols) - ykeys)
    for c in clashes:
        xdf = xdf.withColumnRenamed(c, c + suffix[0])
        ydf = ydf.withColumnRenamed(c, c + suffix[1])
    return xdf, ydf, left_keys, right_keys


def _join(x: Any, y: Any, by: Any, how: str, suffix=("_x", "_y"), keep: bool = False) -> Tibble:
    x = ensure_tibble(x)
    y = ensure_tibble(y)
    left_on, right_on = _resolve_by(x, y, by)
    xdf, ydf, left_keys, right_keys = _prep_sides(x, y, left_on, right_on, suffix, keep)

    if keep:
        cond = None
        for lk, rk in zip(left_keys, right_keys):
            c = xdf[lk] == ydf[rk]
            cond = c if cond is None else (cond & c)
        out = xdf.join(ydf, on=cond, how=how)
    else:
        out = xdf.join(ydf, on=left_keys, how=how)

    # frame order: left order primary, right order tiebreak (reference
    # maintain_order="left"/"right", join.py:111). Combined as a struct
    # (structs are orderable in Spark) — NO physical sort at join time;
    # order is only realized if a downstream op needs it.
    if how == "right":
        primary, secondary = _Y_ORDER, ORDER_COL
    else:
        primary, secondary = ORDER_COL, _Y_ORDER
    if ORDER_COL in out.columns and _Y_ORDER in out.columns:
        combined = F.struct(
            F.col(primary).alias("p"), F.col(secondary).alias("s")
        )
        out = (
            out.withColumn("__datar_ro_new__", combined)
            .drop(ORDER_COL, _Y_ORDER)
            .withColumnRenamed("__datar_ro_new__", ORDER_COL)
        )
    elif _Y_ORDER in out.columns:
        out = out.withColumnRenamed(_Y_ORDER, ORDER_COL)

    levels = {**y.levels, **x.levels}
    return Tibble(out, groups=[g for g in x.group_vars if g in out.columns], levels=levels)


@verb2
def inner_join(x, y, by=None, suffix=("_x", "_y"), keep=False):
    return _join(x, y, by, "inner", suffix, keep)


@verb2
def left_join(x, y, by=None, suffix=("_x", "_y"), keep=False):
    return _join(x, y, by, "left", suffix, keep)


@verb2
def right_join(x, y, by=None, suffix=("_x", "_y"), keep=False):
    return _join(x, y, by, "right", suffix, keep)


@verb2
def full_join(x, y, by=None, suffix=("_x", "_y"), keep=False):
    return _join(x, y, by, "full", suffix, keep)


@verb2
def semi_join(x, y, by=None):
    x = ensure_tibble(x)
    y = ensure_tibble(y)
    left_on, right_on = _resolve_by(x, y, by)
    ydf = y.df.select(*right_on)
    for lk, rk in zip(left_on, right_on):
        if rk != lk:
            ydf = ydf.withColumnRenamed(rk, lk)
    out = x.df.join(ydf, on=left_on, how="left_semi")
    return x.with_df(out)


@verb2
def anti_join(x, y, by=None):
    x = ensure_tibble(x)
    y = ensure_tibble(y)
    left_on, right_on = _resolve_by(x, y, by)
    ydf = y.df.select(*right_on)
    for lk, rk in zip(left_on, right_on):
        if rk != lk:
            ydf = ydf.withColumnRenamed(rk, lk)
    out = x.df.join(ydf, on=left_on, how="left_anti")
    return x.with_df(out)


@verb2
def cross_join(x, y, suffix=("_x", "_y")):
    x = ensure_tibble(x)
    y = ensure_tibble(y)
    ydf = y.df.withColumnRenamed(ORDER_COL, _Y_ORDER)
    clashes = set(x.columns) & set(y.columns)
    xdf = x.df
    for c in clashes:
        xdf = xdf.withColumnRenamed(c, c + suffix[0])
        ydf = ydf.withColumnRenamed(c, c + suffix[1])
    out = xdf.crossJoin(ydf)
    if ORDER_COL in out.columns and _Y_ORDER in out.columns:
        out = (
            out.withColumn(
                "__datar_ro_new__",
                F.struct(F.col(ORDER_COL).alias("p"), F.col(_Y_ORDER).alias("s")),
            )
            .drop(ORDER_COL, _Y_ORDER)
            .withColumnRenamed("__datar_ro_new__", ORDER_COL)
        )
    elif _Y_ORDER in out.columns:
        out = out.withColumnRenamed(_Y_ORDER, ORDER_COL)
    return Tibble(out, groups=x.group_vars, levels={**y.levels, **x.levels})


@verb2
def salted_join(
    x, y, by, how: str = "inner", salt: int = 16, suffix=("_x", "_y")
):
    """Skew-mitigated equi-join: salt the skewed (left) side's key into
    ``salt`` sub-keys and replicate the right side once per salt value,
    so one hot key spreads over ``salt`` reducers instead of one.

    Use when AQE's skew-join split isn't enough (e.g. a single key
    holding >10% of rows). ``by`` must be a dict {left_key: right_key}
    or a shared column name. The salt columns never escape the join.
    """
    from pyspark.sql import functions as F

    from ..tibble import ensure_tibble

    if how in ("right", "full", "outer", "full_outer"):
        # unmatched right rows would be emitted once per salt replica
        raise ValueError(f"salted_join does not support how={how!r}; "
                         "salt the other side and use 'left' instead")
    x, y = ensure_tibble(x), ensure_tibble(y)
    left_on, right_on = _resolve_by(x, y, by)
    xd = x.df.withColumn("__salt__", (F.rand(42) * salt).cast("int"))
    yd = y.df.crossJoin(
        y.df.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt__"))
    )
    xdf, ydf, left_keys, _ = _prep_sides(
        x.with_df(xd), y.with_df(yd),
        left_on + ["__salt__"], right_on + ["__salt__"], suffix, keep=False,
    )
    out = xdf.join(ydf, left_keys, how).drop("__salt__", _Y_ORDER)
    return Tibble(out)


@verb2
def nest_join(x, y, by=None, name: str | None = None):
    """Left row × matching right rows nested as array<struct> — the
    distributed re-expression of the reference's driver loop
    (``join.py:239-250``), per SURVEY §2.4."""
    x = ensure_tibble(x)
    y = ensure_tibble(y)
    left_on, right_on = _resolve_by(x, y, by)
    # reference default column name (tests/dplyr/test_join.py:267)
    nm = name or "_y_joined"
    payload = [c for c in y.columns if c not in right_on]
    ydf = y.df
    for lk, rk in zip(left_on, right_on):
        if rk != lk:
            ydf = ydf.withColumnRenamed(rk, lk)
    nested = ydf.groupBy(*left_on).agg(
        F.collect_list(F.struct(*payload)).alias(nm)
    )
    out = x.df.join(nested, on=left_on, how="left")
    out = out.withColumn(nm, F.coalesce(F.col(nm), F.array()))
    return x.with_df(out)


@verb2
def asof_join(
    x,
    y,
    by=None,
    on=None,
    direction: str = "backward",
    suffix=("_x", "_y"),
    tolerance=None,
):
    """As-of join (no reference equivalent; dplyr 1.1 ``join_by``
    rolling-join / pandas ``merge_asof`` semantics): for each left row,
    attach the single nearest right row whose ``on`` value is <= the
    left's (``backward``) or >= (``forward``), within equal ``by`` keys.
    Left rows with no candidate keep NULL right columns (left-join-like).

    Distributed shape: tag + union both sides, then ONE window over
    partitionBy(by) orderBy(on, side) carrying the last right payload —
    a merge-join, not a range cross-product. At scale this costs one
    shuffle of (left + right), same as a sort-merge join; there is no
    per-key loop and no bucket blow-up on dense time series. With
    ``by=None`` the window is a single global partition — supply keys at
    scale.

    ``tolerance``: maximum |left.on - right.on| for a match (same units
    as the ``on`` column); farther matches become NULL.
    """
    from pyspark.sql import Window

    x = ensure_tibble(x)
    y = ensure_tibble(y)
    if on is None:
        raise ValueError("asof_join requires `on`")
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if isinstance(on, dict):
        (on_l, on_r), = on.items()
    else:
        on_l = on_r = on._name if isinstance(on, Ref) else str(on)

    by_l, by_r = ([], []) if by is None else _resolve_by(x, y, by)

    xdf = x.df
    ydf = y.df.drop(_Y_ORDER, ORDER_COL)
    # align right key names with left
    for lk, rk in zip(by_l, by_r):
        if rk != lk:
            ydf = ydf.withColumnRenamed(rk, lk)
    # suffix right payload columns clashing with left non-key columns
    payload = [c for c in ydf.columns if c not in by_l and c != on_r]
    xvis = set(c for c in xdf.columns if not c.startswith("__datar_"))
    renamed = []
    for c in payload:
        out_name = c + suffix[1] if c in xvis else c
        if out_name != c:
            ydf = ydf.withColumnRenamed(c, out_name)
        renamed.append(out_name)
    if not renamed:
        raise ValueError("asof_join: right side has no payload columns")

    def _numeric_key(df: DataFrame, name: str) -> Column:
        # temporal keys can't cast straight to double in Spark 4
        # (TIMESTAMP_NTZ -> DOUBLE is a DATATYPE_MISMATCH); route them
        # through TIMESTAMP, which yields fractional epoch seconds and
        # preserves order on both sides identically.
        dt = dict(df.dtypes).get(name, "")
        col = F.col(name)
        if dt.startswith("timestamp") or dt == "date":
            return col.cast("timestamp").cast("double")
        return col.cast("double")

    pay_struct = F.struct(
        _numeric_key(ydf, on_r).alias("__yt__"),
        *[F.col(c) for c in renamed],
    )
    rside = ydf.select(
        *by_l,
        _numeric_key(ydf, on_r).alias("__t__"),
        pay_struct.alias("__y__"),
        F.lit(0).alias("__side__"),
    )
    # left side carries every left column + the probe time
    lside = xdf.withColumn("__t__", _numeric_key(xdf, on_l)).withColumn(
        "__side__", F.lit(1)
    )
    lonly = [c for c in lside.columns if c not in rside.columns]
    for c in lonly:
        dt = dict(lside.dtypes)[c]
        rside = rside.withColumn(c, F.lit(None).cast(dt))
    for c in ("__y__",):
        lside = lside.withColumn(c, F.lit(None).cast(rside.schema["__y__"].dataType))
    both = lside.unionByName(rside)

    part = Window.partitionBy(*by_l) if by_l else Window.partitionBy()
    if direction == "backward":
        w = part.orderBy(F.col("__t__").asc_nulls_first(), F.col("__side__").asc())
    else:
        w = part.orderBy(F.col("__t__").desc_nulls_first(), F.col("__side__").asc())
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = F.last("__y__", ignorenulls=True).over(w)

    out = (
        both.withColumn("__m__", carried)
        .filter(F.col("__side__") == 1)
        .drop("__side__")
    )
    # a NULL probe value never matches
    matched = F.when(F.col("__t__").isNull(), F.lit(None)).otherwise(F.col("__m__"))
    if tolerance is not None:
        matched = F.when(
            F.abs(F.col("__t__") - matched["__yt__"]) <= F.lit(tolerance), matched
        )
    out = out.withColumn("__m__", matched)
    for c in renamed:
        out = out.withColumn(c, F.col("__m__")[c])
    out = out.drop("__m__", "__t__", "__y__")

    levels = {**y.levels, **x.levels}
    levels = {k: v for k, v in levels.items() if k in out.columns}
    return Tibble(out, groups=[g for g in x.group_vars if g in out.columns], levels=levels)


@verb2
def range_join(
    x,
    y,
    on=None,
    by=None,
    suffix=("_x", "_y"),
    how: str = "inner",
    bucket_width=None,
    max_buckets_per_interval: int = 1024,
):
    """Point-in-interval join (no reference equivalent; dplyr 1.1
    ``join_by(between(key, lo, hi))`` semantics): attach every right
    row whose ``[lo, hi]`` interval contains the left ``key``, within
    equal ``by`` keys. ``on=(key, lo, hi)`` names the left key column
    and the right interval columns. ``how``: "inner" or "left".

    Distributed shape — a naive inequality join is a broadcast nested
    loop (O(|x| * |y|)); instead both sides are BUCKETIZED so Catalyst
    runs an ordinary hash equi-join:

      * left rows land in bucket floor(key / width);
      * each right interval explodes to the buckets it spans
        (``sequence``), so a candidate pair always shares a bucket;
      * an exact ``lo <= key <= hi`` filter removes false candidates.

    ``bucket_width`` defaults to the p95 interval span (one tiny
    quantile job), so ~95% of intervals explode to at most 2 buckets
    and candidate volume stays near-linear. Intervals spanning more
    than ``max_buckets_per_interval`` buckets (rare giants) are routed
    through a separate small broadcast side with the raw inequality
    predicate instead of exploding."""
    from pyspark.sql import DataFrame as _DF

    x = ensure_tibble(x).ensure_order()
    y = ensure_tibble(y)
    if on is None or len(on) != 3:
        raise ValueError("range_join requires on=(key, lo, hi)")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    key_n, lo_n, hi_n = (
        c._name if isinstance(c, Ref) else str(c) for c in on
    )
    by_l, by_r = ([], []) if by is None else _resolve_by(x, y, by)

    xdf = x.df
    ydf = y.df.drop(_Y_ORDER, ORDER_COL)
    for lk, rk in zip(by_l, by_r):
        if rk != lk:
            ydf = ydf.withColumnRenamed(rk, lk)
    # suffix right payload columns clashing with left visible columns
    xvis = {c for c in xdf.columns if not c.startswith("__datar_")}
    for c in [c for c in ydf.columns if c not in by_l]:
        if c in xvis:
            ydf = ydf.withColumnRenamed(c, c + suffix[1])
            if c == lo_n:
                lo_n = c + suffix[1]
            elif c == hi_n:
                hi_n = c + suffix[1]

    def _num(df, name):
        dt = dict(df.dtypes).get(name, "")
        col = F.col(name)
        if dt.startswith("timestamp") or dt == "date":
            return col.cast("timestamp").cast("double")
        return col.cast("double")

    klc = _num(xdf, key_n)
    loc, hic = _num(ydf, lo_n), _num(ydf, hi_n)

    if bucket_width is None:
        spans = ydf.select((hic - loc).alias("__s__"))
        try:
            q = spans.stat.approxQuantile("__s__", [0.95], 0.01)
            bucket_width = q[0] if q else None
        except Exception:
            bucket_width = None
        if not bucket_width or bucket_width <= 0:
            bucket_width = 1.0
    width = float(bucket_width)

    cond = [F.col(c) for c in by_l] if by_l else []
    exact = (F.col(key_n + "__kv__") >= F.col("__lo__")) & (
        F.col(key_n + "__kv__") <= F.col("__hi__")
    )

    lb = xdf.withColumn(key_n + "__kv__", klc).withColumn(
        "__bkt__", F.floor(klc / F.lit(width))
    )
    span_buckets = F.floor(hic / F.lit(width)) - F.floor(loc / F.lit(width))
    ydf2 = ydf.withColumn("__lo__", loc).withColumn("__hi__", hic).withColumn(
        "__nb__", span_buckets
    )
    narrow = ydf2.filter(F.col("__nb__") < max_buckets_per_interval)
    wide = ydf2.filter(F.col("__nb__") >= max_buckets_per_interval)

    rb = narrow.withColumn(
        "__bkt__",
        F.explode(
            F.sequence(
                F.floor(F.col("__lo__") / F.lit(width)),
                F.floor(F.col("__hi__") / F.lit(width)),
            )
        ),
    ).drop("__nb__")
    joined = lb.join(rb, on=[*by_l, "__bkt__"], how="inner").filter(exact)

    # rare giant intervals: tiny side, broadcast + raw inequality
    if wide.take(1):
        wide_side = F.broadcast(wide.drop("__nb__"))
        if by_l:
            wjoin = lb.join(wide_side, on=by_l, how="inner").filter(exact)
        else:
            wjoin = lb.crossJoin(wide_side).filter(exact)
        joined = joined.unionByName(wjoin, allowMissingColumns=True)

    out = joined.drop("__bkt__", key_n + "__kv__", "__lo__", "__hi__")

    if how == "left":
        matched_keys = out.select(ORDER_COL).dropDuplicates() if ORDER_COL in out.columns else None
        if matched_keys is not None:
            unmatched = xdf.join(matched_keys, on=ORDER_COL, how="left_anti")
            for c in out.columns:
                if c not in unmatched.columns:
                    unmatched = unmatched.withColumn(
                        c, F.lit(None).cast(dict(out.dtypes)[c])
                    )
            out = out.unionByName(unmatched.select(*out.columns))

    levels = {**y.levels, **x.levels}
    levels = {k: v for k, v in levels.items() if k in out.columns}
    return Tibble(
        out,
        groups=[g for g in x.group_vars if g in out.columns],
        levels=levels,
    )


@verb2
def overlap_join(
    x,
    y,
    on=None,
    by=None,
    suffix=("_x", "_y"),
    how: str = "inner",
    bucket_width=None,
    max_buckets_per_interval: int = 1024,
):
    """Interval-overlap join (dplyr 1.1 ``join_by(overlaps(...))``):
    attach every right row whose ``[y_lo, y_hi]`` interval intersects
    the left ``[x_lo, x_hi]``, within equal ``by`` keys.
    ``on=((x_lo, x_hi), (y_lo, y_hi))``. ``how``: "inner" or "left".

    Same bucketization as range_join, applied to BOTH sides: each
    interval explodes to the width-sized buckets it spans, overlapping
    intervals always share at least one bucket, an exact
    ``x_lo <= y_hi AND y_lo <= x_hi`` filter drops false candidates,
    and the (left-id, right-id) pairs are deduplicated (a pair can
    share several buckets). Giant intervals on either side are routed
    through a small broadcast leg with the raw predicate instead of
    exploding."""
    x = ensure_tibble(x).ensure_order()
    y = ensure_tibble(y)
    if (
        on is None
        or len(on) != 2
        or any(len(side) != 2 for side in on)
    ):
        raise ValueError("overlap_join requires on=((x_lo, x_hi), (y_lo, y_hi))")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    (xlo_n, xhi_n), (ylo_n, yhi_n) = (
        tuple(c._name if isinstance(c, Ref) else str(c) for c in side)
        for side in on
    )
    by_l, by_r = ([], []) if by is None else _resolve_by(x, y, by)

    xdf = x.df
    ydf = y.df.drop(_Y_ORDER, ORDER_COL)
    for lk, rk in zip(by_l, by_r):
        if rk != lk:
            ydf = ydf.withColumnRenamed(rk, lk)
    xvis = {c for c in xdf.columns if not c.startswith("__datar_")}
    for c in [c for c in ydf.columns if c not in by_l]:
        if c in xvis:
            ydf = ydf.withColumnRenamed(c, c + suffix[1])
            if c == ylo_n:
                ylo_n = c + suffix[1]
            elif c == yhi_n:
                yhi_n = c + suffix[1]

    def _num(df, name):
        dt = dict(df.dtypes).get(name, "")
        col = F.col(name)
        if dt.startswith("timestamp") or dt == "date":
            return col.cast("timestamp").cast("double")
        return col.cast("double")

    xlo, xhi = _num(xdf, xlo_n), _num(xdf, xhi_n)
    ylo, yhi = _num(ydf, ylo_n), _num(ydf, yhi_n)

    if bucket_width is None:
        spans = ydf.select((yhi - ylo).alias("__s__")).union(
            xdf.select((xhi - xlo).alias("__s__"))
        )
        try:
            q = spans.stat.approxQuantile("__s__", [0.95], 0.01)
            bucket_width = q[0] if q else None
        except Exception:
            bucket_width = None
        if not bucket_width or bucket_width <= 0:
            bucket_width = 1.0
    width = float(bucket_width)

    exact = (F.col("__xlo__") <= F.col("__yhi__")) & (
        F.col("__ylo__") <= F.col("__xhi__")
    )

    xb = xdf.withColumn("__xlo__", xlo).withColumn("__xhi__", xhi)
    yb = ydf.withColumn("__ylo__", ylo).withColumn("__yhi__", yhi).withColumn(
        "__yid__", F.monotonically_increasing_id()
    )
    x_span = F.floor(F.col("__xhi__") / F.lit(width)) - F.floor(
        F.col("__xlo__") / F.lit(width)
    )
    y_span = F.floor(F.col("__yhi__") / F.lit(width)) - F.floor(
        F.col("__ylo__") / F.lit(width)
    )
    x_narrow = xb.filter(x_span < max_buckets_per_interval)
    x_wide = xb.filter(x_span >= max_buckets_per_interval)
    y_narrow = yb.filter(y_span < max_buckets_per_interval)
    y_wide = yb.filter(y_span >= max_buckets_per_interval)

    def _explode(df, lo, hi):
        return df.withColumn(
            "__bkt__",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / F.lit(width)),
                    F.floor(F.col(hi) / F.lit(width)),
                )
            ),
        )

    lx = _explode(x_narrow, "__xlo__", "__xhi__")
    ry = _explode(y_narrow, "__ylo__", "__yhi__")
    pair_keys = [ORDER_COL, "__yid__"]
    joined = (
        lx.join(ry, on=[*by_l, "__bkt__"], how="inner")
        .filter(exact)
        .dropDuplicates(pair_keys)
        .drop("__bkt__")
    )

    legs = [joined]
    # giant-interval legs: broadcast the small side, raw predicate
    if y_wide.take(1):
        yw = F.broadcast(y_wide)
        leg = (
            x_narrow.join(yw, on=by_l, how="inner")
            if by_l
            else x_narrow.crossJoin(yw)
        ).filter(exact)
        legs.append(leg)
    if x_wide.take(1):
        xw = F.broadcast(x_wide)
        leg = (
            xw.join(yb, on=by_l, how="inner") if by_l else xw.crossJoin(yb)
        ).filter(exact).dropDuplicates(pair_keys)
        legs.append(leg)
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg, allowMissingColumns=True)
    out = out.drop("__bkt__", "__xlo__", "__xhi__", "__ylo__", "__yhi__", "__yid__")

    if how == "left":
        matched = out.select(ORDER_COL).dropDuplicates()
        unmatched = xdf.join(matched, on=ORDER_COL, how="left_anti")
        for c in out.columns:
            if c not in unmatched.columns:
                unmatched = unmatched.withColumn(
                    c, F.lit(None).cast(dict(out.dtypes)[c])
                )
        out = out.unionByName(unmatched.select(*out.columns))

    levels = {**y.levels, **x.levels}
    levels = {k: v for k, v in levels.items() if k in out.columns}
    return Tibble(
        out,
        groups=[g for g in x.group_vars if g in out.columns],
        levels=levels,
    )
