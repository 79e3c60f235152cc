"""Vector utilities + grouping-context functions.

Reference: ``api/base/seq.py``/``verbs.py`` (rev, duplicated, lengths,
sample), ``api/base/random.py:47-134`` (rnorm/runif), and
``api/dplyr/context.py`` (cur_group/cur_group_id/n_groups context fns
— reference builds cur_group_id from a collected distinct-key scan at
``context.py:192-205``; here it's a distributed ``dense_rank`` over the
sorted key order).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .aggregates import _nn
from .registry import NEEDS_ORDER, register

ORDER_COL = "__datar_ro__"


@register("rev")
def _rev(ctx, x):
    """Reverse values within the group, in frame order: value at the
    mirrored position, via a full-frame collect_list in descending
    frame order indexed by the ascending row_number."""
    col = ctx.col(x)
    w_desc = (
        ctx.partition()
        .orderBy(F.col(ORDER_COL).desc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    lst = F.collect_list(col).over(w_desc)
    rn = F.row_number().over(ctx.ordered())
    return F.element_at(lst, rn)


@register("duplicated")
def _duplicated(ctx, *xs):
    """R semantics: True for the 2nd+ occurrence of a value (first
    occurrence in frame order is False) — reference ``verbs.py:214-227``."""
    cols = [ctx.col(x) for x in xs]
    w = Window.partitionBy(*list(ctx.groups), *cols).orderBy(F.col(ORDER_COL).asc())
    return F.row_number().over(w) > 1


@register("lengths")
def _lengths(ctx, x):
    return F.size(ctx.col(x))


@register("seq_along")
def _seq_along(ctx, x=None):
    return F.row_number().over(ctx.ordered())


@register("diff")
def _diff(ctx, x, lag: int = 1, differences: int = 1, order_by=None):
    """Lagged differences, length-preserving (leading NULLs) like the
    reference (api/base/stats.py diff). d-th difference expands to the
    binomial sum Σ (-1)^k C(d,k) lag(x, kL) — ONE window level, since
    Spark forbids nesting a window inside another window."""
    from math import comb

    col = ctx.col(x)
    L = int(ctx.eval(lag))
    d = int(ctx.eval(differences))
    w = ctx.ordered(order_by)
    out = None
    for k in range(d + 1):
        term = F.lag(col, k * L).over(w) if k else col
        coef = (-1) ** k * comb(d, k)
        term = term * F.lit(coef)
        out = term if out is None else out + term
    return out


@register("seq_len")
def _seq_len(ctx, x):
    """Per-row 0-based range array, the reference's Expr dispatch
    (api/base/seq.py:58-62: pl.int_ranges(0, x))."""
    n = ctx.col(x).cast("long")
    return F.when(n > 0, F.sequence(F.lit(0).cast("long"), n - 1)).otherwise(
        F.array().cast("array<long>")
    )


@register("runif")
def _runif(ctx, n=None, min: float = 0.0, max: float = 1.0, seed: int | None = None):
    r = F.rand(seed) if seed is not None else F.rand()
    return r * (max - min) + min


@register("rnorm")
def _rnorm(ctx, n=None, mean: float = 0.0, sd: float = 1.0, seed: int | None = None):
    r = F.randn(seed) if seed is not None else F.randn()
    return r * sd + mean


# ---- further random distributions (reference api/base/random.py:47-134).
# The reference draws from numpy on the driver; here every draw is a
# JVM-side expression derived from rand()/randn() (inverse-CDF or sums),
# so generation is distributed and seed-threaded — no driver materialize,
# no Python in the hot path.

def _u(seed, off: int = 0):
    return F.rand(seed + off) if seed is not None else F.rand()


@register("rexp")
def _rexp(ctx, n=None, rate: float = 1.0, seed: int | None = None):
    """Inverse CDF: -ln(1-U)/rate."""
    return -F.log(F.lit(1.0) - _u(seed)) / F.lit(float(rate))


@register("rcauchy")
def _rcauchy(
    ctx, n=None, location: float = 0.0, scale: float = 1.0, seed: int | None = None
):
    """Inverse CDF: location + scale * tan(pi * (U - 1/2))."""
    import math

    return F.lit(float(location)) + F.lit(float(scale)) * F.tan(
        F.lit(math.pi) * (_u(seed) - F.lit(0.5))
    )


@register("rchisq")
def _rchisq(ctx, n=None, df: float = 1.0, seed: int | None = None):
    """Integer df <= 64: exact sum of df squared standard normals;
    otherwise the Wilson–Hilferty cube approximation (documented)."""
    dff = float(df)
    if dff.is_integer() and 1 <= dff <= 64:
        acc = None
        for i in range(int(dff)):
            z = F.randn(seed + i) if seed is not None else F.randn()
            acc = z * z if acc is None else acc + z * z
        return acc
    z = F.randn(seed) if seed is not None else F.randn()
    h = F.lit(2.0 / (9.0 * dff))
    return F.lit(dff) * F.pow(F.lit(1.0) - h + z * F.sqrt(h), F.lit(3.0))


@register("rbinom")
def _rbinom(ctx, n=None, size: int = 1, prob: float = 0.5, seed: int | None = None):
    """size <= 64: exact sum of Bernoulli indicators; larger sizes use
    the normal approximation with continuity correction, clamped."""
    p = float(prob)
    if size <= 64:
        acc = None
        for i in range(int(size)):
            b = (_u(seed, i) < p).cast("long")
            acc = b if acc is None else acc + b
        return acc if acc is not None else F.lit(0).cast("long")
    mu, sigma = size * p, (size * p * (1 - p)) ** 0.5
    z = F.randn(seed) if seed is not None else F.randn()
    raw = F.round(z * F.lit(sigma) + F.lit(mu))
    return F.greatest(F.lit(0), F.least(F.lit(int(size)), raw)).cast("long")


@register("rpois")
def _rpois(ctx, n=None, lambda_: float = 1.0, seed: int | None = None):
    """lambda <= 32: exact draw by counting exponential inter-arrivals
    (N = #prefixes of -ln(U_i) sums below lambda). Each rand() node is
    referenced exactly ONCE, inside an array constructor — rand is
    stateful per evaluation, so an inverse-CDF when-chain that reads one
    uniform many times silently redraws it per branch and biases the
    result. Larger lambda: normal approximation, clamped at 0."""
    import math

    lam = float(lambda_)
    if lam <= 32:
        kmax = int(lam + 10 * math.sqrt(lam) + 10)
        arr = F.array(
            *[-F.log(F.lit(1.0) - _u(seed, i)) for i in range(kmax)]
        )
        zero = F.struct(
            F.lit(0.0).alias("s"), F.lit(0).cast("long").alias("n")
        )
        return F.aggregate(
            arr,
            zero,
            lambda acc, e: F.struct(
                (acc["s"] + e).alias("s"),
                (
                    acc["n"]
                    + F.when(acc["s"] + e < F.lit(lam), F.lit(1)).otherwise(0)
                ).cast("long").alias("n"),
            ),
            lambda acc: acc["n"],
        )
    z = F.randn(seed) if seed is not None else F.randn()
    raw = F.round(z * F.lit(math.sqrt(lam)) + F.lit(lam))
    return F.greatest(F.lit(0), raw).cast("long")


@register("row_sums")
def _row_sums(ctx, *xs, na_rm: bool = False):
    """Horizontal sum across columns (reference ``api/base/stats.py``).
    na_rm=True treats NA as 0; default propagates NA (R semantics)."""
    cols = [_nn(ctx, x) for x in xs]
    if na_rm:
        cols = [F.coalesce(c, F.lit(0)) for c in cols]
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


@register("row_means")
def _row_means(ctx, *xs, na_rm: bool = False):
    cols = [_nn(ctx, x) for x in xs]
    if na_rm:
        arr = F.array(*cols)
        valid = F.filter(arr, lambda v: v.isNotNull())
        return F.when(
            F.size(valid) > 0,
            F.aggregate(valid, F.lit(0.0), lambda a, v: a + v) / F.size(valid),
        )
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out / len(cols)


@register("row_sds")
def _row_sds(ctx, *xs, na_rm: bool = False, ddof: int = 1):
    """Horizontal sample sd (reference ``api/base/stats.py:124-141``).
    na_rm=True drops NAs per row; default propagates NA."""
    arr = F.array(*[_nn(ctx, x).cast("double") for x in xs])
    vals = F.filter(arr, lambda v: v.isNotNull()) if na_rm else arr
    cnt = F.size(vals)
    total = F.aggregate(vals, F.lit(0.0), lambda a, v: a + v)
    mean = total / cnt
    ss = F.aggregate(vals, F.lit(0.0), lambda a, v: a + (v - mean) * (v - mean))
    return F.when(cnt > ddof, F.sqrt(ss / (cnt - F.lit(ddof))))


@register("row_medians")
def _row_medians(ctx, *xs):
    """Horizontal median. Reference ``api/base/stats.py:170-180`` takes
    sorted(non-null)[len//2] (upper median, no interpolation) — kept for
    parity."""
    arr = F.array(*[_nn(ctx, x).cast("double") for x in xs])
    vals = F.array_sort(F.filter(arr, lambda v: v.isNotNull()))
    cnt = F.size(vals)
    return F.when(cnt > 0, F.element_at(vals, F.floor(cnt / 2).cast("int") + 1))


@register("row_mins")
def _row_mins(ctx, *xs):
    return F.least(*[_nn(ctx, x) for x in xs])


@register("row_maxs")
def _row_maxs(ctx, *xs):
    return F.greatest(*[_nn(ctx, x) for x in xs])


# ---- per-row array set operations (reference api/base/sets.py expr
# path — polars list.set_* rewritten as Spark array HOFs, JVM-side) ----

def _is_array_operand(ctx, v) -> bool:
    from ..plans.expr import Ref

    if isinstance(v, Ref):
        return dict(ctx.tibble.dtypes).get(v._name, "").startswith("array")
    try:
        dt = ctx.tibble.df.select(ctx.col(v).alias("__c__")).schema[0].dataType
        return dt.typeName() == "array"
    except Exception:
        return False


def _as_array_col(ctx, v):
    """Array operand for a set op. Array columns keep per-row
    element-wise semantics; a SCALAR-element column is treated as "the
    vector" (reference ``api/base/sets.py`` object path: the op runs
    over the column's values) — collected to its sorted-distinct value
    set, a multi-value aggregate that summarise/reframe explode to rows
    (reference ``tests/dplyr/test_summarise.py`` reframe+intersect)."""
    from ..plans.expr import Expr

    if not isinstance(v, Expr):
        return F.lit(list(v))
    col = ctx.col(v)
    if _is_array_operand(ctx, v):
        return col
    collected = F.array_sort(F.array_distinct(F.collect_list(col)))
    if ctx.mode == "agg":
        return collected
    return F.array_sort(
        F.array_distinct(F.collect_list(col).over(_full_frame(ctx)))
    )


@register("vec_intersect")
def _vec_intersect(ctx, x, y):
    return F.array_intersect(_as_array_col(ctx, x), _as_array_col(ctx, y))


@register("vec_union")
def _vec_union(ctx, x, y):
    return F.array_union(_as_array_col(ctx, x), _as_array_col(ctx, y))


@register("vec_setdiff")
def _vec_setdiff(ctx, x, y):
    return F.array_except(_as_array_col(ctx, x), _as_array_col(ctx, y))


@register("vec_setequal")
def _vec_setequal(ctx, x, y):
    a, b = _as_array_col(ctx, x), _as_array_col(ctx, y)
    return (F.size(F.array_except(a, b)) == 0) & (F.size(F.array_except(b, a)) == 0)


def _collect_frame(ctx, cols):
    """Sub-frame as an ordered array of structs. In summarise mode a
    plain sorted aggregate (a window inside agg is illegal — it was
    raising MISSING_GROUP_BY for the ungrouped case); in mutate mode a
    whole-partition window."""
    payload = F.struct(*[F.col(c) for c in cols])
    if ctx.mode == "agg":
        arr = F.sort_array(
            F.collect_list(
                F.struct(F.col(ORDER_COL).alias("__o__"), payload.alias("p"))
            )
        )
        return F.transform(arr, lambda s: s["p"])
    w = (
        ctx.partition()
        .orderBy(F.col(ORDER_COL).asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return F.collect_list(payload).over(w)


@register("cur_data_all")
def _cur_data_all(ctx):
    """Like cur_data() but including the grouping columns."""
    return _collect_frame(ctx, list(ctx.tibble.columns))


@register("cur_data")
def _cur_data(ctx):
    """Per-group sub-frame as an array of structs (the reference's
    Object-column escape hatch re-expressed, SURVEY §1.1c)."""
    return _collect_frame(
        ctx, [c for c in ctx.tibble.columns if c not in ctx.groups]
    )


# ---- grouping-context functions -------------------------------------------

@register("cur_group")
def _cur_group(ctx):
    if not ctx.groups:
        return F.lit(None)
    return F.struct(*[F.col(g) for g in ctx.groups])


@register("cur_group_id")
def _cur_group_id(ctx):
    """1-based id of the current row's group; keys sorted ascending
    (dplyr group order). Reads the materialized ``__datar_gid__``
    column (``Tibble.ensure_gid``: rank over DISTINCT keys broadcast-
    joined back) — ``dense_rank().over(Window.orderBy(keys))`` would
    sort every row of the table through a single task."""
    if not ctx.groups:
        return F.lit(1)
    if "__datar_gid__" in ctx.tibble.df.columns:
        gid = F.col("__datar_gid__")
        return F.first(gid) if ctx.mode == "agg" else gid
    return F.dense_rank().over(
        Window.orderBy(*[F.col(g).asc_nulls_last() for g in ctx.groups])
    )


@register("n_groups_")
def _n_groups_expr(ctx):
    if not ctx.groups:
        return F.lit(1)
    df = ctx.tibble.df
    if "__datar_gid__" in df.columns and not df.isStreaming:
        # gid is dense 1..k: its max IS the group count — one tiny
        # map-side-combined agg job, inlined as a literal (the global
        # collect_set window below funnels every row through one task)
        n = df.agg(F.max("__datar_gid__")).first()[0]
        return F.lit(n)
    # struct keys, not string concat: concat_ws skips nulls, conflating
    # ('a', NULL) with (NULL, 'a')
    key = F.struct(*[F.col(g) for g in ctx.groups])
    return F.size(F.collect_set(key).over(Window.partitionBy()))


NEEDS_ORDER.update({"rev", "duplicated", "seq_along"})


# cur_data() collects whole-group structs — harmless unordered, but
# order it by frame order for deterministic list contents
NEEDS_ORDER.add("cur_data")


# ---- column-level ordering / sampling functions ---------------------------
# Reference ``api/base/seq.py:280-420`` (sort/order/rank/sample) and
# ``api/base/verbs.py:269-289`` (unique): Polars evaluates each column
# expression independently, so sort(x) reorders one column in place.
# Spark rows are atomic — the positional-reorder pattern (as in rev)
# collects the group frame once into an array and indexes it by the
# row's frame position, keeping evaluation JVM-side and distributed by
# group.

def _full_frame(ctx):
    return (
        ctx.partition()
        .orderBy(F.col(ORDER_COL).asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )


@register("sort")
def _sort(ctx, x, decreasing: bool = False, na_last: bool = True):
    """Value at the row's position in sorted order. collect_list drops
    NULLs (matching R sort()'s NA removal); with na_last the NULL slots
    land at the tail of the frame, else at the head. In summarise:
    the sorted values as a multi-value array (one row per value)."""
    col = ctx.col(x)
    dec = bool(ctx.eval(decreasing))
    if ctx.mode == "agg":
        lst = F.array_sort(F.collect_list(col))
        return F.reverse(lst) if dec else lst
    wf = _full_frame(ctx)
    lst = F.array_sort(F.collect_list(col).over(wf))
    if dec:
        lst = F.reverse(lst)
    rn = F.row_number().over(ctx.ordered())
    if bool(ctx.eval(na_last)):
        return F.get(lst, rn - 1)  # past-the-end → NULL
    n_null = F.count(F.when(col.isNull(), 1)).over(wf)
    return F.get(lst, rn - n_null - 1)  # negative index → NULL


@register("order")
def _order(ctx, x, decreasing: bool = False, na_last: bool = True):
    """0-based frame positions that would sort x (reference arg_sort,
    ``seq.py:378-398``). Builds (x, frame-index) structs in frame order
    via transform()'s index argument, sorts with an explicit comparator
    (NULL x handled by a null-flag field; ties stable on index), then
    reads the index at the row's own frame position."""
    col = ctx.col(x)
    dec = bool(ctx.eval(decreasing))
    nl = bool(ctx.eval(na_last))
    wf = _full_frame(ctx)
    lst = F.collect_list(
        F.struct(
            F.when(col.isNull(), F.lit(1 if nl else -1)).otherwise(0).alias("nf"),
            col.alias("x"),
        )
    ).over(wf)
    # collect_list skips nothing here (struct itself is never null)
    with_idx = F.transform(
        lst, lambda s, i: F.struct(s["nf"].alias("nf"), s["x"].alias("x"), i.alias("i"))
    )
    lt, gt = (F.lit(1), F.lit(-1)) if dec else (F.lit(-1), F.lit(1))

    def cmp(a, b):
        return (
            F.when(a["nf"] < b["nf"], -1)
            .when(a["nf"] > b["nf"], 1)
            .when(a["x"] < b["x"], lt)
            .when(a["x"] > b["x"], gt)
            .when(a["i"] < b["i"], -1)
            .when(a["i"] > b["i"], 1)
            .otherwise(0)
        )

    ordered = F.transform(F.array_sort(with_idx, cmp), lambda s: s["i"])
    if ctx.mode == "agg":
        return ordered
    rn = F.row_number().over(ctx.ordered())
    return F.get(ordered, rn - 1)


@register("rank")
def _rank(ctx, x, na_last: bool = True, ties_method: str = "average"):
    """R rank() with the reference's ties methods (``seq.py:333-372``).
    NULL inputs rank NULL (Polars semantics). min/first/random/max are
    single windows; average = (min + max) / 2."""
    col = ctx.col(x)
    method = str(ctx.eval(ties_method))
    w = ctx.partition().orderBy(col.asc_nulls_last())

    def min_rank():
        return F.rank().over(w)

    def max_rank():
        peers = F.count(F.lit(1)).over(Window.partitionBy(*list(ctx.groups), col))
        return F.rank().over(w) + peers - 1

    if method == "min":
        r = min_rank()
    elif method == "max":
        r = max_rank()
    elif method == "first":
        r = F.row_number().over(
            ctx.partition().orderBy(col.asc_nulls_last(), F.col(ORDER_COL).asc())
        )
    elif method == "random":
        r = F.row_number().over(ctx.partition().orderBy(col.asc_nulls_last(), F.rand()))
    else:  # average
        r = (min_rank() + max_rank()) / F.lit(2.0)
    return F.when(col.isNull(), F.lit(None)).otherwise(r)


@register("sample")
def _sample(ctx, x, size=None, replace: bool = False, prob=None, seed=None):
    """Shuffle the column within its group (reference ``seq.py:165-181``:
    size=None → full shuffle; explicit size → the first `size` draws as
    one array value, mirroring Polars implode broadcast). With
    replace=True each row draws independently."""
    col = ctx.col(x)
    sd = ctx.eval(seed)
    rnd = F.rand(int(sd)) if sd is not None else F.rand()
    sz = ctx.eval(size)
    wf = _full_frame(ctx)
    if bool(ctx.eval(replace)):
        lst = F.collect_list(col).over(wf)
        pick = F.get(lst, F.floor(rnd * F.size(lst)).cast("int"))
        if sz is None:
            return pick
        # explicit size + replacement: one shared array of `size`
        # independent draws, broadcast to every row of the group (the
        # implode convention of the size!=None no-replace branch;
        # reference api/base/seq.py:160-217 supports replace there
        # too). Draw indices come from hash(i, salt) so all rows agree
        # on the same array and a seed makes it reproducible.
        import random as _pyrandom

        salt = int(sd) if sd is not None else _pyrandom.randrange(1 << 31)
        return F.transform(
            F.sequence(F.lit(1), F.lit(int(sz))),
            lambda i: F.get(
                lst, F.pmod(F.hash(i, F.lit(salt)), F.size(lst)).cast("int")
            ),
        )
    w_rand = (
        ctx.partition()
        .orderBy(rnd)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    lst = F.collect_list(col).over(w_rand)
    if sz is not None:
        return F.slice(lst, 1, int(sz))
    rn = F.row_number().over(ctx.ordered())
    return F.get(lst, rn - 1)


@register("unique")
def _unique(ctx, x):
    """Distinct values, ascending (Spark collect aggregates drop NULLs
    and give no stable encounter order, so the deterministic contract
    here is sorted-distinct — reference ``verbs.py:269-289`` makes no
    order promise either). Multi-value in summarise."""
    col = ctx.col(x)
    if ctx.mode == "agg":
        return F.array_sort(F.array_distinct(F.collect_list(col)))
    return F.array_sort(F.array_distinct(F.collect_list(col).over(_full_frame(ctx))))


@register("any_na")
def _any_na(ctx, x):
    """True when any value in the group is NULL (reference
    ``sets.py:163-178``)."""
    col = ctx.col(x)
    return ctx.agg(F.max(col.isNull()))


POS_COL = "__datar_pos__"


@register("cur_group_rows")
def _cur_group_rows(ctx):
    """0-based global frame positions of the current group's rows
    (reference ``api/dplyr/context.py:208-245`` — which builds a
    driver-side case-when per group; here the positions column is
    materialized once by the distributed two-pass id assignment
    (`Tibble.ensure_pos`) and this is a plain collect_list per group)."""
    pos = F.col(POS_COL)
    if ctx.mode == "agg":
        return F.sort_array(F.collect_list(pos))
    return F.sort_array(F.collect_list(pos).over(_full_frame(ctx)))


NEEDS_ORDER.update({"sort", "order", "sample", "cur_group_rows"})
