"""Grouping metadata + group iteration verbs.

Reference: ``api/dplyr/group_data.py:56-210`` (group_data/keys/rows/
indices/vars/size/n_groups) and ``api/dplyr/group_iter.py:73-253``
(group_split/map/modify/walk/with_groups). The reference computes
these with driver-side Python dict grouping; here the per-group shapes
come from distributed aggregations and ``group_modify`` runs as
``applyInPandas`` (Arrow-batched, one pandas frame per group on the
executors — the reference's one genuinely UDF-shaped verb, SURVEY
§2.5). Only ``group_split``/``group_map`` collect keys to the driver,
mirroring the reference's small-data utility semantics.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.context import ORDER_COL
from ..plans.expr import Ref
from ..plans.verb import verb
from ..tibble import Tibble

__all__ = [
    "group_vars",
    "group_keys",
    "group_size",
    "n_groups",
    "group_data",
    "group_rows",
    "group_indices",
    "group_cols",
    "group_split",
    "group_map",
    "group_walk",
    "group_modify",
    "with_groups",
    "group_trim",
]


def _gvars(td: Tibble, extra: tuple) -> list[str]:
    if extra:
        return [x._name if isinstance(x, Ref) else str(x) for x in extra]
    return list(td.group_vars)


def _key_sorted(td: Tibble, gvars: list[str]):
    """Distinct group keys in dplyr order (sorted by key values;
    factor group columns sort by level position). With ``_drop=False``
    a single factor group var contributes its UNUSED levels as empty
    groups too (reference group_by.py _drop semantics)."""
    d = td.df.select(*gvars).dropDuplicates(gvars)
    if not td.group_drop and len(gvars) == 1 and gvars[0] in td.levels:
        g = gvars[0]
        lv = td.df.sparkSession.createDataFrame(
            [(str(v),) for v in td.levels[g]], f"{g} string"
        )
        d = d.unionByName(lv).dropDuplicates(gvars)
    keys = []
    for g in gvars:
        if g in td.levels:
            keys.append(F.array_position(F.lit(td.levels[g]), F.col(g)).asc())
        else:
            keys.append(F.col(g).asc_nulls_last())
    return d.orderBy(*keys)


@verb
def group_vars(td: Tibble) -> list[str]:
    return list(td.group_vars)


@verb
def group_keys(td: Tibble) -> Tibble:
    gvars = list(td.group_vars)
    if not gvars:
        return Tibble(td.df.limit(0).select())
    return Tibble(_key_sorted(td, gvars))


@verb
def group_size(td: Tibble) -> list[int]:
    gvars = list(td.group_vars)
    if not gvars:
        return [td.nrow()]
    rows = (
        td.df.groupBy(*gvars)
        .agg(F.count(F.lit(1)).alias("__n__"))
        .orderBy(*[F.col(g).asc_nulls_last() for g in gvars])
        .select("__n__")
        .collect()
    )
    return [r[0] for r in rows]


@verb
def n_groups(td: Tibble) -> int:
    gvars = list(td.group_vars)
    if not gvars:
        return 1
    return td.df.select(*gvars).dropDuplicates(gvars).count()


@verb
def group_data(td: Tibble) -> Tibble:
    """Group keys + ``_rows`` (0-based row positions per group, in frame
    order) — reference ``group_data.py:56-116``."""
    gvars = list(td.group_vars)
    t = td.ensure_order()
    w = Window.orderBy(F.col(ORDER_COL).asc())
    d = t.df.withColumn("__pos__", F.row_number().over(w) - 1)
    if not gvars:
        out = d.agg(F.sort_array(F.collect_list("__pos__")).alias("_rows"))
        return Tibble(out)
    out = d.groupBy(*gvars).agg(
        F.sort_array(F.collect_list("__pos__")).alias("_rows")
    )
    # _drop=False: unused factor levels appear as empty groups
    # (reference group_by.py _drop semantics)
    if not td.group_drop and len(gvars) == 1 and gvars[0] in td.levels:
        g = gvars[0]
        lv = d.sparkSession.createDataFrame(
            [(str(v),) for v in td.levels[g]], f"{g} string"
        )
        missing = lv.join(out.select(g), g, "left_anti").withColumn(
            "_rows", F.array().cast("array<int>")
        )
        out = out.unionByName(missing)
    keys = [
        F.array_position(F.lit(td.levels[g]), F.col(g)).asc()
        if g in td.levels
        else F.col(g).asc_nulls_last()
        for g in gvars
    ]
    return Tibble(out.orderBy(*keys))


@verb
def group_rows(td: Tibble) -> list[list[int]]:
    gd = group_data(td)
    return [r[-1] for r in gd.df.collect()]


@verb
def group_cols(td: Tibble) -> list[int]:
    """Column indices of the grouping variables (reference
    ``group_data.py:202-210``)."""
    cols = td.columns
    return [cols.index(g) for g in td.group_vars if g in cols]


@verb
def group_indices(td: Tibble) -> list[int]:
    """1-based group id per row, in frame order."""
    gvars = list(td.group_vars)
    t = td.ensure_order()
    if not gvars:
        return [1] * t.nrow()
    gid = F.dense_rank().over(
        Window.orderBy(*[F.col(g).asc_nulls_last() for g in gvars])
    )
    rows = (
        t.df.withColumn("__gid__", gid)
        .orderBy(F.col(ORDER_COL).asc())
        .select("__gid__")
        .collect()
    )
    return [r[0] for r in rows]


# --------------------------------------------------------------------------
# group iteration (reference api/dplyr/group_iter.py:73-253)
# --------------------------------------------------------------------------

@verb
def group_split(td: Tibble, *cols: Any, _keep: bool = True) -> list[Tibble]:
    """List of per-group Tibbles (driver iteration over collected keys —
    small-data utility, as in the reference)."""
    gvars = _gvars(td, cols)
    if not gvars:
        return [Tibble(td.df)]
    keys = _key_sorted(td, gvars).collect()
    out = []
    for row in keys:
        cond = None
        for g in gvars:
            c = F.col(g).isNull() if row[g] is None else (F.col(g) == F.lit(row[g]))
            cond = c if cond is None else (cond & c)
        sub = td.df.filter(cond)
        if not _keep:
            sub = sub.drop(*gvars)
        out.append(Tibble(sub))
    return out


@verb
def group_map(td: Tibble, fn: Callable, *cols: Any) -> list:
    """Apply ``fn`` per group on the driver, in key order. Like the
    reference (``group_iter.py:142-167``), a one-parameter ``fn``
    receives just the group's frame; a two-parameter ``fn`` receives
    ``(pandas_df, key_dict)``."""
    import inspect

    gvars = _gvars(td, cols)
    parts = group_split(td, *cols, _keep=False)
    keys = _key_sorted(td, gvars).collect() if gvars else [None]
    try:
        n_params = len(inspect.signature(fn).parameters)
    except (ValueError, TypeError):
        n_params = 2
    out = []
    for part, key in zip(parts, keys):
        pdf = part.collect()
        if n_params == 1:
            out.append(fn(pdf))
        else:
            kd = dict(key.asDict()) if key is not None else {}
            out.append(fn(pdf, kd))
    return out


@verb
def group_walk(td: Tibble, fn: Callable, *cols: Any) -> Tibble:
    group_map(td, fn, *cols)
    return td


@verb
def group_modify(td: Tibble, fn: Callable, schema: Any = None) -> Tibble:
    """Distributed per-group frame transform: ``fn(pandas.DataFrame) ->
    pandas.DataFrame`` runs on executors via ``applyInPandas`` (Arrow
    batches). ``schema`` is the output schema *excluding* group keys,
    which are re-attached as dplyr does (keys prepended, result stays
    grouped). When omitted (the reference needs none —
    ``group_iter.py:178-212`` — but Spark's applyInPandas demands one
    upfront), it is inferred by running ``fn`` on ONE sample group on
    the driver: one small filtered collect, independent of corpus size."""
    from pyspark.sql.types import StructType

    gvars = list(td.group_vars)
    if not gvars:
        raise ValueError("group_modify requires a grouped tibble")
    if schema is None:
        sample_key = td.df.select(*gvars).first()
        cond = None
        for g in gvars:
            c = (
                F.col(g).isNull()
                if sample_key[g] is None
                else (F.col(g) == F.lit(sample_key[g]))
            )
            cond = c if cond is None else (cond & c)
        sample = td.df.filter(cond).drop(
            *[c for c in td.df.columns if c.startswith("__datar_")]
        )
        body = fn(sample.toPandas().drop(columns=gvars))
        schema = td.df.sparkSession.createDataFrame(body).schema
    if isinstance(schema, str):
        key_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in td.df.schema
            if f.name in gvars
        )
        full_schema = f"{key_schema}, {schema}"
    else:
        key_fields = [f for f in td.df.schema if f.name in gvars]
        full_schema = StructType(key_fields + list(schema.fields))

    def apply_fn(pdf):
        keys = pdf[gvars].iloc[:1]
        body = fn(pdf.drop(columns=gvars))
        body = body.reset_index(drop=True)
        for g in reversed(gvars):
            body.insert(0, g, keys[g].iloc[0])
        return body

    plain = td.df.drop(ORDER_COL) if ORDER_COL in td.df.columns else td.df
    out = plain.groupBy(*gvars).applyInPandas(apply_fn, schema=full_schema)
    return Tibble(out, groups=gvars)


@verb
def group_trim(td: Tibble) -> Tibble:
    """Drop unused factor levels on the grouping variables (reference
    ``group_iter.py`` group_trim): re-observe each grouped factor's
    levels from the data, keeping relative level order."""
    out = td
    for g in td.group_vars:
        if g in td.levels:
            observed = {
                r[0]
                for r in td.df.select(g).dropDuplicates([g]).collect()
                if r[0] is not None
            }
            lv = dict(out.levels)
            lv[g] = [l for l in out.levels[g] if l in observed]
            out = out.with_df(out.df, levels=lv)
    return out


@verb
def with_groups(
    td: Tibble, groups: Any, verb_call: Any, *args: Any, **kwargs: Any
) -> Tibble:
    """Temporarily regroup, apply a verb, restore original grouping
    (reference ``group_iter.py:73-117``): the verb's own arguments pass
    through, so ``td >> with_groups(f.g, summarise, s=sum_(f.x))``
    works exactly as in the reference."""
    old = list(td.group_vars)
    if groups is None:
        gvars: list[str] = []
    elif isinstance(groups, (list, tuple)):
        gvars = [g._name if isinstance(g, Ref) else str(g) for g in groups]
    else:
        gvars = [groups._name if isinstance(groups, Ref) else str(groups)]
    regrouped = td.with_df(td.df, groups=gvars)
    from ..plans.verb import VerbCall

    if isinstance(verb_call, VerbCall):  # pre-built verb: pipe it in
        out = regrouped >> verb_call
    else:
        out = verb_call(regrouped, *args, **kwargs)
        if isinstance(out, VerbCall):
            out = regrouped >> out
    return out.with_df(out.df, groups=[g for g in old if g in out.df.columns])
