"""Curation-funnel accounting — per-stage keep/drop statistics for a
chain of document filters, computed in ONE aggregation over ONE scan.

Every real cleaning pipeline (C4, Gopher, RefinedWeb, Dolma) reports a
funnel: documents in, documents surviving each rule, what each rule
uniquely removed. Computing that naively costs one count() job per
stage — k full scans. ``filter_funnel`` instead projects every stage
predicate to a boolean flag in the scan and derives ALL stage counts
from a single partial-aggregating pass (k conditional sums + one
count), so the funnel costs the same as one count(*) no matter how
many stages the pipeline has. At 100 TB that is the difference between
one pass and a dozen.

The kept/dropped frames are separate lazy plans over the same source
(Spark recomputes the scan when both are materialized — cache the
input if you need kept + dropped + funnel in one job set).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..tibble import Tibble, ensure_tibble

__all__ = ["drop_reason", "filter_funnel", "keep_top_fraction"]


def _stage_columns(td: Tibble, stages: Mapping[str, Any]) -> dict:
    """Resolve each stage to a boolean Column: accepts a Column, a SQL
    string, a datar expression (f.x > 1), or a callable(td) -> any of
    those."""
    from ..plans.context import EvalContext

    out = {}
    for name, cond in stages.items():
        if callable(cond) and not isinstance(cond, Column):
            cond = cond(td)
        if isinstance(cond, str):
            col = F.expr(cond)
        elif isinstance(cond, Column):
            col = cond
        else:
            ctx = EvalContext(td, "eval")
            ctx.allow_agg_join = True
            col = ctx.col(cond)
            if ctx.pending_group_aggs:
                raise ValueError(
                    f"filter_funnel: stage {name!r} uses grouped "
                    "aggregates — funnel stages must be per-row "
                    "predicates"
                )
        # NULL predicates drop rows via plain WHERE/when() semantics —
        # no coalesce wrapper, which would block parquet pushdown
        out[name] = col.cast("boolean")
    return out


def filter_funnel(
    td: Any,
    stages: Mapping[str, Any],
    mode: str = "sequential",
) -> tuple:
    """Apply a named chain of row predicates and account for each
    stage. Returns ``(kept, funnel)``:

    * ``kept`` — Tibble of rows passing EVERY stage (one conjunctive
      filter, pushdown-friendly: plain column predicates reach the
      scan).
    * ``funnel`` — Tibble with one row per stage, in chain order:
      ``stage``, ``n_in``, ``n_kept``, ``n_dropped``, ``drop_rate``
      (rounded to 6). All rows derive from ONE aggregation job.

    ``mode="sequential"`` (the pipeline view): stage i sees only the
    survivors of stages 1..i-1, so ``n_in`` of the first stage is the
    corpus size and the last ``n_kept`` equals ``kept``'s count.
    ``mode="independent"`` (the diagnostic view): every stage is
    counted against the FULL input — ``n_kept`` is how many rows pass
    that rule alone, exposing which rule bites hardest regardless of
    chain order.
    """
    if mode not in ("sequential", "independent"):
        raise ValueError(
            f"filter_funnel: mode must be 'sequential' or "
            f"'independent', got {mode!r}"
        )
    td = ensure_tibble(td)
    if not stages:
        raise ValueError("filter_funnel: at least one stage required")
    cols = _stage_columns(td, stages)
    names = list(cols)

    # one aggregation: total + one conditional sum per stage (prefix
    # conjunction for sequential, lone flag for independent); partial
    # aggregation makes the exchange one row per task
    aggs = [F.count(F.lit(1)).alias("__n")]
    prefix = None
    for i, name in enumerate(names):
        flag = cols[name]
        if mode == "sequential":
            prefix = flag if prefix is None else (prefix & flag)
            flag = prefix
        aggs.append(
            F.sum(F.when(flag, 1).otherwise(0)).alias(f"__s{i}")
        )
    one = td.df.agg(*aggs)

    # unpivot the single stats row to per-stage funnel rows — still
    # lazy, no driver collect
    rows = []
    for i, name in enumerate(names):
        n_in = F.col("__n") if (mode == "independent" or i == 0) else F.col(
            f"__s{i - 1}"
        )
        n_kept = F.col(f"__s{i}")
        rows.append(
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(name).alias("stage"),
                n_in.alias("n_in"),
                n_kept.alias("n_kept"),
                (n_in - n_kept).alias("n_dropped"),
                F.round(
                    F.when(n_in > 0, (n_in - n_kept) / n_in).otherwise(
                        F.lit(0.0)
                    ),
                    6,
                ).alias("drop_rate"),
            )
        )
    funnel = (
        one.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("stage_idx")
        .drop("stage_idx")
    )

    keep_all = None
    for name in names:
        keep_all = cols[name] if keep_all is None else (keep_all & cols[name])
    kept = td.with_df(td.df.filter(keep_all), keep_sort_meta=True)
    return kept, Tibble(funnel)


def keep_top_fraction(
    td: Any,
    score: Any,
    frac: float,
    by: Any = None,
    largest: bool = True,
    relative_error: float = 1e-3,
) -> Tibble:
    """Keep (approximately) the top ``frac`` of rows by a score column
    — the "keep the best 30% by quality_prob" step after a classifier
    or perplexity stage.

    The threshold is an ``approx_percentile`` (Greenwald-Khanna sketch:
    map-side partial, one tiny exchange — never a sort of the corpus),
    attached back by a broadcast join, so the whole thing is LAZY and
    one scan-plus-sketch pass no matter the corpus size. Pass ``by``
    (a column name or list) for PER-KEY thresholds (e.g. keep the best
    30% of every language) — the per-key sketch rows join back keyed,
    broadcast when small via AQE. NULL scores always drop;
    ``largest=False`` keeps the bottom fraction (e.g. lowest
    perplexity). Ties at the threshold are kept, so the realized
    fraction can slightly exceed ``frac`` on heavily-tied scores.
    """
    td = ensure_tibble(td)
    sname = score if isinstance(score, str) else score._name
    if not (0.0 < float(frac) <= 1.0):
        raise ValueError("keep_top_fraction: frac must be in (0, 1]")
    if "__thr__" in td.columns:
        raise ValueError(
            "keep_top_fraction: reserved column '__thr__' already exists"
        )
    q = 1.0 - float(frac) if largest else float(frac)
    acc = max(1, int(round(1.0 / float(relative_error))))
    pct = F.expr(
        f"approx_percentile({sname}, {q!r}, {acc})"
    ).alias("__thr__")
    cmp_ = (F.col(sname) >= F.col("__thr__")) if largest else (
        F.col(sname) <= F.col("__thr__")
    )
    if by is None:
        thr = td.df.agg(pct)
        kept = (
            td.df.crossJoin(F.broadcast(thr))
            .filter(cmp_)
            .drop("__thr__")
        )
    else:
        keys = [by] if isinstance(by, str) else [
            k if isinstance(k, str) else k._name for k in by
        ]
        thr = td.df.groupBy(*keys).agg(pct)
        kept = (
            td.df.join(thr, on=keys, how="inner")
            .filter(cmp_)
            .drop("__thr__")
        )
    return td.with_df(kept, keep_sort_meta=True)


def drop_reason(
    td: Any,
    stages: Mapping[str, Any],
    out_col: str = "drop_reason",
) -> Tibble:
    """Tag every row with the FIRST stage (in chain order) that would
    drop it, or NULL for survivors — the row-level audit view of
    :func:`filter_funnel` (inspect what a rule removes before enabling
    it, sample dropped docs per reason, join reasons back to sources).

    Pure JVM when-chain in the scan — no shuffle, no Python; the same
    stage-spec forms as filter_funnel. NULL predicates count as drops,
    matching filter semantics.
    """
    td = ensure_tibble(td)
    if not stages:
        raise ValueError("drop_reason: at least one stage required")
    if out_col in td.columns:
        raise ValueError(f"drop_reason: column {out_col!r} already exists")
    cols = _stage_columns(td, stages)
    # nested when-chain, first failing stage wins (built innermost-out)
    expr = F.lit(None).cast("string")
    for name in reversed(list(cols)):
        expr = F.when(
            ~F.coalesce(cols[name], F.lit(False)), F.lit(name)
        ).otherwise(expr)
    return td.with_df(td.df.withColumn(out_col, expr), keep_sort_meta=True)
