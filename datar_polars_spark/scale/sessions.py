"""Batch sessionization: gap-based session ids over event logs.

The batch analogue of ``streaming.sessionize`` (session_window): a new
session starts when the gap to the previous event of the same key
exceeds ``gap_seconds``. Compiles to lag + running sum over the
(key, ts) window — one shuffle on the key, no UDFs.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.expr import Ref
from ..plans.verb import verb
from ..tibble import Tibble

__all__ = ["sessionize_batch", "session_stats", "trailing_agg"]


def _name_of(x: Any) -> str:
    return x._name if isinstance(x, Ref) else str(x)


def _epoch_s(df, name: str):
    """Epoch seconds from any temporal/numeric column. TIMESTAMP_NTZ
    can't cast straight to BIGINT in Spark 4 — route temporals through
    TIMESTAMP (identical on both sides of a gap, so any session-tz
    offset cancels; sessions pin UTC anyway)."""
    dt = dict(df.dtypes).get(name, "")
    c = F.col(name)
    if dt.startswith("timestamp") or dt == "date":
        return c.cast("timestamp").cast("long")
    return c.cast("long")


@verb
def sessionize_batch(
    td: Tibble, ts: Any, *keys: Any, gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> Tibble:
    """Add a per-key 1-based ``session_id`` column (events within
    ``gap_seconds`` of the previous event share a session)."""
    tcol = _name_of(ts)
    kcols = [_name_of(k) for k in keys]
    w = Window.partitionBy(*kcols).orderBy(F.col(tcol).asc())
    gap = _epoch_s(td.df, tcol) - F.lag(_epoch_s(td.df, tcol)).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    sid = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return td.with_df(td.df.withColumn(session_col, sid))


@verb
def session_stats(
    td: Tibble, ts: Any, *keys: Any, gap_seconds: int = 1800
) -> Tibble:
    """One row per (key, session): start/end/duration/event count."""
    tcol = _name_of(ts)
    kcols = [_name_of(k) for k in keys]
    s = sessionize_batch(td, ts, *keys, gap_seconds=gap_seconds)
    out = (
        s.df.groupBy(*kcols, "session_id")
        .agg(
            F.min(tcol).alias("session_start"),
            F.max(tcol).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    out = out.withColumn(
        "duration_s",
        _epoch_s(out, "session_end") - _epoch_s(out, "session_start"),
    )
    return Tibble(out, levels=td.levels)


_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _window_seconds(window: str | int | float) -> float:
    if isinstance(window, (int, float)):
        return float(window)
    parts = str(window).strip().split()
    if len(parts) != 2 or parts[1].lower() not in _UNIT_SECONDS:
        raise ValueError(
            f"window must be '<n> <unit>' (seconds/minutes/hours/days/"
            f"weeks) or a number of seconds, got {window!r}"
        )
    return float(parts[0]) * _UNIT_SECONDS[parts[1].lower()]


@verb
def trailing_agg(
    td: Tibble,
    ts: Any,
    value: Any,
    window: str | int = "1 hour",
    fns: tuple[str, ...] = ("sum",),
    prefix: str | None = None,
) -> Tibble:
    """Time-based trailing window aggregates (r3 extension): for every
    row, aggregate ``value`` over rows of the same group whose ``ts``
    falls within ``window`` BEFORE it (inclusive at both ends — SQL
    ``RANGE BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW``).

    fns: any of sum/mean/min/max/count -> columns ``{prefix}_{fn}``
    (prefix defaults to the value column's name).

    Scale shape: one ``rangeBetween`` window partitioned by the
    tibble's group vars — the realistic form (per-user / per-entity
    trailing features) shuffles once on the group key. Ungrouped use
    orders the WHOLE table by time through one range window; prefer a
    group_by, which is also what a 100 TB feature pipeline wants."""
    tcol, vcol = _name_of(ts), _name_of(value)
    secs = _window_seconds(window)
    gvars = list(td.group_vars)
    # microsecond longs preserve sub-second precision (rangeBetween
    # boundaries must be integral), matching exact INTERVAL arithmetic
    # in SQL engines
    tsd = F.unix_micros(F.col(tcol).cast("timestamp"))
    lo = -int(secs * 1_000_000)
    w = (
        Window.partitionBy(*gvars).orderBy(tsd).rangeBetween(lo, 0)
        if gvars
        else Window.orderBy(tsd).rangeBetween(lo, 0)
    )
    aggfns = {
        "sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max,
        "count": lambda c: F.count(c),
    }
    pref = prefix or vcol
    d = td.df
    for fn in fns:
        if fn not in aggfns:
            raise ValueError(f"trailing_agg: unknown fn {fn!r}")
        d = d.withColumn(f"{pref}_{fn}", aggfns[fn](F.col(vcol)).over(w))
    return td.with_df(d, keep_sort_meta=True)
