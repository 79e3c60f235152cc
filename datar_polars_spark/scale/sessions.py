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

__all__ = ["sessionize_batch", "session_stats"]


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
