"""Gap-based sessionization of the events stream.

The classic clickstream/behavioral-analytics operator: order each
user's events by time, cut a new session wherever the gap to the
previous event exceeds ``gap``, aggregate per session. One shuffle on
the user key; the cut + running-count is a window function pair (lag →
cumulative sum) that stays entirely inside whole-stage codegen — the
textbook Spark layout, identical at 100 TB (sessions never cross the
user partition key, so skew is bounded by the hottest user).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """Assign ``session_idx`` (0-based per user, time order) to every
    event. Ties on ``ts`` are broken by ``event_id`` so the numbering
    is total and reproducible.

    The gap is measured with ``timestampdiff`` over second-truncated
    NTZ values — purely naive-timestamp arithmetic, independent of
    ``spark.sql.session.timeZone``. (Casting NTZ through TIMESTAMP
    would route the epoch through the session zone, and across a DST
    transition the offset shift changes the measured gap — a session
    boundary that moves with the driver's timezone config. The
    truncate-then-diff form also matches SQL engines' floor-of-epoch
    convention exactly, review r4 #4.)"""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    prev = F.lag(F.col(ts_col)).over(w)
    gap = F.timestamp_diff(
        "SECOND",
        F.date_trunc("second", prev),
        F.date_trunc("second", F.col(ts_col)),
    )
    new_sess = (prev.isNull() | (gap > gap_s)).cast("int")
    # first event's flag is 1 → subtract 1 for 0-based session ids
    return events.withColumn(
        "session_idx",
        (F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ) - 1).cast("int"),
    )


def session_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """Per-session rollup: event count, span, value sum — the session
    table a downstream join would consume."""
    s = sessionize(events, user_col=user_col, ts_col=ts_col, gap_s=gap_s)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
