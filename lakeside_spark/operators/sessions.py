"""Gap-based sessionization — the standard event-stream operator a
training-data/telemetry pipeline needs (user journeys, trace grouping).

Pure window composition: per key, a new session starts where the gap to
the previous event exceeds the threshold; the session id is the running
count of session starts. One shuffle (hash by key for the window sort),
everything else stays in whole-stage codegen. The streaming analog is
``groupBy(session_window(...))`` in streaming/pipeline.py's terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap_ms: int = 1_800_000,
) -> DataFrame:
    """Assign a session index per key: (all event columns) + session_id.

    session_id is 1-based and ordered by time within each key."""
    w = Window.partitionBy(key).orderBy(ts_col)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    is_start = F.when(gap.isNull() | (gap > gap_ms), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_start).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_stats(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap_ms: int = 1_800_000,
) -> DataFrame:
    """Session summaries: (key, session_id, session_start, session_end,
    n_events, duration_ms)."""
    s = sessionize(events, key, ts_col, gap_ms)
    return s.groupBy(key, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_ms"),
    )
