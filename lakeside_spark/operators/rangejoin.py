"""Range (interval-containment) join — points matched to enclosing
intervals without a theta join.

Spark plans a raw ``point.ts BETWEEN lo AND hi`` join as
BroadcastNestedLoopJoin (O(|points| x |intervals|) comparisons). The
bucketed strategy makes it an equi-join: every interval is exploded to the
fixed-width time buckets it covers, each point owns exactly one bucket, and
the join key is (series key, bucket) with the precise bounds left as a
residual filter. A point's bucket appears at most once per interval, so no
dedup pass is needed.

Scale shape: shuffle on (key, bucket) — the same distribution a windowed
aggregation would use. Bucket width trades explode fan-out (long intervals
-> more bucket rows) against bucket occupancy (too-wide buckets -> more
residual comparisons); size it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: tuple[str, str] | None = None,
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Inner join: point columns + interval columns for every interval with
    ``start <= point_ts <= end``; ``on=(point_key, interval_key)`` adds a
    series-key equality. All column names must be distinct across inputs.
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"rename overlapping columns before joining: {sorted(overlap)}")
    b = F.lit(bucket_ms)
    ivals = intervals.withColumn(
        "__ibucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / b).cast("bigint"),
                (F.col(end_col) / b).cast("bigint"),
            )
        ),
    )
    pts = points.withColumn("__pbucket", (F.col(point_ts) / b).cast("bigint"))
    cond = pts["__pbucket"] == ivals["__ibucket"]
    if on is not None:
        point_key, interval_key = on
        cond = cond & (pts[point_key] == ivals[interval_key])
    return (
        pts.join(ivals, on=cond, how="inner")
        .filter(
            (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__pbucket", "__ibucket")
    )
