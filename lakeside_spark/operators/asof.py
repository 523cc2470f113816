"""As-of (nearest-prior) join — an operator Spark's API lacks natively.

Telemetry use case: attach the most recent metric/quote/config row at or
before each event's timestamp, per series key (the reference pushes this to
DuckDB, which has native ASOF JOIN; our oracle uses exactly that).

Implementation is a composition of built-in DataFrame ops — no Python row
path, no range explosion:

1. union the two sides with a side marker (left rows carry a null right
   payload and vice versa);
2. one window per key, ordered by (ts, side) with right-before-left on
   ties, takes ``last(right_payload, ignorenulls=True)`` — the latest right
   row with ``right_ts <= left_ts``;
3. keep the left rows and unpack the carried payload.

Scale shape: ONE shuffle (hash by key for the window sort). This is the
same partitioning a groupBy(key) would need, so at 100 TB it behaves like
any keyed aggregation — skewed keys respond to the usual salting/AQE
treatment, and no cross-product ever materializes (contrast a naive
left.join(right, right_ts <= left_ts) which is O(|L|x|R|) per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_ms: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row: the latest right row with right_ts <= left_ts,
    per ``on`` key. Right columns (except key/ts) are appended; ties on
    timestamp match (>= semantics, like DuckDB ASOF JOIN).

    tolerance_ms bounds the lookback window; how="left" keeps unmatched
    left rows with null right columns, "inner" drops them.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    right_payload = [c for c in right.columns if c not in (on, right_ts)]
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts AFTER right on ties (>=)
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_payload + [right_ts]) + ">"
        ).alias("__r"),
    )
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("__l"),
        F.struct(*right_payload, F.col(right_ts)).alias("__r"),
    )
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_ms is not None:
        in_range = F.col("__ts") - F.col(f"__match.{right_ts}") <= F.lit(tolerance_ms)
        matched = matched.withColumn(
            "__match", F.when(in_range, F.col("__match"))
        )
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__match.{c}").alias(c) for c in right_payload]
    out_cols.append(F.col(f"__match.{right_ts}").alias(f"asof_{right_ts}"))
    return matched.select(*out_cols)
