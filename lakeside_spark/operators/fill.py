"""Dense step-grid fill for chart series.

The reference zero-fills missing sides inside formula evaluation
(Formula.scala:46-47) and leaves chart gaps to the consumer; a
training-data/alerting pipeline wants the dense grid server-side. The grid
is (distinct series) × (step sequence) — exactly the output's own size, so
the only costs are one distinct over the (already aggregated, tiny
relative to the fact table) series keys and one left join keyed on
(step_ts, *groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakeside_spark import schema as S


def fill_steps(
    series: DataFrame,
    step_ms: int,
    group_cols: tuple[str, ...] = (S.NAME,),
    value_col: str = S.VALUE,
    fill_value: float = 0.0,
    start_ts: int | None = None,
    end_ts: int | None = None,
) -> DataFrame:
    """Fill missing (step_ts, *groups) points with ``fill_value`` over the
    inclusive step range [start_ts, end_ts] (defaults: observed min/max).
    Output schema matches the input."""
    if start_ts is None or end_ts is None:
        bounds = series.agg(
            F.min(S.STEP_TS).alias("lo"), F.max(S.STEP_TS).alias("hi")
        ).first()
        if bounds is None or bounds["lo"] is None:
            return series
        start_ts = start_ts if start_ts is not None else bounds["lo"]
        end_ts = end_ts if end_ts is not None else bounds["hi"]
    grid = (
        series.select(*group_cols)
        .distinct()
        .select(
            "*",
            F.explode(
                F.sequence(F.lit(start_ts), F.lit(end_ts), F.lit(step_ms))
            ).alias(S.STEP_TS),
        )
    )
    filled = grid.join(series, on=[S.STEP_TS, *group_cols], how="left").withColumn(
        value_col, F.coalesce(F.col(value_col), F.lit(fill_value))
    )
    return filled.select(*series.columns)


def gap_report(
    events: DataFrame,
    step_ms: int,
    name_col: str = "name",
    ts_col: str = "timestamp_ms",
) -> DataFrame:
    """Per-series reporting-gap audit over the step grid: gap events
    (consecutive observed steps more than one step apart), total missing
    steps, and the longest silent stretch in ms — the "is this metric
    still reporting?" staple the dense-grid fill above papers over.

    Shape: one step-keyed aggregation (map-side combined) + one
    series-keyed window over the step-count-sized table. All integer
    arithmetic (step deltas are exact multiples of step_ms), so the SQL
    oracle is exact by construction.
    """
    from pyspark.sql import Window

    step = F.lit(int(step_ms))
    steps = (
        events.filter(F.col(name_col).isNotNull())
        .groupBy(
            F.col(name_col).alias("name"),
            (F.col(ts_col) - F.col(ts_col) % step).alias("step_ts"),
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy("name").orderBy("step_ts")
    d = F.col("step_ts") - F.lag("step_ts").over(w)
    gaps = steps.select(
        "name",
        F.when(d > step, F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
        F.when(d > step, (d / step).cast("long") - 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("missing"),
        F.when(d > step, d - step).otherwise(F.lit(0)).cast("long").alias("silent"),
    )
    return gaps.groupBy("name").agg(
        F.sum("is_gap").cast("long").alias("n_gaps"),
        F.sum("missing").cast("long").alias("missing_steps"),
        F.max("silent").cast("long").alias("longest_gap_ms"),
    )
