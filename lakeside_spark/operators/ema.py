"""Per-series exponential moving average (reference: core
datastructures/EMA.scala — ema₀ = x₀; emaₜ = α·xₜ + (1-α)·emaₜ₋₁).

EMA is a sequential recurrence, so it cannot be a built-in aggregate; it
runs as applyInPandas per series key: each series' rows are shuffled to one
task and smoothed vectorized in C (pandas ewm with adjust=False matches the
reference recurrence exactly). Series counts are high in telemetry, so
parallelism is by key — the right distribution at scale. Rows within a
series stay time-ordered by the explicit sort inside the group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from lakeside_spark import schema as S


def ema_smooth(
    series: DataFrame,
    alpha: float = 0.3,
    key_cols: tuple[str, ...] = (S.NAME,),
    ts_col: str = S.STEP_TS,
    value_col: str = S.VALUE,
) -> DataFrame:
    """(keys..., ts, value) → (keys..., ts, value, ema)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in series.schema.fields
    ) + ", ema double"

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        pdf["ema"] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return series.groupBy(*[series[c] for c in key_cols]).applyInPandas(
        smooth, schema=out_schema
    )
