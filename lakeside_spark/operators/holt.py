"""Holt's linear (double exponential) smoothing per series.

The chart path's ``ts_forecast`` fits one OLS trend over the whole
window — fine for steady drift, blind to recent level shifts. Holt
smoothing (level + trend recursions with exponential decay) tracks the
*current* regime, which is what alert-threshold forecasting actually
wants. The recursion is inherently sequential per series, so this is an
``applyInPandas`` operator (no SQL oracle possible — DuckDB has no
recursive smoothing aggregate); correctness is pinned by a pytest
property test against an independent pure-Python model.

Scale shape: ONE shuffle keyed by the series id — the standard keyed-
window budget every per-series operator here pays. Each group is a
single (already aggregated) time series, thousands of points at most;
state is two floats per series. At 100 TB the input to this operator is
the *series table* (steps × names), not the raw telemetry, so group
sizes are bounded by the time window, never by corpus size.

Standard init (Hyndman & Athanasopoulos, "Forecasting: Principles and
Practice" §8.2): level = x0, trend = x1 - x0.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def _holt_fit(xs: list[float], alpha: float, beta: float) -> tuple[float, float, float]:
    """Run the Holt recursion; returns (level, trend, one-step SSE)."""
    level, trend = xs[0], xs[1] - xs[0]
    sse = 0.0
    for x in xs[1:]:
        pred = level + trend
        sse += (x - pred) ** 2
        prev = level
        level = alpha * x + (1 - alpha) * pred
        trend = beta * (level - prev) + (1 - beta) * trend
    return level, trend, sse


def holt_forecast(
    series: DataFrame,
    key_col: str = "name",
    ts_col: str = "step_ts",
    value_col: str = "value",
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
) -> DataFrame:
    """Per-series Holt linear smoothing over an already-aggregated
    ``(key, step_ts, value)`` table. Output one row per series:
    ``(key, n_points, level, trend, forecast_1 .. forecast_{horizon},
    rmse)`` — the smoothed state, h-step-ahead linear forecasts, and the
    in-sample one-step RMSE (the alerting band width). Series with fewer
    than 2 points are dropped (no trend is definable)."""
    fc_cols = [f"forecast_{h}" for h in range(1, horizon + 1)]
    schema = (
        f"{key_col} string, n_points long, level double, trend double, "
        + ", ".join(f"{c} double" for c in fc_cols)
        + ", rmse double"
    )

    out_cols = [key_col, "n_points", "level", "trend", *fc_cols, "rmse"]

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        xs = pdf[value_col].astype(float).tolist()
        if len(xs) < 2:
            return pd.DataFrame({c: [] for c in out_cols})
        level, trend, sse = _holt_fit(xs, alpha, beta)
        row = {
            key_col: pdf[key_col].iloc[0],
            "n_points": len(xs),
            "level": round(level, 6),
            "trend": round(trend, 6),
            "rmse": round((sse / (len(xs) - 1)) ** 0.5, 6),
        }
        for h, c in enumerate(fc_cols, start=1):
            row[c] = round(level + h * trend, 6)
        return pd.DataFrame([row])[out_cols]

    return series.groupBy(key_col).applyInPandas(_fit, schema=schema)
