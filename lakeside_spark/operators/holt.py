"""Holt / Holt-Winters exponential smoothing per series.

The chart path's ``ts_forecast`` fits one OLS trend over the whole
window — fine for steady drift, blind to recent level shifts. Holt
smoothing (level + trend recursions with exponential decay) tracks the
*current* regime, and the Holt-Winters extension adds an additive
seasonal component (hour-of-day / day-of-week cycles — the dominant
structure in real telemetry), which is what alert-threshold forecasting
actually wants. The recursions are inherently sequential per series, so
this is an ``applyInPandas`` operator (no SQL oracle possible — DuckDB
has no recursive smoothing aggregate); correctness is pinned by pytest
property tests against an independent pure-Python model.

Scale shape: ONE shuffle keyed by the series id — the standard keyed-
window budget every per-series operator here pays. Each group is a
single (already aggregated) time series, thousands of points at most;
state is two floats plus one season vector per series. At 100 TB the
input to this operator is the *series table* (steps × names), not the
raw telemetry, so group sizes are bounded by the time window, never by
corpus size.

Standard inits (Hyndman & Athanasopoulos, "Forecasting: Principles and
Practice"): linear (§8.2) level = x0, trend = x1 − x0; seasonal (§8.3)
level = mean(first season), trend = (mean(second) − mean(first))/m,
seasonal[i] = x_i − mean(first season).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def _holt_fit(
    xs: list[float], alpha: float, beta: float
) -> tuple[float, float, float]:
    """Holt linear recursion; returns (level, trend, one-step SSE)."""
    level, trend = xs[0], xs[1] - xs[0]
    sse = 0.0
    for x in xs[1:]:
        pred = level + trend
        sse += (x - pred) ** 2
        prev = level
        level = alpha * x + (1 - alpha) * pred
        trend = beta * (level - prev) + (1 - beta) * trend
    return level, trend, sse


def _holt_winters_fit(
    xs: list[float], m: int, alpha: float, beta: float, gamma: float
) -> tuple[float, float, list[float], float]:
    """Additive Holt-Winters recursion (season length m, needs ≥ 2m
    points); returns (level, trend, season_vector, one-step SSE). The
    season vector is indexed so season[(t) % m] is the component for
    time step t (t counted from the series start)."""
    s1 = xs[:m]
    s2 = xs[m : 2 * m]
    mean1 = sum(s1) / m
    level = mean1
    trend = (sum(s2) / m - mean1) / m
    season = [x - mean1 for x in s1]
    sse = 0.0
    for t in range(m, len(xs)):
        x = xs[t]
        pred = level + trend + season[t % m]
        sse += (x - pred) ** 2
        prev = level
        level = alpha * (x - season[t % m]) + (1 - alpha) * (level + trend)
        trend = beta * (level - prev) + (1 - beta) * trend
        season[t % m] = gamma * (x - level) + (1 - gamma) * season[t % m]
    return level, trend, season, sse


def holt_forecast(
    series: DataFrame,
    key_col: str = "name",
    ts_col: str = "step_ts",
    value_col: str = "value",
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
    season_length: int | None = None,
    horizon: int = 3,
) -> DataFrame:
    """Per-series exponential smoothing over an already-aggregated
    ``(key, step_ts, value)`` table. With ``season_length=m`` set and a
    series holding ≥ 2m points, fits additive Holt-Winters (level +
    trend + m-step seasonal cycle); otherwise — and for the short series
    of a seasonal run — falls back to Holt linear. Output one row per
    series: ``(key, n_points, seasonal, level, trend,
    forecast_1 .. forecast_{horizon}, rmse)`` where ``seasonal`` flags
    which model fitted, forecasts are h-step-ahead (seasonal term
    included when fitted), and rmse is the in-sample one-step error (the
    alerting band width). Series with fewer than 2 points are dropped
    (no trend is definable)."""
    fc_cols = [f"forecast_{h}" for h in range(1, horizon + 1)]
    schema = (
        f"{key_col} string, n_points long, seasonal boolean, "
        "level double, trend double, "
        + ", ".join(f"{c} double" for c in fc_cols)
        + ", rmse double"
    )
    out_cols = [
        key_col, "n_points", "seasonal", "level", "trend", *fc_cols, "rmse",
    ]

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        xs = pdf[value_col].astype(float).tolist()
        n = len(xs)
        if n < 2:
            return pd.DataFrame({c: [] for c in out_cols})
        m = season_length
        if m is not None and m >= 2 and n >= 2 * m:
            level, trend, season, sse = _holt_winters_fit(
                xs, m, alpha, beta, gamma
            )
            fits = n - m  # one-step predictions start after the init cycle
            fc = [
                level + h * trend + season[(n + h - 1) % m]
                for h in range(1, horizon + 1)
            ]
            seasonal = True
        else:
            level, trend, sse = _holt_fit(xs, alpha, beta)
            fits = n - 1
            fc = [level + h * trend for h in range(1, horizon + 1)]
            seasonal = False
        row = {
            key_col: pdf[key_col].iloc[0],
            "n_points": n,
            "seasonal": seasonal,
            "level": round(level, 6),
            "trend": round(trend, 6),
            "rmse": round((sse / fits) ** 0.5, 6),
        }
        for h, c in enumerate(fc_cols, start=1):
            row[c] = round(fc[h - 1], 6)
        return pd.DataFrame([row])[out_cols]

    return series.groupBy(key_col).applyInPandas(_fit, schema=schema)
