"""LTTB chart downsampling: Largest-Triangle-Three-Buckets per series.

The reference's whole output surface is time-series charts (SSE
datapoint streams rendered as panels); LTTB (Steinarsson 2013) is the
canonical way to cut a dense series to a pixel-budget point count while
preserving visual shape — peaks, troughs, and trend reversals survive
where uniform striding drops them.

Shape: one ``applyInPandas`` over the per-series groups of the ALREADY
AGGREGATED step series (series tables are step-count-sized, thousands of
rows per key — never the fact table), so the only shuffle is the keyed
group-by Spark needs anyway. Inside a group the bucket scan is
vectorized numpy per bucket with a sequential bucket loop, which is the
algorithm's data dependence (each pick anchors the next triangle).

Guarantees (pinned by pytest): first/last point always kept, output
size = min(n_out, series length), every output point is an input point,
deterministic (ties resolve to the earliest point).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _lttb_one(ts: np.ndarray, vals: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB-selected points of one (sorted) series."""
    n = len(ts)
    if n_out >= n:
        return np.arange(n)
    if n_out < 3:
        # honor the size cap below the triangle minimum: endpoints only
        # (n_out=2), the first point (n_out=1), nothing for a
        # nonsensical budget — never the full series
        if n_out <= 0:
            return np.array([], dtype=np.int64)
        if n_out == 1:
            return np.array([0], dtype=np.int64)
        return np.array([0, n - 1], dtype=np.int64)
    # interior bucket boundaries: n_out-2 equal buckets over points 1..n-1
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    picked = np.empty(n_out, dtype=np.int64)
    picked[0] = 0
    picked[-1] = n - 1
    a = 0  # previously selected point
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nxt_lo, nxt_hi = edges[b + 1], (n if b + 2 >= n_out - 1 else edges[b + 2])
        # anchor C = mean of the NEXT bucket (last bucket → the final point)
        if nxt_lo < nxt_hi:
            cx, cy = ts[nxt_lo:nxt_hi].mean(), vals[nxt_lo:nxt_hi].mean()
        else:
            cx, cy = float(ts[-1]), float(vals[-1])
        ax, ay = float(ts[a]), float(vals[a])
        # triangle area per candidate, vectorized over the bucket
        area = np.abs(
            (ax - cx) * (vals[lo:hi] - ay) - (ax - ts[lo:hi]) * (cy - ay)
        )
        a = lo + int(np.argmax(area))  # argmax: first max → earliest point
        picked[b + 1] = a
    return picked


def lttb_downsample(
    series: DataFrame,
    n_out: int = 100,
    key_col: str = "name",
    ts_col: str = "step_ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key LTTB downsample of a step series to ≤ ``n_out`` points."""
    schema = f"{key_col} string, {ts_col} long, {value_col} double"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        idx = _lttb_one(
            pdf[ts_col].to_numpy(dtype=np.int64),
            pdf[value_col].to_numpy(dtype=np.float64),
            n_out,
        )
        return pdf.iloc[idx][[key_col, ts_col, value_col]]

    return series.select(key_col, ts_col, value_col).groupBy(key_col).applyInPandas(
        fold, schema=schema
    )
