"""Deterministic, engine-replayable spherical k-means for the exact
cluster-analytics oracles (embedding_cluster_stats first; the ANN
quantizers keep operators/similarity._spherical_kmeans so their pinned
recall panel is untouched).

Same determinism discipline as operators/eigh_replay: no RNG (init =
evenly strided rows of the vec_id-ORDERED sample — SQL: sid % stride),
a FIXED iteration count (no early stop), every vector 1e-9 fixed-point
snapped, every dot product / dimension sum an ORDER-FREE integer sum,
and every scalar formula a pinned IEEE sequence — so a DuckDB recursive
CTE (registry/_kmeans_sql) replays training and assignment bit-for-bit.

Assignment ties (equal snapped dot) break to the LOWEST cell index —
np.argmax's first-max == SQL list_position(l, list_max(l)).
"""

from __future__ import annotations

import math

import numpy as np

KM_ITERS = 15


def _snap9i(a: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero of a*1e9 → int64 (the shared engine
    snap convention; see similarity._snap9_arr)."""
    v = a * 1e9
    f = np.floor(v)
    tie = (v - f) == 0.5
    out = np.rint(v)
    if tie.any():
        out = np.where(tie, np.where(v > 0, f + 1.0, f), out)
    return out.astype(np.int64)


def unit9(m: np.ndarray) -> np.ndarray:
    """Row-normalize to snapped 1e-9 int64 unit vectors with an
    order-free norm: ss9 = Σ_d snap9(x_d²), norm = sqrt(ss9/1e9)
    (0-norm rows stay zero). Twin: the u9 expression in _kmeans_sql."""
    ss9 = _snap9i(m * m).sum(axis=1, dtype=np.int64)
    norm = np.sqrt(ss9.astype(np.float64) / 1e9)
    norm[norm == 0.0] = 1.0
    return _snap9i(m / norm[:, None])


def _dots9(u9: np.ndarray, cents9: np.ndarray) -> np.ndarray:
    """Integer dot-product matrix: dot9[i,c] = Σ_d snap9(u_d · c_d) with
    u = u9/1e9, c = cents9/1e9 — order-free by integer summation."""
    u = u9.astype(np.float64) / 1e9
    c = cents9.astype(np.float64) / 1e9
    out = np.empty((len(u), len(c)), dtype=np.int64)
    for j in range(len(c)):
        out[:, j] = _snap9i(u * c[j][None, :]).sum(axis=1, dtype=np.int64)
    return out


def spherical_kmeans_snapped(
    u9: np.ndarray, k: int, iters: int = KM_ITERS
) -> np.ndarray:
    """Fixed-iteration snapped spherical k-means over snapped unit
    vectors (int64 at 1e-9). Returns k×d snapped centroids (int64).
    Init = rows 0, stride, 2·stride, … of the (already ordered) sample;
    empty cells keep their previous centroid."""
    n, d = u9.shape
    k = min(k, n)
    stride = max(n // k, 1)
    cents9 = u9[[j * stride for j in range(k)]].copy()
    for _ in range(iters):
        best = np.argmax(_dots9(u9, cents9), axis=1)  # first-max ties
        for c in range(k):
            members = u9[best == c]
            if not len(members):
                continue
            cnt = float(len(members))
            s9 = members.sum(axis=0, dtype=np.int64)
            v = s9.astype(np.float64) / 1e9 / cnt
            ss9 = int(_snap9i(v * v).sum(dtype=np.int64))
            norm = math.sqrt(ss9 / 1e9)
            if norm == 0.0:
                norm = 1.0
            cents9[c] = _snap9i(v / norm)
    return cents9
