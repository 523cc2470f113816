"""Metric-name clustering for batched queries (reference: core
ClusteringUtils.scala — jaccard n-gram feature vectors + k-means, used to
batch related metric names into one query).

The name lists are small (thousands at most — they're distinct metric
names, not rows), so this is deliberately driver-side numpy: distributing
it would add shuffles for no benefit.

ORACLE-EXACT since r10: the k-means is the REPLAYABLE snapped spherical
k-means (operators/kmeans_replay — strided init over the caller-ordered
names, fixed iterations, order-free 1e-9 integer dots), the jaccard
features are exact int/int divisions snapped by unit9, and the k-growth
loop (first k in [min_k, max_k] whose clusters all fit, else max_k) is
a pure function of the assignments — so KMEANS_NAMES_SQL
(registry/_kmeans_sql) replays feature build, training for every k,
assignment and the k selection bit-for-bit. The ≤5-name passthrough is
Python-only; the registry corpus has ~100 names at every SF.
"""

from __future__ import annotations

import numpy as np

COMMON_SUFFIXES = (
    "95percentile", "max", "median", "count", "avg", "50p", "75p", "95p",
    "99p", "sum", "total",
)


def _ngrams(s: str, n: int = 2) -> set[str]:
    return {s[i : i + n] for i in range(max(len(s) - n + 1, 1))}


def jaccard_similarity(a: str, b: str, n: int = 2) -> float:
    sa, sb = _ngrams(a, n), _ngrams(b, n)
    union = len(sa | sb)
    return len(sa & sb) / union if union else 0.0


def cluster_names(
    names: list[str], min_k: int = 2, max_k: int = 6, max_cluster_size: int = 15
) -> list[list[str]]:
    """Batch names into clusters of similar strings, growing k until every
    cluster fits under max_cluster_size (reference: ClusteringUtils
    .clustered). Clusters come back in centroid-cell order with empty
    cells dropped — the SQL twin's dense_rank over cell index."""
    from lakeside_spark.operators.kmeans_replay import (
        _dots9,
        spherical_kmeans_snapped,
        unit9,
    )

    if len(names) <= 5:
        return [list(names)]
    features = np.array(
        [[jaccard_similarity(a, b) for b in names] for a in names]
    )
    u9 = unit9(features)
    clusters: list[list[str]] = []
    for k in range(min_k, max_k + 1):
        cents9 = spherical_kmeans_snapped(u9, k)
        assign = _dots9(u9, cents9).argmax(axis=1)  # first-max ties
        clusters = [
            [names[i] for i in range(len(names)) if assign[i] == j]
            for j in range(len(cents9))
        ]
        clusters = [c for c in clusters if c]
        if all(len(c) < max_cluster_size for c in clusters):
            return clusters
    return clusters
