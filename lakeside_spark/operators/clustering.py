"""Metric-name clustering for batched queries (reference: core
ClusteringUtils.scala — jaccard n-gram feature vectors + k-means, used to
batch related metric names into one query).

The name lists are small (thousands at most — they're distinct metric
names, not rows), so this is deliberately driver-side numpy: distributing
it would add shuffles for no benefit. Deterministic via seeded init.
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


def _kmeans(data: np.ndarray, k: int, max_iter: int = 100, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centroids = data[rng.integers(0, len(data), size=k)]
    assign = np.zeros(len(data), dtype=int)
    for _ in range(max_iter):
        dists = ((data[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        new_assign = dists.argmin(axis=1)
        if (new_assign == assign).all():
            break
        assign = new_assign
        for j in range(k):
            members = data[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return assign


def cluster_names(
    names: list[str], min_k: int = 2, max_k: int = 6, max_cluster_size: int = 15
) -> list[list[str]]:
    """Batch names into clusters of similar strings, growing k until every
    cluster fits under max_cluster_size (reference: ClusteringUtils.clustered)."""
    if len(names) <= 5:
        return [list(names)]
    features = np.array(
        [[jaccard_similarity(a, b) for b in names] for a in names]
    )
    for k in range(min_k, max_k + 1):
        assign = _kmeans(features, k)
        clusters = [
            [names[i] for i in range(len(names)) if assign[i] == j]
            for j in range(k)
        ]
        clusters = [c for c in clusters if c]
        if all(len(c) < max_cluster_size for c in clusters):
            return clusters
    return clusters
