"""Embedding-space (semantic) decontamination: flag training-corpus
vectors that are near-duplicates of a held-out benchmark/eval set.

The semantic complement of the n-gram decontamination family
(operators/decontam — exact 13-gram overlap, Bloom membership): n-gram
matching misses paraphrased contamination, which embedding cosine
catches (the standard second pass in LLM data pipelines — e.g. the
benchmark-similarity filters run alongside exact-overlap decontam).

100 TB shape: benchmark/eval sets are SMALL by construction (an eval
suite is thousands of rows, the corpus is billions), so the benchmark
side broadcasts as one snapped unit matrix and the scan stays MAP-ONLY
— one Arrow kernel computes each corpus block's integer-dot maximum
against the benchmark matrix in a blocked pass, emitting only rows over
the threshold. No shuffle, no join; at benchmark sizes past broadcast
reach, the hyperplane-bucketed candidate path (operators/similarity
.ann_lsh) is the swap, same contract.

ORACLE-EXACT by construction: both sides are 1e-9 snapped unit vectors
(operators/kmeans_replay.unit9), every cosine is an order-free integer
dot, the keep test is an integer compare against round(τ·1e9), and the
best-match tie breaks to the LOWEST benchmark id (first-max over the
id-sorted matrix == SQL ROW_NUMBER ORDER BY cos9 DESC, bench_id) — so
EMBEDDING_DECONTAM_SQL (registry/embedding.py) replays the whole pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakeside_spark.operators.kmeans_replay import _dots9, _snap9i, unit9


def benchmark_matches(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, bench_id, cos): for every corpus vector whose best
    benchmark cosine meets ``threshold``, its best-matching benchmark
    row. Corpus rows that also appear in the benchmark are the caller's
    concern (pass disjoint frames)."""
    spark = corpus.sparkSession
    empty = f"{id_col} bigint, bench_id bigint, cos double"
    thr9 = int(_snap9i(np.array([threshold]))[0])
    bench_rows = (
        benchmark.select(id_col, vec_col).orderBy(id_col).collect()
    )
    if not bench_rows:
        return spark.createDataFrame([], schema=empty)
    b_ids = np.array([r[0] for r in bench_rows], dtype=np.int64)
    bu9 = unit9(np.array([r[1] for r in bench_rows], dtype=np.float64))
    bc = spark.sparkContext.broadcast((b_ids, bu9))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, unit_b9 = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            u9 = unit9(np.array(list(pdf[vec_col]), dtype=np.float64))
            dots = _dots9(u9, unit_b9)
            best = dots.argmax(axis=1)  # first-max: ties to lowest id
            mx = dots[np.arange(len(best)), best]
            keep = mx >= thr9
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(np.int64)[keep],
                    "bench_id": ids_b[best[keep]],
                    "cos9": mx[keep],
                }
            )

    from lakeside_spark.operators.similarity import _parallelize

    scored = _parallelize(
        corpus.select(id_col, vec_col), bytes_per_task=8 << 20
    ).mapInPandas(
        kernel, schema=f"{id_col} bigint, bench_id bigint, cos9 bigint"
    )
    return scored.select(
        id_col,
        "bench_id",
        F.round(F.col("cos9") / F.lit(1e9), 6).alias("cos"),
    )
