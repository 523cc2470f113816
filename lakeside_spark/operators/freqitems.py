"""Misra-Gries frequent-items sketch: distributed heavy hitters.

Completes the engine's sketch family (HLL cardinality, KLL/DDSketch
quantiles, theta-sketch set intersection — SURVEY §2C): the reference's
sketch-merge architecture (TimeGroupedSketchAggregator) applied to the
"which values dominate this stream" question, which none of the other
sketches answer.

Shape: each Arrow batch is summarized into a Misra-Gries summary of at
most ``capacity`` counters (mapInPandas — the corpus is never held, only
k counters per batch), the per-batch summaries are merged by a plain
``groupBy(item).sum`` (MG merge = pointwise counter addition, then the
top-k cut), and the global top-k is ranked on the merged lower bounds.

Guarantees (Misra-Gries; merge/prune per Agarwal, Cormode et al.,
"Mergeable Summaries", PODS 2012):
- est_count ≤ true_count ≤ est_count + err_bound, where err_bound is
  the sum of per-batch prune cuts — reported on every row so the
  consumer sees the worst-case slack;
- each batch's cut is ≤ batch_rows/(capacity+1), so err_bound ≤
  N/(capacity+1): every item with true_count > N/(capacity+1) keeps a
  positive merged counter and appears in the output (no false negatives
  among true heavy hitters above the threshold).

At 100 TB: the map side emits ≤ capacity rows per batch (KB-sized), the
single shuffle moves summaries not data, and the final top-k runs on a
table bounded by capacity × n_batches — never corpus-sized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mg_summarize(values: pd.Series, capacity: int) -> tuple[pd.Series, int]:
    """Vectorized Misra-Gries summary of one batch.

    An exact count vector is an MG summary with zero error; pruning it to
    ``capacity`` counters subtracts the (capacity+1)-th largest count from
    every kept counter and charges that cut to the error bound (Agarwal,
    Cormode et al., "Mergeable Summaries", PODS 2012). value_counts does
    the counting — no per-row Python."""
    vc = values.value_counts()
    if len(vc) <= capacity:
        return vc, 0
    cut = int(vc.iloc[capacity])
    kept = vc.iloc[:capacity] - cut
    return kept[kept > 0], cut


def mg_summaries(
    df: DataFrame, item_col: str, capacity: int = 64
) -> DataFrame:
    """Per-Arrow-batch MG summaries as (item, cnt) rows; a NULL item row
    carries the batch's prune-cut error mass. Exact count rows (e.g. the
    streaming unsealed-window counts of
    streaming.pipeline.streaming_freq_counts) are themselves valid MG
    summaries with zero error, so sealed and unsealed sides union
    directly into ``merge_topk`` — the reference's sealed+unsealed
    sketch-merge pattern (same shape as the DDSketch rows)."""
    src = df.select(F.col(item_col).cast("string").alias("item"))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counters, cut = _mg_summarize(pdf["item"], capacity)
            out = pd.DataFrame(
                {"item": counters.index, "cnt": counters.to_numpy()}
            )
            # the batch's error bound rides along on a sentinel row so the
            # merge stays one plain aggregation
            out = pd.concat(
                [out, pd.DataFrame({"item": [None], "cnt": [cut]})],
                ignore_index=True,
            )
            yield out

    return src.mapInPandas(summarize, schema="item string, cnt long")


def merge_topk(summaries: DataFrame, k: int = 10) -> DataFrame:
    """Merge MG summary rows → (rank, item, est_count, err_bound).

    MG merge = pointwise counter addition (one groupBy-sum over KB-sized
    summaries); err_bound = total NULL-sentinel mass, attached to every
    output row."""
    merged = summaries.groupBy("item").agg(F.sum("cnt").alias("est_count"))
    err = merged.filter(F.col("item").isNull()).select(
        F.coalesce(F.sum("est_count"), F.lit(0)).alias("err_bound")
    )
    rk = Window.orderBy(F.desc("est_count"), F.asc("item"))
    top = (
        merged.filter(F.col("item").isNotNull())
        .select(
            F.row_number().over(rk).cast("bigint").alias("rank"),
            "item",
            "est_count",
        )
        .filter(F.col("rank") <= k)
    )
    return top.crossJoin(F.broadcast(err))


def freq_topk_sketch(
    df: DataFrame,
    item_col: str,
    k: int = 10,
    capacity: int = 64,
) -> DataFrame:
    """(rank, item, est_count, err_bound): approximate top-k items.

    ``est_count`` is a lower bound on the true count; the true count is
    ≤ est_count + err_bound (err_bound = total prune-cut mass across
    batch summaries, a single global number attached to every row)."""
    return merge_topk(mg_summaries(df, item_col, capacity), k)
