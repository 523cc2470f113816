"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023).

Scores every raw document by how target-like its hashed word-feature
distribution is: per-bucket importance weight ``log p_target(b) -
log p_raw(b)`` over ``n_buckets`` md5-hashed buckets, document score =
sum of its words' bucket weights. The standard recipe for picking
pre-training data that "looks like" a trusted target corpus without
training a classifier.

Scale shape (the 100 TB contract): the two feature distributions are ONE
word-exploded aggregation each (map-side combined, bucket-sized results
— ``n_buckets`` rows regardless of corpus size), the weight table rides
to every executor as a broadcast hash join, and scoring is one
``doc_id``-keyed aggregation. No corpus-sized shuffle beyond the single
score agg; nothing quadratic anywhere.

Cross-engine determinism: bucket ids come from the first 8 hex digits of
``md5(word)`` (identical in Spark and DuckDB), add-one-smoothed log
ratios are snapped to 1e-9 fixed-point BIGINTs, and per-doc sums add
exact integers — so the oracle's 6-decimal compare is safe against float
summation order (same trick as operators/textstats.unigram_nll).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeside_spark.functions.text import words


def _bucket(col: str | Column, n_buckets: int) -> Column:
    """md5-hashed feature bucket in [0, n_buckets) — stable across
    engines (DuckDB twin: CAST('0x' || substr(md5(w),1,8) AS BIGINT))."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets
    )


def dsir_scores(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance score against the ``target`` subset.

    ``target`` is a boolean Column over ``docs`` marking the trusted
    corpus (e.g. ``F.col("lang") == "en"``). Returns
    ``(doc_id, n_words, dsir_score)`` for every doc with ≥1 word, where
    ``dsir_score`` is the exact fixed-point sum of bucket log-ratios
    divided by 1e9 (order-independent).
    """
    wds = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            target.alias("__tgt"),
            F.explode(words(text_col)).alias("w"),
        )
        .filter(F.col("w") != "")
        .select("doc_id", "__tgt", _bucket("w", n_buckets).alias("b"))
    )
    # Collapse the word stream to per-doc bucket COUNTS first: md5 runs
    # once per word occurrence, the shuffle moves ≤min(words, n_buckets)
    # rows per doc instead of every word (map-side combined), and both
    # the distribution build and the scoring read this compact table —
    # persisted because it feeds two branches (100x probe: recomputing
    # the explode+md5 for each branch doubled the dominant cost).
    per_doc = (
        wds.groupBy("doc_id", "__tgt", "b")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    # both distributions from the compact table: raw = all docs, target =
    # the flagged subset (bucket-sized result)
    dist = per_doc.groupBy("b").agg(
        F.sum("cnt").alias("rc"),
        F.sum(F.when(F.col("__tgt"), F.col("cnt")).otherwise(0)).alias("tc"),
    )
    totals = dist.agg(
        F.sum("rc").alias("__rt"), F.sum("tc").alias("__tt")
    )
    lr9 = (
        F.log((F.col("tc") + 1) / (F.col("__tt") + n_buckets))
        - F.log((F.col("rc") + 1) / (F.col("__rt") + n_buckets))
    ) * 1e9
    weights = dist.crossJoin(F.broadcast(totals)).select(
        "b", F.round(lr9).cast("long").alias("lr9")
    )
    return (
        per_doc.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("lr9")).alias("__s9"),
        )
        .select(
            "doc_id",
            "n_words",
            F.round(F.col("__s9") / 1e9, 6).alias("dsir_score"),
        )
    )


def dsir_select(
    docs: DataFrame,
    target: Column,
    k: int,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` raw documents by DSIR score (deterministic tie-break on
    doc_id — the selection set is stable across engines and runs)."""
    scored = dsir_scores(docs, target, n_buckets, text_col, id_col)
    return scored.orderBy(
        F.col("dsir_score").desc(), F.col("doc_id")
    ).limit(k)
