"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023).

Scores every raw document by how target-like its hashed word-feature
distribution is: per-bucket importance weight ``log p_target(b) -
log p_raw(b)`` over ``n_buckets`` md5-hashed buckets, document score =
sum of its words' bucket weights. The standard recipe for picking
pre-training data that "looks like" a trusted target corpus without
training a classifier.

Scale shape (the 100 TB contract): pass 1 aggregates the word stream to
the ``n_buckets``-row distribution table (map-side combined — tasks emit
≤ n_buckets rows each) and collects it to the driver, where the
log-ratio weights are computed once; pass 2 re-reads the corpus and
scores every word through a LITERAL lookup array (``element_at`` over
n_buckets longs — pure whole-stage codegen, no join, nothing cached),
then one ``doc_id``-keyed aggregation produces the scores. Exactly one
corpus-sized shuffle (the score agg, map-side combined); no persisted
state outlives the call; nothing quadratic anywhere.

Cross-engine determinism: bucket ids come from the first 8 hex digits of
``md5(word)`` (identical in Spark and DuckDB), add-one-smoothed log
ratios are snapped to 1e-9 fixed-point BIGINTs (``math.log`` here and
DuckDB's ``ln`` are both the platform libm), and per-doc sums add exact
integers — so the oracle's 6-decimal compare is safe against float
summation order (same trick as operators/textstats.unigram_nll).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeside_spark.functions.text import words


def _bucket(col: str | Column, n_buckets: int) -> Column:
    """md5-hashed feature bucket in [0, n_buckets) — stable across
    engines (DuckDB twin: CAST('0x' || substr(md5(w),1,8) AS BIGINT)
    % n_buckets).

    When n_buckets divides 256, hex digits 1-6 of the 8-char prefix are
    irrelevant (16^k ≡ 0 mod 256 for k ≥ 2), so parsing just digits 7-8
    yields the identical bucket with a ~13% cheaper scoring pass at 100x
    (conv's per-call cost scales with input length; equivalence
    asserted against the full-prefix form in tests). The oracle SQL
    keeps the canonical 8-char form — both engines agree either way."""
    h = F.md5(col)
    if 256 % n_buckets == 0:
        return F.conv(F.substring(h, 7, 2), 16, 10).cast("long") % n_buckets
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets


def _word_buckets(
    docs: DataFrame,
    target: Column | None,
    n_buckets: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    # target=None: scoring-only callers (precomputed weights) must not
    # reference target columns the shard may not carry
    tgt = F.lit(False) if target is None else target
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            tgt.alias("__tgt"),
            F.explode(words(text_col)).alias("w"),
        )
        .filter(F.col("w") != "")
        .select("doc_id", "__tgt", _bucket("w", n_buckets).alias("b"))
    )


def dsir_fit(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[int]:
    """ONE corpus pass fitting the importance weights: both feature
    distributions in a single bucket-keyed agg (map-side combined —
    ≤ n_buckets rows per task reach the shuffle), collected because the
    weight table is n_buckets longs, i.e. metadata-sized. Returns the
    1e-9 fixed-point log-ratio weight per bucket.

    At 100 TB this is the pass to AMORTIZE: the weights are a pure
    function of (corpus, target, n_buckets) — 256 numbers — so fit once,
    store them, and score any number of shards/runs with
    ``dsir_scores(..., weights=...)`` at one scan each (DSIR's published
    recipe is exactly this fit-then-score split)."""
    wb = _word_buckets(docs, target, n_buckets, text_col, id_col)
    dist = {
        r["b"]: (r["rc"], r["tc"])
        for r in wb.groupBy("b")
        .agg(
            F.count("*").alias("rc"),
            F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("tc"),
        )
        .collect()
    }
    rt = sum(rc for rc, _ in dist.values())
    tt = sum(tc for _, tc in dist.values())

    def weight(rc: int, tc: int) -> int:
        # half-AWAY-from-zero to match DuckDB/Spark ROUND() — Python's
        # round() banker-rounds, which can flip a 1e-9 weight by 1 on an
        # exact .5 boundary and reorder a dsir_select top-k tie
        x = (
            math.log((tc + 1) / (tt + n_buckets))
            - math.log((rc + 1) / (rt + n_buckets))
        ) * 1e9
        return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

    # buckets unseen in the FIT corpus still carry the add-one-smoothed
    # log-ratio (rc=tc=0), not 0 — the fit-once/score-other-shards path
    # probes them for words the fit corpus never hashed there
    lr9 = [weight(0, 0)] * n_buckets
    for b, (rc, tc) in dist.items():
        lr9[b] = weight(rc, tc)
    return lr9


def dsir_scores(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: list[int] | None = None,
) -> DataFrame:
    """Per-document DSIR importance score against the ``target`` subset.

    ``target`` is a boolean Column over ``docs`` marking the trusted
    corpus (e.g. ``F.col("lang") == "en"``). Returns
    ``(doc_id, n_words, dsir_score)`` for every doc with ≥1 word, where
    ``dsir_score`` is the exact fixed-point sum of bucket log-ratios
    divided by 1e9 (order-independent). Without precomputed ``weights``
    this calls ``dsir_fit`` eagerly (like the ANN quantizer training
    passes) and then scores — two scans total, the operator's inherent
    shape; pass ``weights`` (from an earlier fit) to score in ONE scan.
    """
    lr9 = weights if weights is not None else dsir_fit(
        docs, target, n_buckets, text_col, id_col
    )
    if len(lr9) != n_buckets:
        raise ValueError(
            f"weights length {len(lr9)} != n_buckets {n_buckets}"
        )
    # with precomputed weights the target column is not consulted (and
    # may not exist on the shard being scored)
    wb = _word_buckets(
        docs, None if weights is not None else target, n_buckets,
        text_col, id_col,
    )
    # scoring goes through a literal lookup array — no join, no cache,
    # pure codegen; the only corpus-sized shuffle is the doc_id agg
    lut = F.array(*[F.lit(v).cast("long") for v in lr9])
    return (
        wb.select("doc_id", F.element_at(lut, F.col("b").cast("int") + 1).alias("lr9"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("lr9").alias("__s9"),
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
