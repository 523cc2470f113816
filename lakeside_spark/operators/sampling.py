"""Deterministic corpus sampling and sequence packing — the last two
stages of a training-data pipeline (filter → dedup → sample → pack).

Sampling uses a content-derived hash gate instead of RNG: md5(doc_id) maps
each doc to a stable point in [0, 1), and a per-stratum rate keeps docs
below it. Fully reproducible across runs/engines (the oracle runs the
same expression), no seed plumbing, and resampling at a higher rate is a
superset of the lower rate — the property curation pipelines actually
want when they grow a mixture.

Packing greedily fills token-budget bins per stratum via applyInPandas:
each stratum's docs arrive sorted and are folded into bins in one pass.
Bins never cross strata, so the operation distributes by the stratum key
(one shuffle); within a group the fold is linear.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(id_col: str) -> F.Column:
    """Deterministic [0,100) bucket from md5(id) — the ONE expression
    every deterministic sample/split gate shares (cross-engine leakage
    safety depends on sample gates and split membership staying
    bit-identical, so they must come from this helper, never a copy).

    Portable: CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8) AS
    BIGINT) % 100 in any engine with md5."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )


def hash_gate(id_col: str, rate_pct: F.Column | float) -> F.Column:
    """Keep when hash_bucket(id) < rate_pct."""
    rate = rate_pct if isinstance(rate_pct, F.Column) else F.lit(rate_pct)
    return hash_bucket(id_col) < rate


def source_cap(
    docs: DataFrame,
    cap: int = 100,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source document cap: keep the first ``cap`` docs (by id) of each
    source — the per-domain cap every crawl pipeline applies so a handful
    of giant domains cannot dominate the mixture (C4 and RefinedWeb both
    cap URL-host contributions).

    One shuffle on the source key, then a bounded row_number. At 100 TB a
    monster domain makes its window partition big, but the sort is by the
    id the scan already delivers mostly-ordered and spills gracefully; a
    two-phase refinement (per-partition local top-cap, then global) drops
    out of the same plan when cap << partition rows because row_number
    stops consuming after cap rows per key. Deterministic: (source, id)
    is a total order, so the kept set is stable across engines."""
    w = Window.partitionBy(source_col).orderBy(id_col)
    return docs.withColumn(
        "source_rank", F.row_number().over(w).cast("long")
    ).filter(F.col("source_rank") <= cap)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep rate_pct% of each stratum, deterministically (no RNG).

    rates maps stratum value -> percentage [0, 100]; unlisted strata use
    default_rate. The gate is a per-row expression: fully pushdown-able,
    no shuffle, and stable under re-execution and engine changes.
    """
    rate = F.lit(float(default_rate))
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(float(pct))).otherwise(rate)
    return docs.filter(hash_gate(id_col, rate))


def pack_documents(
    docs: DataFrame,
    budget_tokens: int,
    tokens_col: str = "n_tokens",
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequence packing: fold each stratum's docs (ordered by id)
    into bins of at most budget_tokens; oversized docs get a bin alone.

    Output: (stratum, bin_id, doc_id, n_tokens). Distributed by stratum —
    packing is inherently sequential within a bin stream, so the stratum
    is the parallelism unit (salt wide strata upstream if one dominates).
    """

    def pack(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        bins, used, current = [], 0, 0
        for t in pdf[tokens_col]:
            if used > 0 and used + t > budget_tokens:
                current += 1
                used = 0
            bins.append(current)
            used += t
            if used >= budget_tokens:
                current += 1
                used = 0
        out = pdf[[id_col, tokens_col]].copy()
        out.insert(0, "bin_id", bins)
        out.insert(0, stratum_col, keys[0])
        return out

    schema = f"{stratum_col} string, bin_id long, {id_col} bigint, {tokens_col} bigint"
    return (
        docs.select(stratum_col, id_col, tokens_col)
        .groupBy(stratum_col)
        .applyInPandas(pack, schema=schema)
    )


def train_val_test_split(
    docs: DataFrame,
    val_pct: float = 5.0,
    test_pct: float = 5.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment from the md5 hash gate's
    [0,100) bucket — the standard leakage-safe split for a training
    corpus: membership is a pure function of the document id, so
    re-running the pipeline (or running it in another engine) never
    migrates a document across splits, and no RNG state needs to be
    carried. Per-row expression: zero shuffles, fully pushdown-able when
    a consumer filters to one split.

    Percentages must be whole numbers: the shared bucket has 100 integer
    levels, so a fractional boundary would silently starve a split
    (val_pct=0.5 would make 'val' empty)."""
    if val_pct != int(val_pct) or test_pct != int(test_pct):
        raise ValueError(
            f"val_pct/test_pct must be whole percentages (100-level hash "
            f"bucket): got {val_pct}/{test_pct}"
        )
    bucket = hash_bucket(id_col)
    train_hi = 100.0 - val_pct - test_pct
    return docs.withColumn(
        "split",
        F.when(bucket < train_hi, "train")
        .when(bucket < train_hi + val_pct, "val")
        .otherwise("test"),
    )
