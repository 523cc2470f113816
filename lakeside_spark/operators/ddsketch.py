"""DDSketch-style relative-error quantiles as plain DataFrame aggregation.

The reference's percentile path is DDSketch (reference:
TimeGroupedSketchAggregator.scala merges DDSketches across segments;
`DDSketch` from the datadog sketches-java library): values land in
log-spaced buckets index = ceil(log_gamma(x)), gamma = (1+alpha)/(1-alpha),
which bounds RELATIVE error by alpha at any quantile — unlike KLL/
percentile_approx whose guarantee is rank error.

Spark-first re-expression: a DDSketch IS just a counts-per-log-bucket map,
so the sketch becomes rows (group, bucket, cnt) produced by one partial-agg
friendly groupBy — and sketch MERGE (the property the reference's
sealed-segment rollup relies on) is literally `sum(cnt)` over a coarser
grain. No UDAF, no binary blobs, whole-stage codegen end to end; the
quantile extraction is one cumulative-sum window over ~hundreds of buckets
per group (log-spaced buckets: ~1400 buckets cover 1e-9..1e9 at alpha=1%).

Sign handling matches DDSketch's three stores: negative mirror store,
zero bucket (|x| <= min_indexable), positive store.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakeside_spark import schema as S

DEFAULT_ALPHA = 0.01
_MIN_INDEXABLE = 1e-9


def _gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def ddsketch_buckets(
    df: DataFrame,
    value_col: str = S.VALUE,
    step_ms: int = 3_600_000,
    group_cols: tuple[str, ...] = (S.NAME,),
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """Build per-(step, groups) DDSketch bucket rows: (step_ts, *groups,
    bucket, cnt). One shuffle, partial aggregation map-side — at 100 TB the
    reducer sees only distinct (group, bucket) pairs, not rows."""
    gamma = _gamma(alpha)
    v = F.col(value_col).cast("double")
    absb = F.ceil(F.log(F.abs(v)) / F.lit(math.log(gamma))).cast("long")
    bucket = (
        F.when(v > _MIN_INDEXABLE, absb)
        .when(v < -_MIN_INDEXABLE, -absb)
        .otherwise(F.lit(0))
    )
    step_ts = F.col(S.TIMESTAMP) - F.col(S.TIMESTAMP) % F.lit(step_ms)
    return (
        df.filter(v.isNotNull())
        .groupBy(
            step_ts.alias(S.STEP_TS),
            *[F.col(g) for g in group_cols],
            bucket.alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ddsketch_merge(
    buckets: DataFrame,
    step_ms: int,
    group_cols: tuple[str, ...] = (S.NAME,),
) -> DataFrame:
    """Merge sketches to a coarser time grain — the reference's
    sealed-segment rollup (hourly segment sketches → daily answer) is a
    lossless `sum(cnt)` because DDSketch merge is bucket-wise addition."""
    coarse = F.col(S.STEP_TS) - F.col(S.STEP_TS) % F.lit(step_ms)
    return buckets.groupBy(
        coarse.alias(S.STEP_TS),
        *[F.col(g) for g in group_cols],
        F.col("bucket"),
    ).agg(F.sum("cnt").alias("cnt"))


def ddsketch_quantile(
    buckets: DataFrame,
    q: float,
    group_cols: tuple[str, ...] = (S.NAME,),
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """Extract the q-quantile per (step_ts, *groups): the bucket where the
    cumulative count crosses ceil(q*n), estimated at the bucket's log
    midpoint 2*gamma^b/(gamma+1) — relative error ≤ alpha by construction."""
    out = ddsketch_quantiles(buckets, (q,), group_cols, alpha)
    return out.withColumnRenamed(_qcol(q), S.VALUE)


def _qcol(q: float) -> str:
    return "p" + f"{q * 100:g}".replace(".", "_")


def ddsketch_quantiles(
    buckets: DataFrame,
    qs: tuple[float, ...],
    group_cols: tuple[str, ...] = (S.NAME,),
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """All requested quantiles (e.g. p50/p95/p99) from ONE cumulative-sum
    window pass — a dashboard's percentile panel costs the same shuffle as
    a single quantile. Output columns ``p50, p95, p99_9`` etc."""
    gamma = _gamma(alpha)
    est = (
        F.when(F.col("bucket") == 0, F.lit(0.0))
        .otherwise(
            F.signum(F.col("bucket"))
            * F.lit(2.0)
            * F.pow(F.lit(gamma), F.abs(F.col("bucket")))
            / F.lit(gamma + 1.0)
        )
        .alias("est")
    )
    keys = [S.STEP_TS, *group_cols]
    scored = buckets.select(*keys, "cnt", est)
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("est")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    scored = scored.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(w_all)
    )
    measures = [
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("total")), F.col("est")
            )
        ).alias(_qcol(q))
        for q in qs
    ]
    return scored.groupBy(*keys).agg(*measures)
