"""Partitioned segment lake layout.

The reference stores sealed segments at
``db/{customer}/{collector}/{dateint}/{dataset}/{hour}/{segmentId}.parquet``
and prunes segments with a trigram index + time metadata
(core Commons.scala:160-177, NLPUtils.scala). The Spark-native equivalent is
a hive-partitioned layout — ``dataset=X/dateint=D/hour=H`` — where time-range
predicates become partition filters: excluded hours are never listed, read,
or even footer-checked. Tag-value skipping comes from parquet row-group
statistics and (optionally) bloom filters instead of trigrams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeside_spark import schema as S


def write_segments(
    telemetry: DataFrame,
    path: str,
    dataset: str = S.DATASET_LOGS,
    bloom_columns: tuple[str, ...] = (),
) -> None:
    """Seal a telemetry frame into the partitioned lake layout.

    Partition columns derive from the timestamp: dateint=YYYYMMDD, hour=HH
    (reference dateint/hour path parity). Writers at scale should aim for
    ~100-500 MB files per partition (repartition by the partition key first).
    """
    ts = F.timestamp_millis(F.col(S.TIMESTAMP))
    df = (
        telemetry.withColumn("dataset", F.lit(dataset))
        .withColumn("dateint", F.date_format(ts, "yyyyMMdd").cast("int"))
        .withColumn("hour", F.date_format(ts, "HH").cast("int"))
        .repartition("dateint", "hour")
    )
    writer = df.write.mode("overwrite").partitionBy("dataset", "dateint", "hour")
    for col in bloom_columns:
        writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
    writer.parquet(path)


def read_segments(
    spark: SparkSession,
    path: str,
    dataset: str | None = None,
    start_ts: int | None = None,
    end_ts: int | None = None,
) -> DataFrame:
    """Read with partition pruning: the dataset/dateint/hour predicates are
    partition filters (check .explain() → PartitionFilters), so out-of-range
    segments cost nothing. The residual precise timestamp bounds remain as
    pushed row-group filters."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if dataset is not None:
        df = df.filter(F.col("dataset") == dataset)
    if start_ts is not None:
        day, hour = _dateint_hour(start_ts)
        df = df.filter(
            (F.col("dateint") > day)
            | ((F.col("dateint") == day) & (F.col("hour") >= hour))
        ).filter(F.col(S.TIMESTAMP) >= start_ts)
    if end_ts is not None:
        day, hour = _dateint_hour(end_ts)
        df = df.filter(
            (F.col("dateint") < day)
            | ((F.col("dateint") == day) & (F.col("hour") <= hour))
        ).filter(F.col(S.TIMESTAMP) < end_ts)
    return df


def _dateint_hour(ts_ms: int) -> tuple[int, int]:
    from datetime import datetime, timezone

    dt = datetime.fromtimestamp(ts_ms / 1000.0, tz=timezone.utc)
    return int(dt.strftime("%Y%m%d")), dt.hour
