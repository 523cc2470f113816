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
    # timezone-INDEPENDENT partition derivation: pure integer math on epoch
    # millis plus DateType arithmetic (dates carry no timezone), so written
    # partitions always agree with read_segments' UTC pruning
    # (_dateint_hour) no matter what spark.sql.session.timeZone a
    # caller-supplied session uses
    epoch_day = (F.col(S.TIMESTAMP) / F.lit(86_400_000)).cast("long")
    dateint = F.date_format(
        F.date_add(F.to_date(F.lit("1970-01-01")), epoch_day.cast("int")), "yyyyMMdd"
    ).cast("int")
    hour = ((F.col(S.TIMESTAMP) / F.lit(3_600_000)).cast("long") % 24).cast("int")
    df = (
        telemetry.withColumn("dataset", F.lit(dataset))
        .withColumn("dateint", dateint)
        .withColumn("hour", hour)
        .repartition("dateint", "hour")
        # sort rows inside each file by (ts, name): parquet row-group
        # min/max statistics become tight ranges, so time- and
        # name-predicate scans skip whole row groups at read time —
        # free pruning on every query against the lake
        .sortWithinPartitions(S.TIMESTAMP, S.NAME)
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

    Crash-safe: the compacted lake is written to a sibling temp directory,
    row-count-verified against the source, and only then swapped into place
    with two renames — a failure at any earlier point leaves the original
    lake untouched (on an object store the same two-phase shape applies
    with the store's atomic-rename/committer primitive).
    """
    import os
    import shutil

    base = path.rstrip("/")
    tmp, old = base + ".compact.tmp", base + ".compact.old"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        df = spark.read.option("mergeSchema", "true").parquet(path)
        total_rows = df.count() or 1
        total_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
        # estimate rows per target file from overall average row width;
        # skewed hours get ceil(rows/rows_per_file) files, never one giant
        rows_per_file = max(1, int(target_file_bytes / max(total_bytes / total_rows, 1)))
        sort_cols = [c for c in (S.TIMESTAMP, S.NAME) if c in df.columns]
        shaped = df.repartition("dataset", "dateint", "hour")
        if sort_cols:
            shaped = shaped.sortWithinPartitions(*sort_cols)
        (
            shaped.write.mode("overwrite")
            .option("maxRecordsPerFile", rows_per_file)
            .partitionBy("dataset", "dateint", "hour")
            .parquet(tmp)
        )
        compacted_rows = spark.read.option("mergeSchema", "true").parquet(tmp).count()
        if compacted_rows != total_rows:
            raise RuntimeError(
                f"compact_segments: row count changed during compaction "
                f"({total_rows} -> {compacted_rows}); source left untouched"
            )
        os.rename(base, old)
        os.rename(tmp, base)
        shutil.rmtree(old)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


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
