"""Bucketed tables: co-located fact-fact joins without a shuffle.

The reference joins within a DuckDB process per segment, so "co-location"
is implicit. On a cluster, the same effect comes from writing both fact
tables bucketed by the join key: Spark records the bucketing in the
catalog, and an equi-join on the bucket key reads matching buckets
pair-wise — no Exchange on either side (check the plan: SortMergeJoin with
no Exchange beneath). This is THE answer for repeated large-fact joins
(lineitem x orders at 100 TB): pay one bucketed write, then every
downstream join is shuffle-free.

Bucket count guidance: target file sizes of 100-500 MB per bucket at the
expected table size; both sides must use the same count for pair-wise
reads (Spark can also coalesce k*n vs n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Write df as an external bucketed table (parquet). Sorting within
    buckets lets SortMergeJoin skip its sort too."""
    w = df.write.mode("overwrite").format("parquet").option("path", path)
    w = w.bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucketing metadata comes from the catalog —
    a plain spark.read.parquet(path) would NOT know about the buckets)."""
    return spark.table(table)
