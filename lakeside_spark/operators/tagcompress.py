"""Tag-name compression for result streams.

Port of reference ``core/.../utils/TagNameCompressionStage.scala``: as
datapoints stream out, a tag KEY is emitted only the first time the stream
sees it (``!seenTags.add(t)`` drops repeats), null/empty values are
dropped, and datapoints left with no tags are suppressed. The reference
runs one stateful stage per response stream; the Spark-first equivalent is
a first-occurrence window over the exploded (stream, tag_name) pairs — no
driver state, one keyed shuffle, deterministic given a unique order key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compress_tag_stream(
    rows: DataFrame,
    order_col: str,
    key_col: str = "tag_name",
    value_col: str = "tag_value",
    stream_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Keep, per stream, only the FIRST occurrence of each tag key.

    ``rows``: exploded tag stream (*stream_cols, order_col, key_col,
    value_col); ``order_col`` must be unique within a stream so "first" is
    deterministic. Rows whose value is null/empty never count as an
    occurrence (TagNameCompressionStage drops them before seenTags)."""
    valid = (
        F.col(value_col).isNotNull() & (F.col(value_col).cast("string") != "")
    )
    w = Window.partitionBy(*stream_cols, key_col).orderBy(order_col)
    return (
        rows.filter(valid)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
