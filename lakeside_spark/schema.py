"""Canonical telemetry schema.

The reference stores telemetry rows with prefixed canonical columns
(``_cardinalhq.timestamp`` epoch-millis, ``.name``, ``.value``, ``.message``;
reference: core Commons.scala:45-72) plus arbitrary string tag columns. We
use unprefixed names (dots in column names fight Spark's resolver) and a
mapping layer for the driver's ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TIMESTAMP = "timestamp_ms"  # epoch millis, bigint
NAME = "name"
VALUE = "value"
MESSAGE = "message"
STEP_TS = "step_ts"

DATASET_LOGS = "logs"
DATASET_METRICS = "metrics"
DATASET_TRACES = "traces"

# ASL operators (reference: core LogCommons.scala)
EQ, NOT_EQUALS, IN, NOT_IN = "eq", "!=", "in", "not_in"
GT, GE, LT, LE = "gt", "ge", "lt", "le"
CONTAINS, REGEX, HAS, EXISTS = "contains", "regex", "has", "exists"

STRING_TYPE, NUMBER_TYPE = "string", "number"
DURATION_TYPE, DATA_SIZE_TYPE = "duration", "datasize"

MIN, MAX, SUM, COUNT, AVG = "min", "max", "sum", "count", "avg"
CARDINALITY_ESTIMATE_AGGREGATION = "ces"

DEFAULT_STEP_MS = 10_000  # reference: SketchInput.DEFAULT_EVAL_STEP


def telemetry_from_events(events: DataFrame) -> DataFrame:
    """Map the driver's ``events`` table onto the canonical telemetry shape.

    ts→timestamp_ms, event_type→name, value→value, props→message; user_id and
    event_id ride along as tag columns.
    """
    return events.select(
        F.unix_millis(F.col("ts")).alias(TIMESTAMP),
        F.col("event_type").alias(NAME),
        F.col(VALUE),
        F.col("props").alias(MESSAGE),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("event_id"),
    )


def load_telemetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeside_spark.sources.tables import load_table

    return telemetry_from_events(load_table(spark, sf_dir, "events"))
