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
SPAN_NAME = "span_name"  # reference: "span.name" (core Commons.scala:71)
SPAN_KIND = "span_kind"  # reference: "span.kind" (core Commons.scala:72)

DATASET_LOGS = "logs"
DATASET_METRICS = "metrics"
DATASET_TRACES = "traces"

# Per-dataset canonical projections (reference: BaseExpr.scala:41-45
# LOGS_PROJECTIONS / METRICS_PROJECTIONS_WITH_VALUE / SPANS_PROJECTIONS,
# dispatched on baseExpr.dataset at BaseExpr.scala:210-214). Raw-row
# (exemplar) output leads with these columns, mirroring the reference's
# `SELECT $projectionSql, *`.
DATASET_PROJECTIONS: dict[str, tuple[str, ...]] = {
    DATASET_LOGS: (TIMESTAMP, VALUE, NAME, MESSAGE),
    DATASET_METRICS: (TIMESTAMP, NAME),
    DATASET_TRACES: (TIMESTAMP, VALUE, SPAN_NAME, SPAN_KIND),
}


def dataset_projection_columns(dataset: str) -> tuple[str, ...]:
    """Canonical leading columns for a dataset's raw-row output; unknown
    datasets raise, as in the reference's dispatch (BaseExpr.scala:214)."""
    try:
        return DATASET_PROJECTIONS[dataset]
    except KeyError:
        raise ValueError(f"Invalid dataset: {dataset}") from None

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


# OTel span.kind values; the driver data ships no trace table, so the
# traces view derives a deterministic kind from the event taxonomy
# (interaction events arrive at a server span, business events from a
# client SDK, errors from internal spans). Both engines (Spark here,
# DuckDB in the registry oracle) apply the identical CASE mapping.
_SPAN_KIND_CASE = {
    "click": "SERVER",
    "view": "SERVER",
    "purchase": "CLIENT",
    "signup": "CLIENT",
    "error": "INTERNAL",
}


def traces_from_events(events: DataFrame) -> DataFrame:
    """Map the driver's ``events`` table onto the canonical traces shape
    (reference: SPANS_PROJECTIONS, BaseExpr.scala:44-45 — timestamp, value,
    span.name, span.kind; trace segments live in their own lake table,
    query-api QueryEngineV2.scala:858-862 ``trace_seg``).

    ts→timestamp_ms, value→value (duration proxy), event_type→span_name,
    a deterministic OTel-style kind→span_kind; user_id/event_id ride along
    as tag columns (trace/span id stand-ins)."""
    kind = F.lit("INTERNAL")
    for etype, k in _SPAN_KIND_CASE.items():
        kind = F.when(F.col("event_type") == etype, F.lit(k)).otherwise(kind)
    return events.select(
        F.unix_millis(F.col("ts")).alias(TIMESTAMP),
        F.col(VALUE),
        F.col("event_type").alias(SPAN_NAME),
        kind.alias(SPAN_KIND),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("event_id"),
    )


def load_traces(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeside_spark.sources.tables import load_table

    return traces_from_events(load_table(spark, sf_dir, "events"))
