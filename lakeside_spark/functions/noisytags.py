"""Noisy-tag suppression for tag-catalog responses.

Port of reference ``core/.../utils/NoisyTagsDropper.scala``: tag-query
responses drop (a) a fixed set of internal/bookkeeping tag names, (b) any
tag whose name starts with an excluded prefix (``rollup_``), and (c) tags
whose value is null / empty / the literal string ``"null"``. The reference
applies this per emitted datapoint (Commons.scala:414, toDataPoint); here
names are schema metadata so (a)+(b) filter driver-side, and (c) is a
Column predicate evaluated in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference uses the "_cardinalhq." canonical prefix; our canonical columns
# are unprefixed (schema.py), so the canonical members of the reference list
# map to their unprefixed names where we have an analog.
DO_NOT_DISPLAY_TAG_PREFIXES: tuple[str, ...] = ("rollup_",)

DO_NOT_DISPLAY_TAGS: frozenset[str] = frozenset(
    {
        "day",
        "month",
        "hour",
        "minute",
        "year",
        "sketch",
        "tid",
        "would_filter",
        "trace_has_error",
        "id",
        "telemetry_type",
        "filtered",
        "is_root_span",
        "positive_counts",
        "negative_counts",
        "metric.stepTs",
        "metric.tagName",
        "metric.metrics_type",
        "scope.telemetry.sdk.name",
        "metric.filter",
        "metric.dd.israte",
        "metric.dd.rateinterval",
    }
)


def is_noisy_tag_name(name: str) -> bool:
    return name in DO_NOT_DISPLAY_TAGS or any(
        name.startswith(p) for p in DO_NOT_DISPLAY_TAG_PREFIXES
    )


def displayable_value(col: Column) -> Column:
    """NoisyTagsDropper's value test: non-null, non-empty, not 'null'."""
    s = col.cast("string")
    return s.isNotNull() & (s != "") & (s != "null")
