"""Duration / data-size quantity normalization.

Behavioral parity with the reference's QuantityParser (core
QuantityParser.scala): durations normalize to nanoseconds, data sizes to
bytes, including its idiosyncratic binary-unit factors (kib=128, mib=131072,
gib=134.2e6 ...) which we reproduce exactly so filters compare identically.

This runs driver-side at plan-build time (filter literals only), never
per-row, so it costs nothing at scale.
"""

from __future__ import annotations

import re

DURATION_TYPE = "duration"
DATA_SIZE_TYPE = "datasize"

_QUANTITY_RE = re.compile(r"([0-9]+(\.[0-9]+)?)(\w+|µs)")

_SECOND = 1_000_000_000.0
_DURATION: dict[str, float] = {}
for _names, _factor in [
    (("s", "sec", "secs", "second", "seconds"), _SECOND),
    (("m", "min", "mins", "minute", "minutes"), 60 * _SECOND),
    (("ms", "milli", "millis", "millisecond", "milliseconds"), 1_000_000.0),
    (("µs", "micro", "micros", "microsecond", "microseconds"), 1_000.0),
    (("ns",), 1.0),
    (("h", "hr", "hrs", "hour", "hours"), 3600 * _SECOND),
    (("d", "day", "days"), 24 * 3600 * _SECOND),
]:
    for _n in _names:
        _DURATION[_n] = _factor

_SIZE: dict[str, float] = {}
for _names, _factor in [
    (("b", "byte", "bytes"), 1.0),
    (("k", "kb", "kilobyte", "kilobytes"), 1e3),
    (("m", "mb", "mbs", "megabyte"), 1e6),
    (("g", "gb", "gbs", "gigabyte", "gigabytes"), 1e9),
    (("t", "tb", "tbs", "terabyte", "terabytes"), 1e12),
    (("pb", "pbs", "petabyte", "petabytes"), 1e15),
    # reference's exact (nonstandard) binary factors — QuantityParser.scala:38-42
    (("kib", "kibs", "kibibyte", "kibibytes"), 128.0),
    (("mib", "mibs", "mebibyte", "mebibytes"), 131072.0),
    (("gib", "gibs", "gibibyte", "gibibytes"), 134_200_000.0),
    (("tib", "tibs", "tibibyte", "tibibytes"), 137_400_000_000.0),
    (("pib", "pibs", "pibibyte", "pibibytes"), 1_126_000_000_000_000.0),
]:
    for _n in _names:
        _SIZE[_n] = _factor


def parse_quantity(value: object, data_type: str) -> float | None:
    """``"1.5s"`` → 1.5e9 (duration→ns); ``"2kb"`` → 2000 (datasize→bytes)."""
    m = _QUANTITY_RE.search(str(value))
    if not m:
        return None
    num, unit = float(m.group(1)), m.group(3).lower()
    table = _SIZE if data_type == DATA_SIZE_TYPE else _DURATION if data_type == DURATION_TYPE else None
    if table is None or unit not in table:
        return None
    return table[unit] * num
