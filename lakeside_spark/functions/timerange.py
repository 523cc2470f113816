"""Atlas-style time-range parsing (reference: core Strings.scala:40-180,
used by Commons.toStartEnd — defaults s=``e-1h``, e=``now``).

Supported date forms: ``now``/``epoch`` named refs, ``e±<dur>`` / ``s±<dur>``
/ ``now±<dur>`` relative refs, unix seconds/millis, ISO-8601. Durations:
``<n><unit>`` (s/m/h/d/w/month/y) or ISO ``PT...`` periods. Returns epoch
millis, driver-side only (plan-build time).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_RELATIVE = re.compile(r"^([a-z]+)([\-+])(.+)$")
_NAMED = re.compile(r"^([a-z]+)$")
_UNIX = re.compile(r"^([0-9]+)$")
_AT_PERIOD = re.compile(r"^(\d+)([a-z]+)$")

_UNIT_SECONDS = {
    "seconds": 1, "second": 1, "s": 1,
    "minutes": 60, "minute": 60, "min": 60, "m": 60,
    "hours": 3600, "hour": 3600, "h": 3600,
    "days": 86400, "day": 86400, "d": 86400,
    "weeks": 604800, "week": 604800, "wk": 604800, "w": 604800,
    "months": 86400 * 30, "month": 86400 * 30,
    "years": 86400 * 365, "year": 86400 * 365, "y": 86400 * 365,
}


def _parse_duration(text: str) -> timedelta:
    m = _AT_PERIOD.match(text)
    if m and m.group(2) in _UNIT_SECONDS:
        return timedelta(seconds=int(m.group(1)) * _UNIT_SECONDS[m.group(2)])
    if text.startswith("P") or text.startswith("PT"):
        # minimal ISO-8601 duration support (PTnHnMnS / PnD)
        iso = re.fullmatch(
            r"P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?", text
        )
        if iso and any(iso.groups()):
            d, h, mnt, s = (float(g) if g else 0.0 for g in iso.groups())
            return timedelta(days=d, hours=h, minutes=mnt, seconds=s)
    raise ValueError(f"invalid period {text}")


def _is_relative(text: str, custom_ref: bool) -> bool:
    m = _RELATIVE.match(text)
    if not m:
        return False
    return not custom_ref or m.group(1) not in ("now", "epoch")


def _parse_date(ref: datetime, text: str, now: datetime) -> datetime:
    m = _RELATIVE.match(text)
    if m:
        r, op, p = m.groups()
        base = _ref_var(ref, r, now)
        delta = _parse_duration(p)
        return base - delta if op == "-" else base + delta
    if _NAMED.match(text):
        return _ref_var(ref, text, now)
    m = _UNIX.match(text)
    if m:
        v = int(m.group(1))
        millis = v if v > 2**31 - 1 else v * 1000
        return datetime.fromtimestamp(millis / 1000.0, tz=timezone.utc)
    try:
        return datetime.fromisoformat(text.replace("Z", "+00:00")).astimezone(timezone.utc)
    except ValueError as exc:
        raise ValueError(f"invalid date {text}") from exc


def _ref_var(ref: datetime, name: str, now: datetime) -> datetime:
    if name == "now":
        return now
    if name == "epoch":
        return datetime.fromtimestamp(0, tz=timezone.utc)
    return ref


def time_range(
    s: str = "e-1h", e: str = "now", now: datetime | None = None
) -> tuple[int, int]:
    """(start_ms, end_ms). ``now`` injectable for tests."""
    now = now or datetime.now(timezone.utc)
    if _is_relative(s, custom_ref=True) or s == "e":
        if _is_relative(e, custom_ref=True):
            raise ValueError("start and end are both relative")
        end = _parse_date(now, e, now)
        start = _parse_date(end, s, now)
    else:
        start = _parse_date(now, s, now)
        end = _parse_date(start, e, now)
    start_ms, end_ms = int(start.timestamp() * 1000), int(end.timestamp() * 1000)
    if end_ms < start_ms:
        raise ValueError("end time is before start time")
    return start_ms, end_ms
