"""As-of join (backward / forward / nearest) — an operator Spark's API
lacks natively.

Telemetry use case: attach the most recent metric/quote/config row at or
before each event's timestamp, per series key (the reference pushes this to
DuckDB, which has native ASOF JOIN; our oracle uses exactly that), the
next-following row (forward), or whichever is closer in time (nearest —
sensor-reading alignment; oracle = a LATERAL argmin replaying the same
deterministic tie rule).

Implementation is a composition of built-in DataFrame ops — no Python row
path, no range explosion:

1. union the two sides with a side marker (left rows carry a null right
   payload and vice versa);
2. one window per key, ordered by (ts, side) with right-before-left on
   ties, takes ``last(right_payload, ignorenulls=True)`` — the latest right
   row with ``right_ts <= left_ts``;
3. keep the left rows and unpack the carried payload.

Scale shape: ONE shuffle (hash by key for the window sort). This is the
same partitioning a groupBy(key) would need, so at 100 TB it behaves like
any keyed aggregation — skewed keys respond to the usual salting/AQE
treatment, and no cross-product ever materializes (contrast a naive
left.join(right, right_ts <= left_ts) which is O(|L|x|R|) per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_ms: int | None = None,
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, the as-of right row per ``on`` key under
    ``direction`` (pandas merge_asof's vocabulary):

    - "backward" (default): the LATEST right row with right_ts <=
      left_ts — ties on timestamp match (>= semantics, like DuckDB
      ASOF JOIN).
    - "forward": the EARLIEST right row with right_ts >= left_ts
      (<= tie semantics, mirror-symmetric).
    - "nearest": whichever of the backward/forward candidates is
      closer in |right_ts - left_ts|; an exact-equidistant tie takes
      the BACKWARD (prior) row — the deterministic rule the oracle
      replays. Both candidates come out of the SAME sorted union frame
      (two frames over one window spec = one Sort, one Window
      operator), so nearest costs the same single shuffle as the
      directed forms. A same-ts right row is seen only by the backward
      frame (it sorts before the left row), which is harmless: its
      distance is 0 and the tie rule prefers backward anyway.

    Right columns (except key/ts) are appended; tolerance_ms bounds the
    match distance (per side, before the nearest pick); how="left"
    keeps unmatched left rows with null right columns, "inner" drops
    them. Duplicate (key, right_ts) rows make the picked payload
    order-dependent — callers needing determinism must dedupe or
    tiebreak the right side first (the registry key's feed is unique).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest', "
            f"got {direction!r}"
        )
    right_payload = [c for c in right.columns if c not in (on, right_ts)]
    # tie ordering: for backward/nearest the right side sorts BEFORE the
    # left row at equal ts (so a same-ts right is inside the preceding
    # frame — >= semantics); for forward it sorts AFTER (inside the
    # following frame — <= semantics)
    side_l, side_r = (0, 1) if direction == "forward" else (1, 0)
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(side_l).alias("__side"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_payload + [right_ts]) + ">"
        ).alias("__r"),
    )
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(side_r).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("__l"),
        F.struct(*right_payload, F.col(right_ts)).alias("__r"),
    )
    w = Window.partitionBy("__key").orderBy("__ts", "__side")
    wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u = l.unionByName(r)
    rts = lambda m: m.getField(right_ts)  # noqa: E731
    tol = F.lit(tolerance_ms) if tolerance_ms is not None else None

    def _bounded(m, dist):
        return m if tol is None else F.when(dist <= tol, m)

    if direction == "backward":
        m = _bounded(
            F.last("__r", ignorenulls=True).over(wb),
            F.col("__ts") - rts(F.last("__r", ignorenulls=True).over(wb)),
        )
        matched = u.withColumn("__match", m)
    elif direction == "forward":
        m = _bounded(
            F.first("__r", ignorenulls=True).over(wf),
            rts(F.first("__r", ignorenulls=True).over(wf)) - F.col("__ts"),
        )
        matched = u.withColumn("__match", m)
    else:  # nearest
        matched = u.select(
            "*",
            F.last("__r", ignorenulls=True).over(wb).alias("__b"),
            F.first("__r", ignorenulls=True).over(wf).alias("__f"),
        )
        bd = F.col("__ts") - rts(F.col("__b"))
        fd = rts(F.col("__f")) - F.col("__ts")
        b = _bounded(F.col("__b"), bd)
        f = _bounded(F.col("__f"), fd)
        matched = matched.withColumn(
            "__match",
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(bd <= fd, b)  # equidistant -> backward (prior) row
            .otherwise(f),
        )
    matched = matched.filter(F.col("__side") == side_l)
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__match.{c}").alias(c) for c in right_payload]
    out_cols.append(F.col(f"__match.{right_ts}").alias(f"asof_{right_ts}"))
    return matched.select(*out_cols)
