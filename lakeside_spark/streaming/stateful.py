"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps per-series state in its Akka eval pipeline (EMA
datastructure, TimeGroupedSketchAggregator buffers). In Structured Streaming
the equivalent is applyInPandasWithState: state lives in the state store
(checkpointed, fault-tolerant), keyed by series, with timeout-based
expiry replacing the reference's buffer rotation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_ema(
    stream: DataFrame,
    alpha: float = 0.3,
    key_col: str = "name",
    ts_col: str = "step_ts",
    value_col: str = "value",
) -> DataFrame:
    """Stateful EMA over a keyed stream: state = last EMA per series
    (reference recurrence EMA.scala:24-31). Emits one smoothed row per input
    row; batch rows are processed in event-time order within each key."""

    output_schema = f"{key_col} string, {ts_col} long, {value_col} double, ema double"
    state_schema = "ema double"

    def update(key, pdfs, state: GroupState):
        prev = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        emas = []
        for v in rows[value_col]:
            prev = v if prev is None else alpha * v + (1 - alpha) * prev
            emas.append(prev)
        state.update((float(prev),))
        out = pd.DataFrame(
            {
                key_col: [key[0]] * len(rows),
                ts_col: rows[ts_col].to_numpy(),
                value_col: rows[value_col].to_numpy(),
                "ema": emas,
            }
        )
        yield out

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
