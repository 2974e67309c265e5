"""Custom stateful streaming operators (applyInPandasWithState).

The scale path for per-key running state that windowed aggregation
can't express: exponential moving averages, running counters,
anomaly flags. State lives in Spark's state store per group —
distributed, checkpointed, watermark-expired.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n long, value_sum double, ema double"
)
STATE_SCHEMA = "n long, value_sum double, ema double"


def _update_user_state(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    (user_id,) = key
    if state.exists:
        n, value_sum, ema = state.get
    else:
        n, value_sum, ema = 0, 0.0, None
    alpha = 0.1
    for pdf in pdfs:
        pdf = pdf.sort_values("ts_us", kind="mergesort")
        for v in pdf["value"]:
            n += 1
            value_sum += float(v)
            ema = float(v) if ema is None else alpha * float(v) + (1 - alpha) * ema
    state.update((n, value_sum, ema))
    yield pd.DataFrame(
        [{"user_id": user_id, "n": n, "value_sum": value_sum, "ema": ema}]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, EMA) maintained in the state
    store; emits the updated row per user per micro-batch. Works on
    a streaming DataFrame grouped by user."""
    return events.select("user_id", "ts_us", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
