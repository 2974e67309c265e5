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
    # the EMA fold is ORDER-SENSITIVE and a group arrives as an
    # iterator of Arrow-sized chunks in arbitrary order — sorting each
    # chunk separately could diverge whenever a group's micro-batch
    # spans multiple chunks; materialize the group and sort ONCE (the
    # same fix streaming_funnel/streaming_cusum got in round 11,
    # backported per round-12 advisory)
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        pdf = pd.concat(chunks).sort_values("ts_us", kind="mergesort")
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


def streaming_funnel(
    events: DataFrame,
    steps: list,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    within: int | None = None,
) -> DataFrame:
    """Streaming twin of ``operators/window.py:funnel_steps``: per
    entity, the first time each step was completed strictly after the
    previous step, maintained in the state store (N longs per entity)
    and re-emitted per micro-batch in ``update`` mode.

    Within a batch, rows fold in event-time order, so any
    intra-batch arrival order is handled; ACROSS batches the fold
    assumes event time progresses with arrival (the same in-order
    contract as ``running_user_stats`` — an out-of-order step-1 event
    arriving after a later step-2 event was already rejected cannot
    retroactively convert it; exact any-order reprocessing is the
    batch operator's job).

    Scale: state is N longs per entity — far below any session
    buffer; the single groupBy(entity) feeds the state store exactly
    like the batch plan's one hash exchange.
    """
    if not steps:
        raise ValueError("streaming_funnel requires at least one step")
    if within is not None and within <= 0:
        raise ValueError("streaming_funnel within must be a positive ts delta")
    n = len(steps)
    out_schema = f"{entity_col} long, " + ", ".join(f"t{i+1} long" for i in range(n))
    state_schema = ", ".join(f"t{i+1} long" for i in range(n))

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (entity,) = key
        ts = list(state.get) if state.exists else [None] * n
        # a group arrives as an ITERATOR of Arrow-sized chunks in
        # arbitrary order — the funnel fold is order-sensitive, so
        # materialize the whole micro-batch group and sort ONCE
        # (unlike the order-insensitive running sums above); per-group
        # micro-batch volume bounds the memory, same as any
        # applyInPandas group
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(ts_col, kind="mergesort")
            for et, tv in zip(pdf[type_col], pdf[ts_col]):
                tv = int(tv)
                # consider the event for EVERY step slot its type
                # matches (steps may repeat a type: view->click->click);
                # the strictly-after guard uses the slot below, which
                # in-order folding has already finalized for earlier
                # timestamps
                for i, step in enumerate(steps):
                    if et != step:
                        continue
                    if i > 0 and (
                        ts[i - 1] is None
                        or tv <= ts[i - 1]
                        or (within is not None and tv > ts[i - 1] + within)
                    ):
                        continue
                    if ts[i] is None or tv < ts[i]:
                        ts[i] = tv
        state.update(tuple(ts))
        yield pd.DataFrame([{entity_col: int(entity), **{f"t{i+1}": ts[i] for i in range(n)}}])

    return (
        events.select(entity_col, type_col, ts_col)
        .groupBy(entity_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_STATE_SCHEMA = "prefix long, runmin long"


def streaming_cusum(
    events: DataFrame,
    target_micro: int,
    threshold_micro: int | None = None,
    entity_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    value_col: str = "value_micro",
) -> DataFrame:
    """Streaming twin of ``operators/window.py:cusum``: the per-key
    drift statistic maintained at ingest with TWO longs of state —
    the running prefix sum P and the running min of (0, P…) — since
    S_i = P_i − min(0, min_{j<=i} P_j). Emits one row per event with
    the statistic and the threshold alarm, exactly the batch
    operator's read-out INCLUDING null-value rows: a null before any
    value yields a null statistic, a null after values carries the
    current statistic forward — the same read-outs the batch window
    pipeline produces (parity pinned unfiltered in
    tests/test_stateful.py). State is created only once a non-null
    value arrives, so the null-leading case costs no state-store row.

    Order contract: rows are folded in (ts, id) order WITHIN each
    delivery after concatenating the chunked group iterator ONCE
    (the round-11 chunk lesson); cross-batch late data needs the
    caller's watermark, same stance as streaming_funnel. All-integer
    state — bit-identical to the batch closed form on in-order input.
    """
    tgt = int(target_micro)
    thr = None if threshold_micro is None else int(threshold_micro)
    out_schema = (
        f"{entity_col} long, {id_col} long, cusum_micro long, alarm boolean"
    )
    cols = [entity_col, id_col, "cusum_micro", "alarm"]

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (uid,) = key
        seen = state.exists
        prefix, runmin = state.get if seen else (0, 0)
        rows = []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
            for eid, v in zip(pdf[id_col], pdf[value_col]):
                if pd.isna(v):
                    # batch twin: SUM/MIN windows skip nulls, so the row
                    # reads the current statistic (null before any value)
                    s = prefix - runmin if seen else None
                else:
                    seen = True
                    prefix += int(v) - tgt
                    if prefix < runmin:
                        runmin = prefix
                    s = prefix - runmin
                alarm = None if (thr is None or s is None) else bool(s > thr)
                rows.append(
                    {entity_col: uid, id_col: eid, "cusum_micro": s, "alarm": alarm}
                )
        if seen:
            state.update((prefix, runmin))
        yield pd.DataFrame(rows, columns=cols)

    return (
        events.select(entity_col, ts_col, id_col, value_col)
        .groupBy(entity_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
