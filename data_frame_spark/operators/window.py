"""Ordered-iteration operators: prev-aware map, deltas, cumulative.

The reference's map/fold family optionally passes the *previous* row
to the user function — its idiom for derivatives/deltas over the
frame's natural order (``df-map`` arity-2, df.rkt:946-998;
``df-fold`` arity-3, df.rkt:1056-1100). In Spark that 1-row
look-back is a ``lag`` window over the declared order.

Scale note: a window over a global ORDER BY is a single-partition
sort. Every helper therefore takes ``partition_by``; at 100 TB the
natural key (user, device, trajectory id) keeps the sort distributed.
A truly global ordered delta is only safe on already-small frames —
callers opt in by passing ``partition_by=()``.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from data_frame_spark.operators.colnames import quoted as _qc


def ordered_window(
    order_by: Sequence[str | Column],
    partition_by: Sequence[str | Column] = (),
) -> WindowSpec:
    # Window.partitionBy/orderBy PARSE bare strings (dotted names
    # resolve as struct-field access) — quote literals
    ob = [_qc(c) if isinstance(c, str) else c for c in order_by]
    if partition_by:
        pb = [_qc(c) if isinstance(c, str) else c for c in partition_by]
        return Window.partitionBy(*pb).orderBy(*ob)
    return Window.orderBy(*ob)


def with_prev(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str],
    partition_by: Sequence[str] = (),
    prefix: str = "prev_",
) -> DataFrame:
    """Attach ``prev_<col>`` columns (``lag`` of each requested col).

    This is the reference's arity-2 ``df-map`` contract: the first
    row of each partition sees NULL previous values (the reference
    passes ``#f`` — same NA semantics, df.rkt:990-998).
    """
    w = ordered_window(order_by, partition_by)
    out = df
    for c in cols:
        out = out.withColumn(prefix + c, F.lag(_qc(c)).over(w))
    return out


def map_with_prev(
    df: DataFrame,
    name: str,
    fn: Callable[..., Column],
    cols: Sequence[str],
    order_by: Sequence[str],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """``df-add-derived!`` of an arity-2 mapfn: ``fn`` receives
    (prev_c1..prev_cn, c1..cn) Columns and returns the new column."""
    tagged = with_prev(df, cols, order_by, partition_by)
    args = [_qc(f"prev_{c}") for c in cols] + [_qc(c) for c in cols]
    return tagged.withColumn(name, fn(*args)).drop(*[f"prev_{c}" for c in cols])


def delta(
    df: DataFrame,
    col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str] = (),
    name: str | None = None,
) -> DataFrame:
    """value - lag(value): the derivative idiom (df-test.rkt uses this
    shape for grade/speed computations)."""
    w = ordered_window(order_by, partition_by)
    return df.withColumn(name or f"delta_{col}", _qc(col) - F.lag(_qc(col)).over(w))


def cumulative(
    df: DataFrame,
    col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str] = (),
    name: str | None = None,
) -> DataFrame:
    """Running sum over the declared order (the reference models
    cumulative series — dst, elapsed, timer — as stored columns; we
    derive them with an expanding window)."""
    w = ordered_window(order_by, partition_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(name or f"cum_{col}", F.sum(_qc(col)).over(w))


def row_range(
    df: DataFrame,
    order_by: Sequence[str],
    start: int = 0,
    stop: int | None = None,
) -> DataFrame:
    """The reference's pervasive ``#:start/#:stop`` row-range over an
    ordered frame (df.rkt:811-818). Positions only exist relative to
    an order, so this numbers rows over ``order_by`` and filters.
    Global positions come from the range-bucketed two-level rank in
    ``operators.distributed`` — no partitionless window, so the sort
    stays distributed at any scale."""
    from data_frame_spark.operators.distributed import with_global_rank

    out = with_global_rank(df, list(order_by), out="__pos1")
    pos = F.col("__pos1") - 1
    cond = pos >= F.lit(start)
    if stop is not None:
        cond = cond & (pos < F.lit(stop))
    return out.where(cond).drop("__pos1")


def rolling_stats(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str | Column],
    partition_by: Sequence[str | Column],
    n: int = 5,
) -> DataFrame:
    """Trailing n-row rolling mean/min/max/count of ``value_col`` —
    the smoothing pass a telemetry or training-loss series needs
    before plotting or thresholding (the reference reaches this with
    arity-2 ``df-map`` + manual accumulation, df.rkt:946-998; Spark
    states it declaratively as a bounded ROWS frame).

    The frame is ``ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW`` —
    bounded, so Spark keeps a sliding buffer of n rows per partition,
    never the whole partition in memory. ``partition_by`` is required
    non-empty (same 100 TB contract as every helper here: a global
    ordered window is a single-partition sort).

    The rolling mean is emitted as an exact integer micro-value
    (FLOOR over the micro-quantized SUM divided by the count) so the
    result is summation-order independent and oracle-checkable.
    """
    if not partition_by:
        raise ValueError("rolling_stats requires partition_by (scale contract)")
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    x = _qc(value_col)
    micro = F.floor(x * 1e6 + F.lit(0.5)).cast("long")
    return (
        df.withColumn("__rn_cnt", F.count(x).over(w))
        .withColumn("__rsum_micro", F.sum(micro).over(w))
        .withColumn(
            "roll_mean_micro",
            F.expr("__rsum_micro div __rn_cnt"),
        )
        .withColumn("roll_min", F.min(x).over(w))
        .withColumn("roll_max", F.max(x).over(w))
        .withColumn("roll_n", F.col("__rn_cnt"))
        .drop("__rn_cnt", "__rsum_micro")
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: int,
    partition_by: Sequence[str],
    order_tiebreak: Sequence[str] = (),
    out: str = "session_seq",
) -> DataFrame:
    """Batch sessionization: assign each row a per-key session number,
    starting a new session whenever the gap since the previous row
    exceeds ``gap`` (in ``ts_col`` units) — the batch twin of the
    streaming session windows (streaming/windows.py), and the classic
    gaps-and-islands formulation: a lag-compare flags session starts,
    a running sum of flags numbers the sessions.

    ``ts_col`` should be an exact integer timestamp (ts_us) so the
    gap compare is engine-exact. Both windows are partitioned by the
    session key (user/device) — no global sort, and the running-sum
    frame is ROWS-bounded growth per partition, so at 100 TB the
    sort is per-user and distributed. ``partition_by`` is required
    non-empty (same scale contract as rolling_stats).
    """
    if not partition_by:
        raise ValueError("sessionize requires partition_by (scale contract)")
    order = [ts_col, *order_tiebreak]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    prev = F.lag(_qc(ts_col)).over(w)
    new_s = F.when(
        prev.isNull() | ((_qc(ts_col) - prev) > F.lit(gap)), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*partition_by).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out, F.sum(new_s).over(run))


def funnel_steps(
    df: DataFrame,
    steps: Sequence,
    entity_col: str,
    type_col: str,
    ts_col: str,
    out_prefix: str = "t",
    within: int | None = None,
) -> DataFrame:
    """N-step ordered funnel: per entity, the time each step was
    FIRST completed in sequence — step k counts only strictly after
    step k-1's completion time (the classic product-analytics funnel;
    no reference twin — the generalization of the event-sequence
    scans the reference's ordered fold family supports, df.rkt:
    1056-1100, to cross-row sequential conditions).

    ``steps`` is a sequence of event-type values; the result has one
    row per input row with columns ``{out_prefix}1..{out_prefix}N`` =
    the per-entity completion times (NULL when the entity never
    reached the step). Callers aggregate to per-entity rows with
    ``F.first``/``F.min``. ``within`` additionally requires step k
    to land no more than ``within`` ts-units after step k-1 (the
    conversion-window form: "purchased within 7 days of clicking");
    each dwell bound applies per hop, not to the whole chain.

    Scale shape: every step is an unordered MIN window PARTITION BY
    the entity — ONE hash exchange on the entity key reused by all N
    WindowExec nodes (no ORDER BY, so no per-step sort beyond the
    partitioning); ``ts_col`` should be an exact integer timestamp
    (ts_us) so the strict > / window-bound comparisons are
    engine-exact.
    """
    if not steps:
        raise ValueError("funnel_steps requires at least one step")
    if within is not None and within <= 0:
        raise ValueError("funnel_steps within must be a positive ts delta")
    w = Window.partitionBy(entity_col)
    out = df
    prev_t = None
    for i, step in enumerate(steps, start=1):
        cond = _qc(type_col) == F.lit(step)
        if prev_t is not None:
            cond = cond & _qc(prev_t).isNotNull() & (_qc(ts_col) > _qc(prev_t))
            if within is not None:
                cond = cond & (_qc(ts_col) <= _qc(prev_t) + F.lit(int(within)))
        name = f"{out_prefix}{i}"
        out = out.withColumn(name, F.min(F.when(cond, _qc(ts_col))).over(w))
        prev_t = name
    return out


def cusum(
    df: DataFrame,
    value_micro_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    target_micro: int,
    threshold_micro: int | None = None,
    out: str = "cusum_micro",
) -> DataFrame:
    """One-sided (upper) CUSUM drift statistic per key, integer-exact:
    ``S_i = max(0, S_{i-1} + (x_i - target))`` over the declared
    order. The recurrence LOOKS inherently sequential, but has the
    closed form ``S_i = P_i - min_{j<=i} P_j`` with
    ``P_i = Σ_{t<=i}(x_t - target)`` (``P_0 = 0`` — the running min
    is floored at the empty prefix) — two ROWS-bounded windows, no
    per-row iteration anywhere. ``value_micro_col`` must already be
    an exact integer (micro-quantized) series so both windows are
    engine-exact and order-stable; with ``threshold_micro`` an
    ``alarm`` flag marks rows whose statistic exceeds it (the
    change-point detector read-out).

    Scale shape: both windows are PARTITION BY the entity key with
    ROWS UNBOUNDED PRECEDING frames — one hash exchange + per-key
    sort shared by the cumulation and the running min; at 100 TB the
    sort is per-user and distributed (the same contract as
    rolling_stats/sessionize: ``partition_by`` required non-empty).
    """
    if not partition_by:
        raise ValueError("cusum requires partition_by (scale contract)")
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(_qc(value_micro_col) - F.lit(int(target_micro))).over(w)
    out_df = df.withColumn("__p", p).withColumn(
        out,
        F.col("__p") - F.least(F.min("__p").over(w), F.lit(0).cast("long")),
    ).drop("__p")
    if threshold_micro is not None:
        out_df = out_df.withColumn(
            "alarm", _qc(out) > F.lit(int(threshold_micro))
        )
    return out_df
