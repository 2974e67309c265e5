"""Mean-maximal ("critical power") curve — the reference's flagship
custom operator (private/meanmax.rkt).

Semantics (meanmax.rkt:141-189): build the delta series of adjacent
samples — dt = x2-x1, slice = dt*(y1+y2)/2 (trapezoid area), pos =
x1 — then for each duration d slide a window over slices starting at
every sample position x_i; the last slice is prorated *linearly*
(partial_y = slice * partial_dt/dt). Windows that run past the last
sample are excluded. Best = max (min when ``inverted``, e.g. pace)
of window_total/d; ties keep the earliest position (strict
comparison in maybe-update).

Spark-first formulation: the window total is exactly
``A(x_i + d) - A(x_i)`` where A is the piecewise-LINEAR
interpolation of cumulative slice areas at sample points (linear
proration == linear interpolation of A). So:

  1. lag-window -> slices; running sum -> A_i per sample.   [1 sort]
  2. probes = (sample starts × durations), k = x_i + d,
     filtered to k <= x_max.
  3. union probes into the (x, A) point set; one ordered window
     pass carries the bracketing (x0,A0)/(x1,A1) for every probe
     -> interpolated A(x_i+d).                              [1 sort]
  4. groupBy duration -> best mean + earliest achieving position.

Two sorts + one small aggregate, all distributed; the duration
ladder (meanmax.rkt:44-82) keeps the probe fan-out at
O(n·|durations|), |durations| ≈ 80 — the reference's own
sparsification, kept verbatim.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_frame_spark.operators import distributed as D

#: meanmax.rkt:35-39 — durations always included in the ladder.
IMPORTANT_DURATIONS = [
    10, 15, 30, 45, 60, 75, 90, 120, 180, 300, 600, 900,
    1200, 1800, 2700, 3600, 5400, 7200, 10800,
]


def generate_durations(
    start: int = 10,
    limit: int = 300 * 60,
    growth_factor: float = 1.2,
    max_growth: int = 300,
) -> list[int]:
    """meanmax.rkt:44-57: geometric ladder with min +5 (bumped to
    +20) and max +300 s growth per step."""
    series = [start]
    current = start
    while True:
        nval = round(current * growth_factor)
        if nval < current + 5:
            nval = current + 20
        if nval > current + max_growth:
            nval = current + max_growth
        if nval >= limit:
            break
        series.append(nval)
        current = nval
    return series


def default_durations() -> list[int]:
    """meanmax.rkt:59-82: generated ladder merged with the important
    durations (sorted union)."""
    return sorted(set(generate_durations()) | set(IMPORTANT_DURATIONS))


def mean_max(
    df: DataFrame,
    value_col: str,
    x_col: str,
    durations: Sequence[int] | None = None,
    inverted: bool = False,
    partition_by: Sequence[str] = (),
    slice_scale: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """``df-mean-max`` (meanmax.rkt:262-269). Returns
    (duration, best_mean, start_pos) per duration with at least one
    full window; ``x_col`` is the cumulative extent axis (elapsed
    seconds, distance, ...).

    ``slice_scale``: when set, slice areas are quantized to
    10^-scale before the cumulative sum, making the running sum
    associative — required for bit-identical results across engines
    (window SUM uses a segment tree in some engines, sequential
    accumulation in others, which reorders float additions).

    ``tiebreak_col``: secondary sort key for inputs with duplicate x
    values (lap-swim expansion emits coincident segment end/start
    points whose A-curve order matters — end must cumulate first).
    """
    durations = list(durations or default_durations())
    spark = df.sparkSession
    pcols = list(partition_by)

    x = F.col(x_col).cast("double")
    y = F.col(value_col).cast("double")
    tb = [F.col(tiebreak_col).alias("__tb")] if tiebreak_col else []
    pts = (
        df.where(x.isNotNull() & y.isNotNull())
        .select(*pcols, x.alias("__x"), *tb, y.alias("__y"))
    )
    okeys = ["__x", "__tb"] if tiebreak_col else ["__x"]
    if not pcols:
        return _mean_max_global(
            spark, pts, okeys, durations, inverted, slice_scale
        )
    ow = Window.partitionBy(*pcols).orderBy(*okeys)
    # slice ENDING at this sample; A = cumulative area at this sample
    # (sum of slices up to here). First sample: slice NULL -> A = 0.
    sliced = (
        pts.withColumn("__px", F.lag("__x").over(ow))
        .withColumn("__py", F.lag("__y").over(ow))
        .withColumn(
            "__slice",
            (F.col("__x") - F.col("__px"))
            * (F.col("__py") + F.col("__y")) / 2,
        )
        .withColumn("__A", _cum_area(ow, slice_scale))
        .withColumn("__nx", F.lead("__x").over(ow))
        .withColumn("__xmax", F.max("__x").over(Window.partitionBy(*pcols)))
    )

    ddf = F.broadcast(
        spark.createDataFrame([(float(d),) for d in durations], ["duration"])
    )
    # probes: every sample that STARTS a slice (has a next sample)
    probes = (
        sliced.where(F.col("__nx").isNotNull())
        .crossJoin(ddf)
        .withColumn("__k", F.col("__x") + F.col("duration"))
        .where(F.col("__k") <= F.col("__xmax"))
        .select(
            *pcols,
            "__k",
            F.lit(1).alias("__tag"),
            "duration",
            F.col("__x").alias("pos"),
            F.col("__A").alias("__A_start"),
            F.lit(None).cast("double").alias("__bx"),
            F.lit(None).cast("double").alias("__bA"),
        )
    )
    base = sliced.select(
        *pcols,
        F.col("__x").alias("__k"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast("double").alias("duration"),
        F.lit(None).cast("double").alias("pos"),
        F.lit(None).cast("double").alias("__A_start"),
        F.col("__x").alias("__bx"),
        F.col("__A").alias("__bA"),
    )
    u = probes.unionByName(base)

    back = (
        Window.partitionBy(*pcols)
        .orderBy("__k", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward pass as a DESC-ordered running frame: Spark's
    # UNBOUNDED FOLLOWING frame is O(n^2) (re-aggregated per row);
    # a running UNBOUNDED PRECEDING frame is O(n).
    wf = (
        Window.partitionBy(*pcols)
        .orderBy(F.col("__k").desc(), F.col("__tag").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bk = F.when(F.col("__tag") == 0, F.col("__bx"))
    bA = F.when(F.col("__tag") == 0, F.col("__bA"))
    interp = (
        u.withColumn("__x0", F.last(bk, ignorenulls=True).over(back))
        .withColumn("__A0", F.last(bA, ignorenulls=True).over(back))
        .withColumn("__x1", F.last(bk, ignorenulls=True).over(wf))
        .withColumn("__A1", F.last(bA, ignorenulls=True).over(wf))
        .where(F.col("__tag") == 1)
    )
    a_end = _interp_a(
        F.col("__k"), F.col("__x0"), F.col("__A0"), F.col("__x1"), F.col("__A1")
    )
    means = interp.select(
        *pcols,
        "duration",
        "pos",
        ((a_end - F.col("__A_start")) / F.col("duration")).alias("__mean"),
    )
    return _best_by_duration(means, pcols, inverted)


def _interp_a(k, x0, A0, x1, A1):
    """A(k) by linear interpolation between the bracketing samples."""
    return F.when(x1.isNull() | (x1 == x0), A0).otherwise(
        A0 + (k - x0) / (x1 - x0) * (A1 - A0)
    )


def _best_by_duration(means, pcols, inverted: bool) -> DataFrame:
    """Best mean per duration, ties keeping the earliest position
    (meanmax.rkt maybe-update strict comparison) — as ONE map-side
    combinable aggregate: lexicographic max/min over
    struct(mean, -/+pos). No window, no sort, any scale."""
    if inverted:
        pick = F.min(
            F.struct(F.col("__mean").alias("m"), F.col("pos").alias("p"))
        ).alias("__b")
        pos = F.col("__b.p")
    else:
        pick = F.max(
            F.struct(F.col("__mean").alias("m"), (-F.col("pos")).alias("p"))
        ).alias("__b")
        pos = -F.col("__b.p")
    return (
        means.groupBy(*pcols, "duration")
        .agg(pick)
        .select(*pcols, "duration", F.col("__b.m").alias("best_mean"), pos.alias("pos"))
    )


def _mean_max_global(
    spark, pts, okeys, durations, inverted, slice_scale
) -> DataFrame:
    """Single-series (``partition_by=()``) path with ZERO
    partitionless windows: every globally-ordered pass is a
    range-bucketed two-level computation from
    :mod:`operators.distributed`. One tiny (min, max) aggregate
    yields both the equal-width bucket boundaries (the x axis is an
    elapsed-time/distance axis — near-uniform; boundary placement
    only affects balance, never results) and the xmax literal; the
    SAME boundaries serve the slice-lag pass, the A-cumulation, and
    the probe-bracketing pass, since probe positions k = x + d stay
    inside [xmin, xmax] by the window-fits filter."""
    row = pts.agg(F.min("__x").alias("lo"), F.max("__x").alias("hi")).collect()[0]
    if row["hi"] is None:
        return spark.createDataFrame(
            [], "duration double, best_mean double, pos double"
        )
    lo, xmax = float(row["lo"]), float(row["hi"])
    boundaries = D.width_boundaries(lo, xmax, D._n_buckets(pts))
    lagged = D.with_lag(pts, okeys, ["__x", "__y"], prefix="__p", boundaries=boundaries)
    sliced = lagged.withColumn(
        "__slice",
        (F.col("__x") - F.col("__p__x")) * (F.col("__p__y") + F.col("__y")) / 2,
    )
    # stage checkpoints (eager localCheckpoint, ContextCleaner-
    # reclaimed): the slice table feeds the offset aggregate AND the
    # A window; the A table feeds probes, base, and the bracket
    # summary — materialize each once instead of recomputing the
    # upstream sort per branch (at 100 TB: write these stage tables
    # to parquet between jobs).
    sliced = sliced.localCheckpoint(eager=True)
    if slice_scale is not None:
        m = float(10**slice_scale)
        qv = F.floor(F.col("__slice") * F.lit(m) + F.lit(0.5))
        sliced = D.with_running_sum(sliced, okeys, qv, "__Ar", boundaries=boundaries)
        sliced = sliced.withColumn(
            "__A", F.coalesce(F.col("__Ar"), F.lit(0)).cast("double") / F.lit(m)
        )
    else:
        sliced = D.with_running_sum(
            sliced, okeys, F.col("__slice"), "__Ar", boundaries=boundaries
        )
        sliced = sliced.withColumn(
            "__A", F.coalesce(F.col("__Ar").cast("double"), F.lit(0.0))
        )
    sliced = sliced.drop("__Ar", "__p__x", "__p__y", "__slice").localCheckpoint(
        eager=True
    )

    ddf = F.broadcast(
        spark.createDataFrame([(float(d),) for d in durations], ["duration"])
    )
    # "starts a slice" == "is not the last sample": any row with
    # __x < xmax has a successor; rows AT xmax generate no in-range
    # probe anyway (k = xmax + d > xmax), so the broadcast-scalar
    # test replaces the lead() pass exactly.
    probes = (
        sliced.where(F.col("__x") < F.lit(xmax))
        .crossJoin(ddf)
        .withColumn("__k", F.col("__x") + F.col("duration"))
        .where(F.col("__k") <= F.lit(xmax))
        .select(
            "__k",
            F.lit(1).alias("__tag"),
            "duration",
            F.col("__x").alias("pos"),
            F.col("__A").alias("__A_start"),
            F.lit(None).cast("double").alias("__bx"),
            F.lit(None).cast("double").alias("__bA"),
        )
    )
    base = sliced.select(
        F.col("__x").alias("__k"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast("double").alias("duration"),
        F.lit(None).cast("double").alias("pos"),
        F.lit(None).cast("double").alias("__A_start"),
        F.col("__x").alias("__bx"),
        F.col("__A").alias("__bA"),
    )
    u = probes.unionByName(base)
    br = D.with_event_brackets(
        u,
        ["__k", "__tag"],
        ["__bx", "__bA"],
        mark=F.col("__tag") == 0,
        boundaries=boundaries,
    )
    interp = br.where(F.col("__tag") == 1)
    a_end = _interp_a(
        F.col("__k"),
        F.col("__bk___bx"),
        F.col("__bk___bA"),
        F.col("__fw___bx"),
        F.col("__fw___bA"),
    )
    means = interp.select(
        "duration",
        "pos",
        ((a_end - F.col("__A_start")) / F.col("duration")).alias("__mean"),
    )
    return _best_by_duration(means, [], inverted)


def _cum_area(ow, slice_scale):
    """Cumulative slice area at each sample (0 at the first)."""
    frame = ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if slice_scale is None:
        return F.coalesce(F.sum("__slice").over(frame), F.lit(0.0))
    m = F.lit(float(10**slice_scale))
    q = F.floor(F.col("__slice") * m + F.lit(0.5))
    return F.coalesce(F.sum(q).over(frame), F.lit(0)).cast("double") / m


def mean_max_aux(
    df: DataFrame,
    mm: DataFrame,
    aux_col: str,
    x_col: str,
    partition_by: Sequence[str] = (),
    slice_scale: int | None = None,
) -> DataFrame:
    """``df-mean-max-aux`` (meanmax.rkt:310-314): for each mean-max
    (duration, pos), the mean of a *second* series over the same
    window — same A-curve trick on the aux column, probing at
    (pos, pos+duration)."""
    return mean_max_probe(df, aux_col, x_col, mm, partition_by, slice_scale)


def mean_max_probe(df, value_col, x_col, mm, partition_by=(), slice_scale=None):
    pcols = list(partition_by)
    x = F.col(x_col).cast("double")
    y = F.col(value_col).cast("double")
    pts = df.where(x.isNotNull() & y.isNotNull()).select(
        *pcols, x.alias("__x"), y.alias("__y")
    )
    boundaries: list[float] | None = None
    if pcols:
        ow = Window.partitionBy(*pcols).orderBy("__x")
        sliced = (
            pts.withColumn("__px", F.lag("__x").over(ow))
            .withColumn("__py", F.lag("__y").over(ow))
            .withColumn(
                "__slice",
                (F.col("__x") - F.col("__px")) * (F.col("__py") + F.col("__y")) / 2,
            )
            .withColumn("__A", _cum_area(ow, slice_scale))
        )
    else:
        # single-series path: range-bucketed lag + running sum, zero
        # partitionless windows (same plan shape as _mean_max_global)
        row = pts.agg(F.min("__x").alias("lo"), F.max("__x").alias("hi")).collect()[0]
        if row["hi"] is None:
            return mm.select(
                *pcols, "duration", "pos", F.lit(None).cast("double").alias("aux_mean")
            ).where(F.lit(False))
        boundaries = D.width_boundaries(
            float(row["lo"]), float(row["hi"]), D._n_buckets(pts)
        )
        lagged = D.with_lag(
            pts, ["__x"], ["__x", "__y"], prefix="__p", boundaries=boundaries
        )
        sliced = lagged.withColumn(
            "__slice",
            (F.col("__x") - F.col("__p__x")) * (F.col("__p__y") + F.col("__y")) / 2,
        )
        # stage checkpoint — see _mean_max_global
        sliced = sliced.localCheckpoint(eager=True)
        if slice_scale is not None:
            m = float(10**slice_scale)
            qv = F.floor(F.col("__slice") * F.lit(m) + F.lit(0.5))
            sliced = D.with_running_sum(
                sliced, ["__x"], qv, "__Ar", boundaries=boundaries
            )
            sliced = sliced.withColumn(
                "__A", F.coalesce(F.col("__Ar"), F.lit(0)).cast("double") / F.lit(m)
            )
        else:
            sliced = D.with_running_sum(
                sliced, ["__x"], F.col("__slice"), "__Ar", boundaries=boundaries
            )
            sliced = sliced.withColumn(
                "__A", F.coalesce(F.col("__Ar").cast("double"), F.lit(0.0))
            )
        sliced = sliced.drop("__Ar", "__p__x", "__p__y", "__slice").localCheckpoint(
            eager=True
        )
    # probes at both window ends for every (duration, pos)
    p_start = mm.select(*pcols, "duration", "pos", F.col("pos").alias("__k"))
    p_end = mm.select(
        *pcols, "duration", "pos", (F.col("pos") + F.col("duration")).alias("__k")
    )
    probes = p_start.withColumn("__end", F.lit(0)).unionByName(
        p_end.withColumn("__end", F.lit(1))
    )
    base = sliced.select(
        *pcols,
        F.col("__x").alias("__k"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast("double").alias("duration"),
        F.lit(None).cast("double").alias("pos"),
        F.lit(None).cast("int").alias("__end"),
        F.col("__x").alias("__bx"),
        F.col("__A").alias("__bA"),
    )
    u = probes.withColumn("__tag", F.lit(1)).withColumn(
        "__bx", F.lit(None).cast("double")
    ).withColumn("__bA", F.lit(None).cast("double")).unionByName(base)
    if pcols:
        back = (
            Window.partitionBy(*pcols)
            .orderBy("__k", "__tag")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # forward pass as a DESC-ordered running frame: Spark's
        # UNBOUNDED FOLLOWING frame is O(n^2) (re-aggregated per row);
        # a running UNBOUNDED PRECEDING frame is O(n).
        wf = (
            Window.partitionBy(*pcols)
            .orderBy(F.col("__k").desc(), F.col("__tag").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        bk = F.when(F.col("__tag") == 0, F.col("__bx"))
        bA = F.when(F.col("__tag") == 0, F.col("__bA"))
        interp = (
            u.withColumn("__x0", F.last(bk, ignorenulls=True).over(back))
            .withColumn("__A0", F.last(bA, ignorenulls=True).over(back))
            .withColumn("__x1", F.last(bk, ignorenulls=True).over(wf))
            .withColumn("__A1", F.last(bA, ignorenulls=True).over(wf))
            .where(F.col("__tag") == 1)
        )
        a_at = _interp_a(
            F.col("__k"), F.col("__x0"), F.col("__A0"), F.col("__x1"), F.col("__A1")
        )
    else:
        br = D.with_event_brackets(
            u,
            ["__k", "__tag"],
            ["__bx", "__bA"],
            mark=F.col("__tag") == 0,
            boundaries=boundaries or [],
        )
        interp = br.where(F.col("__tag") == 1)
        a_at = _interp_a(
            F.col("__k"),
            F.col("__bk___bx"),
            F.col("__bk___bA"),
            F.col("__fw___bx"),
            F.col("__fw___bA"),
        )
    ends = interp.select(*pcols, "duration", "pos", "__end", a_at.alias("__Aat"))
    piv = (
        ends.groupBy(*pcols, "duration", "pos")
        .agg(
            F.max(F.when(F.col("__end") == 0, F.col("__Aat"))).alias("__As"),
            F.max(F.when(F.col("__end") == 1, F.col("__Aat"))).alias("__Ae"),
        )
    )
    return piv.select(
        *pcols,
        "duration",
        "pos",
        ((F.col("__Ae") - F.col("__As")) / F.col("duration")).alias("aux_mean"),
    )


def lap_swim_expand(
    df: DataFrame,
    value_col: str,
    x_col: str,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """``df-mean-max/lap-swim`` pre-transform (meanmax.rkt:270-304):
    discretely-sampled data (one sample per pool length, recorded at
    the END of the length) is expanded so each sample becomes two
    points — (prev_x, value) and (x, value) — turning each length
    into a constant-value segment; NA values become 0 instead of
    being dropped (pauses must count). Feed the result to
    :func:`mean_max` with ``tiebreak_col="lap_tb"``: expanded points
    can share an x coordinate (segment boundaries; the first sample
    of a relative axis collides with the synthetic x=0 start), and
    the A-curve cumulation must visit them in the reference's
    sequence order. ``lap_tb`` = 2k-1 for segment k's start point,
    2k for its end — since x is nondecreasing in sequence order,
    sorting by (x, lap_tb) IS the sequence order, whatever collides.
    """
    pcols = list(partition_by)
    x = F.col(x_col).cast("double")
    y = F.coalesce(F.col(value_col).cast("double"), F.lit(0.0))
    base = df.where(x.isNotNull()).select(
        *pcols, x.alias("__x"), y.alias("__y")
    )
    ow = (
        Window.partitionBy(*pcols).orderBy("__x")
        if pcols
        else Window.orderBy("__x")
    )
    tagged = base.withColumn(
        "__px", F.coalesce(F.lag("__x").over(ow), F.lit(0.0))
    ).withColumn("__k", F.row_number().over(ow))
    start_pts = tagged.select(
        *pcols, F.col("__px").alias(x_col), F.col("__y").alias(value_col),
        (2 * F.col("__k") - 1).alias("lap_tb"),
    )
    end_pts = tagged.select(
        *pcols, F.col("__x").alias(x_col), F.col("__y").alias(value_col),
        (2 * F.col("__k")).alias("lap_tb"),
    )
    return start_pts.unionByName(end_pts)
