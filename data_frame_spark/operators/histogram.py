"""Histogram operators (reference private/histogram.rkt:37-204).

Reference semantics:
* numeric samples: bucket = truncate(v / width) (histogram.rkt:49-51)
  — truncation toward zero, bucket key is the integer quotient;
  the returned table maps bucket*width -> count (we expose both).
* string samples: the bucket IS the value (histogram.rkt:49-51).
* weighted: consecutive-pair (Δw, midpoint) samples, like weighted
  statistics (histogram.rkt:53-66) — NO Δw>0 guard: backwards/zero
  deltas contribute their (possibly negative) weight, unlike
  weighted-statistics; unweighted: count 1 per sample.
* ``include_zeroes=False`` discards samples whose *bucket* is 0 at
  binning time (histogram.rkt:60-77); numeric gaps between min and
  max bucket are then zero-filled unconditionally
  (histogram.rkt:119-128) — so bucket 0 can reappear with count 0.
* ``as_percentage``: counts scaled to 100*c/Σc (histogram.rkt:98-112).
* ``trim_outliers``: keep the span between the first and last bucket
  whose share is strictly > p; if no bucket qualifies the histogram
  is returned unchanged (histogram.rkt:142-155).

Plan shape: groupBy(bucket) — one map-side-combinable shuffle on the
bucket key; gap-fill joins against a generated ``sequence()`` range
(no driver materialization); percentage/trim use a window over the
(small) bucket table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_frame_spark.operators.colnames import quoted as _qc

from data_frame_spark.exact import dsum
from data_frame_spark.operators.distributed import with_lag


def _trunc_div(col, width: float):
    # exact-truncate(v / width): truncation toward zero
    q = col / F.lit(float(width))
    return F.when(q < 0, -F.floor(-q)).otherwise(F.floor(q)).cast("long")


def histogram(
    df: DataFrame,
    col: str,
    width: float = 1.0,
    include_zeroes: bool = True,
    as_percentage: bool = False,
    trim_outliers: float | None = None,
) -> DataFrame:
    """Unweighted numeric histogram: (bucket, bucket_start, count).

    ``count`` is double when ``as_percentage`` (share of total * 100),
    else long.
    """
    x = _qc(col).cast("double")
    d = df.where(x.isNotNull())
    bucket = _trunc_div(x, width)
    if not include_zeroes:
        d = d.where(bucket != 0)
    buckets = d.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("count")
    )
    buckets = _gap_fill(buckets, F.lit(0))
    return _postprocess(buckets, width, as_percentage, trim_outliers)


def weighted_histogram(
    df: DataFrame,
    col: str,
    weight_col: str,
    order_by: Sequence[str],
    width: float = 1.0,
    include_zeroes: bool = True,
    as_percentage: bool = False,
    trim_outliers: float | None = None,
    scale: int = 6,
) -> DataFrame:
    """Weighted histogram: consecutive-pair samples (Δw, midpoint)
    binned by the midpoint, counts are Δw sums (histogram.rkt:53-66).
    """
    d = (
        with_lag(df, order_by, [weight_col, col], boundary_mode="width")
        .withColumn("__pw", _qc(f"__lag_{weight_col}"))
        .withColumn("__pv", _qc(f"__lag_{col}"))
        .withColumn("__dx", _qc(weight_col) - F.col("__pw"))
        .withColumn("__dy", (F.col("__pv") + _qc(col)) / 2)
        # the reference's weighted-binning (histogram.rkt:53-66) has no
        # dx>0 guard (unlike weighted-statistics): zero/backwards pairs
        # contribute their delta
        .where(F.col("__dx").isNotNull() & F.col("__dy").isNotNull())
    )
    bucket = _trunc_div(F.col("__dy"), width)
    if not include_zeroes:
        d = d.where(bucket != 0)
    buckets = d.groupBy(bucket.alias("bucket")).agg(
        dsum(F.col("__dx"), scale).alias("count")
    )
    buckets = _gap_fill(buckets, F.lit(0.0))
    return _postprocess(buckets, width, as_percentage, trim_outliers)


def string_histogram(df: DataFrame, col: str, as_percentage: bool = False) -> DataFrame:
    """String-sample histogram: bucket = the value itself."""
    d = df.where(_qc(col).isNotNull())
    out = d.groupBy(_qc(col).alias("bucket")).agg(F.count(F.lit(1)).alias("count"))
    if as_percentage:
        total = Window.partitionBy()
        out = out.select(
            "bucket",
            (F.col("count") * 100.0 / F.sum("count").over(total)).alias("count"),
        )
    return out


def _gap_fill(buckets: DataFrame, zero) -> DataFrame:
    """Zero-fill integer bucket gaps between min and max bucket —
    unconditional for numeric histograms (histogram.rkt:119-128)."""
    rng = buckets.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    ).select(F.explode(F.sequence("lo", "hi")).alias("bucket"))
    return rng.join(buckets, "bucket", "left").select(
        "bucket", F.coalesce("count", zero).alias("count")
    )


def _postprocess(buckets: DataFrame, width, as_percentage, trim_outliers) -> DataFrame:
    out = buckets.withColumn(
        "bucket_start", F.col("bucket") * F.lit(float(width))
    )
    # Reference order (histogram.rkt:198-203): percentages are computed
    # over the FULL total first, then trimming drops edge buckets WITHOUT
    # rescaling — a trimmed percentage histogram does not re-sum to 100.
    #
    # r18: the totals/bounds ride ONE-ROW scalar aggregates
    # crossJoin-broadcast back instead of partitionless windows — the
    # same values from the same rows, but no single-partition Window
    # funnel anywhere in the operator, and the shape stays provably
    # bounded to the scale classifier even when a caller materializes
    # the bucket table behind a checkpoint (histogram_family's shared
    # aggregate), where window-over-RDD-scan provenance is invisible.
    if as_percentage:
        tot = out.agg(F.sum("count").alias("__tot"))
        out = out.crossJoin(F.broadcast(tot)).select(
            "bucket",
            "bucket_start",
            (F.col("count") * 100.0 / F.col("__tot")).alias("count"),
        )
    if trim_outliers is not None:
        # keep the span between the first and last bucket whose share is
        # STRICTLY > percent; if none qualifies, the histogram is
        # returned unchanged (histogram.rkt:142-155)
        tot2 = out.agg(F.sum("count").alias("__t2"))
        keep_b = F.when(
            F.col("count") / F.col("__t2") > F.lit(trim_outliers),
            F.col("bucket"),
        )
        bounds = (
            out.crossJoin(F.broadcast(tot2))
            .agg(
                F.min(keep_b).alias("__klo"),
                F.max(keep_b).alias("__khi"),
                F.min("bucket").alias("__blo"),
                F.max("bucket").alias("__bhi"),
            )
        )
        out = (
            out.crossJoin(F.broadcast(bounds))
            .where(
                F.col("bucket").between(
                    F.coalesce(F.col("__klo"), F.col("__blo")),
                    F.coalesce(F.col("__khi"), F.col("__bhi")),
                )
            )
        )
    return out.select("bucket", "bucket_start", "count")


def histogram_from_counts(
    bucket_counts: DataFrame,
    width: float = 1.0,
    as_percentage: bool = False,
    trim_outliers: float | None = None,
) -> DataFrame:
    """The tail of :func:`histogram` (gap-fill + bucket_start +
    percentage/trim postprocessing) over a PRECOMPUTED
    ``(bucket, count)`` relation — exposed so a caller computing
    several histogram views over the same bucketed counts
    (histogram_family runs plain + normalized + trimmed-percentage
    views, and two include_zeroes=False histograms split by a flag
    column) shares ONE corpus aggregate instead of re-scanning per
    view (r18 optimization, guide §2.3/§2.4). Gap-filling is
    idempotent, so feeding an already gap-filled table is safe."""
    return _postprocess(
        _gap_fill(bucket_counts.select("bucket", "count"), F.lit(0)),
        width,
        as_percentage,
        trim_outliers,
    )


def combine_histograms(h1: DataFrame, h2: DataFrame) -> DataFrame:
    """Align two histograms on the merged bucket set, zero-filling
    missing buckets (histogram.rkt:302-334). Returns
    (bucket, bucket_start, count_1, count_2)."""
    a = h1.select("bucket", "bucket_start", F.col("count").alias("count_1"))
    b = h2.select("bucket", "bucket_start", F.col("count").alias("count_2"))
    return (
        a.join(b, ["bucket", "bucket_start"], "full_outer")
        .select(
            "bucket",
            "bucket_start",
            F.coalesce("count_1", F.lit(0)).alias("count_1"),
            F.coalesce("count_2", F.lit(0)).alias("count_2"),
        )
    )


def normalize_histogram(h: DataFrame) -> DataFrame:
    """Scale counts to fractions summing to 1 (histogram.rkt:302-311).
    The total rides a one-row scalar aggregate crossJoin-broadcast
    back (r18 — no partitionless window; see _postprocess)."""
    tot = h.agg(F.sum("count").alias("__tot"))
    return h.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "bucket_start",
        (F.col("count") / F.col("__tot")).alias("count"),
    )
