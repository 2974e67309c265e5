"""Histogram operators (reference private/histogram.rkt:37-204).

Reference semantics:
* numeric samples: bucket = truncate(v / width) (histogram.rkt:49-51)
  — truncation toward zero, bucket key is the integer quotient;
  the returned table maps bucket*width -> count (we expose both).
* string samples: the bucket IS the value (histogram.rkt:49-51).
* weighted: consecutive-pair (Δw, midpoint) samples, like weighted
  statistics (histogram.rkt:53-66); unweighted: count 1 per sample.
* numeric gaps between min and max bucket are zero-filled
  (histogram.rkt:119-128); ``include_zeroes=False`` drops them.
* ``as_percentage``: counts scaled to 100*c/Σc (histogram.rkt:98-112).
* ``trim_outliers``: drop edge buckets while their share < p,
  scanning in from both ends (histogram.rkt:142-155).

Plan shape: groupBy(bucket) — one map-side-combinable shuffle on the
bucket key; gap-fill joins against a generated ``sequence()`` range
(no driver materialization); percentage/trim use a window over the
(small) bucket table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_frame_spark.exact import dsum


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
    x = F.col(col).cast("double")
    d = df.where(x.isNotNull())
    buckets = d.groupBy(_trunc_div(x, width).alias("bucket")).agg(
        F.count(F.lit(1)).alias("count")
    )
    if include_zeroes:
        rng = buckets.agg(
            F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
        ).select(F.explode(F.sequence("lo", "hi")).alias("bucket"))
        buckets = (
            rng.join(buckets, "bucket", "left")
            .select("bucket", F.coalesce("count", F.lit(0)).alias("count"))
        )
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
    w = Window.orderBy(*order_by)
    d = (
        df.withColumn("__pw", F.lag(F.col(weight_col)).over(w))
        .withColumn("__pv", F.lag(F.col(col)).over(w))
        .withColumn("__dx", F.col(weight_col) - F.col("__pw"))
        .withColumn("__dy", (F.col("__pv") + F.col(col)) / 2)
        .where(
            F.col("__dx").isNotNull() & F.col("__dy").isNotNull() & (F.col("__dx") > 0)
        )
    )
    buckets = d.groupBy(_trunc_div(F.col("__dy"), width).alias("bucket")).agg(
        dsum(F.col("__dx"), scale).alias("count")
    )
    if include_zeroes:
        rng = buckets.agg(
            F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
        ).select(F.explode(F.sequence("lo", "hi")).alias("bucket"))
        buckets = (
            rng.join(buckets, "bucket", "left")
            .select("bucket", F.coalesce("count", F.lit(0.0)).alias("count"))
        )
    return _postprocess(buckets, width, as_percentage, trim_outliers)


def string_histogram(df: DataFrame, col: str, as_percentage: bool = False) -> DataFrame:
    """String-sample histogram: bucket = the value itself."""
    d = df.where(F.col(col).isNotNull())
    out = d.groupBy(F.col(col).alias("bucket")).agg(F.count(F.lit(1)).alias("count"))
    if as_percentage:
        total = Window.partitionBy()
        out = out.select(
            "bucket",
            (F.col("count") * 100.0 / F.sum("count").over(total)).alias("count"),
        )
    return out


def _postprocess(buckets: DataFrame, width, as_percentage, trim_outliers) -> DataFrame:
    out = buckets.withColumn(
        "bucket_start", F.col("bucket") * F.lit(float(width))
    )
    if trim_outliers is not None:
        # drop contiguous edge buckets whose share < p (histogram.rkt:142-155)
        total = Window.partitionBy()
        share = F.col("count") / F.sum("count").over(total)
        keep = share >= F.lit(trim_outliers)
        # positions of first/last bucket meeting the threshold
        w_all = Window.partitionBy()
        out = (
            out.withColumn("__keep_b", F.when(keep, F.col("bucket")))
            .withColumn("__lo", F.min("__keep_b").over(w_all))
            .withColumn("__hi", F.max("__keep_b").over(w_all))
            .where(F.col("bucket").between(F.col("__lo"), F.col("__hi")))
            .drop("__keep_b", "__lo", "__hi")
        )
    if as_percentage:
        total = Window.partitionBy()
        out = out.select(
            "bucket",
            "bucket_start",
            (F.col("count") * 100.0 / F.sum("count").over(total)).alias("count"),
        )
    else:
        out = out.select("bucket", "bucket_start", "count")
    return out


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
    """Scale counts to fractions summing to 1 (histogram.rkt:302-311)."""
    total = Window.partitionBy()
    return h.select(
        "bucket",
        "bucket_start",
        (F.col("count") / F.sum("count").over(total)).alias("count"),
    )
