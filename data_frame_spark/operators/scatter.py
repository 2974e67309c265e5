"""Scatter-plot data preparation (reference private/scatter.rkt).

``group_samples`` (scatter.rkt:66-94): round X to ``frac_digits1``
and Y to ``frac_digits2``, count identical rounded pairs; the count
is the pair's "rank" (plot density). Returns (x, y, rank) — the
relational form of the reference's rank->points hash.

``group_samples_factor`` (scatter.rkt:102-107): tag each row with a
factor expression value — relationally just a projection; the
grouping is the downstream groupBy.

Both are single-shuffle groupBy aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_frame_spark.operators.colnames import quoted as _qc


def _round_half_even(col: Column, digits: int) -> Column:
    # the reference uses exact-round (round-half-even on exact
    # rationals); F.bround is Spark's HALF_EVEN rounding
    return F.bround(col, digits)


def group_samples(
    df: DataFrame,
    x_col: str,
    y_col: str,
    frac_digits1: int = 0,
    frac_digits2: int = 0,
    by: str | None = None,
) -> DataFrame:
    """(x, y, rank): rounded pairs with their duplicate count.
    With ``by``, ranks are computed per factor value — the composed
    group-samples/factor semantics (scatter.rkt:102-107: each factor
    value is its own series) in the same single-shuffle aggregate."""
    x = _round_half_even(_qc(x_col).cast("double"), frac_digits1)
    y = _round_half_even(_qc(y_col).cast("double"), frac_digits2)
    keys = ([_qc(by)] if by else []) + [x.alias("x"), y.alias("y")]
    return (
        df.where(_qc(x_col).isNotNull() & _qc(y_col).isNotNull())
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("rank"))
    )


def group_samples_factor(
    df: DataFrame, factor: Column, factor_name: str = "factor"
) -> DataFrame:
    """Rows tagged by a factor expression (group-samples/factor)."""
    return df.withColumn(factor_name, factor)
