"""Exact (order-insensitive) floating aggregation helpers.

Summing doubles is order-dependent at the last few ulps; a
distributed sum and a single-threaded oracle sum can therefore
hash-differently. These helpers route sums through DECIMAL
arithmetic — exact and associative — and cast the result back to
DOUBLE, so a Spark plan and a DuckDB oracle produce bit-identical
doubles regardless of partitioning or evaluation order.

Recipe (mirrored in oracle SQL):
  sum:  CAST(SUM(CAST(expr AS DECIMAL(38, s)) ) AS DOUBLE)
  avg:  CAST(SUM(...decimal...) AS DOUBLE) / COUNT(expr)

The per-row ``expr`` must itself be deterministic double arithmetic
(same literal ops both sides); double->decimal conversion can't tie
(binary doubles are never exactly at a decimal half-boundary), so
both engines round it identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default decimal scale — 18 fractional digits keeps 20 integral
#: digits of headroom in DECIMAL(38,18), enough for any per-row
#: value this engine aggregates.
SCALE = 18
_DEC = f"decimal(38,{SCALE})"


def dsum(col: Column | str, scale: int = SCALE) -> Column:
    """Order-insensitive SUM of a double expression -> double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def davg(col: Column | str, scale: int = SCALE) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, divided in
    double (both engines divide the same two numbers)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: int = SCALE) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = SCALE) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
