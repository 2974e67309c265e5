"""Exact (order-insensitive, cross-engine-deterministic) float sums.

Summing doubles is order-dependent at the last few ulps, so a
distributed Spark sum and a single-threaded DuckDB oracle sum can
hash-differently. Fractional DECIMAL is not a fix: the two engines'
double<->decimal conversions are not both correctly rounded at all
scales (observed: DuckDB decimal(38,12)->double off by 1 ulp,
double->decimal(38,18) off in the last digits).

The scheme that IS bit-deterministic in both engines:

  1. quantize each per-row value: FLOOR(x * 10^s + 0.5)
     — x is the same double in both engines (IEEE per-row arithmetic
     is deterministic), so multiply/add/floor give the same double;
     floor has no rounding-mode ambiguity (unlike ROUND/CAST).
  2. sum the quantized integers as DECIMAL(38,0) — exact integer
     arithmetic, fully associative, immune to partitioning.
  3. cast the integer sum to double and divide by 10^s — integer ->
     double is correctly rounded in both engines, and the final
     division is one identical IEEE op.

The result is the sum of x quantized at 10^-s — a *defined* value
that both engines compute bit-identically. Choose ``scale`` so that
|x|*10^s stays below ~9e18 (Spark's FLOOR yields BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default quantization: 6 fractional digits. Fine for money-ish
#: magnitudes (|x| < ~9e12 at scale 6).
SCALE = 6


def _q(c: Column, scale: int) -> Column:
    return F.floor(c * F.lit(float(10**scale)) + F.lit(0.5)).cast("decimal(38,0)")


def dsum(col: Column | str, scale: int = SCALE) -> Column:
    """Order-insensitive, cross-engine-exact SUM of a double
    expression, quantized at 10^-scale. Returns double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_q(c, scale)).cast("double") / F.lit(float(10**scale))


def davg(col: Column | str, scale: int = SCALE) -> Column:
    """Order-insensitive AVG: exact quantized sum / count (the final
    division is one identical IEEE op in both engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(_q(c, scale)).cast("double") / F.lit(float(10**scale))
    ) / F.count(c)


def sql_dsum(expr: str, scale: int = SCALE) -> str:
    """DuckDB oracle twin of :func:`dsum`.

    The integer->double conversion goes through VARCHAR: DuckDB's
    direct DECIMAL(38,0)->DOUBLE cast is NOT correctly rounded for
    sums above 2^53 (off by 1 ulp, observed at sf0.1), while its
    string->double parse is — matching Spark's BigDecimal.doubleValue
    exactly."""
    m = float(10**scale)
    return (
        f"CAST(CAST(SUM(CAST(FLOOR(({expr}) * {m!r} + 0.5) AS DECIMAL(38,0)))"
        f" AS VARCHAR) AS DOUBLE) / {m!r}"
    )


def sql_davg(expr: str, scale: int = SCALE) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return f"({sql_dsum(expr, scale)}) / COUNT({expr})"
