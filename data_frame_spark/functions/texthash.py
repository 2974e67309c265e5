"""Cross-engine deterministic text hashing primitives.

Every dedup/fingerprint operator needs a hash that Spark and a SQL
oracle compute identically. Generic engine hashes differ (Spark
xxhash64/murmur vs DuckDB's internal hash), but **md5 is md5**: both
engines expose it and produce identical hex strings. All hashing
here therefore routes through md5 hex:

* ``md5_hash(col, seed)``  -> 32-char hex string
* ``hash60(col, seed)``    -> BIGINT from the first 15 hex digits
  (60 bits, always positive; Spark ``conv(hex,16,10)`` / DuckDB
  ``from_hex``-free arithmetic twin provided in SQL builders)

MinHash can equivalently use the *lexicographic* min of md5 strings
— totally ordered, uniform, and engine-identical — avoiding integer
parsing entirely; LSH band keys are md5 over concatenated minhashes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash(col: Column, seed: int | None = None) -> Column:
    c = col.cast("string")
    if seed is not None:
        c = F.concat(F.lit(f"s{seed}:"), c)
    return F.md5(c)


def hash60(col: Column, seed: int | None = None) -> Column:
    """60-bit positive integer hash (first 15 md5 hex digits)."""
    return F.conv(F.substring(md5_hash(col, seed), 1, 15), 16, 10).cast("long")


def sql_md5(expr: str, seed: int | None = None) -> str:
    if seed is not None:
        return f"md5(CONCAT('s{seed}:', CAST(({expr}) AS VARCHAR)))"
    return f"md5(CAST(({expr}) AS VARCHAR))"


def sql_hash60(expr: str, seed: int | None = None) -> str:
    """DuckDB twin of :func:`hash60`: parse 15 hex digits digit-by-
    digit-free via from_hex -> blob -> hugeint is awkward; instead
    DuckDB can cast hex literals: we build 0x-prefixed text and use
    ``CAST(CONCAT('0x', ...) AS BIGINT)`` semantics via strtoll-like
    parsing with a generated series fallback. Simplest portable
    form: position-weighted sum over the 15 hex chars.
    """
    h = f"substr({sql_md5(expr, seed)}, 1, 15)"
    # Σ hexdigit(substr(h,i,1)) * 16^(15-i) — pure integer arithmetic
    digit = (
        "CAST(CASE WHEN ascii(substr({h},{i},1)) >= 97 "
        "THEN ascii(substr({h},{i},1)) - 87 "
        "ELSE ascii(substr({h},{i},1)) - 48 END AS BIGINT)"
    )
    terms = " + ".join(
        f"({digit.format(h=h, i=i)}) * {16 ** (15 - i)}" for i in range(1, 16)
    )
    return f"({terms})"
