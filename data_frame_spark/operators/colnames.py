"""Shared literal-column-name quoting.

ONE definition of the backtick discipline (previously copy-pasted
into reshape/timeseries/drift — r16 review consolidation): Spark
PARSES bare strings in select/groupBy/window/pivot/expr positions,
so a dotted or spaced name resolves as struct-field access unless
backtick-quoted; embedded backticks are Spark's own quoting limit
and raise. Join-by-name lists must stay UNquoted (usingColumns
resolves by exact name, not by parsing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def check_no_backtick(name: str) -> str:
    if "`" in name:
        raise ValueError(f"column name may not contain backticks: {name!r}")
    return name


def quoted_name(name: str) -> str:
    """The backtick-quoted string form, for SQL-text splices."""
    return f"`{check_no_backtick(name)}`"


def quoted(name: str) -> Column:
    """Resolve a LITERAL column name as a Column."""
    return F.col(quoted_name(name))
