"""Pivot / melt — bounded-domain reshaping.

The wide<->long operators every frame library carries (pandas
pivot_table/melt; Spark ``groupBy().pivot()`` / ``unpivot``). The
reference's single-frame model has no reshape surface (its series
are already columns — SURVEY §1.1), so this is net-new inventory;
included because a user porting spreadsheet-shaped analytics expects
it, and because the SCALE-SAFE form needs an explicit contract the
raw Spark API does not enforce:

* ``pivot`` REQUIRES the caller to pass the pivot values — an
  ATTRIBUTE-DOMAIN list (enum-like: statuses, priorities, languages).
  Spark's two-arg ``pivot(col)`` silently runs a driver-side
  distinct-collect over the data to discover the columns; at corpus
  scale that is a collect on a possibly-unbounded domain AND makes
  the output schema data-dependent (a new value appearing in
  tomorrow's data would change the schema). Forcing the list keeps
  the plan collect-free and the schema stable — values absent from
  the data yield NULL/zero cells, values outside the list are
  IGNORED by construction.
* ``melt`` is Spark's built-in ``unpivot`` (a narrow map-side
  Expand: no shuffle, no Python).

Scale shape: pivot plans as TWO map-combinable aggregates — the
(group, pivot) cell aggregate (the only data-sized exchange), then
the pivotfirst column-assembly aggregate whose input is already
reduced to ≤ |group combinations| × |domain| rows (bounded by the
declared domain, not the data; its partial combines map-side too).
melt = zero shuffles (a map-side Expand).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame

from data_frame_spark.operators.colnames import quoted as _q, quoted_name


def pivot(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """Wide reshape: one output row per ``group_cols`` combination,
    one output column per entry of ``values`` (the EXPLICIT bounded
    pivot domain — see module docstring), each holding ``agg``
    evaluated over the rows where ``pivot_col`` equals that value.

    ``agg`` is an unevaluated aggregate Column over the frame's own
    columns (e.g. ``F.count(F.lit(1))``, ``F.sum("x")``); it is
    applied per pivot cell via Spark's native pivot (see the module
    docstring for the two-aggregate plan shape). Pivot values are
    emitted as columns in the CALLER'S order with the value as the
    column name.
    """
    groups = list(group_cols)
    vals = list(values)
    if not groups:
        raise ValueError("pivot needs at least one group column")
    if not vals:
        # an empty list would silently fall back to Spark's
        # distinct-collect discovery — the exact hazard this wrapper
        # exists to forbid
        raise ValueError(
            "pivot needs an explicit bounded values list (attribute "
            "domain); data-derived column discovery collects a "
            "distinct over the corpus and makes the schema "
            "data-dependent"
        )
    if len(set(vals)) != len(vals):
        raise ValueError("pivot values must be distinct")
    collide = set(map(str, vals)) & set(groups)
    if collide:
        # two same-named output columns -> ambiguous downstream
        raise ValueError(f"pivot values collide with group columns: {sorted(collide)}")
    return (
        df.groupBy(*[_q(g) for g in groups])
        # backtick-quoted like the group/value columns: GroupedData
        # .pivot resolves the string via df.col, so a raw dotted name
        # (the spreadsheet-ingest case this module hardens against)
        # would parse as struct-field access (r15 ADVICE)
        .pivot(quoted_name(pivot_col), vals)
        .agg(agg)
        .select(
            *[_q(g) for g in groups],
            *[_q(str(v)).alias(str(v)) for v in vals],
        )
    )


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Long reshape (pandas ``melt``): one output row per
    (input row, entry of ``value_cols``), carrying the column NAME
    in ``var_name`` and its value in ``value_name``. Spark's native
    ``unpivot`` — a map-side Expand, zero shuffles; value columns
    must share a common castable type (Spark enforces loudly)."""
    ids = list(id_cols)
    vals = list(value_cols)
    if not vals:
        raise ValueError("melt needs at least one value column")
    if {var_name, value_name} & set(ids) or var_name == value_name:
        raise ValueError(
            "melt var_name/value_name must not collide with id columns "
            "or each other"
        )
    return df.unpivot(
        [_q(c) for c in ids],
        [_q(c).alias(c) for c in vals],
        var_name,
        value_name,
    )
