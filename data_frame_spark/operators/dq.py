"""Declarative data-quality verification — Deequ-style rule checks.

The pre-training gate every large-scale data pipeline runs before a
corpus snapshot is trusted: a declarative rule list (completeness,
ranges, accepted domains, key uniqueness, referential integrity)
evaluated in as few passes as the rule mix allows, emitting ONE
bounded row per rule with exact violation counts. The published
precedent is AWS Deequ (Schelter et al., "Automating Large-Scale
Data Quality Verification", VLDB 2018): declarative checks compile
to shared-scan Spark aggregates. No reference twin — the reference's
single-frame model validates per-series NA counts only (SURVEY
§2.5); this is the table-level contract layer next to df-describe
(what the data looks like) and denylist_scrub (what must be removed).

Rule forms (each a plain tuple, the explicit bounded contract — the
rule list is code, never data):

* ``("not_null", rule_id, col)`` — violations: rows where col IS NULL.
* ``("in_range", rule_id, col, lo, hi)`` — violations: non-NULL rows
  outside [lo, hi] (NULLs are not range violations; pair with
  not_null to forbid them — the two failure modes stay separately
  countable).
* ``("accepted_values", rule_id, col, values)`` — violations:
  non-NULL rows whose value is outside the EXPLICIT list (an
  attribute domain, the pivot/psi contract).
* ``("unique", rule_id, cols)`` — violations: surplus copies,
  ``n_rows − n_distinct_key_tuples`` (group-by semantics: NULL keys
  compare equal to each other, exactly like SQL DISTINCT — a doubled
  NULL key IS a duplicate).
* ``("ref_integrity", rule_id, col, ref_df, ref_col)`` — violations:
  non-NULL foreign keys with no match in the referenced column (SQL
  FK semantics: NULL passes; forbid NULLs with not_null).

Output: one row per rule — ``rule_id``, ``rule`` (the form name),
``column`` (comma-joined for multi-column keys), ``n_rows`` (the
rows the rule was evaluated over), ``n_violations``, ``passed``.

Scale shape (the Deequ scan-sharing argument): ALL row-local rules
(not_null / in_range / accepted_values) compile into ONE
map-combinable whole-frame aggregate — one scan however many such
rules there are — then unpack to per-rule rows via a plan-level
inline explode of the single aggregate row (bounded by |rules|,
zero extra exchanges). Each ``unique`` rule adds exactly one
key-partitioned aggregate (count per key, then the bounded surplus
sum); each ``ref_integrity`` rule one key-partitioned LEFT join +
aggregate (broadcast-free by default — both sides are data-sized in
general). Output is |rules| rows at any corpus size; nothing is
collected.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_frame_spark.operators.colnames import quoted as _q

_OUT_COLS = ("rule_id", "rule", "column", "n_rows", "n_violations", "passed")

_ROW_LOCAL = {"not_null", "in_range", "accepted_values"}
_FORMS = _ROW_LOCAL | {"unique", "ref_integrity"}


def _finish(df: DataFrame, gcols: Sequence[str] = ()) -> DataFrame:
    """Attach the verdict column and fix the output column order
    (group columns lead, the report columns follow)."""
    return df.select(
        *[_q(c) for c in gcols],
        "rule_id", "rule", "column", "n_rows", "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def _row_local_violations(rule: tuple) -> Column:
    """The per-row violation indicator for one row-local rule."""
    form = rule[0]
    c = _q(rule[2])
    if form == "not_null":
        return F.when(c.isNull(), 1).otherwise(0)
    if form == "in_range":
        lo, hi = rule[3], rule[4]
        return F.when(
            c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi)), 1
        ).otherwise(0)
    # accepted_values
    vals = list(rule[3])
    return F.when(c.isNotNull() & ~c.isin(vals), 1).otherwise(0)


def verify(
    df: DataFrame,
    rules: Sequence[tuple],
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Evaluate ``rules`` against ``df`` (see the module docstring
    for the rule forms and the pass-count contract). Returns the
    bounded one-row-per-rule report.

    With ``group_by`` (the per-SOURCE corpus-gate form — Deequ's
    grouped analyzers): every rule is evaluated independently per
    group and the report carries the group columns; output is
    |groups| × |rules| rows. Row-local rules still share ONE
    aggregate (now group-keyed, map-combinable — one exchange total
    however many such rules); each ``unique`` rule's key aggregate
    simply prepends the group columns (a NULL-safe composite key);
    ``ref_integrity`` keeps the FK join and adds the group key to
    the miss-count aggregate. Groups with zero rows don't appear
    (there is nothing to certify — emit the domain grid upstream if
    absence itself must alarm)."""
    rules = list(rules)
    gcols = [str(c) for c in group_by]
    if len(set(gcols)) != len(gcols):
        raise ValueError("dq.verify group_by names must be distinct")
    # every internal alias (__cnt/__fk/__hit/__n/__v0..__vN) lives in
    # the "__" prefix, so the prefix guard owns that whole namespace
    # with the accurate message; _OUT_COLS are the report columns
    dunder = [c for c in gcols if c.startswith("__")]
    if dunder:
        raise ValueError(
            f"dq.verify group_by names may not start with '__' "
            f"(internal alias space): {sorted(dunder)}"
        )
    collide = set(_OUT_COLS) & set(gcols)
    if collide:
        raise ValueError(
            f"dq.verify group_by collides with report columns: "
            f"{sorted(collide)}"
        )
    gq = [_q(c) for c in gcols]
    if not rules:
        raise ValueError("dq.verify needs at least one rule")
    ids = [r[1] for r in rules if len(r) >= 2]
    if len(ids) != len(rules) or len(set(ids)) != len(rules):
        raise ValueError("dq.verify rule_ids must be present and distinct")
    # materialize accepted_values domains ONCE: a one-shot iterable
    # would otherwise pass the guards (first list() consumes it) and
    # reach _row_local_violations empty — every non-null row flagged
    # with no error, the silent-wrong-count class the guards exist for
    rules = [
        ("accepted_values", r[1], r[2], list(r[3]))
        if r[0] == "accepted_values" and len(r) >= 4
        else r
        for r in rules
    ]
    for r in rules:
        if r[0] not in _FORMS:
            raise ValueError(f"dq.verify unknown rule form: {r[0]!r}")
        if r[0] == "accepted_values" and not r[3]:
            # an empty domain would silently flag every row — almost
            # certainly a caller bug, fail loudly instead
            raise ValueError(
                f"dq.verify rule {r[1]!r}: accepted_values needs a "
                "non-empty explicit value list"
            )
        if r[0] == "accepted_values" and any(v is None for v in r[3]):
            # NULLs pass by contract (isNotNull() gates the check), so
            # a None member can never match — worse, ~isin([..None..])
            # is NULL for non-matching rows under three-valued logic,
            # silently zeroing the violation count. Fail loudly.
            raise ValueError(
                f"dq.verify rule {r[1]!r}: accepted_values may not "
                "contain None (NULLs already pass by contract)"
            )
        if r[0] == "unique" and not list(r[2]):
            raise ValueError(
                f"dq.verify rule {r[1]!r}: unique needs key columns"
            )

    parts: list[DataFrame] = []

    row_local = [r for r in rules if r[0] in _ROW_LOCAL]
    if row_local:
        # ONE shared aggregate for every row-local rule (the Deequ
        # scan-sharing pass; group-keyed when group_by is set), then
        # a plan-level inline unpack of each aggregate row to
        # per-rule rows
        agg = df.groupBy(*gq).agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(_row_local_violations(r)).alias(f"__v{i}")
                for i, r in enumerate(row_local)
            ],
        )
        structs = F.array(
            *[
                F.struct(
                    F.lit(r[1]).alias("rule_id"),
                    F.lit(r[0]).alias("rule"),
                    F.lit(str(r[2])).alias("column"),
                    F.col("__n").cast("long").alias("n_rows"),
                    F.coalesce(F.col(f"__v{i}").cast("long"), F.lit(0)).alias(
                        "n_violations"
                    ),
                )
                for i, r in enumerate(row_local)
            ]
        )
        parts.append(
            _finish(
                agg.select(
                    *gq, F.explode(structs).alias("r")
                ).select(*gq, "r.*"),
                gcols,
            )
        )

    for r in rules:
        if r[0] == "unique":
            cols = [str(c) for c in r[2]]
            grouped = df.groupBy(*gq, *[_q(c) for c in cols]).agg(
                F.count(F.lit(1)).alias("__cnt")
            )
            rep = grouped.groupBy(*gq).agg(
                F.coalesce(F.sum("__cnt"), F.lit(0)).cast("long").alias("n_rows"),
                F.coalesce(F.sum(F.col("__cnt") - 1), F.lit(0))
                .cast("long")
                .alias("n_violations"),
            ).select(
                *gq,
                F.lit(r[1]).alias("rule_id"),
                F.lit("unique").alias("rule"),
                F.lit(",".join(cols)).alias("column"),
                "n_rows",
                "n_violations",
            )
            parts.append(_finish(rep, gcols))
        elif r[0] == "ref_integrity":
            col, ref_df, ref_col = r[2], r[3], r[4]
            fk = df.where(_q(col).isNotNull()).select(
                *gq, _q(col).alias("__fk")
            )
            refs = ref_df.select(_q(ref_col).alias("__fk")).distinct()
            joined = fk.join(refs.withColumn("__hit", F.lit(1)), "__fk", "left")
            rep = joined.groupBy(*gq).agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_violations"),
            ).select(
                *gq,
                F.lit(r[1]).alias("rule_id"),
                F.lit("ref_integrity").alias("rule"),
                F.lit(str(col)).alias("column"),
                "n_rows",
                "n_violations",
            )
            parts.append(_finish(rep, gcols))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
