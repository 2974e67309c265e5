"""Physical-plan inspection helpers.

The 100 TB contract is enforced here: tests assert that filters and
projections reach the parquet scan (PushedFilters / ReadSchema),
dimension joins broadcast, and hot paths stay inside whole-stage
codegen — so a refactor that silently de-optimizes a plan fails CI,
not a cluster run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def formatted_plan(df: DataFrame) -> str:
    return _explain(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return _explain(df, "simple")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True iff the scan's PushedFilters mention ``fragment``."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (column pruning)."""
    import re

    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            m = re.search(r"struct<(.*)>?", line)
            if m:
                cols += [
                    c.split(":")[0].strip()
                    for c in m.group(1).rstrip(">").split(",")
                    if ":" in c
                ]
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastNestedLoopJoin" in simple_plan(df)


def count_shuffles(df: DataFrame) -> int:
    return simple_plan(df).count("Exchange")


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")


def data_sized_partitionless_windows(df: DataFrame) -> list[str]:
    """Partitionless WindowExec nodes whose input is NOT aggregate-sized.

    A ``Window.orderBy`` with no partition keys funnels its whole input
    through one partition. That is acceptable only when the input is
    already aggregate-sized (e.g. the per-bucket offset tables in
    ``operators.distributed`` — a HashAggregate sits below). Any other
    occurrence is a scale bug; tests assert this returns [].
    """
    jplan = df._jdf.queryExecution().executedPlan()
    if jplan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        jplan = jplan.initialPlan()
    bad: list[str] = []

    def walk(node):
        if node.getClass().getSimpleName() in ("WindowExec", "WindowGroupLimitExec"):
            if node.partitionSpec().isEmpty():
                sub = node.toString()
                if not any(
                    a in sub
                    for a in ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
                ):
                    bad.append(sub.splitlines()[0])
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(jplan)
    return bad
