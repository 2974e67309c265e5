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


def shuffle_census(df: DataFrame) -> tuple[int, int]:
    """(data_sized, bucket_bounded) shuffle-Exchange counts.

    The driver-free range-bucketed primitives (`operators.distributed`)
    replace driver collects with tiny in-plan branches: per-bucket
    aggregates (grouping key ``__bucket`` — at most |buckets|+1 rows by
    construction) cumulated over the bucket spine (SinglePartition
    exchanges over aggregate output). Those exchanges move bytes
    proportional to the BUCKET COUNT, not the data, so the ledger
    reports them separately from real data repartitions.
    """
    jplan = df._jdf.queryExecution().executedPlan()
    if jplan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        jplan = jplan.initialPlan()
    data = tiny = 0

    def walk(node):
        nonlocal data, tiny
        if node.getClass().getSimpleName() == "ShuffleExchangeExec":
            part = node.outputPartitioning().toString()
            sub = node.child().toString()
            # SortAggregate prints "key=[", HashAggregate "keys=["
            bucket_keyed_agg = "keys=[__bucket" in sub or "key=[__bucket" in sub
            first_agg = min(
                (sub.find(a) for a in ("HashAggregate", "SortAggregate", "ObjectHashAggregate") if a in sub),
                default=-1,
            )
            if "SinglePartition" in part and ("__bucket" in sub or "Range (" in sub):
                tiny += 1
            elif (
                "__bucket" in part
                and bucket_keyed_agg
                and first_agg >= 0
                and sub[:first_agg].count("Exchange") == 0
            ):
                # the aggregate bounding this exchange's input sits
                # below it with no other exchange in between
                tiny += 1
            else:
                data += 1
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(jplan)
    return data, tiny


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
