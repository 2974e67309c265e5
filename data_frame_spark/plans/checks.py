"""Physical-plan inspection helpers.

The 100 TB contract is enforced here: tests assert that filters and
projections reach the parquet scan (PushedFilters / ReadSchema),
dimension joins broadcast, and hot paths stay inside whole-stage
codegen — so a refactor that silently de-optimizes a plan fails CI,
not a cluster run.
"""

from __future__ import annotations

import re

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


_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
#: nodes that bound their output row count regardless of input size
_LIMIT_NODES = (
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
)
_KEYS_RE = re.compile(r"keys?=\[(.*?)\](?:,|\))")
_OUTPUT_RE = re.compile(r"output=\[(.*?)\]")

#: Per-query DECLARED bounded grouping domains: aggregate output
#: column names whose cardinality is bounded by construction or by
#: attribute domain, NOT by corpus size — each entry carries its
#: justification and is consulted by the scale ledger and the
#: test_plans pins via :func:`partitionless_for_query`. Anything not
#: declared here (e.g. a token vocabulary) stays flagged.
DECLARED_BOUNDED_KEYS: dict[str, frozenset[str]] = {
    # histogram bin tables: bin count = ceil(range/width), both caller
    # constants — adding rows never adds bins (operators/histogram.py)
    "histogram_quantity": frozenset({"bucket"}),
    "weighted_histogram_value": frozenset({"bucket"}),
    "combine_histograms_returnflag": frozenset({"bucket"}),
    # factor histogram over event_type: attribute domain (enum of
    # event kinds), not corpus-sized; documented in the query
    "string_histogram_event_type": frozenset({"bucket", "event_type"}),
    # mixture strata = language codes — attribute domain (~hundreds),
    # grows with the language inventory, not the corpus
    "temperature_mixture_weights": frozenset({"stratum"}),
}


def partitionless_for_query(name: str, df: DataFrame) -> list[str]:
    """data_sized_partitionless_windows with the query's DECLARED
    bounded key domains applied (see DECLARED_BOUNDED_KEYS)."""
    return data_sized_partitionless_windows(
        df, bounded_names=DECLARED_BOUNDED_KEYS.get(name, frozenset())
    )


def _bounded_first_aggregates(
    node, bounded_names: frozenset[str] = frozenset()
) -> tuple[bool, list[str]]:
    """Walk ``node``'s subtree down to the TOPMOST aggregate / limit
    node of each branch and classify it by output-cardinality class:

    * limit nodes (TakeOrderedAndProject, …) — k-bounded, fine;
    * aggregates with NO grouping keys — one row, fine;
    * aggregates keyed (only) by ``__bucket`` — at most |buckets|+1
      rows by construction (operators.distributed), fine;
    * any OTHER grouping key — DATA-DEPENDENT cardinality (a token
      vocabulary, doc ids, …): a partitionless window over it is a
      scale funnel even though an aggregate sits below.

    Returns (all_branches_bounded, offending first-line summaries).
    """
    bad: list[str] = []
    found_any = False

    def walk(n):
        nonlocal found_any
        name = n.getClass().getSimpleName()
        if any(name.startswith(l) for l in _LIMIT_NODES):
            found_any = True
            return
        if name.startswith(("LocalTableScan", "OneRowRelation", "EmptyRelation")):
            # driver-side literal relation (offset lookup tables,
            # createDataFrame constants) — constant-sized
            found_any = True
            return
        if name.startswith("Range"):
            # spark.range(...) — bounds are plan-time constants (the
            # bucket spines in operators.distributed), never data-sized
            found_any = True
            return
        if any(name.startswith(a) for a in _AGG_NODES):
            found_any = True
            first = n.toString().splitlines()[0]
            m = _KEYS_RE.search(first)
            keys = (m.group(1) if m else "").strip()
            if keys and "__bucket" not in keys:
                outs = _OUTPUT_RE.search(first)
                out_names = {
                    c.strip().split("#")[0]
                    for c in (outs.group(1).split(",") if outs else [])
                }
                if not (bounded_names and out_names & bounded_names):
                    bad.append(first)
            return
        kids = n.children()
        if kids.size() == 0:
            # reached a data leaf (file scan / range) with no bounding
            # node on this branch — data-sized input
            bad.append(n.toString().splitlines()[0])
            return
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(node)
    return (found_any and not bad), bad


def data_sized_partitionless_windows(
    df: DataFrame, bounded_names: frozenset[str] = frozenset()
) -> list[str]:
    """Partitionless WindowExec nodes whose input is NOT bounded.

    A ``Window.orderBy`` with no partition keys funnels its whole input
    through one partition. That is acceptable only when the input's
    cardinality is BOUNDED independent of the data: a global (no-key)
    aggregate, a ``__bucket``-keyed aggregate from
    ``operators.distributed`` (≤ |buckets|+1 rows), or a k-limit.
    An aggregate keyed by a data column (a token vocabulary, doc ids)
    does NOT qualify — its output grows with the corpus, so the window
    is still a scale funnel (round-5 verdict: the old any-aggregate
    exemption wrongly blessed the zipf vocab rank). Tests assert this
    returns [].
    """
    jplan = df._jdf.queryExecution().executedPlan()
    if jplan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        jplan = jplan.initialPlan()
    bad: list[str] = []

    def walk(node):
        if node.getClass().getSimpleName() in ("WindowExec", "WindowGroupLimitExec"):
            if node.partitionSpec().isEmpty():
                ok, offenders = _bounded_first_aggregates(node, bounded_names)
                if not ok:
                    head = node.toString().splitlines()[0]
                    bad.append(
                        head
                        + " <- unbounded input: "
                        + "; ".join(offenders[:3])
                    )
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(jplan)
    return bad
