"""Physical-plan audit: make plan quality a testable property.

The reference has no optimizer to audit (SURVEY §4 — its "plan" is
generated SQL text executed by SQL Server/Trino). On Spark the plan IS the
product, so this module extracts the scale-relevant facts from
``explain("formatted")`` output and lets tests pin them: a dimension join
that silently degrades from broadcast to sort-merge, a filter that stops
reaching the parquet scan, or a Python eval node sneaking into a JVM-only
pipeline are regressions this catches before they cost hours at 100 TB.

Caveat (measured): with AQE enabled, ``[codegen id : N]`` tags are absent
from the *pre-execution* formatted plan of any query containing an
Exchange, so codegen presence is only asserted for exchange-free plans.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanAudit:
    scans: int                #: parquet/file source scans
    broadcast_joins: int      #: BroadcastHashJoin nodes
    sort_merge_joins: int     #: SortMergeJoin nodes
    nested_loop_joins: int    #: BroadcastNestedLoop + Cartesian (usually a bug)
    cartesian_products: int   #: non-broadcast CartesianProduct (always a bug)
    exchanges: int            #: shuffle Exchange nodes (AQE may remove some at runtime)
    python_nodes: int         #: BatchEvalPython / ArrowEvalPython / *InPandas
    codegen_spans: int        #: whole-stage codegen regions (0 under AQE pre-execution)
    pushed_filter_scans: int  #: scans with a non-empty PushedFilters list
    partition_filter_scans: int  #: scans with a non-empty PartitionFilters list
    partition_filters: tuple[str, ...]  #: the non-empty PartitionFilters texts
    plan: str                 #: raw formatted plan, for failure messages


def audit_plan(df: DataFrame) -> PlanAudit:
    """Extract scale-relevant counts from the formatted physical plan."""
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = jqe.explainString(mode.fromString("formatted"))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    # PartitionFilters on a FileSourceScan = partition pruning reached the
    # scan (the persisted-index design depends on it — a regression to
    # full-scan shows up here as an empty list). Filter the always-present
    # isnotnull guard so "non-empty" means a real pruning predicate.
    part = [
        p for p in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if p.strip() and re.sub(r"isnotnull\([^)]*\)|,|\s", "", p)
    ]

    # count only the numbered detail-section nodes — the tree view at the
    # top of a formatted plan repeats every node name, so an unanchored
    # regex double-counts
    def nodes(pattern: str) -> int:
        return len(re.findall(rf"\(\d+\) (?:{pattern})", plan))

    return PlanAudit(
        scans=nodes("Scan "),
        broadcast_joins=nodes("BroadcastHashJoin"),
        sort_merge_joins=nodes("SortMergeJoin"),
        nested_loop_joins=nodes("BroadcastNestedLoopJoin|CartesianProduct"),
        cartesian_products=nodes("CartesianProduct"),
        exchanges=nodes("Exchange"),
        python_nodes=nodes(
            "BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas"
            "|MapInPandas|FlatMapCoGroupsInPandas"
        ),
        codegen_spans=len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        pushed_filter_scans=sum(1 for p in pushed if p.strip()),
        partition_filter_scans=len(part),
        partition_filters=tuple(part),
        plan=plan,
    )
