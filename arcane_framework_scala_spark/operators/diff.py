"""Snapshot diff — the change data feed between two table states.

Delta's Change Data Feed / Iceberg's ``changes`` metadata query, derived
rather than stored: given two committed snapshots of a merge target
(``SnapshotParquetTarget.read_version``), emit one row per changed key
with the operation and the pre/post images:

- key only in *after*  → ``insert``  (old columns null)
- key only in *before* → ``delete``  (new columns null)
- key in both, any compared column differs (null-safe) → ``update``
- identical rows emit nothing.

This answers "what did batch N change?" without the sink having to
record per-row change logs — the reference has no CDF surface at all
(its consumers re-read the target); deriving it post-hoc is the
Spark-first equivalent.

Plan shape: ONE full-outer join keyed on the merge key (the same
shuffle class as the merge that produced the snapshots) + a codegen
projection for the op/changed flags. At 100 TB both sides partition-
prune to the touched partitions first (the merge generator's IN-list
machinery, `queries/merge.py`) — the diff only needs the partitions the
batch touched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDF rows between two snapshots: ``keys…, op, old_<c>, new_<c>``
    for every compared column ``c`` (defaults to all common non-key
    columns, in ``before``'s column order)."""
    if compare_cols is None:
        common = [c for c in before.columns if c in set(after.columns)]
        compare_cols = [c for c in common if c not in set(keys)]
    b = before.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    a = after.select(
        *[F.col(k).alias(f"__ak_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    cond = None
    for k in keys:
        c = F.col(f"__bk_{k}") == F.col(f"__ak_{k}")
        cond = c if cond is None else (cond & c)
    j = b.join(a, cond, "full_outer")
    in_b = F.col(f"__bk_{keys[0]}").isNotNull()
    in_a = F.col(f"__ak_{keys[0]}").isNotNull()
    changed: Column = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    op = (
        F.when(~in_b, F.lit("insert"))
        .when(~in_a, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__ak_{k}"), F.col(f"__bk_{k}")).alias(k)
                for k in keys
            ],
            "op",
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
