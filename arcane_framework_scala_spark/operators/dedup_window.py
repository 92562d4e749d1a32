"""Latest-version-per-key dedup windows (W1/W2) as DataFrame operators.

Reference semantics (``models/batches/SqlServerChangeTracking.scala:77-80``
and siblings): Trino ``ORDER BY ROW_NUMBER() OVER (PARTITION BY
ARCANE_MERGE_KEY ORDER BY <version> DESC) FETCH FIRST 1 ROWS WITH TIES``.
``WITH TIES`` means **rank() == 1, not row_number() == 1**: every row tied
at the max version survives, so a delete marker that shares the final
version with a data row is preserved (deliberate — comment at
``models/batches/SynapseLink.scala:77``).

Scale note: the window shuffles once on the merge key. The merge key is a
SHA-256-derived string → effectively uniform, no skew; AQE handles residual
imbalance. No driver materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from arcane_framework_scala_spark.schema.schema import (
    MERGE_KEY_COLUMN,
    SYNAPSE_DELETE_COLUMN,
)

_RANK = "__arcane_rank"


def latest_version_per_key(
    df: DataFrame,
    version_column: str,
    merge_key: str = MERGE_KEY_COLUMN,
) -> DataFrame:
    """W1: keep all rows rank()==1 by descending version within each key."""
    w = Window.partitionBy(merge_key).orderBy(F.desc(version_column))
    return df.withColumn(_RANK, F.rank().over(w)).filter(F.col(_RANK) == 1).drop(_RANK)


def backfill_commit_dedup(
    df: DataFrame,
    version_column: str,
    merge_key: str = MERGE_KEY_COLUMN,
    drop_synapse_deletes: bool = False,
) -> DataFrame:
    """W2: same window over the combined backfill table; the Synapse variant
    drops delete tombstones before the target swap
    (``backfill/synapse/SynapseLinkShardCommitQuery.scala:10-17``)."""
    out = latest_version_per_key(df, version_column, merge_key)
    if drop_synapse_deletes:
        out = out.filter(~F.coalesce(F.col(SYNAPSE_DELETE_COLUMN), F.lit(False)))
    return out


def scd2_history(
    df,
    version_column: str,
    merge_key: str = MERGE_KEY_COLUMN,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Slowly-Changing-Dimension Type-2 materialization — the history-
    preserving alternative to W1's latest-only collapse: every change
    row becomes a validity interval (valid_from = its version,
    valid_to = the next change's version, NULL-open for the current
    row) plus an ``is_current`` flag.

    The reference's sinks only keep latest state; a warehouse consumer
    of the same CDC feed routinely needs the full history table — this
    is that operator, W1's exact sibling: same single shuffle on the
    merge key, ``lead`` instead of ``rank``. Pass ``tiebreak_cols``
    (e.g. a source sequence id) when (key, version) can tie — the
    ordering must be total and data-derived, never partition-layout-
    dependent, for intervals to be reproducible."""
    w = Window.partitionBy(merge_key).orderBy(
        F.col(version_column).asc(),
        *[F.col(c).asc() for c in tiebreak_cols],
    )
    return (
        df.withColumn("valid_from", F.col(version_column))
        .withColumn("valid_to", F.lead(version_column).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
