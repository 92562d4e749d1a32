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
