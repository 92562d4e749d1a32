"""Overwrite / backfill query generation (M4-M6, W2).

Reference: ``models/queries/OverwriteReplaceQuery.scala:14-22`` (create-or-
replace-as-select with table properties), property serialization at
``models/settings/TablePropertiesSettings.scala:41-56``, shard commit at
``models/queries/DefaultShardCommitQuery.scala`` and the dialect-specific
commit dedup at ``models/queries/backfill/blob/BlobShardCommitQuery.scala``
/ ``backfill/synapse/SynapseLinkShardCommitQuery.scala:10-17``.

Spark dialect: ``CREATE OR REPLACE TABLE … USING iceberg [PARTITIONED BY …]
TBLPROPERTIES (…) AS SELECT``; Synapse backfill commit also filters
``coalesce(IsDelete, false) = false`` so tombstones never land in the
rebuilt target.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from arcane_framework_scala_spark.queries.merge import MergeDialect, reduce_expr
from arcane_framework_scala_spark.schema.schema import (
    MERGE_KEY_COLUMN,
    SYNAPSE_DELETE_COLUMN,
)


@dataclass(frozen=True)
class TableProperties:
    """Target-table layout knobs (reference TablePropertiesSettings).

    ``sorted_by`` maps to Iceberg's write sort order; ``bloom_filter_columns``
    to parquet bloom filters — both matter at 100 TB (data skipping)."""

    partition_expressions: tuple[str, ...] = ()
    format: str = "PARQUET"
    sorted_by: tuple[str, ...] = ()
    bloom_filter_columns: tuple[str, ...] = ()
    provider: str = "iceberg"

    def tblproperties(self) -> dict[str, str]:
        props = {"write.format.default": self.format.lower()}
        if self.sorted_by:
            props["write.sort-order"] = ",".join(self.sorted_by)
        for col in self.bloom_filter_columns:
            props[f"write.parquet.bloom-filter-enabled.column.{col}"] = "true"
        return props


def _props_clause(props: TableProperties) -> str:
    kv = ", ".join(f"'{k}'='{v}'" for k, v in props.tblproperties().items())
    clause = f" TBLPROPERTIES ({kv})" if kv else ""
    part = (
        f" PARTITIONED BY ({', '.join(props.partition_expressions)})"
        if props.partition_expressions
        else ""
    )
    return f" USING {props.provider}{part}{clause}"


def build_overwrite_query(
    target: str,
    source_query: str,
    props: TableProperties | None = None,
) -> str:
    """M4: ``CREATE OR REPLACE TABLE target … AS <source_query>``."""
    props = props or TableProperties()
    return f"CREATE OR REPLACE TABLE {target}{_props_clause(props)} AS\n{source_query}"


def build_backfill_source_query(
    dialect: MergeDialect,
    combined: str,
    *,
    deduplicate: bool = True,
    merge_key: str = MERGE_KEY_COLUMN,
) -> str:
    """W2: the SELECT feeding an overwrite — latest-version window over the
    combined backfill table; Synapse additionally drops delete tombstones."""
    query = (
        reduce_expr(combined, dialect.version_column, merge_key)
        if deduplicate
        else f"SELECT * FROM {combined}"
    )
    if dialect.name == "synapse_link":
        query = (
            f"SELECT * FROM ({query}) "
            f"WHERE coalesce({SYNAPSE_DELETE_COLUMN}, false) = false"
        )
    return query


def build_shard_commit_query(combined: str, shard: str) -> str:
    """M5: append one staged shard into the combined backfill table."""
    return f"INSERT INTO {combined} SELECT * FROM {shard}"


def build_shard_merge_query(
    combined: str, shard: str, columns: list[str]
) -> str:
    """M6: reconcile a shard whose combine crashed mid-INSERT — the full
    3-clause change-tracking MERGE of the shard into the combined table
    (reference ``MsSqlShardFactory.scala:17-32``; version guards make the
    partially-inserted rows no-ops). The DataFrame backfill runner doesn't
    need this — shard staging is overwrite-idempotent and the combine is a
    single atomic snapshot commit — but catalog deployments resuming an
    INSERT-per-shard combine use this query."""
    from arcane_framework_scala_spark.queries.merge import (
        SQL_SERVER_CHANGE_TRACKING,
        build_merge_query,
    )

    return build_merge_query(
        SQL_SERVER_CHANGE_TRACKING, combined, shard, columns
    )
