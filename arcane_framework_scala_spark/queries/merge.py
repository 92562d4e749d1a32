"""MERGE query generation — Spark SQL dialect, three CDC flavors.

The reference generates Trino ``MERGE`` text per staged batch (builder at
``models/queries/MergeQuery.scala:21-50`` and segments at
``models/queries/MergeQuerySegment.scala:4-71``; dialects at
``models/batches/SqlServerChangeTracking.scala:17-80``,
``models/batches/SynapseLink.scala:17-80``,
``models/batches/UpsertBlob.scala:17-70``). This module re-expresses the
same semantics as Spark SQL (runnable against Iceberg/Delta catalogs via
``spark.sql``), with two dialect-conscious changes:

- Trino's ``ORDER BY row_number() OVER (…) FETCH FIRST 1 ROWS WITH TIES``
  latest-version window becomes an explicit ``rank() = 1`` subquery.
  **``WITH TIES`` ⇒ rank, not row_number**: all rows tied at the max version
  survive, deliberately keeping delete markers alongside the final row
  (reference comment at ``models/batches/SynapseLink.scala:77``).
- ``WHEN NOT MATCHED`` without a condition is emitted without the dangling
  double space Trino tolerated.

The same dialect descriptions drive :mod:`operators.merge_apply`, the pure
DataFrame execution path used when the session's catalog has no MERGE
support.
"""

from __future__ import annotations

from dataclasses import dataclass

from arcane_framework_scala_spark.schema.schema import (
    BLOB_VERSION_COLUMN,
    MERGE_KEY_COLUMN,
    MSSQL_OPERATION_COLUMN,
    MSSQL_VERSION_COLUMN,
    SYNAPSE_DELETE_COLUMN,
    SYNAPSE_VERSION_COLUMN,
)

TARGET_ALIAS = "t_o"
SOURCE_ALIAS = "t_s"


@dataclass(frozen=True)
class MergeDialect:
    """A CDC merge flavor: which column versions rows and when each MERGE
    clause fires. Conditions are SQL fragments over aliases ``t_o``/``t_s``;
    ``None`` means the clause is unconditional (or absent for delete)."""

    name: str
    version_column: str
    delete_condition: str | None
    update_condition: str | None
    insert_condition: str | None
    #: columns the engine adds that never reach UPDATE SET (delete markers
    #: and operation flags are filtered from the assignment list)
    non_data_columns: tuple[str, ...] = ()


SQL_SERVER_CHANGE_TRACKING = MergeDialect(
    name="sql_server_change_tracking",
    version_column=MSSQL_VERSION_COLUMN,
    delete_condition=f"{SOURCE_ALIAS}.{MSSQL_OPERATION_COLUMN} = 'D'",
    update_condition=(
        f"{SOURCE_ALIAS}.{MSSQL_OPERATION_COLUMN} != 'D' AND "
        f"{SOURCE_ALIAS}.{MSSQL_VERSION_COLUMN} > {TARGET_ALIAS}.{MSSQL_VERSION_COLUMN}"
    ),
    insert_condition=f"{SOURCE_ALIAS}.{MSSQL_OPERATION_COLUMN} != 'D'",
    non_data_columns=(MSSQL_OPERATION_COLUMN,),
)

SYNAPSE_LINK = MergeDialect(
    name="synapse_link",
    version_column=SYNAPSE_VERSION_COLUMN,
    delete_condition=f"coalesce({SOURCE_ALIAS}.{SYNAPSE_DELETE_COLUMN}, false) = true",
    update_condition=(
        f"coalesce({SOURCE_ALIAS}.{SYNAPSE_DELETE_COLUMN}, false) = false AND "
        f"{SOURCE_ALIAS}.{SYNAPSE_VERSION_COLUMN} > {TARGET_ALIAS}.{SYNAPSE_VERSION_COLUMN}"
    ),
    insert_condition=f"coalesce({SOURCE_ALIAS}.{SYNAPSE_DELETE_COLUMN}, false) = false",
    non_data_columns=(SYNAPSE_DELETE_COLUMN,),
)

UPSERT_BLOB = MergeDialect(
    name="upsert_blob",
    version_column=BLOB_VERSION_COLUMN,
    delete_condition=None,  # blob upserts never delete
    update_condition=(
        f"{SOURCE_ALIAS}.{BLOB_VERSION_COLUMN} > {TARGET_ALIAS}.{BLOB_VERSION_COLUMN}"
    ),
    insert_condition=None,  # unconditional insert
)

DIALECTS: dict[str, MergeDialect] = {
    d.name: d for d in (SQL_SERVER_CHANGE_TRACKING, SYNAPSE_LINK, UPSERT_BLOB)
}


def reduce_expr(
    staged: str,
    version_column: str,
    merge_key: str = MERGE_KEY_COLUMN,
) -> str:
    """Latest-version-per-key subquery over the staged relation (W1).

    ``rank() = 1`` keeps *every* row tied at the max version — the delete
    marker must survive next to the final data row.
    """
    return (
        "SELECT * FROM (\n"
        f" SELECT *, rank() OVER (PARTITION BY {merge_key} "
        f"ORDER BY {version_column} DESC) AS __arcane_rank FROM {staged}\n"
        f") WHERE __arcane_rank = 1"
    )


def _on_condition(
    merge_key: str,
    partition_values: dict[str, list[str]] | None,
    extra_match_keys: list[str] | None,
) -> str:
    """ON clause: key equality + partition IN-lists + null-tolerant extra
    match keys. ``ARCANE_MERGE_KEY`` is filtered out of the extra-match list
    (it is already the ON key — reference golden
    ``filter_out_arcane_merge_key_from_merge_match_*.sql``)."""
    parts = [f"{TARGET_ALIAS}.{merge_key} = {SOURCE_ALIAS}.{merge_key}"]
    for col, values in (partition_values or {}).items():
        quoted = ",".join(f"'{v}'" for v in values)
        parts.append(f"{TARGET_ALIAS}.{col} IN ({quoted})")
    for key in extra_match_keys or []:
        if key.lower() == merge_key.lower():
            continue
        parts.append(
            f"({TARGET_ALIAS}.{key} = {SOURCE_ALIAS}.{key} "
            f"OR {SOURCE_ALIAS}.{key} IS NULL)"
        )
    return " AND ".join(parts)


def build_merge_query(
    dialect: MergeDialect,
    target: str,
    staged: str,
    columns: list[str],
    *,
    deduplicate: bool = True,
    partition_values: dict[str, list[str]] | None = None,
    extra_match_keys: list[str] | None = None,
    merge_key: str = MERGE_KEY_COLUMN,
) -> str:
    """Build the full Spark SQL ``MERGE INTO`` statement for one staged batch.

    ``columns`` is the staged batch's full column list (merge key included).
    Version guards make replays idempotent (late/duplicate handling, T9).
    """
    source_query = (
        reduce_expr(staged, dialect.version_column, merge_key)
        if deduplicate
        else f"SELECT * FROM {staged}"
    )
    # UPDATE SET assigns every data column; the merge key, rank helper and
    # dialect marker columns (operation flag / delete marker) are never
    # assigned — targets don't carry them, only the staged batch does
    # (reference golden ``generate_a_valid_merge_query_synapse_link.sql``
    # assigns versionnumber but never IsDelete). Version columns ARE data:
    # the t_o-side update guard reads them back on the next batch.
    markers = {c.lower() for c in dialect.non_data_columns}
    excluded = {merge_key.lower(), "__arcane_rank"} | markers
    update_cols = [c for c in columns if c.lower() not in excluded]
    insert_cols = [
        c for c in columns if c.lower() not in ({"__arcane_rank"} | markers)
    ]

    lines = [
        f"MERGE INTO {target} {TARGET_ALIAS}",
        f"USING ({source_query}) {SOURCE_ALIAS}",
        f"ON {_on_condition(merge_key, partition_values, extra_match_keys)}",
    ]
    if dialect.delete_condition:
        lines.append(f"WHEN MATCHED AND {dialect.delete_condition} THEN DELETE")
    update_when = f" AND {dialect.update_condition}" if dialect.update_condition else ""
    assignments = ",\n  ".join(f"{c} = {SOURCE_ALIAS}.{c}" for c in update_cols)
    lines.append(f"WHEN MATCHED{update_when} THEN UPDATE SET\n  {assignments}")
    insert_when = f" AND {dialect.insert_condition}" if dialect.insert_condition else ""
    col_list = ",".join(insert_cols)
    value_list = ",".join(f"{SOURCE_ALIAS}.{c}" for c in insert_cols)
    lines.append(
        f"WHEN NOT MATCHED{insert_when} THEN INSERT ({col_list}) VALUES ({value_list})"
    )
    return "\n".join(lines)
