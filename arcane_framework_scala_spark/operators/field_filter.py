"""Column projection rules (P1/P2).

Reference: ``services/filters/FieldsFilteringService.scala:27-47`` applies an
include-list or exclude-list to every row and schema; essential engine fields
(the merge key, version/operation columns) may never be excluded, and primary
keys may never be excluded server-side
(``services/filters/ColumnSummaryFieldsFilteringService.scala:23-60``).

In Spark this is a plain ``select``/``drop`` — Catalyst then prunes the scan
(column pruning reaches the parquet/JDBC reader for free).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from arcane_framework_scala_spark.schema.schema import (
    MERGE_KEY_COLUMN,
    MSSQL_OPERATION_COLUMN,
    MSSQL_VERSION_COLUMN,
    SYNAPSE_DELETE_COLUMN,
    SYNAPSE_VERSION_COLUMN,
    BLOB_VERSION_COLUMN,
)

#: Engine bookkeeping fields that survive any projection rule.
ESSENTIAL_FIELDS = {
    MERGE_KEY_COLUMN.lower(),
    MSSQL_VERSION_COLUMN.lower(),
    MSSQL_OPERATION_COLUMN.lower(),
    SYNAPSE_VERSION_COLUMN.lower(),
    SYNAPSE_DELETE_COLUMN.lower(),
    BLOB_VERSION_COLUMN.lower(),
}


@dataclass(frozen=True)
class FieldSelectionRule:
    """``mode`` is ``"all"``, ``"include"`` or ``"exclude"``; matching is
    case-insensitive. ``is_server_side`` marks rules pushed into the source
    query's column list (P2) rather than applied post-read."""

    mode: str = "all"
    fields: frozenset[str] = field(default_factory=frozenset)
    is_server_side: bool = False

    def __post_init__(self):
        if self.mode not in ("all", "include", "exclude"):
            raise ValueError(f"bad field-selection mode: {self.mode}")
        object.__setattr__(self, "fields", frozenset(f.lower() for f in self.fields))

    def keeps(self, column: str, protected: set[str] | None = None) -> bool:
        c = column.lower()
        if c in ESSENTIAL_FIELDS or c in (protected or set()):
            return True
        if self.mode == "all":
            return True
        if self.mode == "include":
            return c in self.fields
        return c not in self.fields


def apply_field_selection(
    df: DataFrame,
    rule: FieldSelectionRule,
    protected: set[str] | None = None,
) -> DataFrame:
    """Project the DataFrame per the rule; essential/protected columns always
    survive. ``protected`` carries source primary keys (never excludable)."""
    protected_l = {p.lower() for p in (protected or set())}
    kept = [c for c in df.columns if rule.keeps(c, protected_l)]
    if not kept:
        raise ValueError("field selection rule removes every column")
    return df.select(*kept)


def server_side_column_list(
    all_columns: list[str],
    rule: FieldSelectionRule,
    primary_keys: list[str],
) -> list[str]:
    """P2: the pruned column list embedded into the generated source SQL.
    Primary keys may never be excluded server-side."""
    pks = {p.lower() for p in primary_keys}
    return [c for c in all_columns if rule.keeps(c, pks)]
