"""Dynamic engine schema with merge-key metadata and case-insensitive diff.

Re-expresses the reference's ``ArcaneSchema``
(``models/schemas/ArcaneSchema.scala:92-157``): an ordered field list that

- carries the distinguished merge-key field ``ARCANE_MERGE_KEY`` (string,
  required for any mergeable schema — ``ArcaneSchema.scala:82-88,114-123``),
- can strip engine metadata fields (``pure``),
- diffs against a source schema case-insensitively to drive schema migration
  (``getMissingFields``, ``ArcaneSchema.scala:151-157``).

In the Spark build a schema converts to/from ``StructType``; schema
migration becomes ``ALTER TABLE ADD COLUMN`` / merge-schema on write.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.types as T

from arcane_framework_scala_spark.schema.types import (
    ArcaneType,
    STRING,
    from_spark_type,
    to_spark_type,
    type_equals,
)

#: The distinguished merge-key column (reference MergeKeyField).
MERGE_KEY_COLUMN = "ARCANE_MERGE_KEY"
#: Version columns used by the three CDC dialects.
MSSQL_VERSION_COLUMN = "SYS_CHANGE_VERSION"
MSSQL_OPERATION_COLUMN = "SYS_CHANGE_OPERATION"
SYNAPSE_VERSION_COLUMN = "versionnumber"
SYNAPSE_DELETE_COLUMN = "IsDelete"
BLOB_VERSION_COLUMN = "createdon"

#: Engine metadata fields stripped by ``pure`` (reference ArcaneSchema.pure).
_METADATA_FIELDS = {MERGE_KEY_COLUMN.lower()}


@dataclass(frozen=True)
class ArcaneField:
    name: str
    field_type: ArcaneType
    # Optional stable field id carried from indexed sources (Iceberg ids).
    field_id: int | None = None

    def identical(self, other: "ArcaneField") -> bool:
        """Case-insensitive, id-insensitive equality (reference `identical`)."""
        return self.name.lower() == other.name.lower() and type_equals(
            self.field_type, other.field_type
        )


def merge_key_field() -> ArcaneField:
    return ArcaneField(MERGE_KEY_COLUMN, STRING)


@dataclass(frozen=True)
class ArcaneSchema:
    fields: tuple[ArcaneField, ...]

    # -- construction ------------------------------------------------------
    @staticmethod
    def of(*fields: ArcaneField) -> "ArcaneSchema":
        return ArcaneSchema(tuple(fields))

    @staticmethod
    def from_spark(st: T.StructType) -> "ArcaneSchema":
        return ArcaneSchema(
            tuple(ArcaneField(f.name, from_spark_type(f.dataType)) for f in st.fields)
        )

    def to_spark(self) -> T.StructType:
        # All fields nullable: the reference creates every Iceberg field
        # `optional` (SchemaConversions.scala:56,81).
        return T.StructType(
            [T.StructField(f.name, to_spark_type(f.field_type), True) for f in self.fields]
        )

    # -- accessors ---------------------------------------------------------
    @property
    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    @property
    def merge_key(self) -> ArcaneField:
        for f in self.fields:
            if f.name.lower() == MERGE_KEY_COLUMN.lower():
                return f
        raise ValueError(
            f"schema is not mergeable: no {MERGE_KEY_COLUMN} field in {self.names}"
        )

    @property
    def is_mergeable(self) -> bool:
        return any(f.name.lower() == MERGE_KEY_COLUMN.lower() for f in self.fields)

    def pure(self) -> "ArcaneSchema":
        """Strip engine metadata fields."""
        return ArcaneSchema(
            tuple(f for f in self.fields if f.name.lower() not in _METADATA_FIELDS)
        )

    # -- migration ---------------------------------------------------------
    def missing_fields(self, source: "ArcaneSchema") -> list[ArcaneField]:
        """Fields present in ``source`` but not in self (case-insensitive).

        This diff drives schema migration: each missing field becomes an
        ``ADD COLUMN`` on the target (reference ``getMissingFields``).
        """
        return [
            sf
            for sf in source.fields
            if not any(sf.identical(tf) for tf in self.fields)
        ]

    def merged_with(self, source: "ArcaneSchema") -> "ArcaneSchema":
        return ArcaneSchema(self.fields + tuple(self.missing_fields(source)))
