"""Avro-schema → Spark StructType adapter (S9 interop).

The reference's JSON scanner is driven by a user-supplied Avro schema
(``services/iceberg/interop/JsonScanner.scala:20-163``) with a hard
contract: every top-level field must be a **null-first union** with a
``null`` default (the scanner throws otherwise, see the comment block at
JsonScanner.scala:70-83 about Avro's JSON union encoding). Spark's JSON
reader needs a StructType instead — this module converts reference-style
Avro schema strings so a user can move their existing schema definitions
over unchanged, and optionally enforces the same null-first contract the
reference enforces.

Spark-first note: only the *schema* is translated. The reference's
per-row Jackson wrapping/unwrapping of union values exists because Avro's
JSON decoder needs ``{"type": value}`` wrappers; Spark's JSON reader reads
plain JSON against the StructType directly, so that whole layer
disappears rather than being ported.
"""

from __future__ import annotations

import json

import pyspark.sql.types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}

#: Avro logicalType → Spark type (same mappings Spark's own avro module uses)
_LOGICAL: dict[str, T.DataType] = {
    "date": T.DateType(),
    "timestamp-millis": T.TimestampType(),
    "timestamp-micros": T.TimestampType(),
    "local-timestamp-millis": T.TimestampNTZType(),
    "local-timestamp-micros": T.TimestampNTZType(),
    "time-millis": T.LongType(),
    "time-micros": T.LongType(),
    "uuid": T.StringType(),
}


class AvroSchemaError(ValueError):
    pass


def _convert(avro) -> tuple[T.DataType, bool]:
    """(spark_type, nullable) for one Avro type node."""
    if isinstance(avro, str):
        if avro not in _PRIMITIVES:
            raise AvroSchemaError(f"unsupported Avro type {avro!r}")
        return _PRIMITIVES[avro], avro == "null"
    if isinstance(avro, list):  # union
        non_null = [t for t in avro if t != "null"]
        nullable = len(non_null) != len(avro)
        if len(non_null) != 1:
            raise AvroSchemaError(
                f"only unions of null and one type are supported, got {avro!r}"
            )
        dt, _ = _convert(non_null[0])
        return dt, nullable
    if not isinstance(avro, dict):
        raise AvroSchemaError(f"unrecognized Avro node {avro!r}")

    logical = avro.get("logicalType")
    if logical:
        if logical == "decimal":
            return (
                T.DecimalType(avro.get("precision", 38), avro.get("scale", 0)),
                False,
            )
        if logical in _LOGICAL:
            return _LOGICAL[logical], False
        # unknown logical type: fall through to the underlying type (the
        # same forward-compat posture as Avro itself)

    kind = avro.get("type")
    if kind == "record":
        return record_to_struct(avro), False
    if kind == "array":
        item_dt, item_null = _convert(avro["items"])
        return T.ArrayType(item_dt, containsNull=item_null), False
    if kind == "map":
        val_dt, val_null = _convert(avro["values"])
        return T.MapType(T.StringType(), val_dt, valueContainsNull=val_null), False
    if kind == "enum":
        return T.StringType(), False
    if kind == "fixed":
        return T.BinaryType(), False
    if isinstance(kind, (str, list, dict)):
        return _convert(kind)
    raise AvroSchemaError(f"unrecognized Avro node {avro!r}")


def record_to_struct(record: dict) -> T.StructType:
    fields = []
    for f in record.get("fields", []):
        dt, nullable = _convert(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


def avro_schema_to_struct(
    schema: str | dict,
    *,
    require_null_first_unions: bool = False,
) -> T.StructType:
    """Convert an Avro record schema (JSON string or parsed dict) to a
    Spark StructType.

    ``require_null_first_unions=True`` enforces the reference JsonScanner's
    contract — every top-level field a ``["null", T]`` union with a null
    default — so schemas that would be rejected there are rejected here
    too (useful when validating schemas meant to stay compatible with a
    running reference deployment)."""
    rec = json.loads(schema) if isinstance(schema, str) else schema
    if rec.get("type") != "record":
        raise AvroSchemaError(f"top-level Avro schema must be a record: {rec!r}")
    if require_null_first_unions:
        for f in rec.get("fields", []):
            t = f["type"]
            if not (isinstance(t, list) and t and t[0] == "null"):
                raise AvroSchemaError(
                    f"field {f['name']!r}: reference contract requires a "
                    f"null-FIRST union type, got {t!r}"
                )
            if "default" not in f or f["default"] is not None:
                raise AvroSchemaError(
                    f"field {f['name']!r}: reference contract requires "
                    "default: null (JsonScanner.scala:83)"
                )
    return record_to_struct(rec)
