"""Avro-schema → StructType adapter (S9 interop with the reference's
JsonScanner schema contract, ``JsonScanner.scala:20-163``)."""

import json

import pytest
import pyspark.sql.types as T

from arcane_framework_scala_spark.schema.avro_interop import (
    AvroSchemaError,
    avro_schema_to_struct,
)

REFERENCE_STYLE = {
    "type": "record",
    "name": "ChangeRecord",
    "fields": [
        {"name": "id", "type": ["null", "string"], "default": None},
        {"name": "version", "type": ["null", "long"], "default": None},
        {"name": "amount", "type": ["null", "double"], "default": None},
        {"name": "deleted", "type": ["null", "boolean"], "default": None},
    ],
}


def test_reference_style_schema_converts():
    st = avro_schema_to_struct(json.dumps(REFERENCE_STYLE))
    assert st == T.StructType(
        [
            T.StructField("id", T.StringType(), True),
            T.StructField("version", T.LongType(), True),
            T.StructField("amount", T.DoubleType(), True),
            T.StructField("deleted", T.BooleanType(), True),
        ]
    )


def test_null_first_contract_enforced():
    # reference requires null FIRST and a null default (JsonScanner.scala:83)
    avro_schema_to_struct(REFERENCE_STYLE, require_null_first_unions=True)

    bad_order = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "x", "type": ["string", "null"], "default": None}],
    }
    with pytest.raises(AvroSchemaError, match="null-FIRST"):
        avro_schema_to_struct(bad_order, require_null_first_unions=True)

    no_default = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "x", "type": ["null", "string"]}],
    }
    with pytest.raises(AvroSchemaError, match="default"):
        avro_schema_to_struct(no_default, require_null_first_unions=True)


def test_nested_and_logical_types():
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {
                "name": "price",
                "type": {
                    "type": "bytes", "logicalType": "decimal",
                    "precision": 20, "scale": 4,
                },
            },
            {"name": "tags", "type": {"type": "array", "items": ["null", "string"]}},
            {"name": "attrs", "type": {"type": "map", "values": "long"}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "Inner",
                    "fields": [{"name": "k", "type": "string"}],
                },
            },
        ],
    }
    st = avro_schema_to_struct(schema)
    assert st["ts"].dataType == T.TimestampType()
    assert st["d"].dataType == T.DateType()
    assert st["price"].dataType == T.DecimalType(20, 4)
    assert st["tags"].dataType == T.ArrayType(T.StringType(), True)
    assert st["attrs"].dataType == T.MapType(T.StringType(), T.LongType(), False)
    assert st["nested"].dataType == T.StructType(
        [T.StructField("k", T.StringType(), False)]
    )


def test_multi_type_union_rejected():
    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "x", "type": ["null", "string", "long"]}],
    }
    with pytest.raises(AvroSchemaError, match="unions"):
        avro_schema_to_struct(schema)


def test_blob_json_source_accepts_avro_schema(spark, tmp_path):
    from arcane_framework_scala_spark.sources.blob import BlobJsonSource

    rows = [
        {"id": "a", "version": 1, "amount": 1.5, "deleted": False},
        {"id": "b", "version": 2, "amount": None, "deleted": None},
    ]
    p = tmp_path / "data.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    src = BlobJsonSource(
        spark=spark,
        path=str(tmp_path),
        primary_keys=["id"],
        schema=json.dumps(REFERENCE_STYLE),
    )
    batches = list(src.changes(None))
    assert len(batches) == 1
    got = {r["id"]: r for r in batches[0].df.collect()}
    assert got["a"]["version"] == 1 and got["a"]["amount"] == 1.5
    assert got["b"]["amount"] is None
    assert "ARCANE_MERGE_KEY" in batches[0].df.columns
