"""Blob source tests: S9 JSON (root pointer + array explode), S10 CSV,
and the T2 table-property watermark store (production progress path)."""

import json

import pytest

from arcane_framework_scala_spark.sources.blob import BlobCsvSource, BlobJsonSource
from arcane_framework_scala_spark.streaming.watermark import (
    TablePropertyWatermarkStore,
    Watermark,
)


def test_json_source_plain(spark, tmp_path):
    src = tmp_path / "json"
    src.mkdir()
    (src / "a.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [{"id": 1, "name": "x"}, {"id": 2, "name": "y"}]
        )
    )
    source = BlobJsonSource(
        spark=spark,
        path=str(src),
        primary_keys=["id"],
        schema="id long, name string",
    )
    batches = list(source.changes(None))
    assert len(batches) == 1
    rows = {r["id"]: r for r in batches[0].df.collect()}
    assert rows[1]["name"] == "x"
    assert rows[1]["ARCANE_MERGE_KEY"] is not None
    assert rows[1]["createdon"] > 0


def test_json_source_root_pointer_and_explode(spark, tmp_path):
    """S9: relocate the record root (JSON pointer) and explode a nested
    array with field renaming (JsonScanner.scala:20-163 semantics)."""
    src = tmp_path / "json2"
    src.mkdir()
    payload = {
        "payload": {
            "after": {
                "id": 7,
                "items": [
                    {"sku": "a", "qty": 1},
                    {"sku": "b", "qty": 2},
                ],
            }
        }
    }
    (src / "x.jsonl").write_text(json.dumps(payload))
    source = BlobJsonSource(
        spark=spark,
        path=str(src),
        primary_keys=["id"],
        schema=(
            "payload struct<after: struct<id: long, "
            "items: array<struct<sku: string, qty: long>>>>"
        ),
        root_pointer="payload.after",
        array_pointer=("items", "item_"),
    )
    batches = list(source.changes(None))
    rows = sorted(batches[0].df.collect(), key=lambda r: r["item_sku"])
    assert [r["item_sku"] for r in rows] == ["a", "b"]
    assert rows[0]["id"] == 7 and rows[0]["item_qty"] == 1
    assert rows[0]["ARCANE_MERGE_KEY"] == rows[1]["ARCANE_MERGE_KEY"]


def test_csv_source(spark, tmp_path):
    src = tmp_path / "csv"
    src.mkdir()
    (src / "f.csv").write_text('id,note\n1,"hello, quoted"\n2,plain\n')
    source = BlobCsvSource(
        spark=spark, path=str(src), primary_keys=["id"], header=True
    )
    rows = {r["id"]: r for r in next(iter(source.changes(None))).df.collect()}
    assert rows["1"]["note"] == "hello, quoted"


def test_table_property_watermark_roundtrip(spark, tmp_path):
    """T2 production path: watermark JSON in the target table's `comment`
    property, byte-parity with the reference's progress store."""
    spark.sql("DROP TABLE IF EXISTS wm_target")
    spark.sql("CREATE TABLE wm_target (k string, v long) USING parquet")
    spark.sql("INSERT INTO wm_target VALUES ('a', 1)")
    try:
        store = TablePropertyWatermarkStore(spark=spark, table="wm_target")
        assert store.read() is None
        wm = Watermark.now(version="12345", prefix="2025-09-01T00.00.00Z/")
        store.commit(wm)
        got = store.read()
        assert got is not None
        assert got.version == "12345"
        assert got.prefix == "2025-09-01T00.00.00Z/"
        # overwrite advances in place
        store.commit(Watermark.now(version="12346"))
        assert store.read().version == "12346"
    finally:
        spark.sql("DROP TABLE IF EXISTS wm_target")
