"""Iceberg type-surface edges (r10): uuid columns read as the
canonical lowercase string (the Spark connector's own mapping — Spark
has no UUID type), from the spec's fixed[16] parquet storage; time /
timestamp_ns keep their honest fences (no lossless Spark target)."""

import json
import os
import uuid as uuid_mod

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from arcane_framework_scala_spark.sinks.merge_sink import (
    SnapshotParquetTarget,
)
from arcane_framework_scala_spark.sources import iceberg_reader as ir


def _uuid_table(spark, tmp_path):
    vals = [uuid_mod.UUID(int=i * 2654435761 + 17) for i in range(8)]
    t = SnapshotParquetTarget(spark, str(tmp_path / "pub"))
    t.overwrite(
        spark.createDataFrame(
            [(i, v.bytes) for i, v in enumerate(vals)], "k long, u binary"
        )
    )
    out = str(tmp_path / "ice")
    assert ir.export_iceberg(t, out) == 1
    # restamp the data files as the spec's fixed[16] physical storage
    data = os.path.join(out, "data")
    for name in os.listdir(data):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(data, name)
        tab = pq.read_table(p)
        fields = [
            pa.field("k", pa.int64()),
            pa.field("u", pa.binary(16)),
        ]
        tab = tab.cast(pa.schema(fields))
        os.remove(p)  # exporter hard-links; never write through inode
        pq.write_table(tab, p)
    mf = ir.table_metadata_file(out)
    meta = json.load(open(mf))
    for f in meta["schemas"][0]["fields"]:
        if f["name"] == "u":
            f["type"] = "uuid"
    json.dump(meta, open(mf, "w"))
    return out, vals


def test_uuid_column_reads_as_canonical_string(spark, tmp_path):
    out, vals = _uuid_table(spark, tmp_path)
    got = ir.read_iceberg(spark, out)
    assert dict(got.dtypes)["u"] == "string"
    rows = {(r["k"], r["u"]) for r in got.collect()}
    assert rows == {(i, str(v)) for i, v in enumerate(vals)}


def test_uuid_composes_with_position_deletes(spark, tmp_path):
    from arcane_framework_scala_spark.sources import iceberg_mor as im

    out, vals = _uuid_table(spark, tmp_path)
    assert (
        im.commit_position_deletes(spark, out, f"u = '{vals[3]}'") == 2
    )
    rows = {(r["k"], r["u"]) for r in ir.read_iceberg(spark, out).collect()}
    assert rows == {
        (i, str(v)) for i, v in enumerate(vals) if i != 3
    }


def test_time_and_timestamp_ns_still_fence():
    with pytest.raises(ir.IcebergError, match="unsupported Iceberg type"):
        ir._spark_type("time")
    with pytest.raises(ir.IcebergError, match="unsupported Iceberg type"):
        ir._spark_type("timestamp_ns")
