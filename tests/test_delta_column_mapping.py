"""Delta NAME-mode column mapping (r9): physical parquet names resolved
from delta.columnMapping.physicalName field metadata, composed with
partitions and deletion vectors; ID mode and nested mapped types still
raise."""

import json
import os

import pyspark.sql.functions as F
import pytest

from arcane_framework_scala_spark.sources import delta_dv as dv
from arcane_framework_scala_spark.sources import delta_maintenance as dmx
from arcane_framework_scala_spark.sources import delta_reader as dr


def _schema_string(mode_fields):
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": lg,
                    "type": t,
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": i + 1,
                        "delta.columnMapping.physicalName": ph,
                    },
                }
                for i, (lg, ph, t) in enumerate(mode_fields)
            ],
        }
    )


def _commit(table, v, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{v:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _mapped_table(spark, tmp_path, mode="name", partitioned=True):
    """A hand-built column-mapped table: files + partition dirs carry
    PHYSICAL names (col-xxx), the log schema carries the logical ones."""
    table = str(tmp_path / "mapped")
    os.makedirs(table, exist_ok=True)
    df = spark.range(60).select(
        F.col("id").alias("col-aaa"),
        (F.col("id") % 5).alias("col-bbb"),
        (F.col("id") % 2).alias("col-ppp"),
    )
    stage = os.path.join(table, ".stage")
    if partitioned:
        df.write.partitionBy("col-ppp").parquet(stage)
    else:
        df.write.parquet(stage)
    adds = []
    for root, _dirs, files in os.walk(stage):
        for n in sorted(files):
            if not n.endswith(".parquet"):
                continue
            rel_dir = os.path.relpath(root, stage)
            rel = os.path.join(rel_dir, n) if rel_dir != "." else n
            dst = os.path.join(table, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(os.path.join(root, n), dst)
            pv = {}
            if rel_dir != ".":
                k, _, val = rel_dir.partition("=")
                pv[k] = val
            adds.append(
                {
                    "add": {
                        "path": rel.replace(os.sep, "/"),
                        "partitionValues": pv,
                        "size": os.path.getsize(dst),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
    fields = [
        ("uid", "col-aaa", "long"),
        ("bucketed", "col-bbb", "long"),
        ("part", "col-ppp", "long"),
    ]
    _commit(
        table,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "m",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _schema_string(fields),
                    "partitionColumns": ["part"] if partitioned else [],
                    "configuration": {"delta.columnMapping.mode": mode},
                }
            },
        ]
        + adds,
    )
    return table


def test_name_mapping_reads_logical_columns(spark, tmp_path):
    t = _mapped_table(spark, tmp_path)
    got = dr.read_delta(spark, t)
    assert sorted(got.columns) == ["bucketed", "part", "uid"]
    rows = {(r.uid, r.bucketed, r.part) for r in got.collect()}
    assert rows == {(i, i % 5, i % 2) for i in range(60)}
    # logical schema from the log
    assert [f.name for f in dr.table_schema(t).fields] == [
        "uid", "bucketed", "part",
    ]


def test_name_mapping_with_deletion_vectors(spark, tmp_path):
    t = _mapped_table(spark, tmp_path)
    # the predicate speaks LOGICAL names
    assert dv.delete_where(spark, t, "bucketed = 2 AND part = 0") == 1
    # the protocol upgrade must CARRY the legacy reader-v2 columnMapping
    # requirement forward — dropping it leaves a spec-invalid table
    # (mapping mode set but the protocol no longer declaring it)
    proto = next(
        json.loads(ln)["protocol"]
        for ln in open(
            os.path.join(t, "_delta_log", f"{1:020d}.json")
        ).read().splitlines()
        if '"protocol"' in ln
    )
    assert "columnMapping" in proto["readerFeatures"]
    assert "deletionVectors" in proto["readerFeatures"]
    assert "columnMapping" in proto["writerFeatures"]
    rows = {(r.uid, r.bucketed, r.part) for r in dr.read_delta(spark, t).collect()}
    assert rows == {
        (i, i % 5, i % 2)
        for i in range(60)
        if not (i % 5 == 2 and i % 2 == 0)
    }
    # purge on a mapped table is fenced (rewritten files would need
    # physical names)
    with pytest.raises(ValueError, match="column-mapped"):
        dmx.purge_deletion_vectors(spark, t)


def test_id_mode_and_missing_physical_raise(spark, tmp_path):
    t = _mapped_table(spark, tmp_path, mode="id")
    with pytest.raises(ValueError, match="field-id"):
        dr.read_delta(spark, t)
    # name mode but a field without physicalName
    t2 = str(tmp_path / "bad")
    os.makedirs(t2, exist_ok=True)
    _commit(
        t2,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "m",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(
                        {
                            "type": "struct",
                            "fields": [
                                {
                                    "name": "x",
                                    "type": "long",
                                    "nullable": True,
                                    "metadata": {},
                                }
                            ],
                        }
                    ),
                    "partitionColumns": [],
                    "configuration": {
                        "delta.columnMapping.mode": "name"
                    },
                }
            },
            {"add": {"path": "f.parquet", "dataChange": True}},
        ],
    )
    with pytest.raises(ValueError, match="physicalName"):
        dr.read_delta(spark, t2)
