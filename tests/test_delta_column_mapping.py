"""Delta column mapping: NAME mode (r9 — physical parquet names from
delta.columnMapping.physicalName metadata, nested structs rebuilt
recursively since r10), ID mode (r10 — per-file parquet footer
field-id resolution with physicalName fallback), both composed with
partitions and deletion vectors; mapped structs inside arrays/maps
still raise."""

import json
import os

import pyarrow.parquet as pq
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
    # purge on a NAME-mapped table rewrites under PHYSICAL names (r10)
    v = dmx.purge_deletion_vectors(spark, t)
    assert v == 2
    live, _ = dr._replay_full(t, None, spark)
    assert not any(a.get("deletionVector") for a in live.values())
    rows2 = {
        (r.uid, r.bucketed, r.part)
        for r in dr.read_delta(spark, t).collect()
    }
    assert rows2 == rows
    # the rewritten files carry PHYSICAL column names (a logical-name
    # file would be unreadable to the original writer)
    import pyarrow.parquet as pq

    purged = [
        rel for rel in live if os.path.basename(rel).startswith("purge-")
    ]
    assert purged
    for rel in purged:
        names = set(pq.read_schema(os.path.join(t, rel)).names)
        assert names == {"col-aaa", "col-bbb"}  # col-ppp is the hive dir
    # purge on an ID-mapped table rewrites with FIELD IDS stamped into
    # the new footers (r10) — id-mode resolution reads them back like
    # any Databricks-written file
    t_id = _id_table(spark, tmp_path)
    assert dv.delete_where(spark, t_id, "user_id = 1") == 1
    assert dmx.purge_deletion_vectors(spark, t_id) == 2
    live_id, _ = dr._replay_full(t_id, None, spark)
    assert not any(a.get("deletionVector") for a in live_id.values())
    rows_id = {
        (r.user_id, r.val, r.score)
        for r in dr.read_delta(spark, t_id).collect()
    }
    assert rows_id == {r for r in _expected_id_rows() if r[0] != 1}
    purged_id = [
        rel
        for rel in live_id
        if os.path.basename(rel).startswith("purge-")
    ]
    assert purged_id
    for rel in purged_id:
        s = pq.read_schema(os.path.join(t_id, rel))
        got_ids = {
            s.field(i).name: (s.field(i).metadata or {}).get(
                b"PARQUET:field_id"
            )
            for i in range(len(s.names))
        }
        assert got_ids == {"uid": b"1", "val": b"2", "col-score": b"3"}


def test_id_mode_physicalname_fallback_reads(spark, tmp_path):
    """ID mode over files WITHOUT footer field ids (written before the
    mapping upgrade, when physicalName was assigned = the then-current
    name): resolution falls back to physicalName and reads correctly."""
    t = _mapped_table(spark, tmp_path, mode="id")
    got = dr.read_delta(spark, t)
    rows = {(r.uid, r.bucketed, r.part) for r in got.collect()}
    assert rows == {(i, i % 5, i % 2) for i in range(60)}


def _write_pa(path, cols, ids=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(cols)
    if ids:
        t = t.cast(
            pa.schema(
                [
                    pa.field(
                        f.name,
                        f.type,
                        metadata={
                            b"PARQUET:field_id": str(ids[f.name]).encode()
                        },
                    )
                    for f in t.schema
                ]
            )
        )
    pq.write_table(t, path)


def _id_table(spark, tmp_path):
    """An upgraded-then-renamed ID-mapped table with three file shapes:
    A pre-upgrade (no footer ids, physicalName-named columns), B
    post-rename (ids, a new column), C adversarial (column NAMES
    swapped relative to their ids — only id-resolution reads it
    right)."""
    table = str(tmp_path / "idmapped")
    os.makedirs(table, exist_ok=True)
    _write_pa(
        os.path.join(table, "a.parquet"),
        {"uid": list(range(5)), "val": [i + 10 for i in range(5)]},
    )
    _write_pa(
        os.path.join(table, "b.parquet"),
        {"uid": [5, 6], "val": [15, 16], "col-score": [0.5, 0.6]},
        ids={"uid": 1, "val": 2, "col-score": 3},
    )
    # names swapped vs physicalName; field ids carry the truth
    _write_pa(
        os.path.join(table, "c.parquet"),
        {"val": [7, 8], "uid": [17, 18]},
        ids={"val": 1, "uid": 2},
    )
    fields = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "user_id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "uid",
                    },
                },
                {
                    "name": "val",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "val",
                    },
                },
                {
                    "name": "score",
                    "type": "double",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 3,
                        "delta.columnMapping.physicalName": "col-score",
                    },
                },
            ],
        }
    )
    adds = [
        {
            "add": {
                "path": n,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(table, n)),
                "modificationTime": 0,
                "dataChange": True,
            }
        }
        for n in ("a.parquet", "b.parquet", "c.parquet")
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
                    "schemaString": fields,
                    "partitionColumns": [],
                    "configuration": {"delta.columnMapping.mode": "id"},
                }
            },
        ]
        + adds,
    )
    return table


def _expected_id_rows():
    rows = {(i, i + 10, None) for i in range(5)}
    rows |= {(5, 15, 0.5), (6, 16, 0.6)}
    rows |= {(7, 17, None), (8, 18, None)}
    return rows


def test_id_mode_resolves_by_footer_field_id(spark, tmp_path):
    t = _id_table(spark, tmp_path)
    got = dr.read_delta(spark, t)
    assert [f.name for f in got.schema.fields] == ["user_id", "val", "score"]
    rows = {(r.user_id, r.val, r.score) for r in got.collect()}
    assert rows == _expected_id_rows()


def test_id_mode_composes_with_deletion_vectors(spark, tmp_path):
    t = _id_table(spark, tmp_path)
    # logical predicate; touches all three resolution groups
    assert dv.delete_where(spark, t, "user_id % 2 = 0") == 1
    rows = {
        (r.user_id, r.val, r.score)
        for r in dr.read_delta(spark, t).collect()
    }
    assert rows == {r for r in _expected_id_rows() if r[0] % 2 == 1}
    # second delete on the already-DV'd id table (superset rule rides
    # the same per-group lineage machinery)
    assert dv.delete_where(spark, t, "val = 15") == 2
    rows = {
        (r.user_id, r.val, r.score)
        for r in dr.read_delta(spark, t).collect()
    }
    assert rows == {
        r for r in _expected_id_rows() if r[0] % 2 == 1 and r[1] != 15
    }


def test_missing_physical_raises(spark, tmp_path):
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


def _nested_mapped_table(spark, tmp_path):
    """NAME-mode mapping over a NESTED struct: physical names at every
    level (col-*), logical names only in the log schema. One row
    carries a NULL struct — the rebuild must preserve it (a bare
    F.struct would resurrect it as a struct of nulls)."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    table = str(tmp_path / "nested")
    os.makedirs(table, exist_ok=True)
    phys_schema = StructType(
        [
            StructField("col-k", LongType()),
            StructField(
                "col-top",
                StructType(
                    [
                        StructField("col-a", LongType()),
                        StructField(
                            "col-in",
                            StructType(
                                [StructField("col-b", StringType())]
                            ),
                        ),
                    ]
                ),
            ),
        ]
    )
    rows = [(i, (i * 2, (f"s{i}",))) for i in range(5)] + [(5, None)]
    df = spark.createDataFrame(rows, phys_schema)
    stage = os.path.join(table, ".stage")
    df.coalesce(1).write.parquet(stage)
    adds = []
    for n in sorted(os.listdir(stage)):
        if n.endswith(".parquet"):
            os.replace(os.path.join(stage, n), os.path.join(table, n))
            adds.append(
                {
                    "add": {
                        "path": n,
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(table, n)),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )

    def fld(name, typ, ph, fid):
        return {
            "name": name,
            "type": typ,
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": fid,
                "delta.columnMapping.physicalName": ph,
            },
        }

    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                fld("k", "long", "col-k", 1),
                fld(
                    "top",
                    {
                        "type": "struct",
                        "fields": [
                            fld("a", "long", "col-a", 3),
                            fld(
                                "inner",
                                {
                                    "type": "struct",
                                    "fields": [
                                        fld("b", "string", "col-b", 5)
                                    ],
                                },
                                "col-in",
                                4,
                            ),
                        ],
                    },
                    "col-top",
                    2,
                ),
            ],
        }
    )
    _commit(
        table,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "m",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_str,
                    "partitionColumns": [],
                    "configuration": {"delta.columnMapping.mode": "name"},
                }
            },
        ]
        + adds,
    )
    return table


def test_nested_struct_name_mapping_reads_logical(spark, tmp_path):
    t = _nested_mapped_table(spark, tmp_path)
    got = dr.read_delta(spark, t)
    assert got.schema.simpleString() == (
        "struct<k:bigint,top:struct<a:bigint,inner:struct<b:string>>>"
    )
    rows = {
        (
            r["k"],
            None
            if r["top"] is None
            else (r["top"]["a"], r["top"]["inner"]["b"]),
        )
        for r in got.collect()
    }
    assert rows == {(i, (i * 2, f"s{i}")) for i in range(5)} | {(5, None)}


def test_nested_struct_mapping_composes_with_dvs(spark, tmp_path):
    t = _nested_mapped_table(spark, tmp_path)
    # predicate in fully LOGICAL nested names
    assert dv.delete_where(spark, t, "top.a = 4") == 1
    got = {
        r["k"] for r in dr.read_delta(spark, t).collect()
    }
    assert got == {0, 1, 3, 4, 5}


def test_struct_inside_array_now_reads(spark, tmp_path):
    """r10: arrays of mapped structs rebuild through transform lambdas
    (physical inner names -> logical), null elements preserved."""
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    table = str(tmp_path / "arrmap")
    os.makedirs(table, exist_ok=True)
    phys = StructType(
        [
            StructField("col-k", LongType()),
            StructField(
                "col-xs",
                ArrayType(
                    StructType(
                        [
                            StructField("col-a", LongType()),
                            StructField("col-b", StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
    rows = [
        (0, [(1, "x"), (2, "y")]),
        (1, [None, (3, "z")]),
        (2, None),
    ]
    df = spark.createDataFrame(rows, phys)
    stage = os.path.join(table, ".stage")
    df.coalesce(1).write.parquet(stage)
    adds = []
    for n in sorted(os.listdir(stage)):
        if n.endswith(".parquet"):
            os.replace(os.path.join(stage, n), os.path.join(table, n))
            adds.append(
                {
                    "add": {
                        "path": n,
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(table, n)),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )

    def fld(name, typ, ph, fid):
        return {
            "name": name,
            "type": typ,
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": fid,
                "delta.columnMapping.physicalName": ph,
            },
        }

    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                fld("k", "long", "col-k", 1),
                fld(
                    "xs",
                    {
                        "type": "array",
                        "elementType": {
                            "type": "struct",
                            "fields": [
                                fld("a", "long", "col-a", 3),
                                fld("b", "string", "col-b", 4),
                            ],
                        },
                        "containsNull": True,
                    },
                    "col-xs",
                    2,
                ),
            ],
        }
    )
    _commit(
        table,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "m",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_str,
                    "partitionColumns": [],
                    "configuration": {"delta.columnMapping.mode": "name"},
                }
            },
        ]
        + adds,
    )
    got = dr.read_delta(spark, table)
    assert got.schema.simpleString() == (
        "struct<k:bigint,xs:array<struct<a:bigint,b:string>>>"
    )
    out = {
        r["k"]: (
            None
            if r["xs"] is None
            else tuple(
                None if e is None else (e["a"], e["b"]) for e in r["xs"]
            )
        )
        for r in got.collect()
    }
    assert out == {
        0: ((1, "x"), (2, "y")),
        1: (None, (3, "z")),
        2: None,
    }


def test_struct_map_keys_still_raise(spark, tmp_path):
    t = str(tmp_path / "mapkey")
    os.makedirs(t, exist_ok=True)
    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "xs",
                    "type": {
                        "type": "map",
                        "keyType": {
                            "type": "struct",
                            "fields": [
                                {
                                    "name": "a",
                                    "type": "long",
                                    "nullable": True,
                                    "metadata": {
                                        "delta.columnMapping.id": 2,
                                        "delta.columnMapping.physicalName": "col-a",
                                    },
                                }
                            ],
                        },
                        "valueType": "long",
                        "valueContainsNull": True,
                    },
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-xs",
                    },
                }
            ],
        }
    )
    _commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "m",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_str,
                    "partitionColumns": [],
                    "configuration": {"delta.columnMapping.mode": "name"},
                }
            },
            {"add": {"path": "f.parquet", "dataChange": True}},
        ],
    )
    with pytest.raises(ValueError, match="MAP KEYS"):
        dr.read_delta(spark, t)


def test_id_mode_missing_id_nullfills_never_binds_physicalname(
    spark, tmp_path
):
    """r11 (ADVICE r10): a footer that CARRIES field ids but lacks a
    mapped field's id means the column post-dates (or was rewritten
    away from) the file — it must null-fill. Falling back to
    physicalName would silently bind a column with that physical name
    owned by a DROPPED field id (the duplicate-source guard can't see
    it because the rightful owner is gone from the current schema)."""
    t = _id_table(spark, tmp_path)
    # d.parquet: ids present; carries a column NAMED 'col-score' that
    # belongs to dropped field id 9 — NOT current 'score' (id 3)
    _write_pa(
        os.path.join(t, "d.parquet"),
        {"uid": [100], "val": [200], "col-score": [99.5]},
        ids={"uid": 1, "val": 2, "col-score": 9},
    )
    _commit(
        t,
        1,
        [
            {
                "add": {
                    "path": "d.parquet",
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(t, "d.parquet")),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        ],
    )
    got = dr.read_delta(spark, t)
    rows = {(r.user_id, r.val, r.score) for r in got.collect()}
    # the stale 99.5 must NOT surface as 'score'
    assert rows == _expected_id_rows() | {(100, 200, None)}


def _write_typed(path, cols):
    """cols: {name: (values, pa_type)} — explicit physical types, with
    optional per-column field ids via a 3-tuple (values, type, id)."""
    import pyarrow as pa

    fields, arrays = [], []
    for name, spec in cols.items():
        vals, typ = spec[0], spec[1]
        md = None
        if len(spec) > 2:
            md = {b"PARQUET:field_id": str(spec[2]).encode()}
        fields.append(pa.field(name, typ, metadata=md))
        arrays.append(pa.array(vals, type=typ))
    pq.write_table(pa.table(arrays, schema=pa.schema(fields)), path)


def _widened_name_table(spark, tmp_path):
    """NAME-mapped table whose old file stores int32 under the
    physical names while the current (renamed) schema says long with
    delta.typeChanges — the r10 fence pairing."""
    import pyarrow as pa

    table = str(tmp_path / "wname")
    os.makedirs(table, exist_ok=True)
    _write_typed(
        os.path.join(table, "old.parquet"),
        {
            "col-u": ([0, 1, 2], pa.int32()),
            "col-v": ([10, 11, 12], pa.int32()),
        },
    )
    _write_typed(
        os.path.join(table, "new.parquet"),
        {
            "col-u": ([3, 4], pa.int64()),
            "col-v": ([13, 14], pa.int64()),
        },
    )
    fields = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "user_id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-u",
                        "delta.typeChanges": [
                            {"fromType": "integer", "toType": "long"}
                        ],
                    },
                },
                {
                    "name": "val",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col-v",
                        "delta.typeChanges": [
                            {"fromType": "integer", "toType": "long"}
                        ],
                    },
                },
            ],
        }
    )
    adds = [
        {
            "add": {
                "path": n,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(table, n)),
                "modificationTime": 0,
                "dataChange": True,
            }
        }
        for n in ("old.parquet", "new.parquet")
    ]
    _commit(
        table,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["typeWidening", "columnMapping"],
                    "writerFeatures": ["typeWidening", "columnMapping"],
                }
            },
            {
                "metaData": {
                    "id": "wn",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": fields,
                    "partitionColumns": [],
                    "configuration": {"delta.columnMapping.mode": "name"},
                }
            },
        ]
        + adds,
    )
    return table


def test_widening_composes_with_name_mapping(spark, tmp_path):
    """r11 (VERDICT r10 item 3): the last fenced Delta pairing — a
    widened NAME-mapped table reads logical names at the widened types
    across both file generations, and deletion vectors compose on
    top (the lineage path rides the same per-group plans)."""
    t = _widened_name_table(spark, tmp_path)
    got = dr.read_delta(spark, t)
    assert [f.name for f in got.schema.fields] == ["user_id", "val"]
    assert dict(got.dtypes) == {"user_id": "bigint", "val": "bigint"}
    assert {(r.user_id, r.val) for r in got.collect()} == {
        (0, 10), (1, 11), (2, 12), (3, 13), (4, 14),
    }
    # DV compose: logical predicate spans both narrow-type groups
    assert dv.delete_where(spark, t, "user_id % 2 = 0") == 1
    rows = {(r.user_id, r.val) for r in dr.read_delta(spark, t).collect()}
    assert rows == {(1, 11), (3, 13)}


def test_widening_composes_with_id_mapping(spark, tmp_path):
    """r11: widened ID-mapped table — an old file with footer field
    ids, SWAPPED column names AND narrow types resolves by id and
    upcasts; a current-width file unifies; DVs compose on top."""
    import pyarrow as pa

    t = str(tmp_path / "wid")
    os.makedirs(t, exist_ok=True)
    # names swapped relative to physicalName; ids carry the truth;
    # types narrower than the current schema
    _write_typed(
        os.path.join(t, "old.parquet"),
        {
            "val": ([0, 1, 2], pa.int32(), 1),   # actually user_id (id 1)
            "uid": ([20, 21, 22], pa.int32(), 2),  # actually val (id 2)
        },
    )
    _write_typed(
        os.path.join(t, "new.parquet"),
        {
            "uid": ([3, 4], pa.int64(), 1),
            "val": ([23, 24], pa.int64(), 2),
        },
    )
    fields = _schema_string(
        [("user_id", "uid", "long"), ("val", "val", "long")]
    )
    # stamp typeChanges on both fields
    parsed = json.loads(fields)
    for f in parsed["fields"]:
        f["metadata"]["delta.typeChanges"] = [
            {"fromType": "integer", "toType": "long"}
        ]
    fields = json.dumps(parsed)
    adds = [
        {
            "add": {
                "path": n,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(t, n)),
                "modificationTime": 0,
                "dataChange": True,
            }
        }
        for n in ("old.parquet", "new.parquet")
    ]
    _commit(
        t,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["typeWidening", "columnMapping"],
                    "writerFeatures": ["typeWidening", "columnMapping"],
                }
            },
            {
                "metaData": {
                    "id": "wi",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": fields,
                    "partitionColumns": [],
                    "configuration": {"delta.columnMapping.mode": "id"},
                }
            },
        ]
        + adds,
    )
    got = dr.read_delta(spark, t)
    assert dict(got.dtypes) == {"user_id": "bigint", "val": "bigint"}
    assert {(r.user_id, r.val) for r in got.collect()} == {
        (0, 20), (1, 21), (2, 22), (3, 23), (4, 24),
    }
    # illegal: a file storing WIDER than the schema under its id
    assert dv.delete_where(spark, t, "val >= 23") == 1
    rows = {(r.user_id, r.val) for r in dr.read_delta(spark, t).collect()}
    assert rows == {(0, 20), (1, 21), (2, 22)}
