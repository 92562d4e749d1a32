"""Protocol-level conformance of the Delta exporter (VERDICT r8 item 4):
the only consumer so far was this repo's own reader — a closed loop. No
connector jars exist in this container, so these tests pin the exported
JSON actions, checkpoint parquet schema and ``_last_checkpoint`` sidecar
FIELD BY FIELD against fixtures derived from the public Delta protocol
spec (delta.io PROTOCOL.md: Protocol Evolution, Change Metadata, Add
File and Remove File, Checkpoints), so any Delta-capable engine that
shows up later reads the export without surprises. When jars appear,
``tests/test_lakehouse_runtime.py`` does the real round-trip."""

import json
import os
import time

import pytest

from arcane_framework_scala_spark.sinks.merge_sink import (
    SnapshotParquetTarget,
)
from arcane_framework_scala_spark.sources import delta_reader as dr

#: exact action key sets per PROTOCOL.md (our exporter emits precisely
#: the required fields — nothing optional, nothing missing)
PROTOCOL_KEYS = {"minReaderVersion", "minWriterVersion"}
METADATA_KEYS = {
    "id", "format", "schemaString", "partitionColumns", "configuration",
}
ADD_KEYS = {"path", "partitionValues", "size", "modificationTime", "dataChange"}
REMOVE_KEYS = {"path", "deletionTimestamp", "dataChange"}


def _commit_actions(out_dir, version):
    p = os.path.join(out_dir, "_delta_log", f"{version:020d}.json")
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def _partitioned_target(spark, tmp_path, rows):
    t = SnapshotParquetTarget(
        spark, str(tmp_path / "src"), partition_cols=["p"]
    )
    t.overwrite(spark.createDataFrame(rows, "id long, p string, v string"))
    return t


def test_commit_zero_pins_the_protocol_fixture(spark, tmp_path):
    """Version-0 commit: exactly one protocol action (1/2, first line),
    one metaData with the spec's required fields, then adds carrying
    path/partitionValues/size/modificationTime/dataChange — and nothing
    else. Partition values round the hive layout: a space-containing
    value is percent-encoded in ``path`` but DECODED in
    ``partitionValues``; a NULL partition value (hive
    ``__HIVE_DEFAULT_PARTITION__`` dir) is a JSON null."""
    rows = [(1, "a b", "x"), (2, None, "y"), (3, "plain", "z")]
    target = _partitioned_target(spark, tmp_path, rows)
    out = str(tmp_path / "exp")
    before_ms = int(time.time() * 1000)
    assert dr.export_delta(target, out) == 0
    actions = _commit_actions(out, 0)

    assert set(actions[0]) == {"protocol"}  # first action, per spec order
    assert actions[0]["protocol"] == {
        "minReaderVersion": 1,
        "minWriterVersion": 2,
    }
    assert set(actions[0]["protocol"]) == PROTOCOL_KEYS

    metas = [a["metaData"] for a in actions if "metaData" in a]
    assert len(metas) == 1
    meta = metas[0]
    assert set(meta) == METADATA_KEYS
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == ["p"]
    assert isinstance(meta["configuration"], dict)
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    assert {f.name for f in schema.fields} >= {"id", "p", "v"}

    adds = [a["add"] for a in actions if "add" in a]
    assert len(adds) == 3  # one file per partition value
    seen_parts = set()
    for add in adds:
        assert set(add) == ADD_KEYS
        assert add["dataChange"] is True
        assert not add["path"].startswith("/")  # table-relative
        assert " " not in add["path"]  # url-encoded
        fs_rel = dr.unquote(add["path"])
        fpath = os.path.join(out, fs_rel)
        assert os.path.getsize(fpath) == add["size"]
        assert isinstance(add["modificationTime"], int)
        # export hard-links, so the data file keeps the SOURCE mtime —
        # the field must mirror the on-disk file, not the export instant
        assert add["modificationTime"] == os.stat(fpath).st_mtime_ns // 10**6
        assert add["modificationTime"] <= before_ms + 60_000
        assert set(add["partitionValues"]) == {"p"}
        seen_parts.add(add["partitionValues"]["p"])
    assert seen_parts == {"a b", None, "plain"}  # decoded + JSON null
    # the encoded path carries the hive dir for the spaced value
    assert any("p=a%20b/" in a["path"] for a in adds)

    # no other action kinds in a v0 export
    assert all(set(a) <= {"protocol", "metaData", "add"} for a in actions)


def test_incremental_commit_pins_the_remove_fixture(spark, tmp_path):
    """Shrinking the table produces remove actions with
    path/deletionTimestamp/dataChange — deletionTimestamp in epoch
    millis at export time (real readers key retention VACUUM off it) —
    and NO repeated metaData when the schema is unchanged."""
    rows = [(1, "a", "x"), (2, "b", "y")]
    target = _partitioned_target(spark, tmp_path, rows)
    out = str(tmp_path / "exp")
    assert dr.export_delta(target, out) == 0
    t0 = int(time.time() * 1000)
    target.overwrite(
        spark.createDataFrame([(1, "a", "x")], "id long, p string, v string")
    )
    assert dr.export_delta(target, out) == 1
    t1 = int(time.time() * 1000)
    actions = _commit_actions(out, 1)
    removes = [a["remove"] for a in actions if "remove" in a]
    assert removes, "shrink produced no remove actions"
    for rm in removes:
        assert set(rm) == REMOVE_KEYS
        assert rm["dataChange"] is True
        assert t0 <= rm["deletionTimestamp"] <= t1
    assert not any("metaData" in a for a in actions)  # schema unchanged
    assert not any("protocol" in a for a in actions)  # v0-only action


def test_checkpoint_parquet_and_last_checkpoint_sidecar(spark, tmp_path):
    """The single-file checkpoint carries the spec's three action
    columns with the same field shapes as the commit JSONs (adds at
    dataChange=false with url-encoded paths and modificationTime;
    metaData with format.provider+options; protocol 1/2), named
    ``<v>.checkpoint.parquet``; ``_last_checkpoint`` holds exactly
    {version, size} with size == the checkpoint's action-row count."""
    rows = [(1, "a b", "x"), (2, None, "y")]
    target = _partitioned_target(spark, tmp_path, rows)
    out = str(tmp_path / "exp")
    dr.export_delta(target, out)
    head = dr.export_checkpoint(spark, out)
    assert head == 0
    ck_path = os.path.join(out, "_delta_log", f"{head:020d}.checkpoint.parquet")
    assert os.path.exists(ck_path)
    ck = spark.read.parquet(ck_path)

    # field shapes (schema-level conformance; r10 adds the remove
    # tombstone column, the add.deletionVector descriptor and the
    # protocol feature lists — all spec checkpoint columns)
    names = {f.name: f for f in ck.schema.fields}
    assert set(names) == {"add", "remove", "metaData", "protocol"}
    add_fields = {f.name for f in names["add"].dataType.fields}
    assert add_fields == ADD_KEYS | {"deletionVector"}
    meta_fields = {f.name for f in names["metaData"].dataType.fields}
    assert meta_fields == METADATA_KEYS
    fmt_fields = {
        f.name
        for f in names["metaData"].dataType["format"].dataType.fields
    }
    assert fmt_fields == {"provider", "options"}
    proto_fields = {f.name for f in names["protocol"].dataType.fields}
    assert proto_fields == PROTOCOL_KEYS | {
        "readerFeatures", "writerFeatures",
    }

    # row shapes
    protos = ck.filter("protocol is not null").collect()
    assert len(protos) == 1
    assert protos[0]["protocol"].asDict() == {
        "minReaderVersion": 1,
        "minWriterVersion": 2,
        "readerFeatures": None,
        "writerFeatures": None,
    }
    metas = ck.filter("metaData is not null").collect()
    assert len(metas) == 1
    assert metas[0]["metaData"]["format"]["provider"] == "parquet"
    adds = [r["add"] for r in ck.filter("add is not null").collect()]
    commit_adds = {
        a["add"]["path"]: a["add"]
        for a in _commit_actions(out, 0)
        if "add" in a
    }
    assert {a["path"] for a in adds} == set(commit_adds)
    for a in adds:
        assert a["dataChange"] is False  # checkpoint adds never replay
        assert a["size"] == commit_adds[a["path"]]["size"]
        assert (
            a["modificationTime"]
            == commit_adds[a["path"]]["modificationTime"]
        )

    with open(os.path.join(out, "_delta_log", "_last_checkpoint")) as f:
        lc = json.load(f)
    assert set(lc) == {"version", "size"}
    assert lc["version"] == head
    assert lc["size"] == ck.count()


def test_checkpoint_only_log_replays_through_the_sidecar(spark, tmp_path):
    """Retention semantics: after the checkpoint, the pre-checkpoint
    commit JSON may be cleaned; a reader that consults
    ``_last_checkpoint`` first still reconstructs the full table (and a
    later incremental commit replays on top of the checkpoint)."""
    rows = [(1, "a", "x"), (2, "b", "y")]
    target = _partitioned_target(spark, tmp_path, rows)
    out = str(tmp_path / "exp")
    dr.export_delta(target, out)
    dr.export_checkpoint(spark, out)
    os.remove(os.path.join(out, "_delta_log", f"{0:020d}.json"))
    got = {
        (r["id"], r["p"], r["v"])
        for r in dr.read_delta(spark, out).collect()
    }
    assert got == set(rows)
    # incremental commit after retention cleanup replays on top
    target.overwrite(
        spark.createDataFrame([(3, "c", "z")], "id long, p string, v string")
    )
    assert dr.export_delta(target, out) == 1
    got2 = {
        (r["id"], r["p"], r["v"])
        for r in dr.read_delta(spark, out).collect()
    }
    assert got2 == {(3, "c", "z")}


def test_checkpoint_remove_tombstones_carry_extended_file_metadata(
    spark, tmp_path
):
    """r11 (ADVICE r10): real Delta writers stamp removes in the
    checkpoint with extendedFileMetadata=true + partitionValues + size
    (PROTOCOL.md Remove File); external readers consuming the exported
    checkpoint expect them. Partition values recover from the hive
    path segments, size from the not-yet-vacuumed file."""
    rows = [(1, "a b", "x"), (2, "k", "y")]
    target = _partitioned_target(spark, tmp_path, rows)
    out = str(tmp_path / "exp")
    dr.export_delta(target, out)
    target.overwrite(
        spark.createDataFrame([(2, "k", "y")], "id long, p string, v string")
    )
    dr.export_delta(target, out)
    head = dr.export_checkpoint(spark, out)
    ck = spark.read.parquet(
        os.path.join(out, "_delta_log", f"{head:020d}.checkpoint.parquet")
    )
    rm_fields = {
        f.name for f in dict(
            (f.name, f) for f in ck.schema.fields
        )["remove"].dataType.fields
    }
    assert rm_fields == REMOVE_KEYS | {
        "extendedFileMetadata", "partitionValues", "size", "deletionVector",
    }
    removes = [r["remove"] for r in ck.filter("remove is not null").collect()]
    assert removes, "checkpoint lost the tombstones"
    from urllib.parse import unquote

    for rm in removes:
        assert rm["extendedFileMetadata"] is True
        rel = unquote(rm["path"])
        # hive segment p=a%20b -> {'p': 'a b'}
        want_p = next(
            seg.partition("=")[2]
            for seg in os.path.dirname(rel).split(os.sep)
            if "=" in seg
        )
        assert rm["partitionValues"] == {"p": unquote(want_p)}
        assert rm["size"] == os.path.getsize(os.path.join(out, rel))
