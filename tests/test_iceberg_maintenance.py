"""Iceberg maintenance + manifest-level planning (r9): snapshot expiry
with crash-safe ordering, orphan-file removal, manifest-list
``partitions`` field-summary pruning, and the schema-evolution fence."""

import json
import os

import pyspark.sql.functions as F
import pytest

from arcane_framework_scala_spark.sinks.merge_sink import (
    SnapshotParquetTarget,
)
from arcane_framework_scala_spark.sources import avro_ocf
from arcane_framework_scala_spark.sources import iceberg_maintenance as imx
from arcane_framework_scala_spark.sources import iceberg_mor as im
from arcane_framework_scala_spark.sources import iceberg_reader as ir


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 10).alias("u")
    )


def _table(spark, tmp_path):
    """Four snapshots: export, pos-delete, two appends (each append is
    its own manifest with disjoint id ranges — manifest-prune bait)."""
    t = SnapshotParquetTarget(spark, str(tmp_path / "pub"))
    t.overwrite(_frame(spark, 0, 100))
    out = str(tmp_path / "ice")
    assert ir.export_iceberg(t, out) == 1
    assert im.commit_position_deletes(spark, out, "id < 5") == 2
    assert im.append_rows(spark, out, _frame(spark, 100, 200)) == 3
    assert im.append_rows(spark, out, _frame(spark, 200, 300)) == 4
    return out


def test_manifest_summaries_prune_without_decoding(spark, tmp_path):
    """The manifest-list ``partitions`` field summaries are the
    FIRST-LEVEL prune: a range probe must skip whole manifests without
    decoding an entry. Appends honor the default spec (truncate[100]),
    so each append's manifest summarizes a disjoint id range."""
    from arcane_framework_scala_spark.sources import (
        iceberg_transforms as tfm,
    )

    out = str(tmp_path / "ice")
    tfm.write_iceberg_partitioned(
        spark, _frame(spark, 0, 100), out, [("id", "truncate[100]")]
    )
    assert im.append_rows(spark, out, _frame(spark, 100, 200)) == 2
    assert im.append_rows(spark, out, _frame(spark, 200, 300)) == 3
    rep = ir.plan_report(out, "id", 250, 260)
    assert rep["manifests_total"] == 3  # create + 2 appends
    assert rep["manifests_decoded"] == 1  # only the 200-block manifest
    assert rep["files"]
    # and the range read stays exact through the first-level prune
    got = {
        r.id
        for r in ir.read_iceberg_range(spark, out, "id", 250, 260).collect()
    }
    assert got == set(range(250, 261))
    # unbounded plan decodes everything
    rep_all = ir.plan_report(out, "id")
    assert rep_all["manifests_decoded"] == rep_all["manifests_total"]
    # full read across the partition-aware appends is complete
    assert {r.id for r in ir.read_iceberg(spark, out).collect()} == set(
        range(300)
    )


def test_expire_snapshots_keeps_current_and_removes_files(spark, tmp_path):
    out = _table(spark, tmp_path)
    want = {r.id for r in ir.read_iceberg(spark, out).collect()}
    log = ir.snapshot_log(out)
    old_files = imx._snapshot_files(
        ir.table_metadata(out), log[0], out
    )
    stats = imx.expire_snapshots(out, keep_last=1)
    assert stats["snapshots_removed"] == 3
    assert stats["files_removed"] > 0
    # current read identical
    assert {r.id for r in ir.read_iceberg(spark, out).collect()} == want
    # expired snapshot unreachable
    with pytest.raises(ir.IcebergError, match="not in the table"):
        ir.read_iceberg(spark, out, snapshot_id=log[0]["snapshot-id"])
    # snapshot 1's manifest list is gone; files shared with the current
    # snapshot survive
    ml0 = ir._to_local(log[0]["manifest-list"], out)
    assert not os.path.exists(ml0)
    cur_files = set(ir.active_files(out))
    for f in old_files & cur_files:
        assert os.path.exists(f)
    # the table keeps working: new commits land after expiry
    assert im.append_rows(spark, out, _frame(spark, 300, 310)) == 5
    assert {r.id for r in ir.read_iceberg(spark, out).collect()} == (
        want | set(range(300, 310))
    )


def test_expire_noop_and_validation(spark, tmp_path):
    out = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="keep_last"):
        imx.expire_snapshots(out)
    assert imx.expire_snapshots(out, keep_last=10) == {
        "snapshots_removed": 0,
        "files_removed": 0,
    }


def test_remove_orphan_files(spark, tmp_path):
    out = _table(spark, tmp_path)
    orphan = os.path.join(out, "data", "orphan-leftover.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    fresh = os.path.join(out, "data", "fresh-inflight.parquet")
    with open(fresh, "wb") as f:
        f.write(b"junk")
    os.utime(orphan, (1, 1))  # ancient
    removed = imx.remove_orphan_files(out, older_than_s=3600)
    assert removed == [orphan]
    assert os.path.exists(fresh)  # age window protects in-flight writes
    # every referenced file untouched
    assert {r.id for r in ir.read_iceberg(spark, out).collect()} == {
        i for i in range(300) if i >= 5
    }


def test_schema_rename_resolves_by_field_id(spark, tmp_path):
    """A RENAMED field id resolves (r9): old files' real column names
    come from their parquet footers and alias to the current schema —
    the same result field-id resolution gives a real reader."""
    from arcane_framework_scala_spark.sources import iceberg_mor as im2

    t = SnapshotParquetTarget(spark, str(tmp_path / "pub"))
    t.overwrite(_frame(spark, 0, 10))
    out = str(tmp_path / "ice")
    ir.export_iceberg(t, out)
    mf = ir.table_metadata_file(out)
    meta = json.load(open(mf))
    old = meta["schemas"][0]
    renamed = {
        **old,
        "schema-id": 1,
        "fields": [
            {**f, "name": ("uid" if f["name"] == "u" else f["name"])}
            for f in old["fields"]
        ],
    }
    meta["schemas"] = [old, renamed]
    meta["current-schema-id"] = 1
    json.dump(meta, open(mf, "w"))
    got = ir.read_iceberg(spark, out)
    assert sorted(got.columns) == ["id", "uid"]
    assert {(r.id, r.uid) for r in got.collect()} == {
        (i, i % 10) for i in range(10)
    }
    # post-rename appends (files store the NEW name) unify with the old
    assert (
        im2.append_rows(
            spark,
            out,
            spark.range(10, 15).select(
                F.col("id"), (F.col("id") % 10).alias("uid")
            ),
        )
        == 2
    )
    got2 = ir.read_iceberg(spark, out)
    assert {(r.id, r.uid) for r in got2.collect()} == {
        (i, i % 10) for i in range(15)
    }
    # range planning still prunes across the rename (bounds key on
    # field ids, not names)
    sub = ir.read_iceberg_range(spark, out, "id", 11, 13)
    assert {r.id for r in sub.collect()} == {11, 12, 13}


def test_schema_added_column_null_fills(spark, tmp_path):
    t = SnapshotParquetTarget(spark, str(tmp_path / "pub"))
    t.overwrite(_frame(spark, 0, 10))
    out = str(tmp_path / "ice")
    ir.export_iceberg(t, out)
    mf = ir.table_metadata_file(out)
    meta = json.load(open(mf))
    old = meta["schemas"][0]
    meta["schemas"] = [
        old,
        {
            **old,
            "schema-id": 2,
            "fields": old["fields"]
            + [{"id": 99, "name": "extra", "required": False, "type": "long"}],
        },
    ]
    meta["current-schema-id"] = 2
    json.dump(meta, open(mf, "w"))
    got = ir.read_iceberg(spark, out)
    assert got.count() == 10
    assert got.filter(F.col("extra").isNull()).count() == 10


def test_schema_promotion_and_retype_fence(spark, tmp_path):
    """int->long promotion resolves with a cast; any other retype
    still raises."""
    t = SnapshotParquetTarget(spark, str(tmp_path / "pub"))
    t.overwrite(
        spark.range(8).select(
            F.col("id"), (F.col("id") % 3).cast("int").alias("v")
        )
    )
    out = str(tmp_path / "ice")
    ir.export_iceberg(t, out)
    mf = ir.table_metadata_file(out)
    meta = json.load(open(mf))
    old = meta["schemas"][0]
    promoted = {
        **old,
        "schema-id": 1,
        "fields": [
            {**f, "type": ("long" if f["name"] == "v" else f["type"])}
            for f in old["fields"]
        ],
    }
    meta["schemas"] = [old, promoted]
    meta["current-schema-id"] = 1
    json.dump(meta, open(mf, "w"))
    got = ir.read_iceberg(spark, out)
    assert dict(got.dtypes)["v"] == "bigint"
    assert {(r.id, r.v) for r in got.collect()} == {
        (i, i % 3) for i in range(8)
    }
    # long -> int narrowing is NOT a legal promotion
    narrowed = {
        **old,
        "schema-id": 2,
        "fields": [
            {**f, "type": ("int" if f["name"] == "id" else f["type"])}
            for f in old["fields"]
        ],
    }
    meta["schemas"] = [old, promoted, narrowed]
    meta["current-schema-id"] = 2
    json.dump(meta, open(mf, "w"))
    with pytest.raises(ir.IcebergError, match="retyped"):
        ir.read_iceberg(spark, out)


def test_metadata_log_tracks_previous_files_and_prunes(spark, tmp_path):
    """write_metadata appends the outgoing file to metadata-log (spec
    TableMetadata previous-file tracking), caps it at
    write.metadata.previous-versions-max, deletes beyond-cap files
    when delete-after-commit is enabled, and expire_metadata_files
    sweeps unreferenced leftovers on demand."""
    out = _table(spark, tmp_path)  # 4 snapshots -> 4 metadata versions
    meta = ir.table_metadata(out)
    mlog = meta.get("metadata-log") or []
    assert len(mlog) == 3  # v1..v3 outgoing files tracked
    md = os.path.dirname(ir.table_metadata_file(out))
    for e in mlog:
        p = e["metadata-file"].removeprefix("file://")
        assert os.path.exists(p)
        assert e["timestamp-ms"] > 0
    # cap + delete-after-commit: cap at 2, enable deletion, commit
    meta = ir.table_metadata(out)
    props = dict(meta.get("properties") or {})
    props["write.metadata.previous-versions-max"] = "2"
    props["write.metadata.delete-after-commit.enabled"] = "true"
    ir.write_metadata(out, {**meta, "properties": props})
    assert im.append_rows(spark, out, _frame(spark, 300, 320)) == 5
    meta2 = ir.table_metadata(out)
    mlog2 = meta2["metadata-log"]
    assert len(mlog2) == 2  # capped
    survivors = {
        e["metadata-file"].removeprefix("file://") for e in mlog2
    }
    all_meta = {
        os.path.join(md, n)
        for n in os.listdir(md)
        if n.endswith(".metadata.json")
    }
    cur = ir.table_metadata_file(out)
    # beyond-cap files were deleted at commit; current + logged remain
    assert all_meta == survivors | {cur}
    # the table still reads fine through the pruned chain
    got = {r.id for r in ir.read_iceberg(spark, out).collect()}
    assert got == (set(range(300)) - set(range(5))) | set(range(300, 320))
    # on-demand sweep: plant a stale unreferenced metadata file
    stale = os.path.join(md, "v1.metadata.json")
    assert not os.path.exists(stale)
    with open(stale, "w") as f:
        f.write("{}")
    removed = imx.expire_metadata_files(out)
    assert removed == [os.path.abspath(stale)]
    assert imx.expire_metadata_files(out) == []
