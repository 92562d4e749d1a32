"""RESTORE / rollback (r11): Delta RESTORE TABLE TO VERSION AS OF as a
new diff-of-snapshots commit, and Iceberg rollback_to_snapshot /
set_current_snapshot as pure metadata — the engine-side time-travel
WRITE surfaces the reference reaches through its catalog
(src/main/scala/services/merging/JdbcMergeServiceClient.scala)."""

import os

import pyspark.sql.functions as F
import pytest

from arcane_framework_scala_spark.sinks.merge_sink import (
    SnapshotParquetTarget,
)
from arcane_framework_scala_spark.sources import delta_cdf as cdf
from arcane_framework_scala_spark.sources import delta_dv as dv
from arcane_framework_scala_spark.sources import delta_maintenance as dmx
from arcane_framework_scala_spark.sources import delta_reader as dr
from arcane_framework_scala_spark.sources import iceberg_maintenance as imx
from arcane_framework_scala_spark.sources import iceberg_mor as im
from arcane_framework_scala_spark.sources import iceberg_reader as ir


def _export_delta(spark, tmp_path, n=60):
    t = SnapshotParquetTarget(spark, str(tmp_path / "pub"))
    t.overwrite(
        spark.range(n).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        )
    )
    out = str(tmp_path / "delta")
    assert dr.export_delta(t, out) == 0
    return out


def _ids(spark, out, **kw):
    return {r.id for r in dr.read_delta(spark, out, **kw).collect()}


def test_delta_restore_rewinds_data_without_rewriting_history(
    spark, tmp_path
):
    out = _export_delta(spark, tmp_path)
    assert cdf.enable_cdf(spark, out) == 1
    assert dv.delete_where(spark, out, "id < 20") == 2
    assert cdf.append_rows(
        spark,
        out,
        spark.range(60, 80).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        ),
    ) == 3
    assert _ids(spark, out) == set(range(20, 80))
    # restore to the post-enable_cdf, pre-delete state
    v = dmx.restore_table(spark, out, 1)
    assert v == 4
    assert _ids(spark, out) == set(range(60))
    # history intact: every pre-restore version still time-travels
    assert _ids(spark, out, version=2) == set(range(20, 60))
    assert _ids(spark, out, version=3) == set(range(20, 80))
    # the restore commit's derived CDF: re-surfaced rows are inserts,
    # the appended file's rows are deletes
    feed = cdf.delta_cdf(spark, out, 3, 4)
    ins = {
        r.id for r in feed.filter("_change_type = 'insert'").collect()
    }
    dels = {
        r.id for r in feed.filter("_change_type = 'delete'").collect()
    }
    assert ins == set(range(20))
    assert dels == set(range(60, 80))
    # restoring to an already-matching state is a no-op
    assert dmx.restore_table(spark, out, 1) is None
    with pytest.raises(ValueError, match="not older than head"):
        dmx.restore_table(spark, out, 99)


def test_delta_restore_refuses_vacuumed_targets(spark, tmp_path):
    import json

    out = _export_delta(spark, tmp_path)
    assert dv.delete_where(spark, out, "id < 20") == 1
    assert dmx.purge_deletion_vectors(spark, out) == 2
    # age the tombstones so vacuum reclaims the pre-purge originals
    log = os.path.join(out, "_delta_log")
    for name in os.listdir(log):
        if not name.endswith(".json"):
            continue
        p = os.path.join(log, name)
        lines = []
        with open(p) as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "remove" in a:
                    a["remove"]["deletionTimestamp"] = 1_000
                lines.append(json.dumps(a))
        with open(p, "w") as f:
            f.write("\n".join(lines) + "\n")
    assert dmx.vacuum(spark, out, older_than_s=3600)
    with pytest.raises(ValueError, match="vacuumed"):
        dmx.restore_table(spark, out, 0)


def _iceberg_table(spark, tmp_path):
    t = SnapshotParquetTarget(spark, str(tmp_path / "pub"))
    t.overwrite(
        spark.range(100).select(F.col("id"), (F.col("id") % 10).alias("u"))
    )
    out = str(tmp_path / "ice")
    assert ir.export_iceberg(t, out) == 1
    assert im.commit_position_deletes(spark, out, "id < 5") == 2
    assert im.append_rows(
        spark,
        out,
        spark.range(100, 200).select(
            F.col("id"), (F.col("id") % 10).alias("u")
        ),
    ) == 3
    return out


def test_iceberg_rollback_is_metadata_only(spark, tmp_path):
    out = _iceberg_table(spark, tmp_path)
    meta = ir.table_metadata(out)
    snaps = sorted(
        meta["snapshots"], key=lambda s: s["sequence-number"]
    )
    first, mid, head = (s["snapshot-id"] for s in snaps)
    assert meta["current-snapshot-id"] == head
    imx.rollback_to_snapshot(out, mid)
    got = {r.id for r in ir.read_iceberg(spark, out).collect()}
    assert got == set(range(5, 100))
    meta2 = ir.table_metadata(out)
    assert meta2["current-snapshot-id"] == mid
    assert meta2["snapshot-log"][-1]["snapshot-id"] == mid
    # nothing deleted: the rolled-over snapshot still time-travels
    fwd = {
        r.id
        for r in ir.read_iceberg(spark, out, snapshot_id=head).collect()
    }
    assert fwd == set(range(5, 200))
    # rollback only rewinds — the rolled-over head is NOT an ancestor
    with pytest.raises(ValueError, match="not an ancestor"):
        imx.rollback_to_snapshot(out, head)
    with pytest.raises(ValueError, match="already current"):
        imx.rollback_to_snapshot(out, mid)
    with pytest.raises(ValueError, match="not in the table"):
        imx.rollback_to_snapshot(out, 123456789)
    # roll forward again via the unchecked setter
    imx.set_current_snapshot(out, head)
    assert {r.id for r in ir.read_iceberg(spark, out).collect()} == set(
        range(5, 200)
    )


def test_iceberg_expire_after_rollback_drops_detached_heads(
    spark, tmp_path
):
    out = _iceberg_table(spark, tmp_path)
    meta = ir.table_metadata(out)
    snaps = sorted(
        meta["snapshots"], key=lambda s: s["sequence-number"]
    )
    first, mid, head = (s["snapshot-id"] for s in snaps)
    imx.rollback_to_snapshot(out, mid)
    # expire everything but current: the detached head (and first)
    # go; current keeps reading
    ts_mid = next(
        s["timestamp-ms"] for s in snaps if s["snapshot-id"] == mid
    )
    rep = imx.expire_snapshots(out, older_than_ms=10**18)
    assert rep["snapshots_removed"] >= 1
    ids = {
        s["snapshot-id"]
        for s in ir.table_metadata(out)["snapshots"]
    }
    assert mid in ids and head not in ids
    got = {r.id for r in ir.read_iceberg(spark, out).collect()}
    assert got == set(range(5, 100))


def test_delta_restore_to_timestamp(spark, tmp_path):
    """TIMESTAMP AS OF resolution: latest commit at-or-before the
    cutoff, commit times monotonized, pre-history timestamps raise."""
    import json
    import time

    out = _export_delta(spark, tmp_path)
    assert dv.delete_where(spark, out, "id < 20") == 1
    # stamp explicit commitInfo timestamps so resolution is exact:
    # v0 @ 1000, v1 @ 5000
    log = os.path.join(out, "_delta_log")
    for v, ts in ((0, 1000), (1, 5000)):
        p = os.path.join(log, f"{v:020d}.json")
        with open(p, "a") as f:
            f.write(
                json.dumps({"commitInfo": {"timestamp": ts}}) + "\n"
            )
    with pytest.raises(ValueError, match="predates"):
        dmx.version_at_timestamp(out, 999)
    assert dmx.version_at_timestamp(out, 1000) == 0
    assert dmx.version_at_timestamp(out, 4999) == 0
    assert dmx.version_at_timestamp(out, 5000) == 1
    assert dmx.version_at_timestamp(out, int(time.time() * 1000)) == 1
    # restore to the v0 timestamp rewinds the delete
    v = dmx.restore_table_to_timestamp(spark, out, 1000)
    assert v == 2
    assert _ids(spark, out) == set(range(60))


def test_delta_version_at_timestamp_monotonizes(spark, tmp_path):
    """A clock-skewed commit (later version, earlier timestamp) must
    never make a later version resolve before an earlier one."""
    import json

    out = _export_delta(spark, tmp_path)
    assert dv.delete_where(spark, out, "id < 10") == 1
    assert dv.delete_where(spark, out, "id < 15") == 2
    log = os.path.join(out, "_delta_log")
    # v0 @ 2000, v1 @ 9000, v2 @ 3000 (skewed backwards)
    for v, ts in ((0, 2000), (1, 9000), (2, 3000)):
        p = os.path.join(log, f"{v:020d}.json")
        with open(p, "a") as f:
            f.write(
                json.dumps({"commitInfo": {"timestamp": ts}}) + "\n"
            )
    # v2's effective time is max(9000, 3000) = 9000: ts 8999 -> v1...
    # but v1 and v2 share effective 9000, so 9000 resolves to v2
    assert dmx.version_at_timestamp(out, 8999) == 0
    assert dmx.version_at_timestamp(out, 9000) == 2


def test_iceberg_rollback_to_timestamp(spark, tmp_path):
    out = _iceberg_table(spark, tmp_path)
    meta = ir.table_metadata(out)
    snaps = sorted(
        meta["snapshots"], key=lambda s: s["sequence-number"]
    )
    first, mid, head = (s["snapshot-id"] for s in snaps)
    ts_mid = next(
        s["timestamp-ms"] for s in snaps if s["snapshot-id"] == mid
    )
    with pytest.raises(ValueError, match="starts later"):
        imx.rollback_to_timestamp(out, snaps[0]["timestamp-ms"] - 1)
    imx.rollback_to_timestamp(out, ts_mid)
    assert ir.table_metadata(out)["current-snapshot-id"] == mid
    got = {r.id for r in ir.read_iceberg(spark, out).collect()}
    assert got == set(range(5, 100))
    with pytest.raises(ValueError, match="already current"):
        imx.rollback_to_timestamp(out, ts_mid)
