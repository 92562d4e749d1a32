"""Delta maintenance (sources/delta_maintenance.py): DV purge
(un-fences checkpointing) and retention VACUUM."""

import os
import time

import pyspark.sql.functions as F
import pytest

from arcane_framework_scala_spark.sinks.merge_sink import (
    SnapshotParquetTarget,
)
from arcane_framework_scala_spark.sources import delta_dv as dv
from arcane_framework_scala_spark.sources import delta_maintenance as dmx
from arcane_framework_scala_spark.sources import delta_reader as dr


def _export(spark, tmp_path, n=120, partition=True):
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") % 3).alias("p")
    )
    st = SnapshotParquetTarget(
        spark, str(tmp_path / "pub"),
        partition_cols=["p"] if partition else None,
    )
    st.overwrite(df)
    out = str(tmp_path / "delta")
    assert dr.export_delta(st, out) == 0
    return out


def _ids(spark, out, **kw):
    return {r.id for r in dr.read_delta(spark, out, **kw).collect()}


def test_purge_rewrites_dv_files_and_unfences_checkpoint(spark, tmp_path):
    out = _export(spark, tmp_path)
    assert dv.delete_where(spark, out, "id % 4 = 0") == 1
    want = {i for i in range(120) if i % 4}
    v = dmx.purge_deletion_vectors(spark, out)
    assert v == 2
    # contents identical, zero live DVs, partition column survives
    assert _ids(spark, out) == want
    live, _ = dr._replay_full(out, None, spark)
    assert not any(a.get("deletionVector") for a in live.values())
    got_p = {
        (r.id, r.p) for r in dr.read_delta(spark, out).collect()
    }
    assert got_p == {(i, i % 3) for i in want}
    # checkpoint now works (the DV fence lifted by the purge)
    assert dr.export_checkpoint(spark, out) == 2
    assert _ids(spark, out) == want
    # purge with no DVs is a no-op
    assert dmx.purge_deletion_vectors(spark, out) is None


def test_vacuum_gates_on_tombstone_not_file_mtime(spark, tmp_path):
    out = _export(spark, tmp_path, partition=False)
    assert dv.delete_where(spark, out, "id < 10") == 1
    assert dmx.purge_deletion_vectors(spark, out) == 2
    want = _ids(spark, out)
    # age every DATA file: the retention decision must come from the
    # remove tombstone's deletionTimestamp, NOT the file's own mtime —
    # a years-old file removed from the log a second ago is still
    # inside the window (time travel / concurrent readers depend on it)
    for root, dirs, files in os.walk(out):
        dirs[:] = [d for d in dirs if d != "_delta_log"]
        for n in files:
            os.utime(os.path.join(root, n), (1, 1))
    assert dmx.vacuum(spark, out, older_than_s=3600) == []
    # now age the TOMBSTONES (rewrite deletionTimestamp in the log) —
    # the replaced originals + the orphaned DV file become deletable
    import json

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
    removed = dmx.vacuum(spark, out, older_than_s=3600)
    assert removed, "expected the pre-purge files to be vacuumed"
    assert any("deletion_vector_" in p for p in removed)
    assert _ids(spark, out) == want
    # a fresh unreferenced file with NO tombstone: mtime fallback
    # protects it inside the window
    fresh = os.path.join(out, "fresh.parquet")
    open(fresh, "wb").write(b"x")
    assert dmx.vacuum(spark, out, older_than_s=3600) == []
    assert os.path.exists(fresh)
    # time travel into the vacuumed window is gone (documented trade)
    with pytest.raises(Exception):
        _ids(spark, out, version=0)


def test_vacuum_binds_cdc_files_to_their_commit_timestamp(
    spark, tmp_path
):
    """_change_data files are vacuumed by their COMMIT's age (the real
    VACUUM's CDF rule), never their own mtime; a vacuumed range's feed
    then raises ChangeDataFeedError instead of a scan-time 404."""
    import json

    from arcane_framework_scala_spark.sources import delta_cdf as cdf

    rows = [(i, "a" if i % 2 else "b", i * 10) for i in range(12)]
    t = SnapshotParquetTarget(spark, str(tmp_path / "pub"))
    t.overwrite(spark.createDataFrame(rows, "k long, g string, n long"))
    out = str(tmp_path / "delta")
    assert dr.export_delta(t, out) == 0
    cdf.enable_cdf(spark, out)
    v = cdf.update_where(spark, out, "g = 'a'", {"n": "n + 1"})
    cdc_files = [
        os.path.join(root, n)
        for root, _, files in os.walk(os.path.join(out, "_change_data"))
        for n in files
        if n.endswith(".parquet")
    ]
    assert cdc_files
    # age the cdc FILES: the commit is recent, so they must survive —
    # pre-r11 mtime-fallback vacuum would delete them here
    for p in cdc_files:
        os.utime(p, (1, 1))
    assert dmx.vacuum(spark, out, older_than_s=3600) == []
    assert all(os.path.exists(p) for p in cdc_files)
    assert cdf.delta_cdf(spark, out, v - 1, v).count() == 12
    # a commitInfo timestamp takes precedence over the log file mtime:
    # ancient log mtime + recent commitInfo → still inside the window
    log = os.path.join(out, "_delta_log")
    vfile = os.path.join(log, f"{v:020d}.json")
    with open(vfile) as f:
        lines = [line for line in f if line.strip()]
    now_ms = int(time.time() * 1000)
    with open(vfile, "a") as f:
        f.write(json.dumps({"commitInfo": {"timestamp": now_ms}}) + "\n")
    os.utime(vfile, (1, 1))
    assert dmx.vacuum(spark, out, older_than_s=3600) == []
    assert all(os.path.exists(p) for p in cdc_files)
    # age the COMMIT itself (drop commitInfo; the log mtime governs):
    # the feed's files fall outside the window and are reclaimed
    with open(vfile, "w") as f:
        f.writelines(lines)
    os.utime(vfile, (1, 1))
    removed = dmx.vacuum(spark, out, older_than_s=3600)
    assert set(removed) >= {os.path.normpath(p) for p in cdc_files}
    with pytest.raises(cdf.ChangeDataFeedError, match="vacuumed"):
        cdf.delta_cdf(spark, out, v - 1, v).count()


def test_cleanup_expired_logs_retains_from_the_checkpoint(
    spark, tmp_path
):
    """Log cleanup deletes commit JSONs strictly below an aged
    checkpoint; replay and new commits keep working off the
    checkpoint, time travel and CDF into the cleaned range raise."""
    from arcane_framework_scala_spark.sources import delta_cdf as cdf

    out = _export(spark, tmp_path, partition=False)
    cdf.enable_cdf(spark, out)
    assert dv.delete_where(spark, out, "id < 10") == 2
    assert cdf.append_rows(
        spark,
        out,
        spark.range(200, 210).select(
            F.col("id"), (F.col("id") % 7).alias("k"),
            (F.col("id") % 3).alias("p"),
        ),
    ) == 3
    want = _ids(spark, out)
    # no checkpoint -> nothing cleaned, ever
    assert dmx.cleanup_expired_logs(out, older_than_s=0) == []
    ck = dr.export_checkpoint(spark, out)
    assert ck == 3
    # everything is recent -> retention protects the whole log
    assert dmx.cleanup_expired_logs(out, older_than_s=3600) == []
    # age every log file; commits < checkpoint go, >= checkpoint stay
    log = os.path.join(out, "_delta_log")
    for n in os.listdir(log):
        os.utime(os.path.join(log, n), (1, 1))
    removed = dmx.cleanup_expired_logs(out, older_than_s=3600)
    assert len(removed) == 3  # commits 0,1,2
    names = sorted(os.path.basename(p) for p in removed)
    assert names == [f"{v:020d}.json" for v in (0, 1, 2)]
    # current state intact, new commits still possible
    assert _ids(spark, out) == want
    assert dv.delete_where(spark, out, "id >= 205") == 4
    assert _ids(spark, out) == {i for i in want if i < 205}
    # time travel into the cleaned range raises the truncated error
    with pytest.raises(Exception):
        _ids(spark, out, version=1)
    # the change feed over a cleaned commit raises, not a 404
    with pytest.raises(Exception):
        cdf.delta_cdf(spark, out, 1, 2).count()
    # idempotent: nothing left below the checkpoint
    assert dmx.cleanup_expired_logs(out, older_than_s=3600) == []
