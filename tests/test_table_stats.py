"""Table statistics (K4/A3-A5): parquet-footer stats vs ground truth, and
the Iceberg metadata-table SQL builders."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from arcane_framework_scala_spark.sinks.table_stats import (
    avg_row_bytes,
    column_sizes_sql,
    partition_count,
    partition_count_sql,
    table_size_sql,
    table_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def test_record_count_matches_duckdb():
    path = f"{SF_DIR}/lineitem.parquet"
    st = table_stats(path)
    expected = duckdb.sql(f"SELECT count(*) FROM '{path}'").fetchone()[0]
    assert st.records == expected
    assert st.files >= 1
    assert st.bytes > 0
    assert avg_row_bytes(st) > 0


def test_column_bytes_cover_all_columns():
    path = f"{SF_DIR}/lineitem.parquet"
    st = table_stats(path)
    cols = {
        r[0]
        for r in duckdb.sql(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
    }
    assert set(st.column_bytes) == cols
    # compressed column chunks must account for most of the file
    # (footer/metadata overhead is the remainder)
    assert 0 < sum(st.column_bytes.values()) <= st.bytes


def test_partition_count_unpartitioned():
    assert partition_count(f"{SF_DIR}/lineitem.parquet") == 1


def test_empty_dir(tmp_path):
    st = table_stats(str(tmp_path))
    assert (st.records, st.bytes, st.files) == (0, 0, 0)
    assert avg_row_bytes(st) == 0.0


def test_metadata_sql_builders():
    assert table_size_sql("cat.db.t") == (
        "SELECT sum(record_count) AS records, "
        "sum(file_size_in_bytes) AS bytes FROM cat.db.t.files"
    )
    assert "cat.db.t.partitions" in partition_count_sql("cat.db.t")
    assert "explode(column_sizes)" in column_sizes_sql("cat.db.t")


def test_max_rows_per_file_chunks_staging_writes(spark, tmp_path):
    """K1 parity: SnapshotParquetTarget(max_rows_per_file=N) caps staged
    parquet files at N rows (reference default 10 000,
    IcebergS3CatalogWriter.scala:34), verified via footer stats."""
    from arcane_framework_scala_spark.sinks import SnapshotParquetTarget

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")  # 6000 rows
    n = df.count()
    tgt = SnapshotParquetTarget(spark, str(tmp_path / "t"), max_rows_per_file=1000)
    tgt.overwrite(df)
    st = table_stats(str(tmp_path / "t" / "v=1"))
    assert st.records == n
    assert st.files >= n // 1000
    import pyarrow.parquet as pq

    for f in sorted((tmp_path / "t" / "v=1").glob("*.parquet")):
        assert pq.ParquetFile(str(f)).metadata.num_rows <= 1000


# ---------------------------------------------------------------------------
# Executable maintenance (X1-X4) on the versioned-parquet layout
# ---------------------------------------------------------------------------


def test_maintenance_optimize_expire_orphans_analyze(spark, sf_dir, tmp_path):
    from arcane_framework_scala_spark.sinks.maintenance import (
        analyze_snapshot,
        expire_snapshots,
        optimize_snapshot,
        read_stats,
        remove_orphan_files,
        run_maintenance,
    )
    from arcane_framework_scala_spark.sinks.merge_sink import SnapshotParquetTarget

    import glob
    import os

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    n = li.count()
    target = SnapshotParquetTarget(spark, str(tmp_path / "t"), max_rows_per_file=500)
    # fragment: 8 writer tasks x 500-row cap -> many small files
    target.overwrite(li.repartition(8))
    v1_files = glob.glob(str(tmp_path / "t" / "v=1" / "*.parquet"))
    assert len(v1_files) > 8

    # X1: compacts into byte-sized file count as a NEW snapshot
    n_files = optimize_snapshot(target, target_file_bytes=128 << 20)
    assert n_files == 1 and target.current_version() == 2
    v2_files = glob.glob(str(tmp_path / "t" / "v=2" / "*.parquet"))
    assert len(v2_files) == 1
    assert target.read().count() == n
    # the row cap is restored after the compaction commit
    assert target.max_rows_per_file == 500

    # X4: stats sidecar matches the data and survives reread
    stats = analyze_snapshot(target)
    assert stats.records == n and stats.files == 1
    persisted = read_stats(target)
    assert persisted["records"] == n and persisted["version"] == 2
    assert set(persisted["column_bytes"]) == {
        "l_orderkey", "l_linenumber", "l_quantity"
    }

    # X3: crashed-commit leftovers go, live snapshots and metadata stay
    (tmp_path / "t" / "_CURRENT.tmp").write_text("9")
    (tmp_path / "t" / "stray").mkdir()
    removed = remove_orphan_files(target)
    assert removed == ["_CURRENT.tmp", "stray"]

    # X2: count-based expiry keeps the newest snapshot only
    expired = expire_snapshots(target, keep_last=1)
    assert expired == [1]
    assert not os.path.exists(tmp_path / "t" / "v=1")
    assert target.read().count() == n

    # dispatcher wires MaintenanceSchedule op names to the executors
    assert run_maintenance(target, "optimize") == 1
    assert target.current_version() == 3


def test_expire_never_drops_current_snapshot(spark, sf_dir, tmp_path):
    from arcane_framework_scala_spark.sinks.maintenance import expire_snapshots
    from arcane_framework_scala_spark.sinks.merge_sink import SnapshotParquetTarget

    df = spark.range(10)
    target = SnapshotParquetTarget(spark, str(tmp_path / "t"))
    target.overwrite(df)
    assert expire_snapshots(target, keep_last=1) == []
    assert target.read().count() == 10


def test_maintenance_handles_partial_commit_and_missing_dir(spark, tmp_path):
    import os

    from arcane_framework_scala_spark.sinks.maintenance import (
        expire_snapshots,
        remove_orphan_files,
    )
    from arcane_framework_scala_spark.sinks.merge_sink import SnapshotParquetTarget

    t = SnapshotParquetTarget(spark, str(tmp_path / "never_created"))
    assert remove_orphan_files(t) == []  # not-yet-bootstrapped: no crash

    t2 = SnapshotParquetTarget(spark, str(tmp_path / "t2"))
    df = spark.range(10).withColumnRenamed("id", "x")
    t2.overwrite(df)  # v=1
    t2.merge_free_overwrite = None  # no-op attr guard
    t2.overwrite(df)  # v=2
    # simulate a crash: v=3 written, pointer never flipped
    os.makedirs(os.path.join(t2.path, "v=3"))
    open(os.path.join(t2.path, "v=3", "part-junk.parquet"), "w").write("x")
    # expire must not spend its keep slot on the partial v=3
    assert expire_snapshots(t2, keep_last=1) == [1]
    assert os.path.isdir(os.path.join(t2.path, "v=2"))
    # orphan removal deletes the crashed partial commit
    assert remove_orphan_files(t2) == ["v=3"]
    assert not os.path.isdir(os.path.join(t2.path, "v=3"))
    assert t2.read().count() == 10


def test_value_quantiles_exact_and_sketch(spark):
    from arcane_framework_scala_spark.functions.stats import value_quantiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)] + [("b", 5.0), ("b", 15.0)],
        "g string, v double",
    )
    rows = {
        r["g"]: r
        for r in value_quantiles(df, "g", "v", quantiles=(0.5, 0.9)).collect()
    }
    # exact interpolated: median of 1..100 = 50.5; p90 = 90.1
    assert rows["a"]["n"] == 100
    assert rows["a"]["q_5"] == 50.5
    assert rows["a"]["q_9"] == 90.1
    assert rows["b"]["q_5"] == 10.0  # midpoint of the two values
    # sketch path returns a value within the group's range (accuracy-bound)
    sk = {
        r["g"]: r
        for r in value_quantiles(
            df, "g", "v", quantiles=(0.5,), exact=False
        ).collect()
    }
    assert 1.0 <= sk["a"]["q_5"] <= 100.0


def test_sort_strategy_compaction_declusters_nothing_overlaps(spark, tmp_path, sf_dir):
    """optimize_snapshot(sort_cols=...) = Iceberg rewrite_data_files
    SORT strategy: the rewrite range-repartitions + sorts, so file-level
    min/max ranges on the sort key are non-overlapping — a point read
    prunes to ONE file from parquet footers alone. Values identical to
    the bin-packed snapshot (compaction is metadata-only either way)."""
    import glob

    from arcane_framework_scala_spark.sinks.maintenance import optimize_snapshot
    from arcane_framework_scala_spark.sinks.merge_sink import SnapshotParquetTarget

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .orderBy("l_quantity")  # deliberately clustered on the WRONG key
    )
    target = SnapshotParquetTarget(spark, str(tmp_path / "t"))
    target.overwrite(li.repartition(6))
    before = li.count()

    # tiny target size forces a multi-file sorted rewrite
    bytes_now = sum(
        __import__("os").path.getsize(f)
        for f in glob.glob(str(tmp_path / "t" / "v=1" / "*.parquet"))
    )
    n_files = optimize_snapshot(
        target, target_file_bytes=max(1, bytes_now // 4), sort_cols=["l_orderkey"]
    )
    assert n_files >= 3
    files = sorted(glob.glob(str(tmp_path / "t" / "v=2" / "*.parquet")))
    assert len(files) >= 3
    assert target.read().count() == before

    # per-file [min, max] on the sort key must not overlap across files
    ranges = []
    for f in files:
        agg = spark.read.parquet(f).agg(
            F.min("l_orderkey"), F.max("l_orderkey")
        ).first()
        if agg[0] is not None:
            ranges.append((agg[0], agg[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1, hi1)} vs {(lo2, hi2)}"
