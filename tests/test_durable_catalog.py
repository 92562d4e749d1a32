"""DurableCatalogTarget: real MERGE INTO + durable copy-on-write snapshots
on one table (the unified Iceberg-CoW shape — the reference gets it from
Trino-on-Iceberg, ``JdbcMergeServiceClient.scala:62-91``).

The split this class closes: CatalogTarget executes the generated MERGE
for real but its MemCatalog store is in-memory; SnapshotParquetTarget is
durable and maintainable but merges through merge_apply. Here every merge
executes as real SQL AND commits a durable parquet snapshot that the
X1-X4 maintenance family manages."""

import os
import uuid

import pyspark.sql.functions as F
import pytest

from arcane_framework_scala_spark.operators.merge_apply import merge_apply
from arcane_framework_scala_spark.queries.merge import SQL_SERVER_CHANGE_TRACKING
from arcane_framework_scala_spark.sinks.maintenance import (
    expire_snapshots,
    optimize_snapshot,
)
from arcane_framework_scala_spark.sinks.merge_sink import (
    DurableCatalogTarget,
    MergeSink,
)

BATCH_SCHEMA = (
    "ARCANE_MERGE_KEY string, SYS_CHANGE_VERSION long, "
    "SYS_CHANGE_OPERATION string, user_id long, score long"
)

WAVE1 = [
    ("k1", 1, "U", 1, 10),
    ("k2", 2, "U", 2, 20),
    ("k3", 3, "D", 3, 30),  # delete-of-absent: never inserted
]
WAVE2 = [
    ("k1", 4, "U", 1, 11),  # update
    ("k2", 5, "D", 2, 20),  # delete
    ("k4", 6, "U", 4, 40),  # insert
]


def _mem_available(spark) -> bool:
    try:
        spark.sql("SHOW TABLES IN mem.itest").collect()
        return True
    except Exception:  # noqa: BLE001 — jar not on the session classpath
        return False


@pytest.fixture()
def target(spark, tmp_path):
    if not _mem_available(spark):
        pytest.skip("mem catalog jar not loaded in this session")
    name = f"mem.itest.dur_{uuid.uuid4().hex[:10]}"
    t = DurableCatalogTarget(spark, str(tmp_path / "t"), name)
    yield t
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _expected_two_waves(spark):
    """The same two waves through the pure-DataFrame merge algebra."""
    w1 = spark.createDataFrame(WAVE1, BATCH_SCHEMA)
    w2 = spark.createDataFrame(WAVE2, BATCH_SCHEMA)
    from arcane_framework_scala_spark.operators.dedup_window import (
        latest_version_per_key,
    )

    boot = (
        latest_version_per_key(w1, "SYS_CHANGE_VERSION")
        .filter(F.col("SYS_CHANGE_OPERATION") != "D")
        .drop("SYS_CHANGE_OPERATION")
    )
    return _rows(merge_apply(boot, w2, SQL_SERVER_CHANGE_TRACKING))


def test_merge_commits_durable_snapshots(spark, target):
    sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
    sink.apply(spark.createDataFrame(WAVE1, BATCH_SCHEMA))
    sink.apply(spark.createDataFrame(WAVE2, BATCH_SCHEMA))
    assert target.versions() == [1, 2]
    final = target.read()
    assert _rows(final) == _expected_two_waves(spark)
    # the catalog execution table mirrors the durable snapshot
    assert _rows(spark.table(target.table)) == _rows(final)
    # time travel: v=1 is the bootstrapped wave-1 state (D never inserted)
    assert _rows(target.read_version(1)) == [("k1", 1, 1, 10), ("k2", 2, 2, 20)]


def test_crash_between_merge_and_commit_loses_nothing(spark, target):
    """Durable truth is the snapshot layout: a crash after the MERGE ran
    but before the snapshot commit leaves _CURRENT at the old version,
    and the retried batch replays onto it cleanly (the catalog table is
    re-hydrated, never trusted)."""
    sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
    sink.apply(spark.createDataFrame(WAVE1, BATCH_SCHEMA))

    real_commit = target.snapshots._commit

    def crash(df, **kw):
        raise OSError("simulated crash before snapshot commit")

    target.snapshots._commit = crash
    with pytest.raises(OSError, match="simulated crash"):
        target.merge(
            spark.createDataFrame(WAVE2, BATCH_SCHEMA), SQL_SERVER_CHANGE_TRACKING
        )
    # the MERGE mutated the catalog table, but durable state is untouched
    assert target.versions() == [1]
    assert _rows(target.read()) == [("k1", 1, 1, 10), ("k2", 2, 2, 20)]

    # retry (what MergeSink's RetryPolicy does for transient errors)
    target.snapshots._commit = real_commit
    sink.apply(spark.createDataFrame(WAVE2, BATCH_SCHEMA))
    assert target.versions() == [1, 2]
    assert _rows(target.read()) == _expected_two_waves(spark)


def test_hydrate_never_trusts_a_leftover_catalog_table(spark, target):
    """A catalog table left behind by a crashed run (or another session's
    table of the same name) must not leak into the merged state."""
    spark.createDataFrame(
        [("junk", 99, 9, 9)],
        "ARCANE_MERGE_KEY string, SYS_CHANGE_VERSION long, user_id long, score long",
    ).writeTo(target.table).create()
    sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
    sink.apply(spark.createDataFrame(WAVE1, BATCH_SCHEMA))
    assert _rows(target.read()) == [("k1", 1, 1, 10), ("k2", 2, 2, 20)]


def test_maintenance_runs_on_the_same_table(spark, target, tmp_path):
    """X1 compaction and X2 expiry operate on the files the merges
    committed; compaction is metadata-only (values identical)."""
    # fragment: 1-row files
    target.snapshots.max_rows_per_file = 1
    sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
    sink.apply(spark.createDataFrame(WAVE1, BATCH_SCHEMA))
    sink.apply(spark.createDataFrame(WAVE2, BATCH_SCHEMA))
    before = _rows(target.read())

    import glob

    v2_files = len(glob.glob(str(tmp_path / "t" / "v=2" / "*.parquet")))
    assert v2_files >= 2  # fragmented (one file per surviving row)
    target.snapshots.max_rows_per_file = None
    n_files = optimize_snapshot(target.snapshots, target_file_bytes=128 << 20)
    assert n_files < v2_files
    assert _rows(target.read()) == before
    assert expire_snapshots(target.snapshots, keep_last=1) == [1, 2]
    assert not os.path.exists(tmp_path / "t" / "v=1")
    # a merge after maintenance continues the same history
    sink.apply(
        spark.createDataFrame([("k5", 7, "U", 5, 50)], BATCH_SCHEMA)
    )
    assert target.versions() == [3, 4]
    assert ("k5", 7, 5, 50) in _rows(target.read())


def test_watermark_survives_the_session(spark, target, tmp_path):
    """T2 on the durable target: the watermark lives in the snapshot
    layout (rename-committed JSON), so a brand-new target instance on the
    same path — a restarted job — resumes exactly where the crashed one
    committed, and X3 orphan sweeps never eat it."""
    from arcane_framework_scala_spark.sinks.maintenance import remove_orphan_files
    from arcane_framework_scala_spark.streaming.watermark import Watermark

    sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
    sink.apply(spark.createDataFrame(WAVE1, BATCH_SCHEMA))
    store = target.watermark_store()
    store.commit(Watermark(version="2", timestamp="2026-08-15T00:00:00+00:00"))

    reborn = DurableCatalogTarget(spark, str(tmp_path / "t"), target.table)
    wm = reborn.watermark_store().read()
    assert wm is not None and wm.version == "2"
    assert remove_orphan_files(reborn.snapshots) == []
    assert reborn.watermark_store().read().version == "2"


def test_schema_drift_widens_the_durable_table(spark, target):
    """T8 through the CoW cycle: a batch carrying a new column triggers
    ALTER TABLE ADD COLUMNS on the execution table, and the widened
    schema lands in the committed snapshot (old rows null-padded)."""
    sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
    sink.apply(spark.createDataFrame(WAVE1, BATCH_SCHEMA))
    drifted = spark.createDataFrame(
        [("k4", 6, "U", 4, 40, "eu")],
        BATCH_SCHEMA + ", region string",
    )
    sink.apply(drifted)
    final = target.read()
    assert "region" in final.columns
    rows = {r["ARCANE_MERGE_KEY"]: r["region"] for r in final.collect()}
    assert rows["k4"] == "eu" and rows["k1"] is None
    # the widened table keeps merging (hydrate handles the wider schema)
    sink.apply(
        spark.createDataFrame(
            [("k1", 7, "U", 1, 12, "us")], BATCH_SCHEMA + ", region string"
        )
    )
    rows = {r["ARCANE_MERGE_KEY"]: r["region"] for r in target.read().collect()}
    assert rows["k1"] == "us"


def test_changes_between_snapshots_is_the_cdf(spark, target):
    """The durable table is a CDC *source* too: changes(v1, v2) derives
    the Delta-CDF-shaped feed the second merge produced."""
    sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
    sink.apply(spark.createDataFrame(WAVE1, BATCH_SCHEMA))
    sink.apply(spark.createDataFrame(WAVE2, BATCH_SCHEMA))
    ops = {
        r["ARCANE_MERGE_KEY"]: r["op"] for r in target.changes(1, 2).collect()
    }
    assert ops == {"k1": "update", "k2": "delete", "k4": "insert"}


def test_partitioned_snapshots_prune_on_read(spark, tmp_path):
    """100 TB posture: a DurableCatalogTarget with partition_cols commits
    hive-partitioned snapshots, and a read with a partition predicate
    reaches the scan as a PartitionFilter (directory pruning — the
    Iceberg partition-spec equivalent)."""
    import uuid as _uuid

    from arcane_framework_scala_spark.plans.audit import audit_plan
    from arcane_framework_scala_spark.sinks.maintenance import (
        expire_snapshots,
        optimize_snapshot,
    )

    if not _mem_available(spark):
        pytest.skip("mem catalog jar not loaded in this session")
    name = f"mem.itest.part_{_uuid.uuid4().hex[:10]}"
    target = DurableCatalogTarget(
        spark, str(tmp_path / "t"), name, partition_cols=["event_type"]
    )
    try:
        wave1 = [
            ("k1", 1, "U", 1, 10, "click"),
            ("k2", 2, "U", 2, 20, "view"),
            ("k3", 3, "U", 3, 30, "click"),
        ]
        wave2 = [
            ("k1", 4, "U", 1, 11, "click"),
            ("k4", 5, "U", 4, 40, "scroll"),
        ]
        schema = BATCH_SCHEMA.replace("score long", "score long, event_type string")
        sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
        sink.apply(spark.createDataFrame(wave1, schema))
        sink.apply(spark.createDataFrame(wave2, schema))

        # hive layout on disk
        assert os.path.isdir(tmp_path / "t" / "v=2" / "event_type=click")
        # full state survives the partitioned round-trip
        got = {r["ARCANE_MERGE_KEY"]: r["event_type"] for r in target.read().collect()}
        assert got == {"k1": "click", "k2": "view", "k3": "click", "k4": "scroll"}

        # partition predicate reaches the scan as a PartitionFilter
        pruned = target.read().filter(F.col("event_type") == "click")
        a = audit_plan(pruned)
        assert a.partition_filter_scans >= 1, a.plan
        assert any("event_type" in p for p in a.partition_filters), (
            a.partition_filters
        )
        assert pruned.count() == 2

        # maintenance still works on the partitioned layout
        optimize_snapshot(target.snapshots, target_file_bytes=128 << 20)
        assert {r["ARCANE_MERGE_KEY"] for r in target.read().collect()} == {
            "k1", "k2", "k3", "k4",
        }
        assert expire_snapshots(target.snapshots, keep_last=1) == [1, 2]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _partitioned_target(spark, tmp_path, tag):
    if not _mem_available(spark):
        pytest.skip("mem catalog jar not loaded in this session")
    name = f"mem.itest.pr_{tag}_{uuid.uuid4().hex[:8]}"
    return DurableCatalogTarget(
        spark, str(tmp_path / tag), name, partition_cols=["event_type"]
    )


def _dir_hashes(root):
    import hashlib

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, root)
            out[rel] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


PART_SCHEMA = BATCH_SCHEMA + ", event_type string"


def test_pruned_merge_leaves_untouched_partitions_byte_identical(
    spark, tmp_path
):
    """The r6 caveat closed: a merge touching ONE partition must leave
    every other partition's data files BYTE-IDENTICAL across the
    snapshot commit (file-hash pin, not value parity) — the rewrite
    group is pruned, untouched files are carried by hard link exactly
    as an Iceberg manifest carries them by reference."""
    target = _partitioned_target(spark, tmp_path, "pin")
    try:
        sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
        sink.apply(
            spark.createDataFrame(
                [
                    ("k1", 1, "U", 1, 10, "click"),
                    ("k2", 2, "U", 2, 20, "view"),
                    ("k3", 3, "U", 3, 30, "scroll"),
                ],
                PART_SCHEMA,
            )
        )
        v1 = _dir_hashes(os.path.join(target.snapshots.path, "v=1"))
        # wave 2 touches ONLY the click partition
        sink.apply(
            spark.createDataFrame(
                [("k1", 4, "U", 1, 11, "click")], PART_SCHEMA
            )
        )
        v2_dir = os.path.join(target.snapshots.path, "v=2")
        v2 = _dir_hashes(v2_dir)
        for part in ("event_type=view", "event_type=scroll"):
            b = {k: h for k, h in v1.items() if k.startswith(part)}
            a = {k: h for k, h in v2.items() if k.startswith(part)}
            assert b and a == b, (part, b, a)
            # carried by hard link: same inode, zero data movement
            for rel in b:
                assert os.path.samefile(
                    os.path.join(target.snapshots.path, "v=1", rel),
                    os.path.join(v2_dir, rel),
                ), rel
        # the touched partition WAS rewritten (new files)
        clicks_before = {k for k in v1 if k.startswith("event_type=click")}
        clicks_after = {k for k in v2 if k.startswith("event_type=click")}
        assert not (clicks_before & clicks_after)
        got = {
            r["ARCANE_MERGE_KEY"]: r["score"] for r in target.read().collect()
        }
        assert got == {"k1": 11, "k2": 20, "k3": 30}
        # hard links survive expiry of the source snapshot: the link
        # count is the manifest refcount
        from arcane_framework_scala_spark.sinks.maintenance import (
            expire_snapshots,
        )

        assert expire_snapshots(target.snapshots, keep_last=1) == [1]
        still = {
            r["ARCANE_MERGE_KEY"]: r["score"] for r in target.read().collect()
        }
        assert still == got
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {target.table}")


def test_pruned_merge_rewrites_old_partition_of_a_moved_key(spark, tmp_path):
    """An update that MOVES a row between partitions must rewrite the old
    partition too (it holds a matched key), or the row would be
    resurrected from the carried-over files."""
    target = _partitioned_target(spark, tmp_path, "move")
    try:
        sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
        sink.apply(
            spark.createDataFrame(
                [
                    ("k1", 1, "U", 1, 10, "click"),
                    ("k2", 2, "U", 2, 20, "view"),
                ],
                PART_SCHEMA,
            )
        )
        # k1 moves click -> view; the click partition must lose it
        sink.apply(
            spark.createDataFrame([("k1", 3, "U", 1, 11, "view")], PART_SCHEMA)
        )
        rows = {
            r["ARCANE_MERGE_KEY"]: (r["event_type"], r["score"])
            for r in target.read().collect()
        }
        assert rows == {"k1": ("view", 11), "k2": ("view", 20)}
        # no stale k1 copy under the old partition dir
        old = target.read().filter(
            (F.col("event_type") == "click")
        ).count()
        assert old == 0
        # a delete prunes to the partition holding the matched key even
        # though the batch's own partition value is the row's old home
        sink.apply(
            spark.createDataFrame([("k2", 4, "D", 2, 20, "view")], PART_SCHEMA)
        )
        assert {
            r["ARCANE_MERGE_KEY"] for r in target.read().collect()
        } == {"k1"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {target.table}")


def test_pruned_merge_schema_drift_falls_back_to_full_rewrite(
    spark, tmp_path
):
    """Carried-over files cannot gain columns, so a drifting batch takes
    the full-table path: all partitions are rewritten with the new
    column and values stay right."""
    target = _partitioned_target(spark, tmp_path, "drift")
    try:
        sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
        sink.apply(
            spark.createDataFrame(
                [
                    ("k1", 1, "U", 1, 10, "click"),
                    ("k2", 2, "U", 2, 20, "view"),
                ],
                PART_SCHEMA,
            )
        )
        sink.apply(
            spark.createDataFrame(
                [("k1", 3, "U", 1, 11, "click", "us")],
                PART_SCHEMA + ", region string",
            )
        )
        rows = {
            r["ARCANE_MERGE_KEY"]: (r["score"], r["region"])
            for r in target.read().collect()
        }
        assert rows == {"k1": (11, "us"), "k2": (20, None)}
        # and the NEXT non-drifting merge prunes again on the widened table
        v2 = _dir_hashes(os.path.join(target.snapshots.path, "v=2"))
        sink.apply(
            spark.createDataFrame(
                [("k1", 5, "U", 1, 12, "click", "us")],
                PART_SCHEMA + ", region string",
            )
        )
        v3 = _dir_hashes(os.path.join(target.snapshots.path, "v=3"))
        view_b = {k: h for k, h in v2.items() if k.startswith("event_type=view")}
        view_a = {k: h for k, h in v3.items() if k.startswith("event_type=view")}
        assert view_b and view_a == view_b
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {target.table}")


def test_pruned_merge_randomized_waves_match_ground_truth(spark, tmp_path):
    """Seeded fuzz of the pruned-CoW flagship: five random CT waves
    (inserts, version-guarded updates, deletes, partition moves, absent-
    key deletes) against a bucket-partitioned target must land exactly
    where sequential merge_apply on a plain DataFrame lands, wave by
    wave — and the final state must also equal the same waves applied
    through an UNPARTITIONED (whole-table-rewrite) target."""
    import random

    from arcane_framework_scala_spark.operators.merge_apply import (
        merge_apply,
    )

    if not _mem_available(spark):
        pytest.skip("mem catalog jar not loaded in this session")
    rng = random.Random(42)
    target = _partitioned_target(spark, tmp_path, "fuzz")
    plain = DurableCatalogTarget(
        spark,
        str(tmp_path / "plain"),
        f"mem.itest.fuzzplain_{uuid.uuid4().hex[:8]}",
    )
    try:
        sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
        plain_sink = MergeSink(
            target=plain, dialect=SQL_SERVER_CHANGE_TRACKING
        )
        etypes = ["click", "view", "scroll"]
        ver = 0
        truth = None  # plain DataFrame ground truth via merge_apply
        for wave in range(5):
            rows = []
            for _ in range(rng.randrange(4, 10)):
                ver += 1
                k = f"k{rng.randrange(12)}"
                op = rng.choice(["U", "U", "U", "D"])
                rows.append(
                    (k, ver, op, rng.randrange(100),
                     rng.randrange(1000), rng.choice(etypes))
                )
            batch = spark.createDataFrame(rows, PART_SCHEMA)
            sink.apply(batch)
            plain_sink.apply(batch)
            if truth is None:
                truth = target.read_version(1)  # bootstrap semantics
            else:
                truth = merge_apply(
                    truth, batch, SQL_SERVER_CHANGE_TRACKING
                ).localCheckpoint()
            got = target.read()
            d1 = got.exceptAll(truth).count()
            d2 = truth.exceptAll(got).count()
            assert d1 == 0 and d2 == 0, f"wave {wave}: {d1}/{d2} rows off"
        p = plain.read()
        assert p.exceptAll(got).count() == 0
        assert got.exceptAll(p).count() == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {target.table}")
        spark.sql(f"DROP TABLE IF EXISTS {plain.table}")


def test_file_group_pruned_merge_on_sorted_layout(spark, tmp_path):
    """Iceberg's real rewrite granularity (opt-in file_group_pruning):
    on a key-sorted compacted layout, a batch touching keys from ONE
    file rewrites only that file — every unmatched file is carried by
    hard link, byte-identical; an insert-only batch carries ALL files;
    a drifting batch falls back to the full rewrite."""
    if not _mem_available(spark):
        pytest.skip("mem catalog jar not loaded in this session")
    from arcane_framework_scala_spark.sinks.maintenance import (
        optimize_snapshot,
    )

    name = f"mem.itest.fg_{uuid.uuid4().hex[:8]}"
    target = DurableCatalogTarget(
        spark, str(tmp_path / "fg"), name, file_group_pruning=True
    )
    try:
        sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
        rows = [(f"k{i:03d}", 1, "U", i, i * 10) for i in range(60)]
        sink.apply(spark.createDataFrame(rows, BATCH_SCHEMA))
        # sort-compact on the merge key into several files (v=2)
        optimize_snapshot(
            target.snapshots,
            target_file_bytes=1000,
            sort_cols=["ARCANE_MERGE_KEY"],
        )
        v2_dir = os.path.join(target.snapshots.path, "v=2")
        files = sorted(
            f for f in os.listdir(v2_dir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        assert len(files) >= 3, files
        # manifest on the sorted layout: the probe scan itself is pruned
        # at planning time to the key-range-overlapping files
        from arcane_framework_scala_spark.sinks import manifest as mf

        mf.build_manifest(target.snapshots, ["ARCANE_MERGE_KEY"])
        # pick every key living in ONE file -> the rewrite group is it
        one = spark.read.parquet(os.path.join(v2_dir, files[0]))
        keys = [r["ARCANE_MERGE_KEY"] for r in one.collect()]
        cand = mf.plan_files(
            target.snapshots, "ARCANE_MERGE_KEY",
            lo=min(keys), hi=max(keys),
        )
        assert len(cand) < len(files)  # planning pruned the probe itself
        batch = spark.createDataFrame(
            [(k, 2, "U", 0, 999) for k in keys], BATCH_SCHEMA
        )
        sink.apply(batch)
        v3_dir = os.path.join(target.snapshots.path, "v=3")
        for f in files[1:]:  # unmatched files carried: same inode
            assert os.path.samefile(
                os.path.join(v2_dir, f), os.path.join(v3_dir, f)
            ), f
        assert not os.path.exists(os.path.join(v3_dir, files[0]))
        got = {
            r["ARCANE_MERGE_KEY"]: r["score"] for r in target.read().collect()
        }
        assert all(got[k] == 999 for k in keys)
        assert len(got) == 60

        # insert-only batch: no matched keys -> ALL files carried
        v3_files = set(os.listdir(v3_dir))
        sink.apply(
            spark.createDataFrame([("new1", 3, "U", 99, 1)], BATCH_SCHEMA)
        )
        v4_dir = os.path.join(target.snapshots.path, "v=4")
        for f in v3_files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                assert os.path.samefile(
                    os.path.join(v3_dir, f), os.path.join(v4_dir, f)
                ), f
        assert target.read().count() == 61

        # schema drift falls back to the full rewrite and stays correct
        sink.apply(
            spark.createDataFrame(
                [("k000", 4, "U", 0, 1000, "eu")],
                BATCH_SCHEMA + ", region string",
            )
        )
        rows2 = {
            r["ARCANE_MERGE_KEY"]: (r["score"], r["region"])
            for r in target.read().collect()
        }
        assert rows2["k000"] == (1000, "eu")
        assert rows2["new1"] == (1, None)
        assert target.versions() == [1, 2, 3, 4, 5]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_file_group_hydration_has_no_file_name_in_literal(
    spark, tmp_path, monkeypatch
):
    """The rewrite group is hydrated by READING the matched files
    directly — never by filtering the full scan through an IN-literal
    of file-path strings. Under a uniformly-hashing merge key the
    matched set approaches |files|, and a 10^5-string IN list bloats
    the plan; a multi-path parquet scan stays O(1) plan nodes at any
    file count (VERDICT r7 'what's wrong' 1)."""
    if not _mem_available(spark):
        pytest.skip("mem catalog jar not loaded in this session")
    from arcane_framework_scala_spark.sinks.merge_sink import CatalogTarget

    name = f"mem.itest.fgplan_{uuid.uuid4().hex[:8]}"
    target = DurableCatalogTarget(
        spark, str(tmp_path / "fgplan"), name, file_group_pruning=True,
        max_rows_per_file=20,
    )
    try:
        sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
        rows = [(f"k{i:03d}", 1, "U", i, i * 10) for i in range(60)]
        sink.apply(spark.createDataFrame(rows, BATCH_SCHEMA))

        captured = []
        real_overwrite = CatalogTarget.overwrite

        def spy(self, df):
            captured.append(df)
            return real_overwrite(self, df)

        monkeypatch.setattr(CatalogTarget, "overwrite", spy)
        sink.apply(  # second merge takes the file-pruned path
            spark.createDataFrame([("k001", 2, "U", 1, 999)], BATCH_SCHEMA)
        )
        assert captured, "pruned merge never hydrated the rewrite group"
        plan = (
            captured[-1]._jdf.queryExecution().optimizedPlan().toString()
        )
        for marker in ("__f", " IN (", "INSET", "input_file_name"):
            assert marker not in plan, f"{marker!r} leaked into plan:\n{plan}"
        assert target.read().count() == 60
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_pruned_merge_survives_glob_metachars_in_table_path(
    spark, tmp_path
):
    """The rewrite-group hydration rebuilds literal paths from base_dir
    + decoded rel name and glob-escapes them before the multi-path
    parquet read — input_file_name() URIs are percent-encoded and
    Hadoop glob-expands read paths, so a table path containing glob
    metacharacters or spaces used to duplicate rows between the
    rewrite group and the linked carry set, or fail to resolve
    (ADVICE r8, merge_sink glob/percent hazard)."""
    if not _mem_available(spark):
        pytest.skip("mem catalog jar not loaded in this session")
    name = f"mem.itest.fgmeta_{uuid.uuid4().hex[:8]}"
    evil = tmp_path / "fg [glob]{x} dir"
    target = DurableCatalogTarget(
        spark, str(evil), name, file_group_pruning=True,
        max_rows_per_file=20,
    )
    try:
        sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
        rows = [(f"k{i:03d}", 1, "U", i, i * 10) for i in range(60)]
        sink.apply(spark.createDataFrame(rows, BATCH_SCHEMA))
        # second merge takes the file-pruned path in the evil dir
        sink.apply(
            spark.createDataFrame([("k001", 2, "U", 1, 999)], BATCH_SCHEMA)
        )
        got = {
            r["ARCANE_MERGE_KEY"]: r["score"]
            for r in target.read().collect()
        }
        assert len(got) == 60  # no row duplicated into the new snapshot
        assert target.read().count() == 60
        assert got["k001"] == 999 and got["k002"] == 20
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_commit_time_is_stamped_at_the_pointer_flip(spark, tmp_path):
    """version_as_of resolves against COMMIT times: _finalize stamps the
    claimed v=N dir's mtime right after the rename (the rename itself
    would keep the older staging-write mtime, so a timestamp falling
    between staging-write and the flip used to resolve to a snapshot no
    reader could have seen then — ADVICE r7)."""
    import time

    from arcane_framework_scala_spark.sinks.merge_sink import (
        SnapshotParquetTarget,
    )

    t = SnapshotParquetTarget(spark, str(tmp_path / "ct"))
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    before = time.time()
    t.overwrite(df)
    committed = os.path.getmtime(os.path.join(t.path, "v=1"))
    # the dir mtime is the commit instant, not the earlier staging write
    assert committed >= before - 0.001
    assert t.version_as_of(time.time()) == 1
    with pytest.raises(ValueError):
        t.version_as_of(before - 60)


def test_concurrent_commit_is_detected_not_lost(spark, tmp_path):
    """Optimistic commit: a pointer flipped by another writer between
    snapshot write and this writer's flip raises CommitConflictError
    (Iceberg CommitFailedException semantics) instead of silently
    discarding the other writer's commit."""
    from arcane_framework_scala_spark.sinks.merge_sink import (
        CommitConflictError,
        SnapshotParquetTarget,
    )

    t = SnapshotParquetTarget(spark, str(tmp_path / "race"))
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    t.overwrite(df)
    assert t.current_version() == 1

    calls = {"n": 0}
    real = SnapshotParquetTarget.current_version

    def racy(self):
        calls["n"] += 1
        # first read = base for the new commit; later reads see another
        # writer's v=2 having landed meanwhile
        return real(self) if calls["n"] == 1 else real(self) + 1

    t.current_version = racy.__get__(t)
    with pytest.raises(CommitConflictError):
        t._commit(df)
    del t.current_version
    assert t.current_version() == 1  # pointer untouched by the loser


def test_loser_never_clobbers_winner_data_files(spark, tmp_path):
    """Two writers race for v=2. The winner's committed data files must be
    BYTE-IDENTICAL after the loser's failed attempt — each attempt writes
    to a unique staging dir and claims ``v=N`` with one atomic rename, so
    a loser physically cannot overwrite files the winner already owns
    (the lost-update clobber the r6 scheme allowed)."""
    from arcane_framework_scala_spark.sinks.merge_sink import (
        CommitConflictError,
        SnapshotParquetTarget,
    )

    t = SnapshotParquetTarget(spark, str(tmp_path / "race2"))
    t.overwrite(spark.createDataFrame([(1, "base")], "id long, v string"))
    assert t.current_version() == 1

    # winner A: a normal commit based on v=1 -> claims v=2
    t._commit(
        spark.createDataFrame([(2, "winner")], "id long, v string"),
        expected_base=1,
    )
    assert t.current_version() == 2
    v2 = os.path.join(t.path, "v=2")
    before = {
        f: open(os.path.join(v2, f), "rb").read()
        for f in sorted(os.listdir(v2))
        if not f.startswith(".")
    }

    # loser B also read the target at v=1; its commit must fail WITHOUT
    # touching the winner's v=2 files
    with pytest.raises(CommitConflictError):
        t._commit(
            spark.createDataFrame([(3, "loser")], "id long, v string"),
            expected_base=1,
        )
    after = {
        f: open(os.path.join(v2, f), "rb").read()
        for f in sorted(os.listdir(v2))
        if not f.startswith(".")
    }
    assert after == before  # byte-identical: no clobber
    assert [r["v"] for r in t.read().collect()] == ["winner"]
    # loser's staging dir was cleaned up (no v=2.tmp-* leftovers)
    assert not [n for n in os.listdir(t.path) if ".tmp-" in n]


def test_rename_claim_detects_midflight_winner_and_crash_leftovers(
    spark, tmp_path
):
    """A ``v=N`` dir that exists while the pointer still sits at N-1 is
    either a winner mid-commit (dir renamed, pointer not yet flipped) or
    a crashed run's leftover. Either way the rename claim fails -> conflict,
    and after X3 orphan removal clears a genuine crash leftover the replay
    succeeds."""
    import shutil as sh

    from arcane_framework_scala_spark.sinks.maintenance import (
        remove_orphan_files,
    )
    from arcane_framework_scala_spark.sinks.merge_sink import (
        CommitConflictError,
        SnapshotParquetTarget,
    )

    t = SnapshotParquetTarget(spark, str(tmp_path / "crash"))
    t.overwrite(spark.createDataFrame([(1, "a")], "id long, v string"))
    # simulate a crash between the v=2 rename and the pointer flip
    sh.copytree(os.path.join(t.path, "v=1"), os.path.join(t.path, "v=2"))
    assert t.current_version() == 1

    df = spark.createDataFrame([(2, "b")], "id long, v string")
    with pytest.raises(CommitConflictError):
        t._commit(df, expected_base=1)
    assert t.current_version() == 1  # pointer untouched

    removed = remove_orphan_files(t)
    assert "v=2" in removed  # the crash leftover is above the pointer
    t._commit(df, expected_base=1)  # replay lands cleanly
    assert t.current_version() == 2
    assert sorted(r["v"] for r in t.read().collect()) == ["b"]


def test_commit_conflict_retries_and_converges(spark, target):
    """MergeSink's retry policy treats the conflict as transient: the
    retried merge re-hydrates from the winner's snapshot and lands the
    batch — no lost update, Iceberg's optimistic-concurrency loop."""
    from arcane_framework_scala_spark.sinks.merge_sink import (
        CommitConflictError,
        RetryPolicy,
    )

    sink = MergeSink(
        target=target,
        dialect=SQL_SERVER_CHANGE_TRACKING,
        retry=RetryPolicy(initial_delay_seconds=0.01),
    )
    sink.apply(spark.createDataFrame(WAVE1, BATCH_SCHEMA))

    orig = target.snapshots._commit
    state = {"raised": False}

    def conflict_once(df, **kw):
        if not state["raised"]:
            state["raised"] = True
            raise CommitConflictError("simulated concurrent commit")
        return orig(df, **kw)

    target.snapshots._commit = conflict_once
    sink.apply(spark.createDataFrame(WAVE2, BATCH_SCHEMA))  # retries inside
    assert state["raised"]
    assert target.versions() == [1, 2]
    assert _rows(target.read()) == _expected_two_waves(spark)


def test_steady_state_merges_skip_the_rehydrate(spark, target):
    """Consecutive merges from one process (the foreachBatch shape) must
    not pay a full-table re-read per batch: the mirror property proves
    the catalog already IS the current snapshot. Crash leftovers clear
    the property, so the skip is never trusted blindly."""
    sink = MergeSink(target=target, dialect=SQL_SERVER_CHANGE_TRACKING)
    sink.apply(spark.createDataFrame(WAVE1, BATCH_SCHEMA))

    calls = {"overwrites": 0}
    orig = target.catalog.overwrite

    def counting(df):
        calls["overwrites"] += 1
        return orig(df)

    target.catalog.overwrite = counting
    sink.apply(spark.createDataFrame(WAVE2, BATCH_SCHEMA))
    assert calls["overwrites"] == 0  # steady state: no rehydrate
    assert _rows(target.read()) == _expected_two_waves(spark)

    # another writer advances the durable truth behind our back -> the
    # mirror is stale and the next merge MUST rehydrate
    target.snapshots._commit(target.read().filter("ARCANE_MERGE_KEY != 'k4'"))
    sink.apply(spark.createDataFrame([("k9", 9, "U", 9, 90)], BATCH_SCHEMA))
    assert calls["overwrites"] == 1  # rehydrated from the foreign snapshot
    keys = {r["ARCANE_MERGE_KEY"] for r in target.read().collect()}
    assert keys == {"k1", "k9"}  # k4 gone (foreign snapshot), k9 merged


def test_polling_loop_with_inloop_maintenance_on_the_durable_table(
    spark, target, tmp_path
):
    """The complete production loop on ONE durable table: the T1 polling
    runner merges each wave with real MERGE INTO (CoW snapshot per
    batch), the T2 watermark lives in the snapshot layout, and the
    every-N maintenance hook compacts/expires the SAME files mid-stream —
    the reference's TargetMaintenanceProcessor wiring, jar-less."""
    import time

    from arcane_framework_scala_spark.queries.maintenance import (
        MaintenanceSchedule,
    )
    from arcane_framework_scala_spark.queries.merge import UPSERT_BLOB
    from arcane_framework_scala_spark.sinks.maintenance import run_maintenance
    from arcane_framework_scala_spark.sources import BlobParquetSource
    from arcane_framework_scala_spark.streaming import StreamRunner, StreamSettings

    src_dir = str(tmp_path / "blobs")
    os.makedirs(src_dir, exist_ok=True)
    runner = StreamRunner(
        source=BlobParquetSource(spark, src_dir, primary_keys=["pk"]),
        sink=MergeSink(target=target, dialect=UPSERT_BLOB),
        watermark_store=target.watermark_store(),
        settings=StreamSettings(poll_interval_seconds=0.01),
        maintenance=MaintenanceSchedule(optimize_every=2, expire_every=2),
        maintenance_fn=lambda op: run_maintenance(target.snapshots, op),
    )

    spark.createDataFrame(
        [("a", "v1"), ("b", "v1")], "pk string, payload string"
    ).coalesce(1).write.parquet(os.path.join(src_dir, "wave1"))
    assert runner.run_once() >= 1
    assert target.versions() == [1]

    time.sleep(1.1)  # later modification epoch for wave 2
    spark.createDataFrame(
        [("b", "v2"), ("c", "v2")], "pk string, payload string"
    ).coalesce(1).write.parquet(os.path.join(src_dir, "wave2"))
    assert runner.run_once() >= 1
    # batch 2 triggered optimize (-> v=3) then expire keep_last=1
    assert runner.metrics.maintenance_runs == 2
    assert target.versions() == [3]
    rows = {r["pk"]: r["payload"] for r in target.read().collect()}
    assert rows == {"a": "v1", "b": "v2", "c": "v2"}
    # the watermark store survives in the snapshot layout
    assert target.watermark_store().read() is not None
    # and the stream keeps merging after maintenance rewrote the files
    time.sleep(1.1)
    spark.createDataFrame(
        [("d", "v3")], "pk string, payload string"
    ).coalesce(1).write.parquet(os.path.join(src_dir, "wave3"))
    assert runner.run_once() >= 1
    assert {r["pk"] for r in target.read().collect()} == {"a", "b", "c", "d"}
