"""Snapshot time travel: versions(), read_version(), expiry interplay."""

import pytest
import pyspark.sql.functions as F

from arcane_framework_scala_spark.queries.merge import (
    SQL_SERVER_CHANGE_TRACKING,
)
from arcane_framework_scala_spark.sinks.maintenance import expire_snapshots
from arcane_framework_scala_spark.sinks.merge_sink import (
    SnapshotParquetTarget,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "ARCANE_MERGE_KEY string, SYS_CHANGE_VERSION long, "
        "SYS_CHANGE_OPERATION string, v long",
    )


def _target(spark, tmp_path):
    t = SnapshotParquetTarget(spark, str(tmp_path / "tgt"))
    t.merge(_batch(spark, [("a", 1, "I", 10), ("b", 1, "I", 20)]),
            SQL_SERVER_CHANGE_TRACKING)
    t.merge(_batch(spark, [("a", 2, "U", 11), ("c", 2, "I", 30)]),
            SQL_SERVER_CHANGE_TRACKING)
    t.merge(_batch(spark, [("b", 3, "D", 0)]), SQL_SERVER_CHANGE_TRACKING)
    return t


def test_versions_and_historical_reads(spark, tmp_path):
    t = _target(spark, tmp_path)
    assert t.versions() == [1, 2, 3]

    def state(df):
        return {r["ARCANE_MERGE_KEY"]: r["v"] for r in df.collect()}

    assert state(t.read_version(1)) == {"a": 10, "b": 20}
    assert state(t.read_version(2)) == {"a": 11, "b": 20, "c": 30}
    assert state(t.read_version(3)) == {"a": 11, "c": 30}
    # current == newest snapshot
    assert state(t.read()) == state(t.read_version(3))


def test_read_version_rejects_unknown(spark, tmp_path):
    t = _target(spark, tmp_path)
    with pytest.raises(ValueError, match="not available"):
        t.read_version(9)


def test_expiry_removes_history_keeps_current(spark, tmp_path):
    t = _target(spark, tmp_path)
    expire_snapshots(t, keep_last=1)
    assert t.versions() == [3]
    with pytest.raises(ValueError):
        t.read_version(1)
    assert t.read().count() == 2  # current still intact


def test_timestamp_as_of_resolves_commit_times(spark, tmp_path):
    """TIMESTAMP AS OF: the newest snapshot committed at or before the
    asked moment (commit time = the claim rename's mtime), raising
    before the first commit; interplay with expiry (an expired version
    no longer resolves)."""
    import os
    import time

    from arcane_framework_scala_spark.sinks.maintenance import (
        should_compact,
    )

    t = _target(spark, tmp_path)  # versions 1..3
    now = time.time()
    for v, ago in ((1, 300), (2, 200), (3, 100)):
        os.utime(os.path.join(t.path, f"v={v}"), (now - ago, now - ago))

    assert t.version_as_of(now - 250) == 1
    assert t.version_as_of(now - 150) == 2
    assert t.version_as_of(now) == 3
    assert {r["ARCANE_MERGE_KEY"] for r in t.read_as_of(now - 150).collect()} \
        == {"a", "b", "c"}
    with pytest.raises(ValueError, match="no snapshot at or before"):
        t.version_as_of(now - 400)
    expire_snapshots(t, keep_last=2)
    # v=1 expired; AT-OR-BEFORE only, so a moment predating every
    # retained commit resolves to nothing (never silently to a newer one)
    with pytest.raises(ValueError, match="no snapshot at or before"):
        t.version_as_of(now - 250)
    assert t.version_as_of(now - 150) == 2  # still resolvable history

    # stats-driven compaction trigger: fragment the current snapshot
    # (one row per file) -> pressure; after compaction -> quiet
    from arcane_framework_scala_spark.sinks.maintenance import (
        optimize_snapshot,
    )

    t.max_rows_per_file = 1
    t.overwrite(t.read())
    t.max_rows_per_file = None
    assert should_compact(t, target_file_bytes=128 << 20)
    optimize_snapshot(t, target_file_bytes=128 << 20)
    assert not should_compact(t, target_file_bytes=128 << 20)


def test_history_lists_versions_with_commit_times(spark, tmp_path):
    """history() = (version, commit_ts) oldest-first, consistent with
    version_as_of on the same clock; Row inputs to sum_profile_cost work
    like dicts (the JDBC fetch shape)."""
    import time

    from arcane_framework_scala_spark.sources.mssql import sum_profile_cost

    t = _target(spark, tmp_path)
    h = t.history()
    assert [v for v, _ in h] == [1, 2, 3]
    assert all(ts <= time.time() + 1 for _, ts in h)
    assert sorted(ts for _, ts in h) == [ts for _, ts in h]
    assert t.version_as_of(h[1][1]) == 2

    rows = spark.createDataFrame(
        [(0.5, 0.25), (None, 1.0)], "EstimateIO double, EstimateCPU double"
    ).collect()
    assert sum_profile_cost(rows) == 1.75


def test_age_based_expiry_and_orphan_retention_window(spark, tmp_path):
    """The reference expires by age (retention_threshold =>
    '<duration>' — JdbcSnapshotExpirationRequest.scala:9): snapshots
    committed inside the window survive even when keep_last would drop
    them, and remove_orphan_files spares entries younger than its window
    (a concurrent writer's in-flight staging dir is not a leftover)."""
    import os
    import time

    from arcane_framework_scala_spark.sinks.maintenance import (
        remove_orphan_files,
    )

    t = _target(spark, tmp_path)  # versions 1..3
    now = time.time()
    # v=1 committed an hour ago; v=2/v=3 just now
    os.utime(os.path.join(t.path, "v=1"), (now - 3600, now - 3600))
    # age window of 30 min: only v=1 is old enough to expire
    doomed = expire_snapshots(
        t, keep_last=1, retention_threshold_seconds=1800, now_fn=lambda: now
    )
    assert doomed == [1]
    assert t.versions() == [2, 3]

    # orphan retention: a fresh staging dir (concurrent writer mid-
    # commit) is spared; an hour-old one is a leftover and goes
    fresh = os.path.join(t.path, "v=4.tmp-fresh")
    stale = os.path.join(t.path, "v=4.tmp-stale")
    os.makedirs(fresh)
    os.makedirs(stale)
    os.utime(stale, (now - 3600, now - 3600))
    removed = remove_orphan_files(
        t, retention_threshold_seconds=1800, now_fn=lambda: now
    )
    assert removed == ["v=4.tmp-stale"]
    assert os.path.isdir(fresh)
    # eager mode (threshold 0, the test default) removes it too
    assert remove_orphan_files(t) == ["v=4.tmp-fresh"]


def test_snapshot_gate_family_invariants(spark, sf_dir):
    """Cross-gate consistency at sf0.001: the w4 time-travel snapshot
    states, the w5 change feed, and the IVM result must agree with
    each other (they share the same two-batch construction):
    - v1 keys + CDF inserts - CDF deletes == current keys
    - the IVM per-user counts sum to the current snapshot's row count
    """
    import __spark_entry__ as entry

    w4 = entry.q_w4_time_travel(spark, sf_dir).collect()
    v1_keys = {r["ARCANE_MERGE_KEY"] for r in w4 if r["snapshot"] == "v1"}
    cur_keys = {
        r["ARCANE_MERGE_KEY"] for r in w4 if r["snapshot"] == "current"
    }
    cdf = entry.q_w5_change_feed(spark, sf_dir).collect()
    ins = {r["ARCANE_MERGE_KEY"] for r in cdf if r["op"] == "insert"}
    dels = {r["ARCANE_MERGE_KEY"] for r in cdf if r["op"] == "delete"}
    upd = {r["ARCANE_MERGE_KEY"] for r in cdf if r["op"] == "update"}
    assert (v1_keys | ins) - dels == cur_keys
    assert upd <= v1_keys & cur_keys
    ivm = entry.q_t_incremental_agg(spark, sf_dir).collect()
    assert sum(r["n"] for r in ivm) == len(cur_keys)
