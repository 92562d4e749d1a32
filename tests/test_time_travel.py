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
