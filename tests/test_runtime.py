"""Runtime units: polling runner semantics (T1/T2/T9/T10), throughput
shapers (T3-T5), retry policy, and MSSQL T-SQL builder shapes (S1-S5)."""

import pyspark.sql.types as T
import pytest

from arcane_framework_scala_spark.queries.merge import UPSERT_BLOB
from arcane_framework_scala_spark.sinks.merge_sink import RetryPolicy, with_retry
from arcane_framework_scala_spark.sources.base import MicroBatch
from arcane_framework_scala_spark.sources.mssql import MsSqlQueryBuilder
from arcane_framework_scala_spark.streaming.runner import StreamRunner, StreamSettings
from arcane_framework_scala_spark.streaming.throughput import (
    MemoryAwareShaper,
    estimate_row_bytes,
)
from arcane_framework_scala_spark.streaming.watermark import FileWatermarkStore


class FakeSource:
    """Scripted CdcSource; versions advance only when batches are pushed."""

    def __init__(self):
        self.pending = []
        self.head = 0
        self.fetches = 0

    def push(self, version):
        self.head = version
        self.pending.append(MicroBatch(df=None, watermark={"version": version}))

    def current_version(self):
        return {"version": self.head}

    def changes(self, since):
        self.fetches += 1
        out, self.pending = self.pending, []
        return iter(out)


def _runner(tmp_path, source):
    store = FileWatermarkStore(path=str(tmp_path / "wm.json"))
    return StreamRunner(
        source=source,
        sink=None,  # watermark-only batches never touch the sink
        watermark_store=store,
        settings=StreamSettings(poll_interval_seconds=0.01),
    ), store


def test_idle_poll_skips_fetch_after_version_probe(tmp_path):
    src = FakeSource()
    runner, store = _runner(tmp_path, src)
    src.push(5)
    assert runner.run_once() == 1
    assert store.read().version == "5"
    fetches = src.fetches
    # head unchanged → probe short-circuits, no fetch (T1 semantics)
    assert runner.run_once() == 0
    assert src.fetches == fetches
    # but the watermark still refreshes (liveness)
    assert store.read().version == "5"


def test_new_version_triggers_fetch(tmp_path):
    src = FakeSource()
    runner, store = _runner(tmp_path, src)
    src.push(5)
    runner.run_once()
    src.push(9)
    assert runner.run_once() == 1
    assert store.read().version == "9"


def test_stop_terminates_run_loop(tmp_path):
    import threading

    src = FakeSource()
    runner, _ = _runner(tmp_path, src)
    src.push(1)
    t = threading.Thread(target=runner.run)
    t.start()
    runner.stop()
    t.join(timeout=10)
    assert not t.is_alive()


def test_stop_before_first_batch_keeps_watermark(tmp_path):
    # T10/T2: cancellation with batches pending must NOT idle-advance the
    # watermark to the source head — that would permanently skip the
    # pending [watermark, head] range on restart.
    src = FakeSource()
    runner, store = _runner(tmp_path, src)
    src.push(5)
    assert runner.run_once() == 1  # watermark now at 5
    src.push(9)
    runner.stop()  # requested before the next cycle processes anything
    assert runner.run_once() == 0
    assert store.read().version == "5"  # NOT 9 — batch for 9 never merged
    # a restarted runner picks the pending range back up
    runner2, store2 = _runner(tmp_path, src)
    src.pending.append(
        MicroBatch(df=None, watermark={"version": 9})
    )  # source replays >5
    assert runner2.run_once() == 1
    assert store2.read().version == "9"


def test_watermark_version_sort_is_numeric():
    from arcane_framework_scala_spark.operators.watermark_rows import (
        version_sort_key,
    )

    # '10' must rank above '9' (lexicographic would invert them and the
    # caller, committing the last element, would regress progress)
    vs = ["9", "10", "2", "100", "zeta", "alpha"]
    assert sorted(vs, key=version_sort_key) == [
        "2", "9", "10", "100", "alpha", "zeta",
    ]


def test_retry_policy_retries_transient_only():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("connection reset")
        return "ok"

    policy = RetryPolicy(max_attempts=4, initial_delay_seconds=0.01)
    assert with_retry(policy, flaky) == "ok"
    assert calls["n"] == 3

    def fatal():
        raise ValueError("syntax error in merge")

    with pytest.raises(ValueError):
        with_retry(policy, fatal)


def test_row_bytes_model_matches_reference_costs():
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("l", T.LongType()),
            T.StructField("d", T.DecimalType(30, 6)),
            T.StructField("s", T.StringType()),
        ]
    )
    # 32 + 36 + 136 + (48 + 2*32*1.5) = 348 (reference per-type costs)
    assert estimate_row_bytes(schema, avg_string_len=32) == 348


def test_memory_shaper_partition_cap():
    shaper = MemoryAwareShaper(
        executor_memory_bytes=1 << 30, partition_count=64
    )
    schema = T.StructType([T.StructField("l", T.LongType())])
    # partition-aware cap: ≤ partitions/2 (MemoryBoundShaper.scala:188-198)
    assert shaper.max_rows(schema) == 32


def test_mssql_builder_matches_reference_shapes():
    b = MsSqlQueryBuilder(database="db", schema="dbo", table="t")
    cols = [("pk", True), ("val", False)]
    delta = b.changes_query(cols, last_id=42)
    assert "CHANGETABLE (CHANGES [db].[dbo].[t], 42)" in delta
    assert "RIGHT JOIN" in delta
    assert (
        "lower(convert(nvarchar(128), HashBytes('SHA2_256', "
        "cast(ct.[pk] as nvarchar(128))),2)) as [ARCANE_MERGE_KEY]" in delta
    )
    backfill = b.backfill_query(cols)
    assert "CAST(0 as BIGINT) as SYS_CHANGE_VERSION" in backfill
    assert "'I' as SYS_CHANGE_OPERATION" in backfill
    preds = b.shard_predicates(["pk"], 4)
    assert preds[0] == "ABS(CHECKSUM([pk])) % 4 = 0" and len(preds) == 4
    assert "TOP 1" in b.has_changes_query(42)
