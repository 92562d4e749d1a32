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
    MemoryBoundSettings,
    MemoryBoundShaper,
    estimate_memory_cutoff,
    estimate_row_bytes,
    estimate_string_length,
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
    # the cap only fires for >1 partition — a single-partition target takes
    # the uncapped estimate, not rows=1 (reference else-branch max(chunk, 1))
    one_part = MemoryAwareShaper(
        executor_memory_bytes=1 << 30, partition_count=1
    )
    assert one_part.max_rows(schema) > 1_000_000


# ---------------------------------------------------------------------------
# Full MemoryBoundShaper port vs the reference's own test expectations
# (src/test/scala/tests/services/streaming/throughput/MemoryBoundShaperTests.scala)
# ---------------------------------------------------------------------------

_REF_SETTINGS = MemoryBoundSettings(  # MemoryBound(100, 4096, 1, 10, .5, .5, 2)
    fallback_string_size=100,
    object_type_size=4096,
    chunk_cost_scale=1,
    chunk_cost_max=10,
    table_row_count_weight=0.5,
    table_size_weight=0.5,
    table_size_scale_factor=2,
    advised_burst=10,
    advised_rate_elements=1,
    advised_rate_interval_seconds=10.0,
)

_FREE = 1 << 30  # pinned "JVM free memory"


def _ref_shaper(uptime=100.0, gc=0):
    return MemoryBoundShaper(
        settings=_REF_SETTINGS,
        free_memory_fn=lambda: _FREE,
        gc_count_fn=lambda: gc,
        uptime_fn=lambda: uptime,
    )


def test_memory_bound_empty_target_matches_reference():
    """Reference test 'correctly estimate on empty target': row size is
    fallbackStringSize*2 + 32 + 16 for a merge-key-only schema, pool cutoff
    floors at 0.2, and the flow rate stays below 15% of chunk size."""
    schema = T.StructType([T.StructField("ARCANE_MERGE_KEY", T.StringType())])
    shaper = _ref_shaper()
    elements, element_size = shaper.estimate_chunk_size(
        schema, table_records=0, table_bytes=0, partitions=1
    )
    expected_row = 100 * 2 + 32 + 16
    assert element_size == expected_row
    expected_elements = int(0.2 * _FREE / (expected_row + 1) / 2)
    assert abs(1 - elements / expected_elements) < 0.01
    rate_elems, interval = shaper.estimate_shape_rate(elements)
    assert interval == 1.0
    assert rate_elems / elements < 0.15


def test_memory_bound_non_empty_target_matches_reference():
    """Reference test 'correctly estimate on non-empty target': string
    length from column sizes (×1.5 safety ÷2 bytes/char), per-type row
    costs, sigmoid cutoff saturating to ~0.8 for a populated table."""
    schema = T.StructType(
        [
            T.StructField("ARCANE_MERGE_KEY", T.StringType()),
            T.StructField("colA", T.StringType()),
            T.StructField("colB", T.IntegerType()),
        ]
    )
    # 200 uncompressed string bytes over 10 rows → avg length 15 chars
    assert estimate_string_length(200, 10, _REF_SETTINGS) == 15
    shaper = _ref_shaper()
    elements, element_size = shaper.estimate_chunk_size(
        schema, table_records=10, table_bytes=500, partitions=1,
        string_col_bytes=200,
    )
    # 2 strings of avg length 15 (= 10 chars × 1.5 buffer) and one int:
    # 2*((10*1.5)*2 + 32 + 16) + (4+8+16+4)  — reference expectation
    expected_row = 2 * (int(10 * 1.5) * 2 + 32 + 16) + (4 + 8 + 16 + 4)
    assert element_size == expected_row
    cutoff = estimate_memory_cutoff(10, 500, _REF_SETTINGS)
    assert 0.799 < cutoff <= 0.8  # sigmoid saturates for nonzero tables
    expected_elements = int(cutoff * _FREE / (expected_row + 1) / 2)
    assert abs(1 - elements / expected_elements) < 0.01


def test_memory_bound_partitioned_halving_rule():
    """MemoryBoundShaper.scala:188-198: >1 partition → chunk forced to
    partitions/2 (merge speed), single partition → uncapped with floor 1."""
    schema = T.StructType([T.StructField("k", T.StringType())])
    parted = _ref_shaper()
    elements, _ = parted.estimate_chunk_size(
        schema, table_records=1000, table_bytes=100_000, partitions=8,
        string_col_bytes=4000,
    )
    assert elements == 4  # 8 // 2
    # tiny free memory + 1 partition → floor at 1, never 0
    tiny = MemoryBoundShaper(
        settings=_REF_SETTINGS,
        free_memory_fn=lambda: 10,
        gc_count_fn=lambda: 0,
        uptime_fn=lambda: 100.0,
    )
    elements, _ = tiny.estimate_chunk_size(
        schema, table_records=1000, table_bytes=100_000, partitions=1,
        string_col_bytes=4000,
    )
    assert elements == 1


def test_memory_bound_files_per_trigger_handoff():
    """T4→T7: the row-based chunk maps onto maxFilesPerTrigger via avg
    rows-per-file, floored at 1."""
    schema = T.StructType([T.StructField("k", T.StringType())])
    shaper = _ref_shaper()
    elements, _ = shaper.estimate_chunk_size(
        schema, table_records=1_000_000, table_bytes=1 << 28, partitions=1,
        string_col_bytes=1 << 26,
    )
    files = shaper.files_per_trigger(
        schema, table_records=1_000_000, table_bytes=1 << 28,
        table_files=100, partitions=1, string_col_bytes=1 << 26,
    )
    assert files == max(int(elements / 10_000), 1)  # 10k rows/file
    # degenerate stats never produce a zero cap
    tiny = MemoryBoundShaper(
        settings=_REF_SETTINGS,
        free_memory_fn=lambda: 10,
        gc_count_fn=lambda: 0,
        uptime_fn=lambda: 100.0,
    )
    assert tiny.files_per_trigger(schema, 0, 0, 0) == 1


def test_memory_bound_burst_and_cost():
    schema = T.StructType([T.StructField("k", T.StringType())])
    shaper = _ref_shaper()
    elements, element_size = shaper.estimate_chunk_size(
        schema, table_records=0, table_bytes=0, partitions=1
    )
    burst = shaper.estimate_shape_burst(elements, element_size)
    # burst ≥ all three floors (free/(size+1), 0.1*chunk, advised)
    assert burst >= max(int(0.1 * elements), 10)
    assert burst == int(_FREE / (element_size + 1))
    # chunk cost is sigmoid-capped at chunk_cost_max
    assert 0 <= shaper.estimate_chunk_cost(elements) <= 10
    assert shaper.estimate_chunk_cost(10 ** 12) == 10


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


def test_watermark_orders_numerically_like_mssql_ct():
    """MsSqlWatermarkTests 'compare correctly': CT versions are numeric
    longs — '9' must sort below '12' (lexicographic would invert)."""
    from arcane_framework_scala_spark.streaming.watermark import Watermark

    wm = Watermark(version="1234")
    assert Watermark(version="1233") < wm < Watermark(version="12345")
    assert Watermark(version="9") < Watermark(version="12")
    assert wm <= Watermark(version="1234") <= wm


def test_watermark_orders_lexicographically_like_synapse():
    """SynapseWatermarkTests 'compare correctly': timestamp folder names
    order as strings."""
    from arcane_framework_scala_spark.streaming.watermark import Watermark

    wm = Watermark(version="2026-01-01T00.00.00Z")
    assert Watermark(version="2025-12-01T00.00.00Z") < wm
    assert wm < Watermark(version="2026-01-01T01.00.00Z")


def test_watermark_json_roundtrip_preserves_identity():
    """Both reference watermark suites: fromJson(toJson(wm)) == wm."""
    from arcane_framework_scala_spark.streaming.watermark import Watermark

    for wm in (
        Watermark.now("1234"),
        Watermark.now("2026-01-01T00.00.00Z", prefix="p/x"),
    ):
        assert Watermark.from_json(wm.to_json()) == wm


def test_replayed_older_batch_never_regresses_watermark(tmp_path):
    """Monotonic commit guard: a source that replays an out-of-order /
    older batch (crash replay, retry) must not move the watermark
    backwards — numeric ordering, so version 9 < 12 despite '9' > '12'
    lexicographically."""
    src = FakeSource()
    runner, store = _runner(tmp_path, src)
    src.push(12)
    assert runner.run_once() == 1
    assert store.read().version == "12"
    # replay an older batch: processed (merge is idempotent) but the
    # watermark must stay at 12
    src.pending.append(MicroBatch(df=None, watermark={"version": 9}))
    src.head = 12
    runner.run_once()
    assert store.read().version == "12"
    # a genuinely newer batch still advances
    src.push(13)
    runner.run_once()
    assert store.read().version == "13"


def test_t4_gate_oracle_cost_constants_match_shaper():
    """The t4_shaper_chain oracle hardcodes the documents-schema row costs
    as 216+6*slen (MemoryBoundShaper matrix) and 216+9*slen
    (MemoryAwareShaper matrix). Recompute both from throughput.py so a
    cost-matrix change breaks HERE before it breaks the driver's gate."""
    from arcane_framework_scala_spark.streaming.throughput import (
        _reference_row_size,
        estimate_row_bytes,
    )

    docs_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    for slen in (1, 17, 230):
        assert _reference_row_size(docs_schema, slen) == 216 + 6 * slen
        assert estimate_row_bytes(docs_schema, float(slen)) == 216 + 9 * slen


def test_sigterm_delivery_stops_runner_and_restores_handlers(tmp_path):
    """T10: install_signal_handler + a REAL os.kill(SIGTERM) sets the
    cancel event; prior handlers must be restorable (the t10 gate's
    save/restore contract)."""
    import os
    import signal

    src = FakeSource()
    runner, _ = _runner(tmp_path, src)
    prev_term = signal.getsignal(signal.SIGTERM)
    try:
        runner.install_signal_handler()
        os.kill(os.getpid(), signal.SIGTERM)
        # handler runs at the next bytecode boundary on the main thread
        for _ in range(1000):
            if runner._cancelled.is_set():
                break
        assert runner._cancelled.is_set()
    finally:
        signal.signal(signal.SIGTERM, prev_term)
    assert signal.getsignal(signal.SIGTERM) is prev_term


def test_cancellation_mid_iterator_holds_watermark_at_last_merge(tmp_path):
    """T10/T2: stop landing between yielded batches finishes nothing
    further — the loop breaks with batches pending, and the watermark
    stays at the LAST MERGED version (no idle-advance that would skip
    the pending range on restart)."""
    src = FakeSource()
    runner, store = _runner(tmp_path, src)

    def changes(since):
        yield MicroBatch(df=None, watermark={"version": 5})
        runner.stop()  # arrives after batch 5 merged, before batch 9
        yield MicroBatch(df=None, watermark={"version": 9})

    src.changes = changes
    src.head = 9
    assert runner.run_once() == 1  # batch 5 only
    assert store.read().version == "5"  # not 9: batch 9 never processed


def test_mssql_builder_wraps_time_columns_to_nanos():
    """ADVICE r4 item 1: the TIME→nanos conversion must be IN the
    generated SELECT text (driven by the 3-tuple ColumnSummary type
    code), not a helper only tests call. 2-tuples stay bare."""
    b = MsSqlQueryBuilder(database="db", schema="dbo", table="t")
    cols = [("pk", True, "bigint"), ("opened", False, "time"), ("val", False)]
    delta = b.changes_query(cols, last_id=7)
    assert (
        "CAST(DATEDIFF_BIG(NANOSECOND, CAST('00:00:00' AS time), "
        "tq.[opened]) AS BIGINT) as [opened]" in delta
    )
    assert "tq.[val]" in delta and "tq.[opened]," not in delta
    backfill = b.backfill_query(cols)
    assert (
        "CAST(DATEDIFF_BIG(NANOSECOND, CAST('00:00:00' AS time), "
        "tq.[opened]) AS BIGINT) as [opened]" in backfill
    )
    # discovery now emits the DATA_TYPE code the 3-tuple is built from
    assert "c.DATA_TYPE" in b.column_summaries_query()
    # a time PRIMARY KEY converts on the CHANGETABLE side too
    pk_time = b.changes_query([("at", True, "time"), ("v", False)], last_id=1)
    assert (
        "CAST(DATEDIFF_BIG(NANOSECOND, CAST('00:00:00' AS time), "
        "ct.[at]) AS BIGINT) as [at]" in pk_time
    )


def test_a7_cost_surfaces_match_reference_semantics():
    """A7 (QueryProvider.scala:163-186 + MsSqlStreamingSource.scala:
    382-411): the profile probe renders the reference's EXEC block, the
    cost sum treats NULL estimates as 0, costToSize clamps 1+ln(cost)^3
    into [1,1000] (only NEGATIVE results floor to 1 — 0<calc<1 passes
    through, faithfully), and the derived shard count ceils size/shard."""
    import math

    from arcane_framework_scala_spark.sources.mssql import (
        MsSqlQueryBuilder,
        cost_to_size,
        shards_from_cost,
        sum_profile_cost,
    )

    b = MsSqlQueryBuilder("db", "dbo", "t")
    q = b.stats_profile_query()
    assert q.startswith("EXEC('") and "SET STATISTICS PROFILE ON;" in q
    assert "SELECT TOP 1 * FROM [dbo].[t];" in q

    assert sum_profile_cost([]) == 0.0
    assert sum_profile_cost(
        [{"EstimateIO": 0.5, "EstimateCPU": 0.25},
         {"EstimateIO": None, "EstimateCPU": 1.0}, {}]
    ) == 1.75

    assert cost_to_size(1.0) == 1.0              # ln(1)=0 -> 1
    assert cost_to_size(0.1) == 1.0              # negative -> floor 1
    assert cost_to_size(1e6) == 1000.0           # cap
    assert 0 < cost_to_size(0.5) < 1             # passes through (ref)
    assert abs(cost_to_size(42.5) - (1 + math.log(42.5) ** 3)) < 1e-9

    # 10 GiB table at cost 42.5 -> ceil(10240 / 53.713) = 191 shards
    assert shards_from_cost(10240.0, 42.5) == 191
    assert shards_from_cost(1.0, 1e6) == 1       # tiny table, one shard

    stats_q = b.physical_stats_query(500)
    assert "dm_db_index_physical_stats" in stats_q
    assert "/ 500) as shards" in stats_q
