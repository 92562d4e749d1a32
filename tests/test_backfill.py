"""Backfill graph tests (§3.2 merge mode, §3.3 sharded overwrite mode).

Models the reference's backfill integration tests
(``tests/services/backfill/...``): stage shards, combine, dedup, swap —
plus the resume semantics the shard state machine exists for."""

import os

import pyspark.sql.functions as F
import pytest

from arcane_framework_scala_spark.backfill.graph import (
    BackfillOverwriteRunner,
    BackfillState,
    FileBackfillStateStore,
    STAGED,
    Shard,
    run_backfill_merge,
)
from arcane_framework_scala_spark.queries.merge import UPSERT_BLOB
from arcane_framework_scala_spark.sinks.merge_sink import (
    MergeSink,
    SnapshotParquetTarget,
)
from arcane_framework_scala_spark.sources.blob import BlobParquetSource
from arcane_framework_scala_spark.streaming.watermark import FileWatermarkStore


@pytest.fixture()
def lineitem_feed(spark, sf_dir, tmp_path):
    """lineitem split into 3 parquet 'blobs' under an incoming dir."""
    src = str(tmp_path / "incoming")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(3000)
    for i in range(3):
        li.filter(F.col("l_orderkey") % 3 == i).write.parquet(
            f"{src}/part{i}", mode="overwrite"
        )
    return src, li.count()


def _runner(spark, tmp_path, source):
    target = SnapshotParquetTarget(spark, str(tmp_path / "target"))
    store = FileBackfillStateStore(str(tmp_path / "state.json"))
    wm = FileWatermarkStore(path=str(tmp_path / "wm.json"))
    return (
        BackfillOverwriteRunner(
            spark,
            target,
            UPSERT_BLOB,
            staging_dir=str(tmp_path / "staging"),
            state_store=store,
            watermark_store=wm,
        ),
        target,
        store,
        wm,
    )


def test_overwrite_backfill_stages_combines_swaps(spark, tmp_path, lineitem_feed):
    src_dir, _total = lineitem_feed
    source = BlobParquetSource(
        spark=spark, path=src_dir, primary_keys=["l_orderkey", "l_linenumber"]
    )
    runner, target, store, wm = _runner(spark, tmp_path, source)
    shards = source.backfill_shards(max_shard_files=2)
    assert len(shards) >= 2  # file groups actually sharded

    result = runner.run(shards, backfill_id="bf1", start_version="0", end_version="99")
    distinct_keys = (
        spark.read.parquet(f"{src_dir}/part0", f"{src_dir}/part1", f"{src_dir}/part2")
        .select("l_orderkey", "l_linenumber")
        .distinct()
        .count()
    )
    # W2 dedup leaves one row per merge key (ties collapse to rank()=1 rows)
    assert result.select("ARCANE_MERGE_KEY").distinct().count() == distinct_keys
    assert target.read() is not None
    state = store.read()
    assert state is not None and all(v == "COMBINED" for v in state.shard_states.values())
    assert wm.read() is not None and wm.read().version == "99"


def test_overwrite_backfill_resume_skips_staged_shards(spark, tmp_path, lineitem_feed):
    src_dir, _ = lineitem_feed
    source = BlobParquetSource(
        spark=spark, path=src_dir, primary_keys=["l_orderkey", "l_linenumber"]
    )
    runner, target, store, _ = _runner(spark, tmp_path, source)
    shards = source.backfill_shards(max_shard_files=2)

    # simulate a crash after shard 0 staged: pre-commit its STAGED marker
    # with a poisoned loader — resume must not call it
    runner._stage(shards[0])
    store.commit(
        BackfillState(
            "bf1", "0", "99", shard_states={shards[0].name: STAGED}
        )
    )

    def boom():
        raise AssertionError("resume re-staged an already-STAGED shard")

    poisoned = [Shard(name=shards[0].name, load=boom)] + list(shards[1:])
    result = runner.run(poisoned, backfill_id="bf1", start_version="0", end_version="99")
    assert result.count() > 0


def test_backfill_merge_bounded_pass(spark, tmp_path, lineitem_feed):
    src_dir, _ = lineitem_feed
    source = BlobParquetSource(
        spark=spark, path=src_dir, primary_keys=["l_orderkey", "l_linenumber"]
    )
    target = SnapshotParquetTarget(spark, str(tmp_path / "target"))
    sink = MergeSink(target=target, dialect=UPSERT_BLOB)
    wm = FileWatermarkStore(path=str(tmp_path / "wm.json"))
    n = run_backfill_merge(source, sink, wm, start_version=None)
    assert n >= 1
    first = target.read().count()
    # re-running the same backfill is a no-op thanks to the version guard
    run_backfill_merge(source, sink, wm, start_version=None)
    assert target.read().count() == first


def test_overwrite_backfill_uses_reference_shard_naming(spark, tmp_path, lineitem_feed):
    """With a NameGenerator bound, shard staging directories follow the
    reference scheme backfill__{stream}__{bfid}__shard__{id} — a resumed
    run and maintenance sweeps find them by prefix."""
    import os

    from arcane_framework_scala_spark.naming import NameGenerator

    src_dir, _ = lineitem_feed
    source = BlobParquetSource(
        spark=spark, path=src_dir, primary_keys=["l_orderkey", "l_linenumber"]
    )
    target = SnapshotParquetTarget(spark, str(tmp_path / "target2"))
    store = FileBackfillStateStore(str(tmp_path / "state2.json"))
    staging = str(tmp_path / "staging2")
    runner = BackfillOverwriteRunner(
        spark,
        target,
        UPSERT_BLOB,
        staging_dir=staging,
        state_store=store,
        names=NameGenerator(
            target_table_full_name="wh.ns.lineitem",
            stream_id="li-stream",
            backfill_id="bf-9",
        ),
    )
    shards = source.backfill_shards(max_shard_files=2)
    runner.run(shards, backfill_id="bf-9", start_version="0", end_version="9")
    dirs = sorted(os.listdir(staging))
    assert dirs, "staging dir is empty"
    for d in dirs:
        assert d.startswith("backfill__li_stream__bf_9__shard__"), dirs
