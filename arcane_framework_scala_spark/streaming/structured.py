"""Structured Streaming front-end: readStream → foreachBatch → merge.

The reference's CDC loop is a single-process poll-sleep-fetch cycle
(``DefaultStreamDataProvider.scala:91-113``). On Spark the same pipeline
runs as a real Structured Streaming query:

    spark.readStream (file source, maxFilesPerTrigger from the shaper)
      → enrich (merge key P4 + version from file modification time)
      → foreachBatch: field filter (P1) → version-guarded MERGE (M1-M3)
                      → maintenance every-N (X1-X4) → watermark commit (T2)

Exactly-once composition: Spark's checkpoint makes each micro-batch
replayable; the version-guarded merge makes replays no-ops (T9); the
watermark property commit happens inside foreachBatch *after* the merge,
preserving the reference's ordering contract. The trigger cadence maps the
poll interval (T1); ``maxFilesPerTrigger`` maps throughput shaping (T3/T5).

Scale: the file source lists incrementally, batches cap at
``max_files_per_batch``, and the merge itself is the only shuffle. At
100 TB the same topology runs with an Iceberg ``CatalogTarget`` — only the
target object changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.merge_key import blob_merge_key
from arcane_framework_scala_spark.operators.field_filter import (
    FieldSelectionRule,
    apply_field_selection,
)
from arcane_framework_scala_spark.queries.maintenance import MaintenanceSchedule
from arcane_framework_scala_spark.schema.schema import (
    BLOB_VERSION_COLUMN,
    MERGE_KEY_COLUMN,
)
from arcane_framework_scala_spark.sinks.merge_sink import MergeSink
from arcane_framework_scala_spark.streaming.watermark import Watermark, WatermarkStore


@dataclass
class StructuredBlobStream:
    """S8 as a Structured Streaming source + the full merge pipeline."""

    spark: SparkSession
    path: str
    schema: str  # file sources require an explicit schema when streaming
    primary_keys: list[str]
    sink: MergeSink
    watermark_store: WatermarkStore
    checkpoint_dir: str
    format: str = "parquet"
    max_files_per_batch: int = 10_000
    #: T3/T4 → T7 hand-off (VERDICT r6 item 7): a ``MemoryBoundShaper``
    #: here SIZES the per-trigger cap from the live memory budget and
    #: the source's footer stats instead of the static
    #: ``max_files_per_batch`` — the reference feeds the same chunk
    #: estimate to its ZStream rechunker (``ThroughputShaper.scala:
    #: 22-40``). The estimate happens at query start (Spark's file
    #: source reads ``maxFilesPerTrigger`` once); a poll-loop deployment
    #: re-estimates per ``start()``/``run_available()`` burst, which is
    #: exactly the reference's per-poll cadence. The applied cap is
    #: recorded in ``shaped_cap`` for observability.
    shaper: object | None = None
    shaped_cap: int | None = None
    #: micro-batches that performed a merge (gate/test observability —
    #: the trigger-progress count for data triggers)
    batches_processed: int = 0
    field_rule: FieldSelectionRule | None = None
    maintenance: MaintenanceSchedule = field(default_factory=MaintenanceSchedule)
    #: callable(op_name) executing the maintenance op against the target
    maintenance_fn: object | None = None
    #: optional callable(batch_id) invoked after each successful
    #: merge+watermark commit — the hook a derived-view maintainer rides
    #: (``operators.ivm.StreamingViewMaintainer.sync``): the view lags
    #: at most one trigger and catches up on the next (the maintainer is
    #: gap-tolerant), so exactly-once of the TABLE never depends on it
    on_batch_merged: object | None = None
    #: optional metrics.DeclaredMetrics hub — merge/maintenance durations
    #: gauge from inside foreachBatch; ``start()`` also registers the
    #: progress listener so rows.incoming/trigger duration come from
    #: Spark's own counters at zero extra job cost
    declared_metrics: object | None = None
    #: T1 poll/skip semantics (DefaultStreamDataProvider.scala:94-111):
    #: when a poll finds NO changes the reference still advances the
    #: watermark (same version, fresh timestamp) so watermark age does
    #: not grow unboundedly on a quiet source. Spark's file source never
    #: runs an empty micro-batch, so the equivalent signal is the
    #: QueryIdleEvent — emitted when a trigger interval passes with no
    #: data (cadence: ``spark.sql.streaming.noDataProgressEventInterval``).
    #: ``start()`` registers the listener when this is True.
    idle_watermark_advance: bool = True
    #: number of watermark-only advances performed (idle triggers)
    idle_advances: int = 0

    def _shaped_max_files(self) -> int:
        """Ask the shaper for this run's file cap: chunk rows from the
        memory-bound estimate (free memory read LIVE, so a shrinking
        budget shrinks the cap), divided by the source's average rows
        per file from parquet footers. Falls back to the static knob
        without a shaper or before any source files exist."""
        if self.shaper is None:
            return self.max_files_per_batch
        from pyspark.sql import types as T

        from arcane_framework_scala_spark.sinks.table_stats import table_stats

        st = table_stats(self.path)
        if st.files == 0:
            return self.max_files_per_batch
        schema = T.StructType.fromDDL(self.schema)
        string_bytes = sum(
            st.column_bytes.get(f.name, 0)
            for f in schema.fields
            if isinstance(f.dataType, T.StringType)
        )
        cap = self.shaper.files_per_trigger(
            schema,
            table_records=st.records,
            table_bytes=st.bytes,
            table_files=st.files,
            string_col_bytes=string_bytes,
        )
        return min(cap, self.max_files_per_batch)

    def _source(self) -> DataFrame:
        self.shaped_cap = self._shaped_max_files()
        reader = (
            self.spark.readStream.format(self.format)
            .schema(self.schema)
            .option("maxFilesPerTrigger", str(self.shaped_cap))
            # blob layouts nest files under arrival folders; match the
            # batch source's recursive listing
            .option("recursiveFileLookup", "true")
        )
        df = reader.load(self.path)
        # MICROSECOND resolution, not cast-to-long (= epoch SECONDS):
        # two waves written within the same second would otherwise get
        # EQUAL versions and the dialect's strictly-greater update guard
        # (s.version > t.version) would silently reject every update of
        # the second wave — the r9 root cause of the stream-hook flake
        # (fast warm-suite runs landed both waves in one second; slow
        # isolated runs never did, so it looked load-dependent).
        version = F.unix_micros(F.col("_metadata.file_modification_time"))
        return df.select(
            "*",
            blob_merge_key(*self.primary_keys).alias(MERGE_KEY_COLUMN),
            version.alias(BLOB_VERSION_COLUMN),
        )

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from arcane_framework_scala_spark import metrics as M

        if batch_df.isEmpty():
            # T1 poll/skip semantics (DefaultStreamDataProvider.scala:
            # 94-111): an empty trigger advances the watermark ONLY —
            # same version, fresh timestamp — so the watermark-age
            # metric doesn't grow unboundedly while the source is quiet
            # (the reference's seed-flag "no updates detected on
            # startup" advance). No merge, no maintenance.
            prev = self.watermark_store.read()
            self.watermark_store.commit(
                Watermark.now(
                    version=prev.version if prev else "",
                    prefix=prev.prefix if prev else None,
                )
            )
            if self.declared_metrics is not None:
                self.declared_metrics.counter(M.WATERMARK_UPDATES)
            return
        df = batch_df
        if self.field_rule is not None:
            df = apply_field_selection(df, self.field_rule)
        # the version column is data now (foreachBatch df is a static frame)
        max_version = df.agg(F.max(BLOB_VERSION_COLUMN)).first()[0]
        dm = self.declared_metrics
        with M.timed_gauge(dm, M.BATCH_MERGE_DURATION):
            self.sink.apply(df)
        self.batches_processed += 1
        for op in self.maintenance.due(batch_id):
            if self.maintenance_fn is not None:
                with M.timed_gauge(
                    dm,
                    M.MAINTENANCE_DURATION_METRICS.get(
                        op, M.NAMESPACE + ".target." + op
                    ),
                ):
                    self.maintenance_fn(op)
        # ordering contract: watermark only after a successful merge
        self.watermark_store.commit(Watermark.now(version=str(max_version or "")))
        if dm is not None:
            dm.counter(M.WATERMARK_UPDATES)
        if self.on_batch_merged is not None:
            self.on_batch_merged(batch_id)

    def start(self, trigger: dict | None = None):
        """Launch the query. ``trigger`` kwargs pass through — e.g.
        ``{"processingTime": "15 seconds"}`` (T1 cadence) or
        ``{"availableNow": True}`` (bounded catch-up / tests)."""
        if self.declared_metrics is not None:
            from arcane_framework_scala_spark import metrics as M

            # idempotent per stream object; Spark dedups listener instances
            if not hasattr(self, "_listener"):
                self._listener = M.make_streaming_listener(self.declared_metrics)
                self.spark.streams.addListener(self._listener)
        writer = (
            self._source()
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if trigger:
            writer = writer.trigger(**trigger)
        query = writer.start()
        if self.idle_watermark_advance:
            listener = self._make_idle_listener(str(query.id))
            self.spark.streams.addListener(listener)
            self._idle_listener = listener
        return query

    def detach_idle_listener(self) -> None:
        """Unregister the idle-advance listener (call after stopping the
        query). Listeners are session-global in Spark; a long-lived
        session running many short streams would otherwise accumulate
        one listener per ``start()`` — each still filtered to its own
        query id, so correctness is unaffected, but the event fan-out
        grows without bound."""
        listener = getattr(self, "_idle_listener", None)
        if listener is not None:
            self.spark.streams.removeListener(listener)
            self._idle_listener = None

    def _make_idle_listener(self, query_id: str):
        """Watermark-only advance on idle triggers (T1 poll/skip). The
        listener runs on Spark's event thread; FileWatermarkStore's
        rename-commit and the table-property ALTER are both atomic, so
        a concurrent batch commit cannot interleave half a watermark."""
        from pyspark.sql.streaming import StreamingQueryListener

        stream = self

        class _IdleWatermarkAdvance(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                pass

            def onQueryIdle(self, event):
                if str(event.id) != query_id:
                    return
                prev = stream.watermark_store.read()
                stream.watermark_store.commit(
                    Watermark.now(
                        version=prev.version if prev else "",
                        prefix=prev.prefix if prev else None,
                    )
                )
                stream.idle_advances += 1
                if stream.declared_metrics is not None:
                    from arcane_framework_scala_spark import metrics as M

                    stream.declared_metrics.counter(M.WATERMARK_UPDATES)

            def onQueryTerminated(self, event):
                pass

        return _IdleWatermarkAdvance()

    # -- bounded catch-up (availableNow) with a verified drain ---------
    #
    # ``Trigger.AvailableNow`` snapshots the source's file listing ONCE,
    # when the query starts, and processes only that snapshot. A file
    # whose directory entry is not yet visible to that single driver-side
    # listing — observed once under full-suite load, where the committer
    # rename of just-written source files raced the new query's listing —
    # is silently deferred to a next trigger that never comes, while the
    # query still terminates "successfully" with an empty micro-batch.
    # A poll-loop production deployment would paper over the skipped wave
    # until its next trigger; a bounded catch-up must not. So the drain
    # verifies itself: snapshot the listing HERE (before the query ever
    # starts), then after termination compare it against the file-source
    # metadata log (the source's own durable record of every file it
    # committed, ``<ckpt>/sources/0``) and re-drain on shortfall. Files
    # arriving after run_available() was called are out of contract and
    # simply make the next drain's snapshot.

    def _listable_files(self) -> set[str]:
        """The files Spark's file source would consider, right now: a
        recursive walk honoring the source's hidden-file rule (names
        starting with ``.`` or ``_`` are invisible, at any depth)."""
        import os

        found: set[str] = set()
        for root, dirs, files in os.walk(self.path):
            dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
            for name in files:
                if not name.startswith((".", "_")):
                    found.add(os.path.abspath(os.path.join(root, name)))
        return found

    def _source_committed_files(self) -> set[str]:
        """Every file path the file source has durably committed, read
        from its metadata log (``v1`` header + one JSON entry per file;
        ``N.compact`` files carry the full union). Driver-side metadata,
        O(files seen) — the same log the source itself replays."""
        import json
        import os
        from urllib.parse import unquote, urlparse

        log_dir = os.path.join(self.checkpoint_dir, "sources", "0")
        committed: set[str] = set()
        if not os.path.isdir(log_dir):
            return committed
        for name in os.listdir(log_dir):
            stem = name[: -len(".compact")] if name.endswith(".compact") else name
            if name.startswith(".") or not stem.isdigit():
                continue
            with open(os.path.join(log_dir, name), encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line or line.startswith("v"):
                        continue
                    entry = json.loads(line)
                    committed.add(
                        os.path.abspath(unquote(urlparse(entry["path"]).path))
                    )
        return committed

    def run_available(self, *, max_drains: int = 3) -> int:
        """Process everything listable at call time, then stop
        (backfill-merge §3.2 shape on the streaming engine). Returns the
        total input rows read — Spark counts every source re-read inside
        foreachBatch (emptiness probe, max-version, merge), so the value
        is >= the logical row count and 0 exactly when nothing was
        ingested. The drain is verified: every file in
        the pre-start listing snapshot must appear in the source's
        metadata log afterwards; on shortfall the drain re-runs (a fresh
        query re-lists) up to ``max_drains`` times, then raises —
        surfacing the violated contract instead of silently returning
        with unprocessed input. The verification walks the path with the
        local filesystem; on object-store URIs the walk is empty and the
        check is vacuous (the race itself is a local-FS rename artifact —
        object-store listings are already read-after-write consistent)."""
        import json
        import logging

        expected = self._listable_files()
        total_rows = 0
        shortfall: set[str] = set()
        for _attempt in range(max_drains):
            q = self.start(trigger={"availableNow": True})
            q.awaitTermination()
            self.detach_idle_listener()
            total_rows += sum(
                json.loads(p.json).get("numInputRows", 0)
                for p in q.recentProgress
            )
            shortfall = expected - self._source_committed_files()
            if not shortfall:
                return total_rows
            logging.getLogger(__name__).warning(
                "run_available: availableNow drain left %d listable "
                "file(s) uncommitted (listing-snapshot race); re-draining",
                len(shortfall),
            )
        raise RuntimeError(
            "run_available: %d file(s) listable before the drain never "
            "reached the file-source metadata log after %d attempts: %s"
            % (len(shortfall), max_drains, sorted(shortfall)[:5])
        )
