"""Merge sinks (K2/K3 + T8 schema migration).

Three target flavors behind one interface:

- ``CatalogTarget``: a catalog table (Iceberg/Delta). The generated MERGE
  SQL from :mod:`queries.merge` executes via ``spark.sql`` — storage-side
  file pruning, snapshots and ``TBLPROPERTIES`` watermarks come free. This
  is the production path at 100 TB.
- ``SnapshotParquetTarget``: a plain parquet directory managed as
  versioned snapshots (``v=N`` subdirs + a ``_CURRENT`` pointer committed
  by atomic rename). Merge semantics execute through
  :func:`operators.merge_apply`. This makes the full pipeline runnable and
  testable on any filesystem with zero catalog dependencies — the local
  stand-in for Iceberg, not a scale recommendation.

Both implement the reference's merge-retry policy (exponential backoff with
an error-message allowlist, ``services/merging/JdbcMergeServiceClient.
scala:38-58``) and per-batch schema drift handling (T8: missing columns are
added to the target before the merge — ``SchemaMigrationProcessor.scala:
24-50``).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from arcane_framework_scala_spark.operators.merge_apply import merge_apply
from arcane_framework_scala_spark.sources.paths import glob_escape
from arcane_framework_scala_spark.queries.merge import MergeDialect, build_merge_query
from arcane_framework_scala_spark.schema.schema import MERGE_KEY_COLUMN


@dataclass(frozen=True)
class RetryPolicy:
    """Exponential backoff; retry only on transient-looking errors."""

    max_attempts: int = 4
    initial_delay_seconds: float = 1.0
    scale_factor: float = 2.0
    retryable_fragments: tuple[str, ...] = (
        "IOException",
        "connection",
        "timeout acquiring",
        "CommitFailedException",
        "CommitConflictError",  # the in-repo snapshot-pointer analogue
    )

    def is_retryable(self, error: BaseException) -> bool:
        msg = f"{type(error).__name__}: {error}"
        return any(f.lower() in msg.lower() for f in self.retryable_fragments)


def with_retry(policy: RetryPolicy, fn):
    delay = policy.initial_delay_seconds
    for attempt in range(policy.max_attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — policy decides
            if attempt == policy.max_attempts - 1 or not policy.is_retryable(e):
                raise
            time.sleep(delay)
            delay *= policy.scale_factor


class CommitConflictError(RuntimeError):
    """A concurrent writer committed between this writer's snapshot write
    and pointer flip — the filesystem analogue of Iceberg's
    ``CommitFailedException``. Retryable by policy: the retried merge
    re-hydrates from the winner's snapshot, so no batch is lost."""


#: K1 parity: the reference chunks staged parquet at 10 000 rows per file
#: (``IcebergS3CatalogWriter.scala:34``). Spark-native file sizing
#: (``write.target-file-size-bytes`` / split planning) is the better default
#: at scale — tiny files are a 100 TB anti-pattern — so the knob is opt-in.
REFERENCE_MAX_ROWS_PER_FILE = 10_000


class SnapshotParquetTarget:
    """Versioned-parquet table: ``<path>/v=N`` snapshot dirs + ``_CURRENT``
    pointer (atomic rename commit). Readers always see a complete snapshot.

    ``max_rows_per_file`` maps the reference's ``maxRowsPerFile`` staging
    knob onto Spark's ``maxRecordsPerFile`` write option (file writes are
    parallel per partition either way, matching the reference's
    ``ZIO.collectAllPar`` file fan-out)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        max_rows_per_file: int | None = None,
        partition_cols: list[str] | None = None,
    ):
        self.spark = spark
        self.path = path
        self.max_rows_per_file = max_rows_per_file
        #: hive-partition every committed snapshot by these columns — the
        #: 100 TB requirement (Iceberg partition spec equivalent): reads
        #: with a partition predicate prune to the matching directories
        #: (PartitionFilters in the scan, pinned by test_plan_audit).
        #: Partition values must be type-inference-stable (strings that
        #: don't look numeric, or genuine numerics) — the same contract
        #: hive layouts always had.
        self.partition_cols = list(partition_cols or [])

    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def exists(self) -> bool:
        return self.current_version() is not None

    def read(self) -> DataFrame | None:
        v = self.current_version()
        if v is None:
            return None
        return self.spark.read.parquet(glob_escape(os.path.join(self.path, f"v={v}")))

    def versions(self) -> list[int]:
        """Committed snapshot versions, oldest first — the readable
        history (snapshots past ``_CURRENT`` are uncommitted leftovers;
        expired ones are gone). Iceberg's ``snapshots`` metadata table
        equivalent for the sandbox layout."""
        cur = self.current_version()
        if cur is None:
            return []
        out = []
        for name in os.listdir(self.path):
            if name.startswith("v="):
                try:
                    v = int(name[2:])
                except ValueError:
                    continue
                if v <= cur:
                    out.append(v)
        return sorted(out)

    def read_version(self, version: int) -> DataFrame:
        """Time travel: read a specific committed snapshot (Iceberg
        ``VERSION AS OF`` / Delta ``versionAsOf``). Raises if the
        snapshot was never committed or has been expired."""
        if version not in self.versions():
            raise ValueError(
                f"snapshot v={version} not available under {self.path} "
                f"(have {self.versions()})"
            )
        return self.spark.read.parquet(glob_escape(os.path.join(self.path, f"v={version}")))

    def version_as_of(self, timestamp: float) -> int:
        """Iceberg ``TIMESTAMP AS OF`` resolution: the newest snapshot
        committed at or before ``timestamp`` (unix seconds). Commit time
        is the version directory's mtime, stamped by ``_finalize``
        immediately after the claim rename succeeds (the rename itself
        preserves the staging dir's older mtime). Raises if every
        retained snapshot is newer (the history before the first
        commit, or expired away)."""
        best = None
        for v in self.versions():
            if os.path.getmtime(os.path.join(self.path, f"v={v}")) <= timestamp:
                best = v
        if best is None:
            raise ValueError(
                f"no snapshot at or before timestamp {timestamp} under "
                f"{self.path} (have {self.versions()})"
            )
        return best

    def read_as_of(self, timestamp: float) -> DataFrame:
        """Time travel by wall clock (Iceberg ``TIMESTAMP AS OF`` / Delta
        ``timestampAsOf``): the table exactly as a reader at that moment
        saw it."""
        return self.read_version(self.version_as_of(timestamp))

    def read_range(
        self, col: str, lo=None, hi=None, version: int | None = None
    ) -> DataFrame:
        """Manifest-planned range read (point lookup with ``lo == hi``):
        when the snapshot carries a ``_MANIFEST.json`` sidecar
        (``sinks.manifest.build_manifest`` — run it after a sort-strategy
        compaction), Spark opens ONLY the files whose [min, max] for
        ``col`` overlaps [lo, hi]; a residual filter keeps the result
        exact. Without a manifest this is the plain filtered scan —
        correct either way, file-pruned on a sorted layout (Iceberg's
        manifest range pruning on the sandbox layout)."""
        from arcane_framework_scala_spark.sinks.manifest import read_range

        return read_range(self, col, lo, hi, version)

    def history(self) -> list[tuple[int, float]]:
        """Commit history, oldest first: ``(version, commit_unix_ts)``
        per retained snapshot (Delta ``DESCRIBE HISTORY`` / the Iceberg
        ``snapshots`` table's committed_at) — commit time is the claim
        rename's mtime, the same clock ``version_as_of`` resolves
        against."""
        return [
            (v, os.path.getmtime(os.path.join(self.path, f"v={v}")))
            for v in self.versions()
        ]

    def _commit(self, df: DataFrame, expected_base: int | None = None) -> None:
        """Optimistic commit (Iceberg ``CommitFailedException`` semantics).

        Each attempt writes its snapshot to a writer-unique STAGING dir
        (``v=N.tmp-<token>``) and then claims the version number with one
        atomic ``os.rename`` onto ``v=N`` — a rename onto an existing
        non-empty directory fails, so the filesystem itself arbitrates:
        exactly one concurrent writer owns ``v=N``, and a loser can never
        clobber data files the winner already committed. The loser's
        staging dir is removed best-effort (leftovers are
        ``remove_orphan_files`` territory), and ``CommitConflictError`` is
        retryable — the retried merge re-hydrates from the winner's
        snapshot, so both batches land.

        ``expected_base`` is the version the CALLER's read was based on
        (captured by :meth:`merge` before reading the target). A commit
        that landed between that read and this call moves the pointer off
        ``expected_base`` and is detected here — without it, the merge
        result would silently drop the intervening batch (lost update).
        """
        if expected_base is None:
            expected_base = self.current_version() or 0
        staging = self._write_staging(df, expected_base + 1)
        self._finalize(staging, expected_base)

    def _write_staging(self, df: DataFrame, v: int) -> str:
        """Write ``df`` as the candidate ``v`` snapshot into a
        writer-unique staging dir; returns the staging path."""
        staging = os.path.join(self.path, f"v={v}.tmp-{uuid.uuid4().hex[:12]}")
        writer = df.write.mode("overwrite")
        if self.max_rows_per_file:
            writer = writer.option("maxRecordsPerFile", self.max_rows_per_file)
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.parquet(staging)
        return staging

    def _finalize(self, staging: str, expected_base: int) -> None:
        """Claim ``v=expected_base+1`` with one atomic rename of the
        staging dir, then flip the pointer."""
        v = expected_base + 1
        out = os.path.join(self.path, f"v={v}")
        if (self.current_version() or 0) != expected_base:
            shutil.rmtree(staging, ignore_errors=True)
            raise CommitConflictError(
                f"concurrent commit to {self.path}: merge read the target "
                f"at v={expected_base}, pointer now at "
                f"v={self.current_version()}"
            )
        try:
            os.rename(staging, out)
        except OSError:
            # v=N already exists: a concurrent writer claimed this version
            # first (or a crashed run left it behind — X3 removes v-dirs
            # above the pointer, after which the replay succeeds).
            shutil.rmtree(staging, ignore_errors=True)
            raise CommitConflictError(
                f"concurrent commit to {self.path}: v={v} already claimed "
                f"by another writer"
            ) from None
        # stamp COMMIT time on the claimed dir: os.rename keeps the
        # renamed directory's own mtime (= last staging write, which
        # precedes the pointer flip), so without this a version_as_of
        # timestamp falling between staging-write and the flip would
        # resolve to a snapshot no reader could have seen at that moment.
        os.utime(out)
        tmp = self._pointer() + f".tmp-{uuid.uuid4().hex[:12]}"
        os.makedirs(self.path, exist_ok=True)
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer())

    def _commit_pruned(
        self, df: DataFrame, carry_dirs: list[str], expected_base: int
    ) -> None:
        """CoW commit of a PRUNED rewrite group: ``df`` holds only the
        rewritten (touched) partitions, and every untouched partition
        directory of the base snapshot is carried into the new snapshot
        by HARD LINK — byte-identical by construction (same inodes, zero
        data movement), the file-level reuse an Iceberg manifest
        expresses by reference. ``carry_dirs`` are base-snapshot-relative
        leaf partition paths (``col=value[/col2=value2]``). Snapshots stay
        self-contained (every version dir lists the full table) and
        expiry stays a plain ``rmtree``: the filesystem's link count is
        the manifest refcount, so shared files survive until the last
        referencing snapshot is expired. Falls back to copy when the
        filesystem refuses links."""
        staging = self._write_staging(df, expected_base + 1)
        base_dir = os.path.join(self.path, f"v={expected_base}")
        for rel in carry_dirs:
            src = os.path.join(base_dir, rel)
            dst = os.path.join(staging, rel)
            os.makedirs(dst, exist_ok=True)
            for name in os.listdir(src):
                s = os.path.join(src, name)
                if not os.path.isfile(s):
                    continue
                d = os.path.join(dst, name)
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)
        self._finalize(staging, expected_base)

    def overwrite(self, df: DataFrame) -> None:
        self._commit(df)

    def merge(self, source: DataFrame, dialect: MergeDialect) -> None:
        # capture the base version BEFORE reading: the merge result is a
        # function of this snapshot, so the commit must verify the pointer
        # has not moved off it (otherwise the intervening batch is lost).
        base = self.current_version()
        target = (
            self.spark.read.parquet(glob_escape(os.path.join(self.path, f"v={base}")))
            if base is not None
            else None
        )
        if target is None:
            # bootstrap: first batch becomes the target minus delete markers
            insert_ok = (
                F.expr(dialect.insert_condition.replace("t_s.", ""))
                if dialect.insert_condition
                else F.lit(True)
            )
            from arcane_framework_scala_spark.operators.dedup_window import (
                latest_version_per_key,
            )
            boot = latest_version_per_key(source, dialect.version_column).filter(
                insert_ok
            )
            drop = [c for c in dialect.non_data_columns if c in boot.columns]
            self._commit(boot.drop(*drop), expected_base=0)
            return
        # T8 schema drift: add source-only columns to the target as nulls
        missing = [
            f
            for f in source.schema.fields
            if f.name not in set(target.columns)
            and f.name not in dialect.non_data_columns
        ]
        for f in missing:
            target = target.withColumn(f.name, F.lit(None).cast(f.dataType))
        self._commit(merge_apply(target, source, dialect), expected_base=base)


class CatalogTarget:
    """Catalog-table target driven by generated MERGE SQL (Iceberg/Delta).

    The bootstrapped table carries only data columns (markers like
    ``SYS_CHANGE_OPERATION``/``IsDelete`` stay in the staged batch;
    :func:`queries.merge.build_merge_query` likewise never assigns them),
    so every later batch merges onto the same schema it would have created.

    On catalogs whose tables don't accept ``MERGE INTO`` (vanilla Spark's
    v1 session catalog), the same dialect semantics execute through
    :func:`operators.merge_apply` + ``replace`` — one code path per
    semantic, two physical strategies, chosen per table at runtime."""

    def __init__(self, spark: SparkSession, table: str):
        self.spark = spark
        self.table = table

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def read(self) -> DataFrame | None:
        return self.spark.table(self.table) if self.exists() else None

    def overwrite(self, df: DataFrame) -> None:
        try:
            df.writeTo(self.table).createOrReplace()
        except Exception as e:  # noqa: BLE001 — v1 catalogs lack RTAS
            if "REPLACE TABLE" not in str(e):
                raise
            df.write.mode("overwrite").saveAsTable(self.table)

    def _migrate_schema(self, source: DataFrame, dialect: MergeDialect) -> None:
        """T8 drift: add source-only data columns to the target before the
        merge (``SchemaMigrationProcessor.scala:24-50``). ADD COLUMNS is a
        metadata-only operation on Iceberg/Delta/v1 alike."""
        target_cols = {c.lower() for c in self.spark.table(self.table).columns}
        markers = {c.lower() for c in dialect.non_data_columns}
        missing = [
            f
            for f in source.schema.fields
            if f.name.lower() not in target_cols
            and f.name.lower() not in markers
        ]
        if missing:
            cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in missing)
            self.spark.sql(f"ALTER TABLE {self.table} ADD COLUMNS ({cols})")

    def merge(self, source: DataFrame, dialect: MergeDialect) -> None:
        if not self.exists():
            df = source
            from arcane_framework_scala_spark.operators.dedup_window import (
                latest_version_per_key,
            )
            df = latest_version_per_key(df, dialect.version_column)
            if dialect.insert_condition:
                df = df.filter(F.expr(dialect.insert_condition.replace("t_s.", "")))
            df = df.drop(*[c for c in dialect.non_data_columns if c in df.columns])
            df.writeTo(self.table).create()
            return
        self._migrate_schema(source, dialect)
        view = f"__arcane_staged_{abs(hash(self.table)) % 10_000_000}"
        # run the MERGE on the SOURCE DataFrame's session, not the one the
        # target was constructed with: inside a foreachBatch callback the
        # batch frame belongs to a per-stream CLONED session, and a temp
        # view registered there is invisible to the outer session (the
        # catalog itself is safe — MemCatalog/Iceberg state is JVM-global,
        # and clones inherit the spark.sql.catalog.* conf).
        sess = source.sparkSession
        source.createOrReplaceTempView(view)
        try:
            sql = build_merge_query(
                dialect, self.table, view, source.columns, deduplicate=True
            )
            try:
                sess.sql(sql)
            except Exception as e:  # noqa: BLE001 — inspect & re-raise below
                if "MERGE INTO" not in str(e):
                    raise
                # catalog has no MERGE support: same semantics, DataFrame
                # execution. Materialize before replace — the plan reads
                # the table being replaced.
                merged = merge_apply(sess.table(self.table), source, dialect)
                self.overwrite(merged.localCheckpoint(eager=True))
        finally:
            sess.catalog.dropTempView(view)


class DurableCatalogTarget:
    """Copy-on-write lakehouse table: real ``MERGE INTO`` execution AND
    durable snapshot commits AND maintenance, all on ONE table.

    Iceberg's copy-on-write MERGE performs exactly this sequence per
    commit (``JdbcMergeServiceClient.scala:62-91`` drives it through
    Trino): (1) read the current snapshot's files, (2) execute the
    rewrite through the DSv2 group-based row-level-operation surface,
    (3) commit the rewritten files as a new snapshot. Here step 2 runs on
    the javaext MemCatalog (the same ``SupportsRowLevelOperations``
    surface Iceberg CoW uses, so the generated MERGE SQL is byte-identical
    to the catalog path), and steps 1/3 run on the versioned-parquet
    layout the X1–X4 maintenance family already manages — compaction,
    snapshot expiry, orphan removal, ANALYZE and time travel all operate
    on the same files every merge commits.

    On a hive-partitioned table (``partition_cols``) the rewrite group is
    PRUNED to the touched partitions, exactly as Iceberg CoW prunes the
    rewrite to files whose key ranges intersect the source (the same
    partition-scoped merge the reference's ``ON … IN (…)`` lists buy —
    ``models/queries/MergeQuerySegment.scala:54-71``): the execution
    table is hydrated with only the partitions the batch writes into or
    holds a matched merge key in, the MERGE rewrites just that group, and
    the snapshot commit carries every untouched partition directory over
    by hard link — byte-identical, zero data movement
    (:meth:`SnapshotParquetTarget._commit_pruned`). Unpartitioned tables
    keep the whole-table group (there is nothing to prune by), and a
    schema-drift batch falls back to the full rewrite (carried-over files
    cannot gain columns). Durable truth is the snapshot layout either
    way: every merge re-hydrates the execution table from ``_CURRENT``
    first, so a crash after the MERGE but before the snapshot commit
    loses nothing — the retried batch replays onto the last durable
    snapshot (T9 version guards make the replay idempotent).

    ``file_group_pruning=True`` extends the pruning BELOW partitions to
    Iceberg's real granularity on unpartitioned tables: the rewrite
    group is the set of FILES containing a matched merge key (found by
    the same broadcast-semi-join planning scan, grouped by
    ``input_file_name``), every unmatched file is carried by hard link,
    and inserts land in the rewritten output. How much it prunes is the
    layout's property, exactly as on Iceberg: after
    ``optimize_snapshot(sort_cols=[...])`` a key-clustered batch touches
    few files; a uniformly-hashing merge key touches most. Opt-in for
    now: the whole-table path keeps the steady-state mirror elision
    (zero re-read on consecutive merges), which the file-group path
    trades for O(|group|) hydration per merge.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        table: str,
        max_rows_per_file: int | None = None,
        partition_cols: list[str] | None = None,
        file_group_pruning: bool = False,
    ):
        self.spark = spark
        self.table = table
        self.snapshots = SnapshotParquetTarget(
            spark, path, max_rows_per_file, partition_cols
        )
        self.catalog = CatalogTarget(spark, table)
        self.file_group_pruning = file_group_pruning

    # -- durable truth: reads delegate to the snapshot layout ---------

    def exists(self) -> bool:
        return self.snapshots.exists()

    def read(self) -> DataFrame | None:
        return self.snapshots.read()

    def versions(self) -> list[int]:
        return self.snapshots.versions()

    def read_version(self, version: int) -> DataFrame:
        return self.snapshots.read_version(version)

    def read_as_of(self, timestamp: float) -> DataFrame:
        return self.snapshots.read_as_of(timestamp)

    def read_range(
        self, col: str, lo=None, hi=None, version: int | None = None
    ) -> DataFrame:
        return self.snapshots.read_range(col, lo, hi, version)

    def history(self) -> list[tuple[int, float]]:
        return self.snapshots.history()

    # -- CoW write path ------------------------------------------------

    #: catalog property recording which durable snapshot the execution
    #: table is a faithful copy of. Set only AFTER both sides agree;
    #: cleared BEFORE the catalog is mutated — so a crash at any point
    #: leaves it absent/stale and the next merge re-hydrates. Steady
    #: state (consecutive merges from one process, e.g. foreachBatch)
    #: skips the full-table re-read entirely.
    MIRROR_PROPERTY = "arcane.mirror_of_snapshot"

    def _mirror_version(self) -> int | None:
        if not self.catalog.exists():
            return None
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {self.table}").collect()
        props = {r["key"]: r["value"] for r in rows}
        try:
            return int(props[self.MIRROR_PROPERTY])
        except (KeyError, ValueError):
            return None

    def _set_mirror(self, version: int) -> None:
        self.spark.sql(
            f"ALTER TABLE {self.table} SET TBLPROPERTIES "
            f"('{self.MIRROR_PROPERTY}'='{version}')"
        )

    def _clear_mirror(self) -> None:
        self.spark.sql(
            f"ALTER TABLE {self.table} UNSET TBLPROPERTIES IF EXISTS "
            f"('{self.MIRROR_PROPERTY}')"
        )

    def _hydrate(self) -> None:
        """Step 1 of the CoW commit: the execution table mirrors the
        current durable snapshot. A catalog table whose mirror property
        matches ``_CURRENT`` is that snapshot (the property is cleared
        before every mutation), so the full-table re-read is skipped;
        anything else — absent property, stale version, leftover of a
        crash between MERGE and commit — is never trusted."""
        cur_v = self.snapshots.current_version()
        if cur_v is None:
            if self.catalog.exists():
                self.spark.sql(f"DROP TABLE {self.table}")
            return
        if self._mirror_version() == cur_v:
            return  # steady state: catalog already IS this snapshot
        self.catalog.overwrite(self.snapshots.read())
        self._set_mirror(cur_v)

    def _commit_from_catalog(self, expected_base: int | None = None) -> None:
        """Step 3: the rewritten table becomes the next durable snapshot
        (atomic ``v=N`` claim + ``_CURRENT`` flip — readers never see a
        partial one), then the catalog is marked as its mirror.
        ``expected_base`` is the snapshot the catalog was hydrated from;
        a commit landing in between raises ``CommitConflictError`` and the
        retried merge re-hydrates from the winner."""
        merged = self.catalog.read()
        assert merged is not None  # _hydrate + merge always create it
        self.snapshots._commit(merged, expected_base=expected_base)
        self._set_mirror(self.snapshots.current_version())

    def overwrite(self, df: DataFrame) -> None:
        base = self.snapshots.current_version() or 0
        if self.catalog.exists():
            self._clear_mirror()
        self.catalog.overwrite(df)
        self._commit_from_catalog(expected_base=base)

    def merge(self, source: DataFrame, dialect: MergeDialect) -> None:
        # the base version is captured BEFORE hydrate: the MERGE rewrites
        # a catalog table that mirrors exactly this snapshot, so the
        # commit asserts the pointer has not moved off it since.
        base = self.snapshots.current_version() or 0
        if (
            base
            and self.snapshots.partition_cols
            and self._merge_pruned(source, dialect, base)
        ):
            return
        if (
            base
            and self.file_group_pruning
            and not self.snapshots.partition_cols
            and self._merge_pruned_files(source, dialect, base)
        ):
            return
        self._hydrate()
        if self.catalog.exists():
            self._clear_mirror()  # catalog is about to diverge
        self.catalog.merge(source, dialect)  # real MERGE INTO (step 2)
        self._commit_from_catalog(expected_base=base)

    def _merge_pruned(
        self, source: DataFrame, dialect: MergeDialect, base: int
    ) -> bool:
        """Partition-scoped CoW merge: rewrite ONLY the touched rewrite
        group; carry every other partition's data files into the new
        snapshot byte-identically. Returns False when the pruned path
        does not apply (the batch drifts the schema — carried-over files
        cannot gain columns — or lacks the partition columns), in which
        case the caller runs the full-table path.

        The rewrite group = partitions the batch writes into (its own
        partition values) ∪ base partitions holding a matched merge key
        (an update may MOVE a row between partitions: the old partition
        must be rewritten without it). The key probe is a broadcast
        semi-join over a two-column pruned scan — the planning read
        Iceberg CoW also performs to find matched files; what it never
        does is rewrite unmatched ones. On a sort-compacted layout
        (``optimize_snapshot(sort_cols)``) the same carry logic extends
        below partitions to file-level key ranges; partition granularity
        is what the layout guarantees without footer reads."""
        from urllib.parse import unquote, urlparse

        pcols = self.snapshots.partition_cols
        base_dir = os.path.join(self.snapshots.path, f"v={base}")
        base_df = self.spark.read.parquet(glob_escape(base_dir))
        have = {c.lower() for c in base_df.columns}
        markers = {c.lower() for c in dialect.non_data_columns}
        if any(
            f.name.lower() not in have and f.name.lower() not in markers
            for f in source.schema.fields
        ):
            return False  # T8 drift -> full rewrite
        if any(c not in source.columns for c in pcols):
            return False
        src_parts = source.select(*pcols).distinct()
        keys = source.select(MERGE_KEY_COLUMN).distinct()
        matched_parts = (
            base_df.join(F.broadcast(keys), MERGE_KEY_COLUMN, "leftsemi")
            .select(*pcols)
            .distinct()
        )
        touched = [
            tuple(r)
            for r in src_parts.unionByName(matched_parts).distinct().collect()
        ]  # metadata-sized: bounded by the batch's partition spread
        # untouched leaf dirs, named by the ENGINE (hive-escaping-proof):
        # distinct parent dir per base data file, anti-joined null-safe
        # against the touched tuples (a NULL partition value is still one
        # partition). One row per leaf dir reaches the driver.
        part_schema = source.select(*pcols).schema
        tdf = self.spark.createDataFrame(touched, part_schema)
        dirs = base_df.select(
            *pcols,
            F.regexp_replace(F.input_file_name(), "/[^/]*$", "").alias("__d"),
        ).distinct()
        cond = None
        for c in pcols:
            e = dirs[c].eqNullSafe(tdf[c])
            cond = e if cond is None else cond & e
        carry = sorted(
            {
                os.path.relpath(unquote(urlparse(r["__d"]).path), base_dir)
                for r in dirs.join(tdf, cond, "left_anti")
                .select("__d")
                .collect()
            }
        )
        # hydrate the catalog with ONLY the rewrite group (a partition
        # filter — the scan prunes to the touched directories). The
        # catalog never mirrors the full snapshot on this path, so the
        # mirror property stays unset and the next merge re-hydrates its
        # own (cheap, group-sized) slice.
        terms = []
        for t in touched:
            conj = None
            for c, v in zip(pcols, t):
                e = F.col(c).eqNullSafe(F.lit(v))
                conj = e if conj is None else conj & e
            terms.append(conj)
        while len(terms) > 1:  # balanced OR: no deep-recursion plans
            terms = [
                terms[i] | terms[i + 1] if i + 1 < len(terms) else terms[i]
                for i in range(0, len(terms), 2)
            ]
        group = base_df.filter(terms[0] if terms else F.lit(False))
        if self.catalog.exists():
            self._clear_mirror()
        self.catalog.overwrite(group)
        self.catalog.merge(source, dialect)  # real MERGE INTO on the group
        merged = self.catalog.read()
        assert merged is not None
        self.snapshots._commit_pruned(merged, carry, expected_base=base)
        return True

    def _merge_pruned_files(
        self, source: DataFrame, dialect: MergeDialect, base: int
    ) -> bool:
        """File-granular CoW merge (Iceberg's real rewrite unit): the
        rewrite group is the set of base data FILES holding a matched
        merge key; unmatched files are carried into the new snapshot by
        hard link, byte-identical. Returns False when the pruned path
        does not apply (schema drift — carried files cannot gain
        columns). Inserts need no file: they land in the rewritten
        output alongside the group's surviving rows.

        The matched-file probe is the planning scan Iceberg CoW also
        runs (a broadcast semi-join over two columns, here key +
        ``input_file_name``); the group it finds is as small as the
        LAYOUT makes it — few files after a key-sorted compaction, most
        files under a uniformly-hashing key. When the snapshot carries a
        column-range manifest covering the merge key
        (``sinks.manifest.build_manifest``), the probe itself is pruned
        at PLANNING time: files whose key range cannot overlap the
        batch's [min, max] key are carried without being scanned —
        Iceberg's manifest range pruning, so the probe cost drops from
        O(table) to O(candidate files) on a sorted layout. Carried file
        names keep their task-UUID part names; a collision with a
        freshly written name is vanishingly unlikely but still detected
        (the link raises instead of clobbering)."""
        from urllib.parse import unquote, urlparse

        base_dir = os.path.join(self.snapshots.path, f"v={base}")
        base_df = self.spark.read.parquet(glob_escape(base_dir))
        have = {c.lower() for c in base_df.columns}
        markers = {c.lower() for c in dialect.non_data_columns}
        if any(
            f.name.lower() not in have and f.name.lower() not in markers
            for f in source.schema.fields
        ):
            return False  # T8 drift -> full rewrite
        keys = source.select(MERGE_KEY_COLUMN).distinct()

        # planning-time candidate pruning from the column-range manifest
        # (absent manifest -> every file is a candidate). deferred import:
        # manifest.py imports this module.
        from arcane_framework_scala_spark.sinks.manifest import plan_files

        lo_hi = None
        candidates = plan_files(self.snapshots, MERGE_KEY_COLUMN, version=base)
        if candidates is not None:
            lo_hi = source.agg(
                F.min(MERGE_KEY_COLUMN), F.max(MERGE_KEY_COLUMN)
            ).first()
            candidates = plan_files(
                self.snapshots,
                MERGE_KEY_COLUMN,
                lo=lo_hi[0],
                hi=lo_hi[1],
                version=base,
            )
        probe_df = (
            base_df
            if candidates is None
            else (
                self.spark.read.parquet(
                    *[glob_escape(c) for c in candidates]
                )
                if candidates
                else base_df.filter(F.lit(False))
            )
        )
        tagged = probe_df.withColumn("__f", F.input_file_name())

        def rel(uri: str) -> str:
            return os.path.relpath(unquote(urlparse(uri).path), base_dir)

        matched_uris = [
            r["__f"]
            for r in tagged.join(F.broadcast(keys), MERGE_KEY_COLUMN, "leftsemi")
            .select("__f")
            .distinct()
            .collect()
        ]  # metadata-sized: ≤ |files|
        from arcane_framework_scala_spark.sinks.table_stats import (
            _parquet_files,
        )

        all_files = {
            os.path.relpath(p, base_dir) for p in _parquet_files(base_dir)
        }
        matched_rel = sorted({rel(u) for u in matched_uris})
        carry = sorted(all_files - set(matched_rel))
        # the rewrite group IS the matched files — hydrate by reading
        # exactly those paths. Never an `isin(<file literals>)` filter:
        # under a uniformly-hashing merge key the matched set approaches
        # |files| and an IN-literal of 10^5+ path strings bloats the plan
        # (the scan below stays O(1) plan nodes at any file count).
        # Paths are REBUILT from the literal base_dir + decoded rel name
        # and glob-escaped — input_file_name() URIs are percent-encoded
        # and Hadoop glob-expands read paths, so feeding them back raw
        # can duplicate rows between group and carry (ADVICE r8).
        group = (
            self.spark.read.parquet(
                *[glob_escape(os.path.join(base_dir, r)) for r in matched_rel]
            )
            if matched_rel
            else base_df.filter(F.lit(False))
        )
        if self.catalog.exists():
            self._clear_mirror()
        self.catalog.overwrite(group)
        self.catalog.merge(source, dialect)  # real MERGE INTO on the group
        merged = self.catalog.read()
        assert merged is not None
        # carry unmatched files FLAT into the new snapshot dir: link each
        # file at its base-relative path ('' dirname for a flat layout)
        staging = self.snapshots._write_staging(merged, base + 1)
        for name in carry:
            src, dst = os.path.join(base_dir, name), os.path.join(staging, name)
            try:
                os.link(src, dst)
            except FileExistsError:
                # collision with a freshly written part file: never
                # clobber (task-UUID part names make this ~impossible)
                raise
            except OSError:
                # filesystem refuses links (EXDEV/EPERM): carry by copy,
                # mirroring _commit_pruned's fallback
                shutil.copy2(src, dst)
        self.snapshots._finalize(staging, expected_base=base)
        return True

    def changes(self, v_from: int, v_to: int, keys: list[str] | None = None):
        """Change data feed between two committed snapshots (Delta CDF /
        Iceberg ``changes`` shape, derived): one row per changed key with
        op + pre/post images. Defaults to the merge-key column the CoW
        merges key on."""
        from arcane_framework_scala_spark.operators.diff import snapshot_diff

        return snapshot_diff(
            self.read_version(v_from),
            self.read_version(v_to),
            keys=keys or [MERGE_KEY_COLUMN],
        )

    def watermark_store(self):
        """T2 watermark persistence that survives what the table survives:
        the reference stores progress in the Iceberg table's ``comment``
        property (durable because Iceberg metadata is files); MemCatalog
        TBLPROPERTIES are JVM memory, so here the watermark lives as a
        rename-committed JSON file inside the snapshot layout — same
        crash-replay contract (``IcebergTablePropertyManager.scala``)."""
        from arcane_framework_scala_spark.streaming.watermark import (
            FileWatermarkStore,
        )

        return FileWatermarkStore(
            path=os.path.join(self.snapshots.path, "_WATERMARK.json")
        )


@dataclass
class MergeSink:
    """K2: apply staged batches to a target with retry (and optional
    audit-parity staging — the reference always stages to Iceberg first;
    Spark can merge straight from the batch DataFrame, K1/K5 elided)."""

    target: SnapshotParquetTarget | CatalogTarget
    dialect: MergeDialect
    retry: RetryPolicy = field(default_factory=RetryPolicy)

    def apply(self, batch_df: DataFrame) -> None:
        if MERGE_KEY_COLUMN not in batch_df.columns:
            raise ValueError(f"batch is not mergeable: no {MERGE_KEY_COLUMN}")
        with_retry(self.retry, lambda: self.target.merge(batch_df, self.dialect))
