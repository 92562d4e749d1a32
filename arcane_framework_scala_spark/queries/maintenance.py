"""Iceberg table-maintenance SQL (X1-X4) + the every-N-batches gate.

The reference issues Trino ``ALTER TABLE … EXECUTE optimize/expire_snapshots/
remove_orphan_files`` and ``ANALYZE`` on a per-operation batch-count cadence
(``models/maintenance/JdbcOptimizationRequest.scala:4-30`` and three
siblings; gate ``(batchIndex + 1) % threshold == 0`` at ``:29``). Spark
equivalents are the Iceberg stored procedures and ``ANALYZE TABLE``.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone


def _cutoff_literal(retention_hours: int, as_of: datetime | None) -> str:
    """``now - retention`` as a timestamp LITERAL. Iceberg's Spark CALL
    parser accepts constants only — ``older_than => TIMESTAMP (now() -
    INTERVAL ...)`` is rejected by the real extension parser, so the
    arithmetic happens here. ``as_of`` pins the clock for deterministic
    golden text; production callers omit it (current UTC).

    The literal carries an explicit ``+00:00`` offset: a bare timestamp
    is parsed in ``spark.sql.session.timeZone``, so executing the
    statement on a session east of UTC would silently move the cutoff
    LATER and expire snapshots/files younger than the configured
    retention (ADVICE r4 item 2). With the offset the instant is
    unambiguous regardless of where the string is executed."""
    base = as_of if as_of is not None else datetime.now(timezone.utc)
    cutoff = base - timedelta(hours=retention_hours)
    return cutoff.strftime("%Y-%m-%d %H:%M:%S+00:00")


def optimize_sql(catalog: str, table: str, file_size_threshold_mb: int = 128) -> str:
    """X1 compaction → Iceberg rewrite_data_files procedure."""
    return (
        f"CALL {catalog}.system.rewrite_data_files(table => '{table}', "
        f"options => map('target-file-size-bytes', "
        f"'{file_size_threshold_mb * 1024 * 1024}'))"
    )


def expire_snapshots_sql(
    catalog: str,
    table: str,
    retention_hours: int = 168,
    as_of: datetime | None = None,
) -> str:
    """X2 snapshot expiry (Iceberg-documented literal-timestamp form)."""
    return (
        f"CALL {catalog}.system.expire_snapshots(table => '{table}', "
        f"older_than => TIMESTAMP '{_cutoff_literal(retention_hours, as_of)}')"
    )


def remove_orphan_files_sql(
    catalog: str,
    table: str,
    retention_hours: int = 168,
    as_of: datetime | None = None,
) -> str:
    """X3 orphan file removal (literal-timestamp form, as above)."""
    return (
        f"CALL {catalog}.system.remove_orphan_files(table => '{table}', "
        f"older_than => TIMESTAMP '{_cutoff_literal(retention_hours, as_of)}')"
    )


def analyze_sql(table: str, columns: list[str] | None = None) -> str:
    """X4 statistics (skipped during backfill in the reference)."""
    cols = f" FOR COLUMNS {', '.join(columns)}" if columns else ""
    return f"ANALYZE TABLE {table} COMPUTE STATISTICS{cols}"


# -- Delta Lake dialect (the same X1-X3 semantics on a Delta catalog) -------


def delta_optimize_sql(table: str, zorder_by: list[str] | None = None) -> str:
    """X1 on Delta: ``OPTIMIZE`` with optional Z-ordering (pairs with
    ``functions/layout.py``'s Z-order key for parquet-dir targets)."""
    z = f" ZORDER BY ({', '.join(zorder_by)})" if zorder_by else ""
    return f"OPTIMIZE {table}{z}"


def delta_vacuum_sql(table: str, retention_hours: int = 168) -> str:
    """X2+X3 on Delta: ``VACUUM`` covers both expiry and orphan removal."""
    return f"VACUUM {table} RETAIN {retention_hours} HOURS"


@dataclass
class MaintenanceSchedule:
    """Every-Nth-batch gates, one counter per operation (reference pattern
    ``(batchCount + 1) % threshold == 0``). Threshold ``None`` disables."""

    optimize_every: int | None = None
    expire_every: int | None = None
    orphans_every: int | None = None
    analyze_every: int | None = None

    def due(self, batch_index: int) -> list[str]:
        ops = []
        for name, threshold in (
            ("optimize", self.optimize_every),
            ("expire_snapshots", self.expire_every),
            ("remove_orphan_files", self.orphans_every),
            ("analyze", self.analyze_every),
        ):
            if threshold and (batch_index + 1) % threshold == 0:
                ops.append(name)
        return ops
