"""Iceberg table-maintenance SQL (X1-X4) + the every-N-batches gate.

The reference issues Trino ``ALTER TABLE … EXECUTE optimize/expire_snapshots/
remove_orphan_files`` and ``ANALYZE`` on a per-operation batch-count cadence
(``models/maintenance/JdbcOptimizationRequest.scala:4-30`` and three
siblings; gate ``(batchIndex + 1) % threshold == 0`` at ``:29``). Spark
equivalents are the Iceberg stored procedures and ``ANALYZE TABLE``.
"""

from __future__ import annotations

from dataclasses import dataclass


def optimize_sql(catalog: str, table: str, file_size_threshold_mb: int = 128) -> str:
    """X1 compaction → Iceberg rewrite_data_files procedure."""
    return (
        f"CALL {catalog}.system.rewrite_data_files(table => '{table}', "
        f"options => map('target-file-size-bytes', "
        f"'{file_size_threshold_mb * 1024 * 1024}'))"
    )


def expire_snapshots_sql(catalog: str, table: str, retention_hours: int = 168) -> str:
    """X2 snapshot expiry."""
    return (
        f"CALL {catalog}.system.expire_snapshots(table => '{table}', "
        f"older_than => TIMESTAMP (now() - INTERVAL {retention_hours} HOURS))"
    )


def remove_orphan_files_sql(catalog: str, table: str, retention_hours: int = 168) -> str:
    """X3 orphan file removal."""
    return (
        f"CALL {catalog}.system.remove_orphan_files(table => '{table}', "
        f"older_than => TIMESTAMP (now() - INTERVAL {retention_hours} HOURS))"
    )


def analyze_sql(table: str, columns: list[str] | None = None) -> str:
    """X4 statistics (skipped during backfill in the reference)."""
    cols = f" FOR COLUMNS {', '.join(columns)}" if columns else ""
    return f"ANALYZE TABLE {table} COMPUTE STATISTICS{cols}"


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
