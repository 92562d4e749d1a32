"""Throughput shaping (T3-T5) mapped onto Spark trigger limits.

The reference throttles with a ZIO token bucket over rechunked row streams
(``services/streaming/throughput/base/ThroughputShaper.scala:22-40``) and an
adaptive ``MemoryBoundShaper`` that models row byte cost, GC pressure and
partition counts (``MemoryBoundShaper.scala:29-265``). Spark's executors
own memory management, so the useful residue is **per-trigger caps**: how
many files/rows one micro-batch may cover and how long to sleep between
polls. ``MemoryAwareShaper`` keeps the partition-aware cap (chunk ≤
partitions/2) and the row-byte-cost model as a batch-size heuristic.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.types as T

#: per-type resident byte cost (reference MemoryBoundShaper.scala:84-147)
_BYTE_COST: dict[type, int] = {
    T.IntegerType: 32,
    T.ShortType: 32,
    T.BooleanType: 32,
    T.LongType: 36,
    T.DoubleType: 36,
    T.FloatType: 36,
    T.TimestampType: 36,
    T.TimestampNTZType: 36,
    T.DateType: 36,
    T.DecimalType: 136,
}
_STRING_BASE = 48
_FALLBACK = 256


def estimate_row_bytes(schema: T.StructType, avg_string_len: float = 32.0) -> int:
    """Reference row-cost model: fixed per-type costs; strings cost
    ``48 + 2 * avgLen * 1.5``; unknown/nested types use a fallback."""
    total = 0
    for f in schema.fields:
        if isinstance(f.dataType, T.StringType):
            total += int(_STRING_BASE + 2 * avg_string_len * 1.5)
        else:
            total += _BYTE_COST.get(type(f.dataType), _FALLBACK)
    return total


@dataclass(frozen=True)
class StaticShaper:
    """T5: fixed caps from config."""

    max_rows_per_batch: int = 100_000
    max_files_per_batch: int = 10_000
    poll_interval_seconds: float = 15.0
    jitter_fraction: float = 0.1  # interval ± variance (T1)


@dataclass(frozen=True)
class MemoryAwareShaper:
    """T4 residue: size one micro-batch so ~2 chunks fit in a memory pool
    of ``pool_fraction × executor_memory``, capped partition-aware
    (≤ partition_count / 2 — reference MemoryBoundShaper.scala:188-198)."""

    executor_memory_bytes: int = 4 << 30
    pool_fraction: float = 0.8
    resident_chunks: int = 2
    partition_count: int | None = None
    poll_interval_seconds: float = 15.0
    jitter_fraction: float = 0.1

    def max_rows(self, schema: T.StructType, avg_string_len: float = 32.0) -> int:
        row_bytes = estimate_row_bytes(schema, avg_string_len)
        pool = self.executor_memory_bytes * self.pool_fraction
        rows = int(pool / (self.resident_chunks * row_bytes))
        if self.partition_count:
            rows = min(rows, max(1, self.partition_count // 2))
        return max(rows, 1)
