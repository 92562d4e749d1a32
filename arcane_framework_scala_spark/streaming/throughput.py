"""Throughput shaping (T3-T5) mapped onto Spark trigger limits.

The reference throttles with a ZIO token bucket over rechunked row streams
(``services/streaming/throughput/base/ThroughputShaper.scala:22-40``) and an
adaptive ``MemoryBoundShaper`` that models row byte cost, GC pressure and
partition counts (``MemoryBoundShaper.scala:29-265``). Spark's executors
own memory management, so the per-executor OOM-protection half of the model
is absorbed; the useful residue is **per-trigger caps**: how many
files/rows one micro-batch may cover and how long to sleep between polls.

Two shapers are provided:

- ``MemoryAwareShaper`` — the simplified heuristic (row-byte model →
  trigger caps), enough for most pipelines;
- ``MemoryBoundShaper`` — the full reference estimation chain
  (``MemoryBoundShaper.scala:60-265``): sigmoid-scaled memory cutoff that
  grows with target-table size, string-length estimation from column
  sizes, the partition-aware chunk cap (chunk ≤ partitions/2 for
  partitioned targets, ``MemoryBoundShaper.scala:188-198``), burst
  sizing, and the Poisson-GC leaking-bucket flow rate. Runtime inputs
  (free memory, GC count, uptime) are injected so driver-side sizing is
  deterministic and testable.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

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
        # reference halving rule (MemoryBoundShaper.scala:188-198): the cap
        # applies only when the target actually has >1 partition — a
        # 1-partition table takes the uncapped row-size estimate
        if self.partition_count is not None and self.partition_count > 1:
            rows = min(rows, max(1, self.partition_count // 2))
        return max(rows, 1)


# ---------------------------------------------------------------------------
# Full reference estimation chain (MemoryBoundShaper.scala:29-265)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MemoryBoundSettings:
    """Reference ``models/settings/streaming/ThroughputSettings.scala:16-24``
    (``MemoryBound``) plus the advised* knobs of ``ThroughputSettings``."""

    fallback_string_size: int = 100  # fallbackStringTypeSizeEstimate
    object_type_size: int = 4096  # objectTypeSizeEstimate
    chunk_cost_scale: int = 1  # chunkCostScale
    chunk_cost_max: int = 10  # chunkCostMax
    table_row_count_weight: float = 0.5  # tableRowCountWeight
    table_size_weight: float = 0.5  # tableSizeWeight
    table_size_scale_factor: int = 2  # tableSizeScaleFactor
    advised_burst: int = 10
    advised_rate_elements: int = 1
    advised_rate_interval_seconds: float = 10.0


def scaled_sigmoid(max_bound: float, value: float, k: int) -> float:
    """(-inf, inf) → (0, max_bound), midpoint-shifted for positive inputs
    (reference ``MemoryBoundShaper.scala:258-259``)."""
    return max_bound * (2.0 / (1.0 + math.exp(-1.0 * k * value)) - 1)


def estimate_memory_cutoff(
    est_rows: int, est_size: int, settings: MemoryBoundSettings = MemoryBoundSettings()
) -> float:
    """Fraction of free memory available to chunks: 0.2 floor for an empty
    target, sigmoid-growing toward 0.8 with table rows × bytes (reference
    ``MemoryBoundShaper.scala:61-67`` — larger tables earn larger pools)."""
    if est_rows * est_size == 0:
        return 0.2
    return scaled_sigmoid(
        0.8,
        settings.table_row_count_weight * math.log(est_rows)
        + settings.table_size_weight * math.log(est_size),
        settings.table_size_scale_factor,
    )


def estimate_string_length(
    string_col_bytes: int,
    record_count: int,
    settings: MemoryBoundSettings = MemoryBoundSettings(),
) -> int:
    """Average string-field length in characters from the summed
    uncompressed string-column bytes: ×1.5 safety, ÷2 bytes-per-char
    (reference ``MemoryBoundShaper.scala:74-85``). Falls back to the
    configured estimate when there are no stats."""
    if string_col_bytes <= 0 or record_count == 0:
        return settings.fallback_string_size
    return int(string_col_bytes * 1.5 / record_count / 2)


def _reference_row_size(
    schema: T.StructType,
    string_length: int,
    settings: MemoryBoundSettings = MemoryBoundSettings(),
) -> int:
    """Per-row resident-byte estimate with the reference's exact per-type
    costs (``MemoryBoundShaper.scala:87-147``): data + pointer + object
    header + padding per field; strings are 32 (wrapper) + 16 (array
    header) + 2 bytes/char; nested/unknown types use the configured
    object-size estimate."""
    total = 0
    for f in schema.fields:
        if isinstance(f.dataType, T.StringType):
            total += 32 + 16 + 2 * string_length
        elif isinstance(f.dataType, T.DecimalType):
            total += 136
        elif isinstance(
            f.dataType,
            (
                T.IntegerType,
                T.ShortType,
                T.FloatType,
                T.DateType,
                T.BooleanType,
            ),
        ):
            total += 32
        elif isinstance(
            f.dataType,
            (T.LongType, T.DoubleType, T.TimestampType, T.TimestampNTZType),
        ):
            total += 36
        else:
            total += 16 + 4 + 8 + settings.object_type_size
    return total


@dataclass
class MemoryBoundShaper:
    """Driver-side port of the reference's adaptive shaper. Sizes one
    micro-batch ("chunk") from target-table statistics so that ~2 chunks fit
    inside the sigmoid-scaled share of free memory, then caps partitioned
    targets at ``partitions/2`` rows per chunk so each MERGE touches fewer
    partitions than the target has (merge-speed rule,
    ``MemoryBoundShaper.scala:188-198``).

    ``free_memory_fn`` / ``gc_count_fn`` / ``uptime_fn`` default to
    process-local approximations but are injectable — the reference reads
    the same numbers from JVM MX beans; tests pin them.
    """

    settings: MemoryBoundSettings = MemoryBoundSettings()
    free_memory_fn: object = None
    gc_count_fn: object = None
    uptime_fn: object = None
    #: optional metrics.DeclaredMetrics hub (reference gauges rowChunkSize,
    #: rowChunkSizeBytes, rowChunkCost, mbsGCFrequency, mbsGCProbability)
    declared_metrics: object = None
    _cache: dict = field(default_factory=dict)

    def _free_memory(self) -> int:
        if self.free_memory_fn is not None:
            return int(self.free_memory_fn())
        try:  # total system available memory — closest Python analogue
            import os

            pages = os.sysconf("SC_AVPHYS_PAGES")
            return pages * os.sysconf("SC_PAGE_SIZE")
        except (ValueError, OSError, AttributeError):
            return 4 << 30

    def _gc_count(self) -> int:
        if self.gc_count_fn is not None:
            return int(self.gc_count_fn())
        import gc

        return sum(s.get("collections", 0) for s in gc.get_stats())

    def _uptime(self) -> float:
        if self.uptime_fn is not None:
            return float(self.uptime_fn())
        if "t0" not in self._cache:
            self._cache["t0"] = time.monotonic()
        return max(time.monotonic() - self._cache["t0"], 1.0)

    def estimate_chunk_size(
        self,
        schema: T.StructType,
        table_records: int,
        table_bytes: int,
        partitions: int = 1,
        string_col_bytes: int = 0,
    ) -> tuple[int, int]:
        """(elements, element_size_bytes) for the next micro-batch —
        reference ``estimateChunkSize`` (``MemoryBoundShaper.scala:149-210``).
        Estimation parameters are cached on first call like the reference's
        TrieMap (stats probes are per-stream, not per-chunk)."""
        if "row_size" not in self._cache:
            string_len = estimate_string_length(
                string_col_bytes, table_records, self.settings
            )
            self._cache["mem_cutoff"] = estimate_memory_cutoff(
                table_records, table_bytes, self.settings
            )
            self._cache["row_size"] = max(
                float(_reference_row_size(schema, string_len, self.settings)),
                table_records / (float(table_bytes) + 1),
            )
            self._cache["partitions"] = float(partitions)
        row_size = self._cache["row_size"]
        # 2 chunks resident at all times
        chunk = self._free_memory() * self._cache["mem_cutoff"] / (row_size + 1) / 2
        if int(self._cache["partitions"]) > 1:
            applied = int(min(chunk, self._cache["partitions"] / 2))
        else:
            applied = int(max(chunk, 1.0))
        if self.declared_metrics is not None:
            from arcane_framework_scala_spark import metrics as M

            self.declared_metrics.gauge(M.ROW_CHUNK_SIZE, float(applied))
            self.declared_metrics.gauge(
                M.ROW_CHUNK_SIZE_BYTES, applied * row_size / (1024 * 1024)
            )
            self.declared_metrics.gauge(
                M.ROW_CHUNK_COST, float(self.estimate_chunk_cost(applied))
            )
        return applied, int(row_size)

    def estimate_shape_burst(self, chunk_size: int, element_size: int) -> int:
        """Burst cap: rows that fit in free memory, floored at 10% of chunk
        and the advised burst (``MemoryBoundShaper.scala:206-216``)."""
        rows_to_fit = self._free_memory() / (element_size + 1)
        return int(
            max(rows_to_fit, 0.1 * chunk_size, float(self.settings.advised_burst))
        )

    def estimate_shape_rate(self, chunk_size: int) -> tuple[int, float]:
        """(elements, interval_seconds) per the leaking-bucket GC model
        (``MemoryBoundShaper.scala:227-253``): assume GC events arrive
        Poisson at the observed frequency and each one "leaks" a chunk, so
        the sustainable rate is chunk × (1 + P[gc within interval]) spread
        over the advised interval."""
        interval = self.settings.advised_rate_interval_seconds
        uptime = self._uptime()
        gc_frequency = (self._gc_count() + 1.0) / uptime
        gc_probability = min(1.0, uptime / interval) * (
            1 - math.exp(-1 * gc_frequency * interval)
        )
        if self.declared_metrics is not None:
            from arcane_framework_scala_spark import metrics as M

            self.declared_metrics.gauge(M.MBS_GC_FREQUENCY, gc_frequency)
            self.declared_metrics.gauge(M.MBS_GC_PROBABILITY, gc_probability)
        return int(chunk_size * (1 + gc_probability) / interval) + 1, 1.0

    def files_per_trigger(
        self,
        schema: T.StructType,
        table_records: int,
        table_bytes: int,
        table_files: int,
        partitions: int = 1,
        string_col_bytes: int = 0,
    ) -> int:
        """Translate the row-based chunk estimate into the unit Spark's
        file streaming source actually throttles on
        (``maxFilesPerTrigger``): chunk rows ÷ average rows per source
        file, floored at 1. This is the T4→T7 hand-off — the reference
        feeds its chunk size to a ZStream rechunker; on Spark the same
        number caps the micro-batch's file count."""
        elements, _ = self.estimate_chunk_size(
            schema, table_records, table_bytes, partitions, string_col_bytes
        )
        rows_per_file = max(table_records / max(table_files, 1), 1.0)
        return max(int(elements / rows_per_file), 1)

    def estimate_chunk_cost(self, size: int) -> int:
        """Relative cost of a chunk vs free memory, sigmoid-capped
        (``MemoryBoundShaper.scala:263-265``)."""
        raw = 2 * size * self._cache.get("row_size", 0.0) / (self._free_memory() + 1)
        return int(
            scaled_sigmoid(
                float(self.settings.chunk_cost_max),
                raw,
                self.settings.chunk_cost_scale,
            )
        )
