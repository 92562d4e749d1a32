"""Shared parallelism helper for compute-heavy narrow transforms."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Repartition a under-partitioned input to cluster parallelism.

    Small table scans (one parquet file) arrive as a single partition; an
    expensive per-row projection (shingle hashing, hyperplane projections)
    would then run on one core no matter how many the cluster has. One
    round-robin shuffle of the raw rows buys full parallelism for the
    projection that follows. No-op when the scan already has enough
    partitions — the 100 TB case, where inputs arrive thousands-wide."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
