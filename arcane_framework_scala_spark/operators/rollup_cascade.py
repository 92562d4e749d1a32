"""Hypertable-style multi-resolution rollup cascade (continuous aggregates).

The TimescaleDB/Druid pattern: aggregate raw events once at the finest
resolution, then derive every coarser level by **re-reducing the finer
level's partials** instead of rescanning raw data. At 100 TB the raw
scan happens once; the minute→hour→day cascade touches only
``|groups| × minutes`` rows — orders of magnitude less.

Correctness hinges on every aggregate being *re-reducible*:

- ``n`` (count)   → sum of finer counts
- ``sum``         → sum of finer sums (exact, int64 fixed-point)
- ``min`` / ``max`` → min/max of finer minima/maxima
- **distinct users** → NOT re-reducible exactly; carried as a mergeable
  Datasketches HLL (``hll_sketch_agg`` at the base, ``hll_union_agg``
  upward) — the "novel sketch" path. Merging sketches is lossless with
  respect to the sketch itself: union-of-partials equals the sketch
  built directly (same library, deterministic), even though the
  estimate is approximate with respect to the true count.

Each level is one keyed aggregation whose input is the previous level —
shuffle sizes shrink geometrically. The exact columns hash-match a
direct-from-raw oracle at any level (the driver gate proves the minute→
hour→day cascade equals a straight daily rollup); sketch equality is
pinned in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from arcane_framework_scala_spark.operators.event_windows import (
    tumbling_window,
)


def rollup_base(
    df: DataFrame,
    window_seconds: int,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    distinct_col: str | None = "user_id",
) -> DataFrame:
    """Finest-grain rollup straight from raw events (the one raw scan)."""
    from arcane_framework_scala_spark.operators.event_windows import ensure_epoch_ns

    df = ensure_epoch_ns(df, ts_col)
    milli = F.floor(F.col(value_col) * 1000).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(milli).alias("value_milli_sum"),
        F.min(milli).alias("vmin_milli"),
        F.max(milli).alias("vmax_milli"),
    ]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(distinct_col).alias("users_hll"))
    return df.groupBy(
        tumbling_window(ts_col, window_seconds).alias("bucket"),
        F.col(group_col),
    ).agg(*aggs)


def rollup_up(
    finer: DataFrame,
    finer_seconds: int,
    coarser_seconds: int,
    group_col: str = "event_type",
) -> DataFrame:
    """One cascade step: re-reduce a finer rollup into a coarser one.
    Never touches raw data."""
    if coarser_seconds % finer_seconds != 0:
        raise ValueError(
            f"coarser level {coarser_seconds}s must be a multiple of the "
            f"finer level {finer_seconds}s"
        )
    coarse_bucket = (
        F.col("bucket") - (F.col("bucket") % F.lit(coarser_seconds))
    ).alias("bucket")
    aggs = [
        F.sum("n").alias("n"),
        F.sum("value_milli_sum").alias("value_milli_sum"),
        F.min("vmin_milli").alias("vmin_milli"),
        F.max("vmax_milli").alias("vmax_milli"),
    ]
    if "users_hll" in finer.columns:
        aggs.append(F.hll_union_agg("users_hll").alias("users_hll"))
    return finer.groupBy(coarse_bucket, F.col(group_col)).agg(*aggs)


def rollup_cascade(
    df: DataFrame,
    levels: tuple[int, ...] = (60, 3600, 86_400),
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    distinct_col: str | None = "user_id",
) -> dict[int, DataFrame]:
    """All levels, coarser ones re-reduced from finer — returns
    {window_seconds: rollup_df}."""
    out = {
        levels[0]: rollup_base(
            df, levels[0], ts_col, group_col, value_col, distinct_col
        )
    }
    for finer, coarser in zip(levels, levels[1:]):
        out[coarser] = rollup_up(out[finer], finer, coarser, group_col)
    return out


def rollup_exact_sql(
    table: str,
    window_seconds: int,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB oracle: the same level computed directly from raw rows —
    if any cascade step mis-reduced, the hashes diverge. (Sketch column
    excluded: estimates are library-specific; sketch merge correctness
    is pinned in pytest instead.)"""
    milli = f"CAST(floor({value_col} * 1000) AS BIGINT)"
    bucket = (
        f"epoch_ns({ts_col}) // 1000000000 // {window_seconds} "
        f"* {window_seconds}"
    )
    return f"""
SELECT {bucket} AS bucket, {group_col},
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({milli}) AS BIGINT) AS value_milli_sum,
       min({milli}) AS vmin_milli,
       max({milli}) AS vmax_milli
FROM {table}
GROUP BY ALL
""".strip()
