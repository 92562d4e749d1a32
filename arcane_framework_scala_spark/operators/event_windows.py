"""Event-time tumbling-window aggregation (streaming T-ops companion).

The driver testdata stores ``events.ts`` as parquet TIMESTAMP(NANOS);
Spark surfaces it as int64 nanoseconds (``spark.sql.legacy.parquet.
nanosAsLong``). Bucketing is pure integer arithmetic — deterministic,
portable to any SQL oracle, and identical on a batch or streaming
DataFrame. On a stream, pair with ``withWatermark`` on a timestamp-typed
column derived from the same nanos (``timestamp_seconds(ts div 1e9)``) for
late-data bounds; the groupBy below is then a standard windowed
aggregation with partial (map-side) combine before the single shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

_NANOS = 1_000_000_000


def tumbling_window(ts_nanos: Column | str, window_seconds: int) -> Column:
    """Window-start epoch seconds for an int64-nanos event time.

    Arithmetic stays exact: epoch nanos (~1.7e18) exceed double's 53-bit
    mantissa, so ``(nanos / 1e9).cast(long)`` would mis-bucket boundary
    events. ``nanos - nanos % window`` is exact int64; the final division
    is over a decimal that the modulo made exactly divisible."""
    c = F.col(ts_nanos) if isinstance(ts_nanos, str) else ts_nanos
    wns = window_seconds * _NANOS
    aligned = c - (c % F.lit(wns))
    idx = (aligned.cast("decimal(38,0)") / F.lit(wns)).cast("long")
    return idx * F.lit(window_seconds)


def tumbling_window_sql(ts_col: str, window_seconds: int) -> str:
    """DuckDB equivalent over a TIMESTAMP column."""
    return (
        f"epoch_ns({ts_col}) // {_NANOS} // {window_seconds} * {window_seconds}"
    )


def windowed_event_stats(
    df: DataFrame,
    window_seconds: int = 86_400,
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """(window_start, group, n, users, value_milli_sum) per tumbling
    window — the canonical streaming rollup, computed batch-side here and
    watermark-side on a stream."""
    return (
        df.groupBy(
            tumbling_window(ts_col, window_seconds).alias("window_start"),
            F.col(group_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias(
                "value_milli_sum"
            ),
        )
    )
