"""Event-time tumbling-window aggregation (streaming T-ops companion).

The engine's canonical event-time representation is int64 epoch
nanoseconds: bucketing is then pure integer arithmetic — deterministic,
portable to any SQL oracle (DuckDB twin: ``epoch_ns(ts)``), and identical
on a batch or streaming DataFrame. Timestamp-typed inputs (the driver
testdata has shipped ``events.ts`` both as parquet TIMESTAMP(NANOS) and as
TIMESTAMP(MICROS)/timestamp_ntz across drops) are normalized with
:func:`ensure_epoch_ns` first. On a stream, pair with ``withWatermark`` on
a timestamp-typed column derived from the same nanos
(``timestamp_seconds(ts div 1e9)``) for late-data bounds; the groupBy
below is then a standard windowed aggregation with partial (map-side)
combine before the single shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

_NANOS = 1_000_000_000


def ensure_epoch_ns(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize an event-time column to int64 epoch nanoseconds.

    Long columns pass through (already nanos). Timestamp columns convert
    exactly via ``unix_micros * 1000`` — micros precision is all a Spark
    timestamp carries, so no information is lost. timestamp_ntz is
    interpreted as UTC wall-clock, which requires
    ``spark.sql.session.timeZone=UTC`` (the engine default,
    :mod:`..session`) to be exact — same contract as the reference's
    UTC-LocalDateTime CDC model (``MsSqlExtensions.scala:19-23``)."""
    dt = df.schema[ts_col].dataType
    if isinstance(dt, LongType):
        return df
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return df.withColumn(
            ts_col,
            F.unix_micros(F.col(ts_col).cast("timestamp")) * F.lit(1000),
        )
    raise TypeError(
        f"{ts_col} must be long (epoch nanos) or timestamp, got {dt.simpleString()}"
    )


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
    df = ensure_epoch_ns(df, ts_col)
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


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_seconds``.

    (user_id, session_id, session_start, session_end, n_events) where
    session_id = the session's first event second. Classic lag → boundary
    flag → running sum, all built-in window functions: two stages over one
    user-keyed shuffle (lag and cumsum share the partition), then the
    session groupBy reuses the same key — Catalyst keeps it to a single
    exchange. User keys are naturally high-cardinality → uniform."""
    from pyspark.sql import Window

    df = ensure_epoch_ns(df, ts_col)
    sec = tumbling_window(ts_col, 1)  # exact epoch-seconds from nanos
    with_gap = df.select(F.col(user_col), sec.alias("__sec")).withColumn(
        "__new",
        F.when(
            F.col("__sec") - F.lag("__sec").over(
                Window.partitionBy(user_col).orderBy("__sec")
            )
            > gap_seconds,
            1,
        )
        .otherwise(0),
    )
    sessions = with_gap.withColumn(
        "__sess_n",
        F.sum("__new").over(
            Window.partitionBy(user_col)
            .orderBy("__sec")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        sessions.groupBy(user_col, "__sess_n")
        .agg(
            F.min("__sec").alias("session_start"),
            F.max("__sec").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col(user_col),
            F.col("session_start").alias("session_id"),
            "session_start",
            "session_end",
            "n_events",
        )
    )


def sessionize_sql(
    table: str,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> str:
    sec = f"epoch_ns({ts_col}) // 1000000000"
    return f"""
WITH secs AS (
  SELECT {user_col}, {sec} AS sec FROM {table}
), flagged AS (
  SELECT {user_col}, sec,
         CASE WHEN sec - lag(sec) OVER (PARTITION BY {user_col} ORDER BY sec)
                   > {gap_seconds} THEN 1 ELSE 0 END AS new_sess
  FROM secs
), numbered AS (
  SELECT {user_col}, sec,
         sum(new_sess) OVER (PARTITION BY {user_col} ORDER BY sec
                             ROWS UNBOUNDED PRECEDING) AS sess_n
  FROM flagged
)
SELECT {user_col}, min(sec) AS session_id, min(sec) AS session_start,
       max(sec) AS session_end, count(*) AS n_events
FROM numbered GROUP BY {user_col}, sess_n
"""


def windowed_stream_stats(
    stream_df: DataFrame,
    window_seconds: int = 300,
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Streaming flavor of :func:`windowed_event_stats`: event-time tumbling
    window + watermark so state for closed windows is dropped (bounded
    memory on unbounded streams — the Structured Streaming late-data
    contract). ``ts_col`` must be timestamp-typed on the stream (convert
    int64 nanos upstream with ``timestamp_micros(nanos div 1000)``).

    Note ``approx_count_distinct`` rather than exact distinct: exact
    distinct over streaming state is unbounded; HLL keeps per-window state
    constant — the right trade at 100 TB."""
    win = F.window(F.col(ts_col), f"{window_seconds} seconds")
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("w"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias(
                "value_milli_sum"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            group_col,
            "n",
            "approx_users",
            "value_milli_sum",
        )
    )
