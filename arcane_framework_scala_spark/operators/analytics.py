"""Reporting analytics: grouping-sets rollups and time-range rolling windows.

The reference has no group-by surface at all (SURVEY §2.6 — its
aggregations are scalar/infrastructural), but a CDC target table's first
consumer is a reporting query. These operators cover the two reporting
shapes Spark answers natively that the rest of the repo doesn't already
gate: multi-level ``ROLLUP`` totals (one pass, no self-union) and
event-time **RANGE** frames (a trailing window keyed by time value, not
row position).

Determinism rules (repo-standard, see ``kmeans.py``): every float
accumulation is int64 fixed-point (``floor(value·1e6)`` summed as
longs); averages are truncating integer division. Counts are exact.

Scale shape:

- ``rollup_event_stats`` is ONE hash aggregation — Spark expands the
  grouping sets map-side (each input row feeds every set's partial), so
  the shuffle carries ``|sets| × |groups|`` partials, not a union of
  three scans. At 100 TB this is the difference between one pass and
  three.
- ``rolling_user_stats`` shuffles once on the partition key and sorts
  within partitions; the RANGE frame is evaluated with a sliding
  two-pointer over the sorted run (bounded state, no per-row rescan).
  Skewed users are the knob — the same salting escape hatch as
  ``operators/salting.py`` applies if one user dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

__all__ = [
    "rollup_event_stats",
    "rollup_event_stats_sql",
    "rolling_user_stats",
    "rolling_user_stats_sql",
]

_FP = 1_000_000


def _vmicro(col: str = "value") -> Column:
    return F.floor(F.col(col).cast("double") * F.lit(float(_FP))).cast("long")


def rollup_event_stats(
    df: DataFrame,
    ts_ns_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(type, day) → (type) → () rollup in one aggregation.

    Output: ``(event_type, day, gid, n_events, value_micro)`` with
    aggregated-out keys coalesced to sentinels (``'(all)'`` / ``-1``) so
    every row keys uniquely; ``gid`` is Spark's ``grouping_id()`` bitmask
    (DuckDB's ``GROUPING(a, b)`` uses the identical first-arg-is-MSB
    convention, which the driver gate pins).
    """
    # integer div, NOT float: epoch nanos (~1.7e18) exceed double's 2^53
    # exact-integer range, so a float path would round the day boundary
    day = F.expr(f"{ts_ns_col} div 1000000000 div 86400")
    return (
        df.select(
            F.col(type_col).alias("event_type"),
            day.alias("day"),
            _vmicro(value_col).alias("vm"),
        )
        .rollup("event_type", "day")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vm").alias("value_micro"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("day", F.lit(-1)).alias("day"),
            "gid",
            "n_events",
            "value_micro",
        )
    )


def rollup_event_stats_sql(
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB oracle for :func:`rollup_event_stats`."""
    return f"""
SELECT coalesce({type_col}, '(all)') AS event_type,
       coalesce(day, -1) AS day,
       GROUPING({type_col}, day) AS gid,
       count(*) AS n_events,
       CAST(sum(vm) AS BIGINT) AS value_micro
FROM (SELECT {type_col},
             epoch_ns({ts_col}) // 1000000000 // 86400 AS day,
             CAST(floor(CAST({value_col} AS DOUBLE) * {_FP}.0) AS BIGINT) AS vm
      FROM {table})
GROUP BY ROLLUP ({type_col}, day)
""".strip()


def rolling_user_stats(
    df: DataFrame,
    window_seconds: int = 3600,
    ts_ns_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Trailing time-RANGE window per key: for every event, the count and
    fixed-point mean of the key's events in the preceding
    ``window_seconds`` (inclusive of the current row and of ties at the
    same second — RANGE frames are value-keyed, so tie handling is
    deterministic without a full-order tiebreak).

    Output: ``(id_col, key_col, sec, w_n, w_avg_micro)``.
    """
    sec = F.expr(f"{ts_ns_col} div 1000000000")
    w = (
        Window.partitionBy(key_col)
        .orderBy("sec")
        .rangeBetween(-window_seconds, 0)
    )
    return (
        df.select(
            id_col,
            key_col,
            sec.alias("sec"),
            _vmicro(value_col).alias("vm"),
        )
        .select(
            id_col,
            key_col,
            "sec",
            F.count(F.lit(1)).over(w).alias("w_n"),
            F.sum("vm").over(w).alias("w_s"),
        )
        .select(
            id_col,
            key_col,
            "sec",
            "w_n",
            F.expr("w_s div w_n").alias("w_avg_micro"),
        )
    )


def rolling_user_stats_sql(
    table: str = "events",
    window_seconds: int = 3600,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    """DuckDB oracle for :func:`rolling_user_stats`."""
    frame = (
        f"PARTITION BY {key_col} ORDER BY sec "
        f"RANGE BETWEEN {window_seconds} PRECEDING AND CURRENT ROW"
    )
    return f"""
SELECT {id_col}, {key_col}, sec,
       count(*) OVER w AS w_n,
       CAST(sum(vm) OVER w AS BIGINT) // count(*) OVER w AS w_avg_micro
FROM (SELECT {id_col}, {key_col},
             epoch_ns({ts_col}) // 1000000000 AS sec,
             CAST(floor(CAST({value_col} AS DOUBLE) * {_FP}.0) AS BIGINT) AS vm
      FROM {table})
WINDOW w AS ({frame})
""".strip()
