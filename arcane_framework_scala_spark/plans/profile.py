"""One-pass table profiling — the dataset-card column statistics.

The deequ/`df.summary()` job done deterministically and in ONE
aggregation: for every column, row/null/distinct counts and min/max,
unpivoted to ``(column, metric, value)`` long form so the output is
schema-stable regardless of the input's width or types (values
canonicalized to strings; numeric floats floored to micro units first
— the repo determinism rules).

Plan shape: a single ``agg`` carrying every metric. The exact
``count(distinct col)`` per column makes Catalyst plan an Expand
(one duplicated stream per distinct aggregate) — acceptable for the
gate, and the documented 100 TB swap is ``approx_count_distinct``
(one pass, no Expand; same output shape). Everything else partial-
aggregates map-side.

The reference's only profiling is table/column byte sizes from Iceberg
metadata (``IcebergTablePropertyManager.scala:70-105`` →
``sinks/table_stats.py``); this is the data-content complement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

__all__ = ["profile_table", "profile_table_sql"]

_FP = 1_000_000


def _canon(col, dt) -> "F.Column":
    """Engine-portable string image of a value: floats via floor-micro,
    timestamps via a second-precision format (TIMESTAMP_NTZ won't cast
    to BIGINT under ANSI), everything else via CAST AS STRING. All
    images are applied AFTER the min/max (floor and formatting are
    monotonic, so min(image) == image(min) and the profile reports the
    numeric extremes, not lexicographic ones)."""
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return F.floor(col.cast("double") * _FP).cast("long").cast("string")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_table(df: DataFrame, approx: bool = False) -> DataFrame:
    """``(column, metric, value)`` per input column with metrics
    ``n_rows, n_null, n_distinct, min, max``. ``approx=True`` swaps the
    exact distinct for ``approx_count_distinct`` (the 100 TB path —
    kills the Expand; estimates are NOT oracle-stable, so the gate uses
    exact)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c, dt = F.col(f.name), f.dataType
        distinct = (
            F.approx_count_distinct(f.name)
            if approx
            else F.countDistinct(f.name)
        )
        aggs += [
            F.sum(c.isNull().cast("long")).alias(f"__null_{f.name}"),
            distinct.alias(f"__dist_{f.name}"),
            _canon(F.min(c), dt).alias(f"__min_{f.name}"),
            _canon(F.max(c), dt).alias(f"__max_{f.name}"),
        ]
    one = df.agg(*aggs)
    stacks = []
    for f in df.schema.fields:
        n = f.name
        stacks.append(
            f"'{n}', 'n_rows', CAST(__n AS STRING), "
            f"'{n}', 'n_null', CAST(__null_{n} AS STRING), "
            f"'{n}', 'n_distinct', CAST(__dist_{n} AS STRING), "
            f"'{n}', 'min', __min_{n}, "
            f"'{n}', 'max', __max_{n}"
        )
    k = 5 * len(df.schema.fields)
    return one.select(
        F.expr(f"stack({k}, {', '.join(stacks)}) AS (column, metric, value)")
    )


def profile_table_sql(table: str, col_types: dict[str, str]) -> str:
    """DuckDB oracle for :func:`profile_table` — the caller passes the
    column→kind map (``'double' | 'timestamp' | 'other'``) so both
    engines canonicalize values identically."""
    parts = []
    for name, kind in col_types.items():
        def img(expr: str) -> str:
            if kind == "double":
                return (
                    f"CAST(CAST(floor(CAST({expr} AS DOUBLE) * {_FP}) "
                    "AS BIGINT) AS VARCHAR)"
                )
            if kind == "timestamp":
                return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"
            return f"CAST({expr} AS VARCHAR)"

        parts.append(
            f"""
SELECT '{name}' AS "column", 'n_rows' AS metric,
       CAST(count(*) AS VARCHAR) AS value FROM {table}
UNION ALL
SELECT '{name}', 'n_null',
       CAST(sum(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS VARCHAR)
FROM {table}
UNION ALL
SELECT '{name}', 'n_distinct', CAST(count(DISTINCT {name}) AS VARCHAR)
FROM {table}
UNION ALL
SELECT '{name}', 'min', {img(f"min({name})")} FROM {table}
UNION ALL
SELECT '{name}', 'max', {img(f"max({name})")} FROM {table}"""
        )
    return "\nUNION ALL".join(parts)
