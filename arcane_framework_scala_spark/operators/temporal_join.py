"""Temporal joins Spark lacks as built-ins: as-of and bucketed range join.

Both are compositions of existing DataFrame ops (no UDFs, no cross
products) — the "custom operator as composition" path:

- **as-of join**: for every left row, the latest right row with
  ``right.ts <= left.ts`` per key (point-in-time lookup — the join a
  feature store / CDC-state reconstruction needs). Implemented as the
  union-and-window trick: tag both sides, sort within key by
  ``(ts, is_left)`` so a right row at exactly the left timestamp is
  visible (inclusive as-of), and carry the last non-null right payload
  forward with ``last(..., ignorenulls=True)``. ONE shuffle on the key —
  never the quadratic per-row subquery, and no range condition for the
  optimizer to mishandle.

- **range join**: points joined to containing intervals. A naive
  ``point BETWEEN start AND end`` theta-join degenerates to
  nested-loop over the full cross product without an equi key. Here
  intervals are exploded onto fixed time bins (``sequence(start div b,
  end div b)``) and points join on their single bin — an equi hash join
  whose fan-out is ``interval_length / bucket`` copies per interval.
  Each (point, interval) pair meets in exactly one bin (the point's),
  so no post-join dedup is needed. ``bucket_seconds`` is the scale
  knob: bins ≈ median interval length keep copies ~2× intervals.

DuckDB expresses both natively (``ASOF JOIN``, ``BETWEEN`` join), which
is exactly what makes them oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the most recent right values at
    or before its timestamp (null when no right row precedes it).

    ``right`` must be unique on ``(key_col, ts_col)`` — dedupe upstream
    (e.g. groupBy max) since "latest of several rows at the same
    instant" is ill-defined in any as-of semantic, including DuckDB's.
    """
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in (key_col, ts_col)
        ]
    left_cols = left.columns
    # the right payload travels as ONE struct: the struct itself is
    # non-null for every right row even when individual values are null,
    # so last(ignorenulls) means "latest right ROW" — a present-but-null
    # value is carried as null (matching ASOF semantics) instead of
    # being skipped for an older non-null one, and multi-column payloads
    # can never mix values from different right rows
    payload = F.struct(
        *[F.col(c) for c in right_value_cols]
    )
    null_payload = F.lit(None).cast(
        "struct<" + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}"
            for c in right_value_cols
        ) + ">"
    )
    tagged_left = left.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols if c not in (key_col, ts_col)],
        null_payload.alias("__r"),
    )
    tagged_right = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in (key_col, ts_col)],
        payload.alias("__r"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged_left.unionByName(tagged_right).withColumn(
        "__r_carried", F.last("__r", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *left_cols,
        *[
            F.col(f"__r_carried.{c}").alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
    )


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> str:
    """DuckDB oracle via native ASOF LEFT JOIN (inclusive <=, same as
    the Spark operator)."""
    lsel = ", ".join(f"l.{c}" for c in left_cols)
    rsel = ", ".join(f"r.{c} AS {c}{suffix}" for c in right_value_cols)
    return f"""
SELECT {lsel}, {rsel}
FROM ({left_sql}) l
ASOF LEFT JOIN ({right_sql}) r
  ON l.{key_col} = r.{key_col} AND l.{ts_col} >= r.{ts_col}
""".strip()


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    extra_key: str | None = None,
) -> DataFrame:
    """Join points to containing intervals (inclusive bounds) via time
    bins; pass ``extra_key`` to additionally equi-join on a shared key
    (e.g. user), shrinking each bin to that key's intervals."""
    bins = F.explode(
        F.sequence(
            (F.col(start_col) / bucket_seconds).cast("long"),
            (F.col(end_col) / bucket_seconds).cast("long"),
        )
    ).alias("__bin")
    ivals = intervals.select("*", bins)
    pts = points.withColumn(
        "__bin", (F.col(ts_col) / bucket_seconds).cast("long")
    )
    on = ["__bin"] if extra_key is None else [extra_key, "__bin"]
    return (
        pts.join(ivals, on)
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bin")
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_value_cols: list[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_near",
) -> DataFrame:
    """Nearest-match temporal join (pandas ``merge_asof
    direction='nearest'``): every left row + the right row with the
    smallest absolute timestamp distance per key — ties go to the
    EARLIER right row; ``tolerance`` (same units as ``ts_col``) drops
    matches farther than the cap.

    Implemented as two as-of passes over the same union-and-window
    machinery — backward as-is, forward on negated timestamps (latest
    ``-ts_r ≤ -ts_l`` ⇔ earliest ``ts_r ≥ ts_l``) — then a codegen
    picker. Two key shuffles total, still no range theta-join for the
    optimizer to degrade. ``right`` must be unique on (key, ts), like
    :func:`asof_join`.

    Output: the left columns + ``<c><suffix>`` for each right value
    column + ``__near_gap`` (signed ``ts_r - ts_l``; null when no match
    within tolerance)."""
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in (key_col, ts_col)
        ]
    rts = right.withColumn("__rts", F.col(ts_col))
    vals = right_value_cols + ["__rts"]
    bwd = asof_join(left, rts, key_col, ts_col, vals, suffix="__b")
    neg_l = bwd.withColumn(ts_col, -F.col(ts_col))
    neg_r = rts.withColumn(ts_col, -F.col(ts_col)).withColumn(
        "__rts", -F.col("__rts")
    )
    both = asof_join(neg_l, neg_r, key_col, ts_col, vals, suffix="__f")
    both = both.withColumn(ts_col, -F.col(ts_col)).withColumn(
        "__rts__f", -F.col("__rts__f")
    )
    gb = F.col(ts_col) - F.col("__rts__b")   # ≥ 0 when backward exists
    gf = F.col("__rts__f") - F.col(ts_col)   # ≥ 0 when forward exists
    use_b = F.col("__rts__b").isNotNull() & (
        F.col("__rts__f").isNull() | (gb <= gf)
    )
    if tolerance is not None:
        in_b = use_b & (gb <= tolerance)
        in_f = ~use_b & F.col("__rts__f").isNotNull() & (gf <= tolerance)
    else:
        in_b = use_b
        in_f = ~use_b & F.col("__rts__f").isNotNull()
    out_cols = [c for c in left.columns]
    sel = [F.col(c) for c in out_cols]
    for c in right_value_cols:
        sel.append(
            F.when(in_b, F.col(f"{c}__b"))
            .when(in_f, F.col(f"{c}__f"))
            .alias(f"{c}{suffix}")
        )
    sel.append(
        F.when(in_b, -gb).when(in_f, gf).alias("__near_gap")
    )
    return both.select(*sel)


def nearest_join_sql(
    left_sql: str,
    right_sql: str,
    key_col: str,
    ts_col: str,
    right_value_cols: list[str],
    tolerance: int,
    suffix: str = "_near",
) -> str:
    """DuckDB oracle: bounded-candidate argmin (|gap| ≤ tolerance),
    ties to the earlier right timestamp, left join for no-match rows."""
    vals = ", ".join(f"r.{c} AS {c}{suffix}" for c in right_value_cols)
    outer_vals = ", ".join(
        f"m.{c}{suffix}" for c in right_value_cols
    )
    return f"""
WITH l AS ({left_sql}),
r AS ({right_sql}),
cand AS (
  SELECT l.*, {vals},
         r.{ts_col} - l.{ts_col} AS __near_gap,
         row_number() OVER (
           PARTITION BY l.{key_col}, l.{ts_col}
           ORDER BY abs(r.{ts_col} - l.{ts_col}), r.{ts_col}
         ) AS __rk
  FROM l JOIN r ON l.{key_col} = r.{key_col}
   AND abs(r.{ts_col} - l.{ts_col}) <= {tolerance}
),
m AS (SELECT * FROM cand WHERE __rk = 1)
SELECT l.*, {outer_vals}, m.__near_gap
FROM l LEFT JOIN m
  ON l.{key_col} = m.{key_col} AND l.{ts_col} = m.{ts_col}
""".strip()
