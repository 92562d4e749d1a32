"""Time-series resampling / gap filling (hypertable-style LOCF).

Beyond-reference surface, same family as the rollup cascade
(`operators/rollup_cascade.py`): align an irregular event stream onto a
regular bucket grid and carry the last observation forward through the
gaps — the `time_bucket_gapfill` + `locf` idiom of time-series stores,
re-expressed as three relational steps:

1. **downsample**: one keyed aggregation to (key, bucket) — max-reduce
   inside the bucket (deterministic on every engine, no tie-break
   machinery);
2. **grid**: distinct keys × `sequence(min_bucket, max_bucket)` — the
   bounds are a broadcast 1-row aggregate, so the grid is a narrow
   explode, never a range join;
3. **fill**: per-key ordered window, `last(value, ignorenulls)` over
   rows-unbounded-preceding — rows before a key's first observation
   stay null (nothing to carry), and every synthesized row is flagged
   `is_filled`.

Scale: the shuffles are the (key, bucket) aggregation and the per-key
window — both on the key, both bounded by keys x buckets output rows,
orders of magnitude below raw event count at any realistic bucket. At
100 TB pick `bucket_seconds` so keys x buckets stays sane, and
partition the output write by bucket range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

_NS = 1_000_000_000


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_ns_col: str,
    value_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """(key, bucket_start_sec, value, is_filled) for EVERY bucket in the
    stream's [min, max] span and every key — observed buckets carry the
    in-bucket max, gaps carry the last observation forward."""
    bucket_ns = bucket_seconds * _NS
    b = (F.col(ts_ns_col) / F.lit(bucket_ns)).cast("long")
    obs = (
        df.select(F.col(key_col).alias("k"), b.alias("bucket"),
                  F.col(value_col).alias("v"))
        .groupBy("k", "bucket")
        .agg(F.max("v").alias("v"))
    )
    bounds = df.select(b.alias("bb")).agg(
        F.min("bb").alias("bmin"), F.max("bb").alias("bmax")
    )
    grid = (
        df.select(F.col(key_col).alias("k"))
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            "k", F.explode(F.sequence("bmin", "bmax")).alias("bucket")
        )
    )
    joined = grid.join(obs, ["k", "bucket"], "left")
    w = (
        Window.partitionBy("k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col("k").alias(key_col),
        (F.col("bucket") * bucket_seconds).alias("bucket_start_sec"),
        F.last("v", ignorenulls=True).over(w).alias(value_col),
        F.col("v").isNull().alias("is_filled"),
    )


def gap_fill_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
) -> str:
    """DuckDB twin: identical bucketing (int ns floor-div), grid, and
    IGNORE NULLS carry-forward."""
    bucket_ns = bucket_seconds * _NS
    b = f"epoch_ns({ts_col}) // {bucket_ns}"
    return f"""
WITH obs AS (
  SELECT {key_col} AS k, {b} AS bucket, max({value_col}) AS v
  FROM {table} GROUP BY 1, 2
),
bounds AS (
  SELECT min({b}) AS bmin, max({b}) AS bmax FROM {table}
),
grid AS (
  SELECT u.k, gs.bucket
  FROM (SELECT DISTINCT {key_col} AS k FROM {table}) u, bounds,
       unnest(range(bmin, bmax + 1)) AS gs(bucket)
),
j AS (
  SELECT g.k, g.bucket, o.v
  FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.bucket = o.bucket
)
SELECT k AS {key_col}, bucket * {bucket_seconds} AS bucket_start_sec,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY k ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS {value_col},
       (v IS NULL) AS is_filled
FROM j
"""
