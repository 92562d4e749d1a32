"""Distribution statistics over grouped streams.

Extends the reference's scalar aggregate family (A1-A6 — version lookups,
listing folds, table stats) with the per-group distribution summary an
analytics/monitoring pipeline needs: exact interpolated quantiles for
gate-verifiable results, and a sketch-based variant for 100 TB.

Two paths, same call shape:

- ``value_quantiles(..., exact=True)`` — Spark's ``percentile``: exact
  linear-interpolated quantiles (identical definition to DuckDB's
  ``quantile_cont``, verified value-equal at 6 decimals in the gate).
  Exact percentile buffers each group's values — right for gate-scale
  and for bounded groups, wrong for unbounded ones.
- ``exact=False`` — ``approx_percentile`` (Greenwald-Khanna): mergeable,
  bounded-memory, map-side-combinable — the 100 TB default. Accuracy knob
  is ``accuracy`` (1/epsilon); results are NOT bit-stable across engines,
  so the oracle twin only exists for the exact path.

One shuffle either way: groupBy(key) with partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def value_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """(group, n, q_50, q_90, ... rounded to 6 decimals). Column names
    derive from the quantile (0.99 → ``q_99``) so oracles can alias
    identically."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n")]
    for q in quantiles:
        name = f"q_{str(q)[2:] or '0'}"
        if exact:
            expr = F.expr(f"percentile({value_col}, {q!r})")
        else:
            expr = F.expr(
                f"approx_percentile({value_col}, {q!r}, {accuracy})"
            )
        aggs.append(F.round(expr, 6).alias(name))
    return df.groupBy(group_col).agg(*aggs)


def value_quantiles_sql(
    table: str,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> str:
    """DuckDB twin of the exact path (quantile_cont == Spark percentile:
    same linear interpolation on the sorted group)."""
    cols = [f"{group_col}", "count(*) AS n"]
    for q in quantiles:
        name = f"q_{str(q)[2:] or '0'}"
        cols.append(f"round(quantile_cont({value_col}, {q}), 6) AS {name}")
    return f"SELECT {', '.join(cols)} FROM {table} GROUP BY {group_col}"


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Robust-stats capping (winsorization): per group, values are
    clamped to the exact [p_lo, p_hi] interpolated quantiles — the
    outlier treatment a metrics pipeline applies before averaging
    (medians of the capped column stop chasing stragglers).

    Output per group: ``(group, n, n_capped_lo, n_capped_hi,
    capped_micro)`` — the count of rows clamped at each side and the
    fixed-point sum of the capped values. The bounds come from ONE
    :func:`value_quantiles` pass broadcast back onto the stream (two
    aggregations total); comparisons use the same rounded-to-6 bound
    both engines compute identically (the a8 parity result).

    At 100 TB swap ``exact=False`` into the quantile pass
    (approx_percentile) — the clamp logic is unchanged; the gate uses
    exact so the oracle can match."""
    b = value_quantiles(df, group_col, value_col, (lo, hi), exact=True)
    lo_c = f"q_{str(lo)[2:] or '0'}"
    hi_c = f"q_{str(hi)[2:] or '0'}"
    bounds = b.select(
        group_col, F.col(lo_c).alias("__lo"), F.col(hi_c).alias("__hi")
    )
    capped = F.when(F.col(value_col) < F.col("__lo"), F.col("__lo")).when(
        F.col(value_col) > F.col("__hi"), F.col("__hi")
    ).otherwise(F.col(value_col))
    return (
        df.join(F.broadcast(bounds), group_col)
        .select(
            group_col,
            (F.col(value_col) < F.col("__lo")).cast("long").alias("cl"),
            (F.col(value_col) > F.col("__hi")).cast("long").alias("ch"),
            F.floor(capped * 1_000_000).cast("long").alias("cm"),
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cl").alias("n_capped_lo"),
            F.sum("ch").alias("n_capped_hi"),
            F.sum("cm").alias("capped_micro"),
        )
    )


def winsorize_sql(
    table: str,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> str:
    """DuckDB oracle for :func:`winsorize`."""
    return f"""
WITH bounds AS (
  SELECT {group_col},
         round(quantile_cont({value_col}, {lo}), 6) AS qlo,
         round(quantile_cont({value_col}, {hi}), 6) AS qhi
  FROM {table} GROUP BY {group_col}
),
c AS (
  SELECT t.{group_col},
         CASE WHEN t.{value_col} < b.qlo THEN 1 ELSE 0 END AS cl,
         CASE WHEN t.{value_col} > b.qhi THEN 1 ELSE 0 END AS ch,
         CAST(floor(CASE WHEN t.{value_col} < b.qlo THEN b.qlo
                         WHEN t.{value_col} > b.qhi THEN b.qhi
                         ELSE t.{value_col} END * 1000000) AS BIGINT) AS cm
  FROM {table} t JOIN bounds b USING ({group_col})
)
SELECT {group_col}, count(*) AS n,
       CAST(sum(cl) AS BIGINT) AS n_capped_lo,
       CAST(sum(ch) AS BIGINT) AS n_capped_hi,
       CAST(sum(cm) AS BIGINT) AS capped_micro
FROM c GROUP BY {group_col}
""".strip()
