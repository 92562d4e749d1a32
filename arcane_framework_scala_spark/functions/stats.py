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
