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

from pyspark.sql import Column, DataFrame, Window
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


def categorical_drift(
    df: DataFrame,
    day_col,
    cat_col: str = "event_type",
) -> DataFrame:
    """Day-over-day categorical distribution drift: the Jensen-Shannon
    divergence between each day's category distribution and the previous
    day's — the upstream-shift monitor a CDC-fed training-data pipeline
    needs (a silent source-schema or traffic change shows up as a JSD
    spike long before it shows up in model metrics; JSD rather than KL
    because it is symmetric, bounded by ln 2, and defined when a
    category appears on only one of the two days).

    ``day_col`` is any integer day expression (Column or name) — e.g.
    ``F.expr("ts div 1000000000 div 86400")`` for the engine's epoch-
    nanos event time. Integer days keep the consecutive-day join pure
    int64 arithmetic (no date types, no timezone surface).

    Output: ``(day, n_cats, jsd_micro)`` for every day with a
    predecessor — ``jsd_micro`` is int64 micro units.

    Determinism (repo fixed-point rule): each category's contribution is
    ONE float expression over the four integer counts, floored to micro,
    and the per-day total is an INTEGER sum — partition order never
    moves the result, and DuckDB computes the identical floor.

    Scale: two tiny aggregation shuffles (per-(day,cat) counts, per-day
    totals — output rows ≈ days × categories, metadata-sized for any
    real cardinality) and joins between those aggregates; the event
    table itself is touched once, map-side combined. Nothing scales
    with row count except the first scan."""
    day = (F.col(day_col) if isinstance(day_col, str) else day_col).alias(
        "day"
    )
    daily = df.groupBy(day, F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = daily.groupBy("day").agg(F.sum("n").alias("tot"))
    prev_daily = daily.select(
        (F.col("day") + 1).alias("day"), "cat", F.col("n").alias("pn")
    )
    prev_tot = tot.select(
        (F.col("day") + 1).alias("day"), F.col("tot").alias("ptot")
    )
    # days that have a predecessor; cats from either side of the pair.
    # pair_tot is |days| rows — broadcast it so the per-(day,cat) side
    # never shuffles for this join even if stats mislead the planner.
    pair_tot = tot.join(prev_tot, "day")
    cats = daily.join(prev_daily, ["day", "cat"], "full_outer")
    j = cats.join(F.broadcast(pair_tot), "day")
    p = F.coalesce(F.col("n"), F.lit(0)) / F.col("tot")
    q = F.coalesce(F.col("pn"), F.lit(0)) / F.col("ptot")
    m = (p + q) / F.lit(2.0)
    contrib = (
        F.when(p > 0, F.lit(0.5) * p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(q > 0, F.lit(0.5) * q * F.log(q / m)).otherwise(F.lit(0.0))
    )
    return (
        j.select(
            "day",
            F.floor(contrib * F.lit(1_000_000.0)).cast("long").alias(
                "__c_micro"
            ),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_cats"),
            F.sum("__c_micro").alias("jsd_micro"),
        )
    )


def categorical_drift_sql(
    table: str = "events",
    day_sql: str = "epoch_ns(ts) // 1000000000 // 86400",
    cat_col: str = "event_type",
) -> str:
    """DuckDB oracle for :func:`categorical_drift` — identical per-
    category floor-to-micro and integer accumulation."""
    return f"""
WITH daily AS (
  SELECT {day_sql} AS day, {cat_col} AS cat,
         CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1, 2
),
tot AS (SELECT day, CAST(sum(n) AS BIGINT) AS tot FROM daily GROUP BY day),
pair AS (
  SELECT t.day, t.tot, p.tot AS ptot
  FROM tot t JOIN tot p ON t.day = p.day + 1
),
cats AS (
  SELECT coalesce(d.day, pd.day) AS day,
         coalesce(d.cat, pd.cat) AS cat,
         coalesce(d.n, 0) AS n, coalesce(pd.pn, 0) AS pn
  FROM daily d
  FULL JOIN (SELECT day + 1 AS day, cat, n AS pn FROM daily) pd
    ON d.day = pd.day AND d.cat = pd.cat
),
terms AS (
  SELECT c.day,
         CAST(floor((
           CASE WHEN c.n > 0 THEN
             0.5 * (c.n / CAST(j.tot AS DOUBLE))
                 * ln((c.n / CAST(j.tot AS DOUBLE))
                      / (((c.n / CAST(j.tot AS DOUBLE))
                          + (c.pn / CAST(j.ptot AS DOUBLE))) / 2.0))
           ELSE 0.0 END
           +
           CASE WHEN c.pn > 0 THEN
             0.5 * (c.pn / CAST(j.ptot AS DOUBLE))
                 * ln((c.pn / CAST(j.ptot AS DOUBLE))
                      / (((c.n / CAST(j.tot AS DOUBLE))
                          + (c.pn / CAST(j.ptot AS DOUBLE))) / 2.0))
           ELSE 0.0 END
         ) * 1000000.0) AS BIGINT) AS c_micro
  FROM cats c JOIN pair j USING (day)
)
SELECT day, CAST(count(*) AS BIGINT) AS n_cats,
       CAST(sum(c_micro) AS BIGINT) AS jsd_micro
FROM terms GROUP BY day
""".strip()


# ---------------------------------------------------------------------------
# Concentration report (host/domain skew diagnostic)
# ---------------------------------------------------------------------------


def concentration_report(
    df: DataFrame,
    weight_col: str,
    group_col: str | None = None,
    max_groups: int | None = 10_000_000,
) -> DataFrame:
    """One-row skew profile of a weighted group table: ``(n_groups,
    total_weight, top1_share_ppm, top10_share_ppm, gini_ppm)``.

    The input is an already-aggregated table (e.g. ``web.host_stats``
    output: one row per host with a ``docs`` weight). Gini uses the
    exact sorted-index identity G = Σ(2i−n−1)·x_i / (n·Σx) over weights
    ascending — all-int64 arithmetic in ppm, so the report is
    cross-engine byte-stable. Ordering ties (equal weights) don't affect
    any of the sums, so no tie-break is needed for determinism.

    Scale: the exact Gini needs a GLOBAL rank, which Spark executes as a
    single-partition sort — fine for the group tables this report is FOR
    (hosts/domains: ≤10⁷ rows sort in seconds on one task), wrong for a
    raw-row table. ``max_groups`` enforces that contract: the input is
    counted first (one cheap agg over the reduced table) and a larger
    input raises instead of silently single-tasking a terabyte sort —
    pass ``None`` only when the caller has pre-verified the size. Beyond
    the cap, bucket the weights (``log_histogram``) for an approximate
    Gini instead of exact ranks.
    """
    if max_groups is not None:
        n_in = df.count()
        if n_in > max_groups:
            raise ValueError(
                f"concentration_report input has {n_in} rows — beyond "
                f"max_groups={max_groups}, the exact-Gini global sort "
                f"single-tasks; aggregate further or use a bucketed "
                f"approximation (functions.sketch.log_histogram)"
            )
    w = Window.orderBy(F.col("x").asc())
    n_w = Window.partitionBy()
    ranked = df.select(
        F.col(weight_col).cast("long").alias("x"),
    ).select(
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(n_w).alias("n"),
    )
    agg = ranked.agg(
        F.max("n").alias("n_groups"),
        F.sum("x").alias("total_weight"),
        F.max("x").alias("__top1"),
        F.sum(F.expr("(2 * i - n - 1) * x")).alias("__gnum"),
        F.sum(F.when(F.col("i") > F.col("n") - 10, F.col("x"))).alias(
            "__top10"
        ),
    )
    ppm = 1_000_000
    return agg.select(
        "n_groups",
        "total_weight",
        F.expr(f"({ppm} * __top1) div total_weight").alias("top1_share_ppm"),
        F.expr(
            f"({ppm} * coalesce(__top10, 0)) div total_weight"
        ).alias("top10_share_ppm"),
        F.expr(
            f"({ppm} * __gnum) div (n_groups * total_weight)"
        ).alias("gini_ppm"),
    )


def concentration_report_sql(inner: str, weight_col: str) -> str:
    """DuckDB twin of :func:`concentration_report` over ``inner``."""
    ppm = 1_000_000
    return f"""
WITH ranked AS (
  SELECT CAST({weight_col} AS BIGINT) AS x,
         row_number() OVER (ORDER BY {weight_col} ASC) AS i,
         count(*) OVER () AS n
  FROM ({inner})
),
a AS (
  SELECT max(n) AS n_groups,
         CAST(sum(x) AS BIGINT) AS total_weight,
         max(x) AS __top1,
         CAST(sum((2 * i - n - 1) * x) AS BIGINT) AS __gnum,
         CAST(coalesce(sum(x) FILTER (WHERE i > n - 10), 0) AS BIGINT) AS __top10
  FROM ranked
)
SELECT n_groups, total_weight,
       ({ppm} * __top1) // total_weight AS top1_share_ppm,
       ({ppm} * __top10) // total_weight AS top10_share_ppm,
       ({ppm} * __gnum) // (n_groups * total_weight) AS gini_ppm
FROM a
""".strip()
