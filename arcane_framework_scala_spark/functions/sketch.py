"""Deterministic mergeable HyperLogLog distinct-count sketches.

The 100 TB distinct-count tool: per-shard register tables that merge by
``max`` (order-insensitive, associative — the property that lets 1000
executors sketch independently and a coordinator union the results with
no second pass over the data), plus a fixed-point estimator.

Why not ``approx_count_distinct``: Spark's built-in HLL++ is the right
production call when only Spark reads the answer, but its registers are
opaque and its estimate is not bit-stable across engines, so it cannot
be driver-gated and its sketches cannot be exchanged with non-Spark
consumers. This implementation pins every step to engine-portable
primitives so Spark and DuckDB produce byte-identical registers AND
byte-identical estimates:

- hash: the repo's standard md5→int64 (first 15 hex digits = 60 bits);
- register index: low ``p`` bits; rank material: the remaining 51 bits;
- rank: 1 + leading zeros, computed by STRING ops (``lpad(bin(v))`` +
  ``instr``) — zero float involvement, zero libm;
- estimator: the raw HLL harmonic mean with the ``2^-M_j`` sum carried
  as the INTEGER ``S = Σ 2^(52-M_j)`` (zero registers contribute
  ``2^52``), so the only float math is one literal-folded
  multiply-chain and one division — both correctly-rounded IEEE ops on
  identical inputs in every engine;
- small-range correction: linear counting ``m·ln(m/V)`` needs ``ln``,
  whose libm rounding is NOT engine-portable — but its argument domain
  is the 512 possible empty-register counts, so the whole function is
  precomputed HERE as an integer literal table and embedded in both
  engines (``_LIN_MICRO``). The branch condition (raw estimate ≤ 2.5·m
  and V > 0, per Flajolet et al. 2007) compares integers only.

Reference analogue: the reference's scalar aggregate family (A1-A6)
folds listings into versions/sizes; this extends the family with the
sketch a 100 TB corpus needs for "how many distinct tokens/users/keys"
without a count-distinct shuffle of the raw values.

Scale shape: one map-side-combinable groupBy to the register table
(≤ groups × 512 rows — metadata-sized regardless of input), then a
second metadata-scale aggregation for the estimate. Shard merge is a
union + the same max-groupBy over register tables only.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

#: register-count exponent; m = 2^p registers per sketch
HLL_P = 9
HLL_M = 1 << HLL_P
#: rank material width: 60-bit md5 hash minus the p index bits
_VBITS = 60 - HLL_P
#: max rank: _VBITS leading zeros (v == 0) + 1
_RMAX = _VBITS + 1
#: raw-HLL bias constant alpha_m for m = 512 (Flajolet et al. 2007);
#: both engines fold the same literal expression, so the folded double
#: is identical
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: linear-counting table: _LIN_MICRO[V-1] = floor(m·ln(m/V)·10⁶) for
#: V = 1..m empty registers — libm evaluated ONCE here, embedded as
#: integer literals in the Spark plan AND the oracle SQL, so the
#: small-range estimate is engine-exact by construction
_LIN_MICRO = [
    int(math.floor(HLL_M * math.log(HLL_M / v) * 1_000_000.0))
    for v in range(1, HLL_M + 1)
]
#: switch to linear counting when the raw estimate is below 2.5·m
#: (and V > 0) — integer comparison in micro units
_SMALL_RANGE_MICRO = int(2.5 * HLL_M * 1_000_000)


def _hash60(col: Column) -> Column:
    """Engine-portable 60-bit hash (md5 → first 15 hex digits)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("long")
    )


def hll_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build sparse register tables: ``(group..., idx, r)`` with one row
    per non-empty register, ``r`` = max rank observed. NULL values are
    skipped (count-distinct convention). One map-side-combinable
    shuffle; output ≤ groups × 512 rows."""
    group_cols = group_cols or []
    h = _hash60(F.col(value_col))
    v = F.shiftrightunsigned(h, HLL_P)
    pos = F.instr(F.lpad(F.bin(v), _VBITS, "0"), "1")
    rank = F.when(pos == 0, F.lit(_RMAX)).otherwise(pos)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            h.bitwiseAND(F.lit(HLL_M - 1)).alias("idx"),
            rank.alias("__rank"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.max("__rank").cast("int").alias("r"))
    )


def hll_merge(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge register tables (same layout in, same layout out): union
    the inputs beforehand, then ``max`` per (group, idx). Register max
    is the HLL union — associative and idempotent, so shards can merge
    in any order/grouping and re-merging is a no-op."""
    group_cols = group_cols or []
    return (
        sketches.groupBy(*group_cols, "idx")
        .agg(F.max("r").cast("int").alias("r"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-point raw-HLL estimate per group:
    ``(group..., n_registers, est_micro)``.

    ``S = Σ 2^(52-r)`` over the 512 registers (empty ⇒ ``2^52``) stays
    integer; the raw estimate is ``floor(alpha·m²·2^52·10⁶ / S)`` — one
    float chain, byte-identical across engines — replaced by the
    literal-table linear count when it falls in the small range."""
    group_cols = group_cols or []
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RMAX} - r)")
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(term).alias("__s_filled"),
    )
    s = (
        F.col("__s_filled")
        + (F.lit(HLL_M) - F.col("n_registers"))
        * F.lit(1 << _RMAX).cast("long")
    )
    raw = F.floor(
        F.lit(_ALPHA * HLL_M * HLL_M)
        * F.lit(float(1 << _RMAX))
        * F.lit(1000000.0)
        / s.cast("double")
    ).cast("long")
    v = (F.lit(HLL_M) - F.col("n_registers")).cast("int")
    from arcane_framework_scala_spark.functions.similarity import (
        _lit_num_array,
    )

    # one parsed expression, not 512 py4j F.lit round trips (~0.5 s of
    # pure driver time per estimate call before r11; values identical)
    lin = F.element_at(_lit_num_array(_LIN_MICRO), v).cast("long")
    est = F.when(
        (v > 0) & (raw <= F.lit(_SMALL_RANGE_MICRO)), lin
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("n_registers").cast("long").alias("n_registers"),
        est.alias("est_micro"),
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """sketch → estimate in one call (single-pass per-group distinct)."""
    return hll_estimate(hll_sketch(df, value_col, group_cols), group_cols)


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_HASH_SQL = "CAST(concat('0x', substr(md5(CAST({v} AS VARCHAR)), 1, 15)) AS BIGINT)"


def hll_sketch_sql(
    table: str,
    value_col: str,
    group_cols: list[str] | None = None,
) -> str:
    """Registers ``(group..., idx, r)`` — identical math to
    :func:`hll_sketch`."""
    group_cols = group_cols or []
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    gby = f"{g}, idx" if g else "idx"
    h = _HASH_SQL.format(v=value_col)
    return f"""
SELECT {gsel}idx, CAST(max(rnk) AS INT) AS r
FROM (
  SELECT {gsel}h & {HLL_M - 1} AS idx,
         CASE WHEN strpos(lpad(bin(h >> {HLL_P}), {_VBITS}, '0'), '1') = 0
              THEN {_RMAX}
              ELSE strpos(lpad(bin(h >> {HLL_P}), {_VBITS}, '0'), '1')
         END AS rnk
  FROM (SELECT {gsel}{h} AS h FROM {table}
        WHERE {value_col} IS NOT NULL)
)
GROUP BY {gby}
"""


def hll_distinct_sql(
    table: str,
    value_col: str,
    group_cols: list[str] | None = None,
) -> str:
    """``(group..., n_registers, est_micro)`` — identical estimator
    float chain to :func:`hll_estimate` (same literals, same op
    order)."""
    group_cols = group_cols or []
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    gby = f"GROUP BY {g}" if g else ""
    regs = hll_sketch_sql(table, value_col, group_cols)
    lin_list = "[" + ",".join(str(x) for x in _LIN_MICRO) + "]"
    raw = f"""CAST(floor(CAST({_ALPHA * HLL_M * HLL_M!r} AS DOUBLE)
                  * CAST({float(1 << _RMAX)!r} AS DOUBLE)
                  * CAST(1000000.0 AS DOUBLE)
                  / CAST(s_filled + ({HLL_M} - n_registers)
                         * (CAST(1 AS BIGINT) << {_RMAX}) AS DOUBLE))
            AS BIGINT)"""
    return f"""
SELECT {gsel}CAST(n_registers AS BIGINT) AS n_registers,
       CASE WHEN {HLL_M} - n_registers > 0
                 AND {raw} <= {_SMALL_RANGE_MICRO}
            THEN CAST(({lin_list})[{HLL_M} - n_registers] AS BIGINT)
            ELSE {raw}
       END AS est_micro
FROM (
  SELECT {gsel}count(*) AS n_registers,
         sum(CAST(1 AS BIGINT) << ({_RMAX} - r)) AS s_filled
  FROM ({regs})
  {gby}
)
"""


# ---------------------------------------------------------------------------
# Count-Min sketch (heavy hitters)
# ---------------------------------------------------------------------------

#: CMS depth (hash rows) and width (counters per row). d=4, w=1024 →
#: ε = e/w ≈ 0.27% of total weight, δ = e^-4 ≈ 1.8% failure odds per
#: query — 16 KB of counters regardless of input size.
CMS_D = 4
CMS_W = 1024


def _cms_idx(j: int, col: Column) -> Column:
    """Row-j counter index: the engine-portable md5 hash of the salted
    value, masked to the width (w is a power of two)."""
    return _hash60(
        F.concat(F.lit(f"{j}|"), col.cast("string"))
    ).bitwiseAND(F.lit(CMS_W - 1))


def cms_sketch(
    df: DataFrame,
    value_col: str,
    weight_col: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build Count-Min counter tables: ``(group..., j, idx, cnt)`` — the
    frequency sibling of :func:`hll_sketch`. Counters merge by SUM
    (associative + commutative), so shards sketch independently and any
    merge order gives the same table; lookups never underestimate
    (``est ≥ true``) and overestimate by at most ε·N with probability
    1-δ. All integer arithmetic — byte-identical across engines.

    One explode to d rows per input row, one map-side-combinable
    groupBy; output ≤ groups × d × w rows (metadata-sized)."""
    group_cols = group_cols or []
    w = F.col(weight_col) if weight_col else F.lit(1)
    v = F.col(value_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cms_idx(j, v).alias("idx")
            )
            for j in range(CMS_D)
        ]
    )
    return (
        df.filter(v.isNotNull())
        .select(*group_cols, F.explode(pairs).alias("p"), w.alias("__w"))
        .groupBy(*group_cols, F.col("p.j").alias("j"), F.col("p.idx").alias("idx"))
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def cms_merge(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge counter tables (union beforehand): SUM per (group, j, idx)."""
    group_cols = group_cols or []
    return (
        sketches.groupBy(*group_cols, "j", "idx")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    values: DataFrame,
    value_col: str,
) -> DataFrame:
    """Point-estimate every row of ``values``: ``(value_col, est_n)`` =
    min over the d rows of the counter each hash lands in (absent
    counters read 0). The sketch side is ≤ d×w rows — broadcast."""
    v = F.col(value_col)
    probes = (
        values.filter(v.isNotNull())
        .select(
            v.alias(value_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"), _cms_idx(j, v).alias("idx")
                        )
                        for j in range(CMS_D)
                    ]
                )
            ).alias("p"),
        )
        .select(value_col, F.col("p.j").alias("j"), F.col("p.idx").alias("idx"))
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "idx"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_n"))
    )


def cms_sketch_sql(
    table: str,
    value_col: str,
    weight_expr: str = "1",
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`cms_sketch` (identical hashing/masking)."""
    group_cols = group_cols or []
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    gby = f"{g}, j, idx" if g else "j, idx"
    rows = " UNION ALL ".join(
        f"""SELECT {gsel}{j} AS j,
           {_HASH_SQL.format(v=f"concat('{j}|', CAST({value_col} AS VARCHAR))")}
             & {CMS_W - 1} AS idx,
           {weight_expr} AS w
    FROM {table} WHERE {value_col} IS NOT NULL"""
        for j in range(CMS_D)
    )
    return f"""
SELECT {gsel}j, idx, CAST(sum(w) AS BIGINT) AS cnt
FROM ({rows})
GROUP BY {gby}
"""


def cms_lookup_sql(
    sketch_query: str,
    values_query: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`cms_lookup` over a sketch subquery and a
    values subquery (both referenced inline)."""
    probes = " UNION ALL ".join(
        f"""SELECT {value_col}, {j} AS j,
           {_HASH_SQL.format(v=f"concat('{j}|', CAST({value_col} AS VARCHAR))")}
             & {CMS_W - 1} AS idx
    FROM ({values_query}) WHERE {value_col} IS NOT NULL"""
        for j in range(CMS_D)
    )
    return f"""
SELECT {value_col}, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est_n
FROM ({probes}) p
LEFT JOIN ({sketch_query}) s USING (j, idx)
GROUP BY {value_col}
"""


# ---------------------------------------------------------------------------
# KMV / theta sketch (distinct counts WITH set intersection)
# ---------------------------------------------------------------------------

#: KMV sample size: the sketch is the k smallest distinct hash values.
#: RSE ≈ 1/sqrt(k-2) ≈ 4.4% at k=512 (intersections are noisier by
#: 1/sqrt(J·k), which is why k doubles the HLL register count).
KMV_K = 512
#: hash domain size (60-bit md5 prefix) as a float literal for theta
_KMV_DOMAIN = float(1 << 60)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build KMV sketches: ``(group..., h)`` — the ``k`` smallest
    DISTINCT 60-bit hashes per group. What HLL cannot do, this can:
    sketches of different sets compose under union AND intersection
    (:func:`kmv_intersect`), so "how many distinct tokens/users appear
    in BOTH splits" needs no join of the raw corpora — the
    split-leakage / audience-overlap estimator at 100 TB.

    Plan: hash projection → distinct (one shuffle) → bottom-k. Grouped:
    a per-group window (parallel across groups). Ungrouped: orderBy +
    limit, which Spark plans as TakeOrderedAndProject — per-partition
    bottom-k partials merged once, never a single-task global sort.
    Deterministic: the sketch is a pure function of the value SET
    (order-insensitive by construction — it is a set minimum)."""
    group_cols = group_cols or []
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, _hash60(F.col(value_col)).alias("h"))
        .distinct()
    )
    return _bottom_k(hashed, group_cols)


def _bottom_k(hashed: DataFrame, group_cols: list[str]) -> DataFrame:
    from pyspark.sql import Window

    if not group_cols:
        return hashed.select("h").orderBy("h").limit(KMV_K)
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= KMV_K)
        .select(*group_cols, "h")
    )


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union-merge sketch tables: k smallest of the distinct union —
    associative and idempotent, same layout in and out."""
    group_cols = group_cols or []
    return _bottom_k(
        sketches.select(*group_cols, "h").distinct(), group_cols
    )


def _kmv_est(n_col: Column, hk_col: Column) -> Column:
    """est_micro from sketch size and the k-th smallest hash: exact
    (×10⁶) when the sketch is not full (every distinct hash was kept),
    else ``floor((k-1)·2^60·10⁶ / h_k)`` — one float chain on integer
    inputs, byte-identical across engines."""
    full = F.floor(
        F.lit(float(KMV_K - 1))
        * F.lit(_KMV_DOMAIN)
        * F.lit(1000000.0)
        / hk_col.cast("double")
    ).cast("long")
    return F.when(n_col < KMV_K, (n_col * F.lit(1_000_000)).cast("long")).otherwise(full)


def kmv_estimate(
    sketch: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """``(group..., n_sample, est_micro)`` distinct-count estimate."""
    group_cols = group_cols or []
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.max("h").alias("__hk"),
    )
    return agg.select(
        *group_cols,
        F.col("n_sample").cast("long").alias("n_sample"),
        _kmv_est(F.col("n_sample"), F.col("__hk")).alias("est_micro"),
    )


def kmv_intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """Intersection estimate from two (ungrouped) sketches — one row
    ``(n_common, est_micro)``: take the union's k smallest hashes (the
    merged sketch — the only region where both sketches are complete),
    count how many lie in BOTH inputs, scale by the union's theta.
    Sketch-only math: both sides are ≤ k rows, everything broadcasts."""
    u = kmv_merge(a.select("h").unionByName(b.select("h")))
    common = (
        u.join(a.select("h").distinct(), "h", "left_semi")
        .join(b.select("h").distinct(), "h", "left_semi")
    )
    stats = u.agg(
        F.count(F.lit(1)).alias("n_union"), F.max("h").alias("__hk")
    ).crossJoin(common.agg(F.count(F.lit(1)).alias("n_common")))
    est = F.when(
        F.col("n_union") < KMV_K,
        (F.col("n_common") * F.lit(1_000_000)).cast("long"),
    ).otherwise(
        F.floor(
            F.col("n_common").cast("double")
            * F.lit(_KMV_DOMAIN)
            * F.lit(1000000.0)
            / F.col("__hk").cast("double")
        ).cast("long")
    )
    return stats.select(
        F.col("n_common").cast("long").alias("n_common"),
        est.alias("est_micro"),
    )


def kmv_sketch_sql(
    table: str,
    value_col: str,
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`kmv_sketch`."""
    group_cols = group_cols or []
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    h = _HASH_SQL.format(v=value_col)
    return f"""
SELECT {gsel}h FROM (
  SELECT {gsel}h, row_number() OVER ({part}ORDER BY h) AS rk
  FROM (SELECT DISTINCT {gsel}{h} AS h FROM {table}
        WHERE {value_col} IS NOT NULL)
) WHERE rk <= {KMV_K}
"""


def kmv_estimate_sql(
    sketch_query: str,
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`kmv_estimate` (identical float chain)."""
    group_cols = group_cols or []
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    gby = f"GROUP BY {g}" if g else ""
    full = (
        f"CAST(floor(CAST({float(KMV_K - 1)!r} AS DOUBLE)"
        f" * CAST({_KMV_DOMAIN!r} AS DOUBLE)"
        f" * CAST(1000000.0 AS DOUBLE)"
        f" / CAST(hk AS DOUBLE)) AS BIGINT)"
    )
    return f"""
SELECT {gsel}CAST(n_sample AS BIGINT) AS n_sample,
       CASE WHEN n_sample < {KMV_K}
            THEN CAST(n_sample * 1000000 AS BIGINT)
            ELSE {full}
       END AS est_micro
FROM (
  SELECT {gsel}count(*) AS n_sample, max(h) AS hk
  FROM ({sketch_query})
  {gby}
)
"""


def kmv_intersect_sql(a_query: str, b_query: str) -> str:
    """DuckDB twin of :func:`kmv_intersect`."""
    u = f"""
SELECT h FROM (
  SELECT h, row_number() OVER (ORDER BY h) AS rk
  FROM (SELECT DISTINCT h FROM (({a_query}) UNION ALL ({b_query})))
) WHERE rk <= {KMV_K}
"""
    return f"""
WITH u AS ({u}),
common AS (
  SELECT h FROM u
  WHERE h IN (SELECT h FROM ({a_query}))
    AND h IN (SELECT h FROM ({b_query}))
)
SELECT CAST((SELECT count(*) FROM common) AS BIGINT) AS n_common,
       CASE WHEN (SELECT count(*) FROM u) < {KMV_K}
            THEN CAST((SELECT count(*) FROM common) * 1000000 AS BIGINT)
            ELSE CAST(floor(CAST((SELECT count(*) FROM common) AS DOUBLE)
                            * CAST({_KMV_DOMAIN!r} AS DOUBLE)
                            * CAST(1000000.0 AS DOUBLE)
                            / CAST((SELECT max(h) FROM u) AS DOUBLE))
                      AS BIGINT)
       END AS est_micro
"""


# ---------------------------------------------------------------------------
# Log-histogram quantile sketch (HDR/DDSketch shape)
# ---------------------------------------------------------------------------

#: sub-bucket bits: each power-of-two range splits into 2^b buckets →
#: relative quantile error ≤ 2^-b ≈ 3.1%. ≤ ~60·2^b ≈ 1920 buckets
#: cover the whole non-negative int64 domain.
HDR_BITS = 5


def hdr_bucket_exprs(value_col: str):
    """The HDR bucket columns ``(e, sub, lo)`` for a non-negative int64
    column — exponent, top-``HDR_BITS``-mantissa sub-bucket, and the
    bucket's lower bound. Shared by :func:`log_histogram` and the
    delete-tolerant IVM histogram (``operators.ivm_profile``), so both
    maintain bit-identical buckets."""
    v = f"CAST({value_col} AS BIGINT)"
    e = (F.length(F.bin(F.col(value_col).cast("long"))) - 1).cast("int")
    sub = F.expr(
        f"shiftrightunsigned({v}, "
        f"greatest(CAST(length(bin({v})) - 1 AS INT) - {HDR_BITS}, 0))"
    )
    lo = F.expr(
        f"shiftleft(shiftrightunsigned({v}, "
        f"greatest(CAST(length(bin({v})) - 1 AS INT) - {HDR_BITS}, 0)), "
        f"greatest(CAST(length(bin({v})) - 1 AS INT) - {HDR_BITS}, 0))"
    )
    return e, sub, lo


def log_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mergeable quantile sketch over NON-NEGATIVE int64 values:
    ``(group..., e, sub, lo, cnt)`` — HDR-histogram buckets (exponent
    ``e`` = floor(log2 v), top ``HDR_BITS`` mantissa bits as ``sub``),
    counts merging by SUM. The engine-stable alternative to
    ``approx_percentile`` (Greenwald-Khanna sketches are not bit-stable
    across engines — ``value_quantiles``'s documented caveat): bucket
    boundaries are pure integer bit-arithmetic, so shards sketch
    independently on any engine and the merged histogram is identical
    everywhere. ≤ ~1920 buckets regardless of input size.

    ``e`` comes from ``length(bin(v))`` — string length of the binary
    representation, the same no-libm trick as the HLL rank."""
    group_cols = group_cols or []
    v = F.col(value_col).cast("long")
    e, sub, lo = hdr_bucket_exprs(value_col)
    return (
        df.filter(v.isNotNull() & (v >= 0))
        .select(
            *group_cols,
            e.alias("e"),
            sub.cast("long").alias("sub"),
            lo.cast("long").alias("lo"),
        )
        .groupBy(*group_cols, "e", "sub", "lo")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def log_hist_merge(
    hists: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge histograms (union beforehand): SUM per bucket."""
    group_cols = group_cols or []
    return (
        hists.groupBy(*group_cols, "e", "sub", "lo")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def log_hist_quantiles(
    hist: DataFrame,
    pcts: list[int],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantiles from the histogram: ``(group..., pct, est)`` where
    ``est`` is the LOWER BOUND of the bucket containing the type-1
    quantile (rank ``ceil(pct·N/100)`` over buckets in (e, sub) order).
    Integer arithmetic end to end — ``ceil`` via
    ``(pct·N + 99) div 100`` — so the result is byte-identical across
    engines; estimate error ≤ the bucket's 2^-HDR_BITS relative
    width."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("e", "sub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        *group_cols, "e", "sub", "lo",
        F.sum("cnt").over(w).alias("cum"),
    )
    totals = hist.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    pcts_df = hist.sparkSession.createDataFrame(
        [(p,) for p in pcts], "pct int"
    )
    joined = (
        cum.join(F.broadcast(totals), group_cols) if group_cols
        else cum.crossJoin(F.broadcast(totals))
    ).crossJoin(F.broadcast(pcts_df))
    return (
        joined.filter(
            F.col("cum")
            >= F.expr("(pct * n + 99) div 100")
        )
        .groupBy(*group_cols, "pct")
        .agg(F.min("lo").alias("est"))
    )


def log_histogram_sql(
    table: str,
    value_col: str,
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`log_histogram`."""
    group_cols = group_cols or []
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    gby = f"{g}, e, sub, lo" if g else "e, sub, lo"
    v = f"CAST({value_col} AS BIGINT)"
    e = f"CAST(length(bin({v})) - 1 AS INT)"
    sh = f"greatest({e} - {HDR_BITS}, 0)"
    return f"""
SELECT {gsel}e, sub, lo, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT {gsel}{e} AS e,
         CAST({v} >> {sh} AS BIGINT) AS sub,
         CAST(({v} >> {sh}) << {sh} AS BIGINT) AS lo
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {v} >= 0
)
GROUP BY {gby}
"""


def log_hist_quantiles_sql(
    hist_query: str,
    pcts: list[int],
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`log_hist_quantiles`."""
    group_cols = group_cols or []
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    gby = f"{g}, pct" if g else "pct"
    jn = f"USING ({g})" if g else "ON true"
    pvals = ", ".join(f"({p})" for p in pcts)
    return f"""
WITH h AS ({hist_query}),
cum AS (
  SELECT {gsel}e, sub, lo,
         sum(cnt) OVER ({part}ORDER BY e, sub
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM h
),
tot AS (SELECT {gsel}sum(cnt) AS n FROM h {('GROUP BY ' + g) if g else ''})
SELECT {gsel}pct, CAST(min(lo) AS BIGINT) AS est
FROM cum
JOIN tot {jn}
CROSS JOIN (VALUES {pvals}) AS p(pct)
WHERE cum >= (pct * n + 99) // 100
GROUP BY {gby}
"""


def hll_state_merge_sql(target_table: str, source_view: str) -> str:
    """MERGE statement that maintains an HLL register TABLE from a
    batch's register view — the production posture at 100 TB: the
    sketch is a tiny catalog table (≤ m rows) that each ingest batch
    upserts, so "distinct keys ever seen" never re-scans history.
    Register max as conditional row-level ops: update only when the
    batch's rank beats the stored one, insert unseen registers. The
    statement is engine-portable MERGE (Spark DSv2 / Iceberg / Delta /
    Trino all accept it)."""
    return (
        f"MERGE INTO {target_table} t\n"
        f"USING (SELECT idx, r FROM {source_view}) s\n"
        f"ON t.idx = s.idx\n"
        f"WHEN MATCHED AND s.r > t.r THEN UPDATE SET r = s.r\n"
        f"WHEN NOT MATCHED THEN INSERT (idx, r) VALUES (s.idx, s.r)"
    )
