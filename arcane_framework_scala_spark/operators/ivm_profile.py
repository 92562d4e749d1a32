"""Incremental maintenance of AVG/variance moments and COUNT(DISTINCT)
under deletes — completing :mod:`ivm`'s view-maintenance family
(VERDICT r7 item 6).

**Moments (avg / population variance).** Both derive from the additive
triple (sum, sum-of-squares, non-NULL count), so they live in the same
self-maintainable class as :mod:`ivm`'s count/sum: per CDF wave the
state absorbs one per-group delta, O(|delta|), never a base rescan.

    avg      = sum_v  / nn
    var_pop  = sum_sq / nn - (sum_v / nn)^2

NULL semantics match a fresh groupBy: a group whose last non-NULL value
leaves returns sum_v/sum_sq to NULL via the same ``nn``-auxiliary trick
:mod:`ivm` uses for SUM. All state is integer (values cast to long).
Overflow posture (ADVICE r8): per-row squaring is GUARDED — any value
with |v| > 3 037 000 499 (floor(sqrt(2^63−1)), the largest long whose
square fits int64) raises at bootstrap/delta time instead of wrapping.
Accumulated sums can still exceed int64 for extreme group sizes
(~9e6 rows/group at |v|=1e6); ``get_session`` pins ANSI mode ON, where
Spark's SUM raises ARITHMETIC_OVERFLOW rather than wrapping, so the
divergence is loud, never silent. Only a non-ANSI session could wrap
silently on ACCUMULATION — run those with DECIMAL(38,0) state columns;
the algebra is unchanged.

**COUNT(DISTINCT) under deletes.** Not self-maintainable from a scalar:
deleting a value must only decrement the distinct count when the LAST
copy of that value in the group leaves. The exact auxiliary is the
counting multiset — one row per live (group, value) with its
multiplicity:

    aux(group, val, cnt>0);   distinct(group) = |{val : cnt > 0}|

Per wave: the CDF collapses to (group, val, ±count) deltas, the aux
absorbs them with one hash shuffle on (group, val), rows at cnt == 0
drop out. State is O(sum of per-group distinct values) — the same
footprint a shuffle-based exact countDistinct materializes transiently,
held incrementally instead. NULL values never enter the aux (SQL's
COUNT(DISTINCT) ignores NULLs), so an all-NULL group counts 0.

KMV/HLL sketches (:mod:`functions.sketch`) are the cheaper state when
approximation is acceptable — but they are insert-only; this module is
the exact, delete-tolerant path.

Determinism: all-integer arithmetic; parity with a from-scratch
recompute is asserted by the ``t_ivm_profile`` gate and its DuckDB
oracle, plus a seeded randomized sweep in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

#: floor(sqrt(2^63 - 1)): the largest |v| whose square fits in int64.
#: Values beyond it RAISE at bootstrap/delta time (see module docstring)
#: — a wrapped square would corrupt the maintained variance in a way the
#: from-scratch parity check wraps identically on, i.e. undetectably.
SUM_SQ_SAFE_ABS = 3_037_000_499


def _sq_guarded(v):
    """``v`` with the squaring-overflow guard attached: raises
    USER_RAISED_EXCEPTION on |v| > :data:`SUM_SQ_SAFE_ABS`, else passes
    the value through (one JVM-side branch, codegen-friendly)."""
    return F.when(
        F.abs(v) > F.lit(SUM_SQ_SAFE_ABS),
        F.raise_error(
            F.concat(
                F.lit(
                    "ivm_profile: |value| exceeds the int64-safe squaring "
                    f"bound {SUM_SQ_SAFE_ABS} (got "
                ),
                v.cast("string"),
                F.lit("); use DECIMAL(38,0) state for this domain"),
            )
        ).cast("long"),
    ).otherwise(v)


def _sided_values(cdf: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """Collapse a CDF batch to signed value contributions
    ``(group, __v, __sg)``: insert → (+1, post-image), delete →
    (−1, pre-image), update → both rows — the canonical sided-explode
    shape of :func:`ivm.group_delta`, shared by every delta builder in
    this module so the CDF convention lives in ONE place."""
    ins = F.col("op") == "insert"
    dele = F.col("op") == "delete"
    sided = cdf.select(
        F.explode(
            F.when(ins, F.array(F.lit(1)))
            .when(dele, F.array(F.lit(-1)))
            .otherwise(F.array(F.lit(1), F.lit(-1)))
        ).alias("side"),
        F.col(f"new_{group_col}").alias("__ng"),
        F.col(f"old_{group_col}").alias("__og"),
        F.col(f"new_{val_col}").cast("long").alias("__nv"),
        F.col(f"old_{val_col}").cast("long").alias("__ov"),
    )
    pos = F.col("side") == 1
    return sided.select(
        F.when(pos, F.col("__ng")).otherwise(F.col("__og")).alias(group_col),
        F.when(pos, F.col("__nv")).otherwise(F.col("__ov")).alias("__v"),
        F.when(pos, F.lit(1)).otherwise(F.lit(-1)).alias("__sg"),
    )


# ---------------------------------------------------------------- moments


def moments_bootstrap(
    df: DataFrame, group_col: str, val_col: str
) -> DataFrame:
    """Initial materialization: ``(group, docs, sum_v, sum_sq, nn)``.
    ``nn`` (non-NULL value count) is the divisor for avg/var AND the
    auxiliary that returns the sums to NULL when it reaches zero."""
    v = _sq_guarded(F.col(val_col).cast("long"))
    return df.groupBy(F.col(group_col).alias(group_col)).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(v).alias("sum_v"),
        F.sum(v * v).alias("sum_sq"),
        F.count(v).alias("nn"),
    )


def moments_delta(cdf: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """Collapse a CDF batch into per-group additive moment deltas
    (insert: +post-image; delete: -pre-image; update: both sides)."""
    v = _sq_guarded(F.col("__v"))
    return (
        _sided_values(cdf, group_col, val_col)
        .groupBy(group_col)
        .agg(
            F.sum("__sg").alias("d_docs"),
            F.sum(F.col("__sg") * v).alias("d_sum"),
            F.sum(F.col("__sg") * v * v).alias("d_sq"),
            F.sum(
                F.col("__sg") * F.col("__v").isNotNull().cast("long")
            ).alias("d_nn"),
        )
    )


def apply_moments_delta(
    state: DataFrame, delta: DataFrame, group_col: str
) -> DataFrame:
    """Merge a moment delta into the maintained state (full-outer on the
    null-safe group key; groups at docs == 0 disappear; sums return to
    NULL exactly when nn reaches zero). One hash shuffle, sized by
    |state| + |delta|."""
    s = state.select(
        F.col(group_col).alias("__sg"),
        "docs",
        "sum_v",
        "sum_sq",
        "nn",
        F.lit(True).alias("__in_s"),
    )
    d = delta.select(
        F.col(group_col).alias("__dg"),
        "d_docs",
        "d_sum",
        "d_sq",
        "d_nn",
        F.lit(True).alias("__in_d"),
    )
    j = s.join(d, F.col("__sg").eqNullSafe(F.col("__dg")), "full_outer")
    in_s = F.coalesce(F.col("__in_s"), F.lit(False))
    nn = F.coalesce(F.col("nn"), F.lit(0)) + F.coalesce(F.col("d_nn"), F.lit(0))

    def summed(cur: str, d_col: str):
        return (
            F.when(nn == 0, F.lit(None))
            .otherwise(
                F.coalesce(F.col(cur), F.lit(0))
                + F.coalesce(F.col(d_col), F.lit(0))
            )
            .cast("long")
        )

    return (
        j.select(
            F.when(in_s, F.col("__sg")).otherwise(F.col("__dg")).alias(group_col),
            (
                F.coalesce(F.col("docs"), F.lit(0))
                + F.coalesce(F.col("d_docs"), F.lit(0))
            ).alias("docs"),
            summed("sum_v", "d_sum").alias("sum_v"),
            summed("sum_sq", "d_sq").alias("sum_sq"),
            nn.alias("nn"),
        )
        .filter(F.col("docs") > 0)
    )


# ------------------------------------------------------ distinct (exact)


def distinct_bootstrap(
    df: DataFrame, group_col: str, val_col: str
) -> DataFrame:
    """Counting-multiset auxiliary: one row per live (group, value) with
    its multiplicity. NULL values never enter (COUNT(DISTINCT) ignores
    them)."""
    v = F.col(val_col).cast("long")
    return (
        df.filter(v.isNotNull())
        .groupBy(F.col(group_col).alias(group_col), v.alias("val"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def distinct_delta(cdf: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """Collapse a CDF batch into (group, val, ±count) multiset deltas."""
    return (
        _sided_values(cdf, group_col, val_col)
        .filter(F.col("__v").isNotNull())
        .select(group_col, F.col("__v").alias("val"), "__sg")
        .groupBy(group_col, "val")
        .agg(F.sum("__sg").alias("d_cnt"))
    )


def apply_distinct_delta(
    aux: DataFrame, delta: DataFrame, group_col: str
) -> DataFrame:
    """Merge multiset deltas into the auxiliary: full-outer on the
    null-safe (group, val) pair, multiplicities at zero drop out. One
    hash shuffle on (group, val), sized |aux| + |delta| — never the
    base table."""
    a = aux.select(
        F.col(group_col).alias("__ag"),
        F.col("val").alias("__av"),
        "cnt",
        F.lit(True).alias("__in_a"),
    )
    d = delta.select(
        F.col(group_col).alias("__dg"),
        F.col("val").alias("__dv"),
        "d_cnt",
    )
    j = a.join(
        d,
        F.col("__ag").eqNullSafe(F.col("__dg"))
        & (F.col("__av") == F.col("__dv")),
        "full_outer",
    )
    in_a = F.coalesce(F.col("__in_a"), F.lit(False))
    cnt = F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(
        F.col("d_cnt"), F.lit(0)
    )
    return (
        j.select(
            F.when(in_a, F.col("__ag")).otherwise(F.col("__dg")).alias(group_col),
            F.when(in_a, F.col("__av")).otherwise(F.col("__dv")).alias("val"),
            cnt.alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def distinct_view(aux: DataFrame, group_col: str) -> DataFrame:
    """The maintained aggregate: per-group count of live distinct
    values. Groups absent from the aux (all values NULL, or the group
    itself gone) simply don't appear — join against the moments state
    with a 0 default for the full profile."""
    return aux.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("distinct_vals")
    )


def profile_view(
    moments: DataFrame, aux: DataFrame, group_col: str
) -> DataFrame:
    """Combine the two maintained states into the full per-group profile
    ``(group, docs, sum_v, sum_sq, nn, distinct_vals)`` — exactly what a
    fresh ``groupBy(...).agg(count, sum, sum(v*v), count(v),
    countDistinct(v))`` produces. Null-safe left join: a live group with
    only NULL values has no aux rows and counts 0 distinct."""
    dv = distinct_view(aux, group_col).select(
        F.col(group_col).alias("__pg"), "distinct_vals"
    )
    return (
        moments.join(
            dv, F.col(group_col).eqNullSafe(F.col("__pg")), "left"
        )
        .select(
            group_col,
            "docs",
            "sum_v",
            "sum_sq",
            "nn",
            F.coalesce(F.col("distinct_vals"), F.lit(0)).alias(
                "distinct_vals"
            ),
        )
    )


# ------------------------------------------- quantiles (log-histogram)
#
# Approximate quantiles under deletes: KMV/HLL are insert-only, but the
# HDR log-histogram (functions.sketch.log_histogram) is a pure COUNTING
# structure — per-(group, bucket) counts are additive in both
# directions, so the same counting-multiset maintenance used for
# distinct values keeps the histogram exact under inserts, deletes and
# updates. Quantile estimates then come from the maintained buckets via
# the existing integer-exact estimator (log_hist_quantiles), with the
# same ≤2^-HDR_BITS relative bucket error as the batch sketch. State is
# O(|groups| × ≤1920 buckets) — bounded regardless of value domain,
# unlike the exact-distinct aux.


def hist_bootstrap(df: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """Initial per-group HDR histogram — exactly
    ``functions.sketch.log_histogram`` (bit-identical buckets)."""
    from arcane_framework_scala_spark.functions.sketch import log_histogram

    return log_histogram(df, val_col, [group_col])


def hist_delta(cdf: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """Collapse a CDF batch into per-(group, bucket) count deltas.
    Negative and NULL values never enter (matching log_histogram's
    non-negative-int64 domain)."""
    from arcane_framework_scala_spark.functions.sketch import (
        hdr_bucket_exprs,
    )

    framed = _sided_values(cdf, group_col, val_col).filter(
        F.col("__v").isNotNull() & (F.col("__v") >= 0)
    )
    e, sub, lo = hdr_bucket_exprs("__v")
    return (
        framed.select(
            group_col,
            e.alias("e"),
            sub.cast("long").alias("sub"),
            lo.cast("long").alias("lo"),
            "__sg",
        )
        .groupBy(group_col, "e", "sub", "lo")
        .agg(F.sum("__sg").alias("d_cnt"))
    )


def apply_hist_delta(
    hist: DataFrame, delta: DataFrame, group_col: str
) -> DataFrame:
    """Merge bucket deltas into the maintained histogram: full-outer on
    the null-safe group key + bucket id, buckets at zero drop out. One
    hash shuffle sized |hist| + |delta|."""
    h = hist.select(
        F.col(group_col).alias("__hg"),
        F.col("e").alias("__he"),
        F.col("sub").alias("__hs"),
        F.col("lo").alias("__hl"),
        "cnt",
        F.lit(True).alias("__in_h"),
    )
    d = delta.select(
        F.col(group_col).alias("__dg"),
        F.col("e").alias("__de"),
        F.col("sub").alias("__ds"),
        F.col("lo").alias("__dl"),
        "d_cnt",
    )
    j = h.join(
        d,
        F.col("__hg").eqNullSafe(F.col("__dg"))
        & (F.col("__he") == F.col("__de"))
        & (F.col("__hs") == F.col("__ds")),
        "full_outer",
    )
    in_h = F.coalesce(F.col("__in_h"), F.lit(False))
    cnt = F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(
        F.col("d_cnt"), F.lit(0)
    )
    return (
        j.select(
            F.when(in_h, F.col("__hg")).otherwise(F.col("__dg")).alias(group_col),
            F.when(in_h, F.col("__he")).otherwise(F.col("__de")).alias("e"),
            F.when(in_h, F.col("__hs")).otherwise(F.col("__ds")).alias("sub"),
            F.when(in_h, F.col("__hl")).otherwise(F.col("__dl")).alias("lo"),
            cnt.cast("long").alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def quantile_view(
    hist: DataFrame, pcts: list[int], group_col: str
) -> DataFrame:
    """Quantile estimates from the maintained histogram — the exact
    estimator the batch sketch uses (``log_hist_quantiles``), so a
    maintained histogram and a fresh one give byte-identical answers."""
    from arcane_framework_scala_spark.functions.sketch import (
        log_hist_quantiles,
    )

    return log_hist_quantiles(hist, pcts, [group_col])


def profile_bootstrap_fresh(
    df: DataFrame, group_col: str, val_col: str
) -> DataFrame:
    """The from-scratch twin of :func:`profile_view` — one groupBy over
    the base table; the gate's parity yardstick."""
    v = F.col(val_col).cast("long")
    return df.groupBy(F.col(group_col).alias(group_col)).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(v).alias("sum_v"),
        F.sum(v * v).alias("sum_sq"),
        F.count(v).alias("nn"),
        F.countDistinct(v).alias("distinct_vals"),
    )


# ------------------- maintenance specs (StreamingViewMaintainer plugins)
#
# Each spec packages one family's (bootstrap, delta, apply, MERGE form)
# so `ivm.StreamingViewMaintainer(target, spec=MomentsSpec("host",
# "n_chars"))` rides the stream's post-merge hook with the same durable
# resume semantics as the additive default.


class MomentsSpec:
    """avg/variance moments: state (group, docs, sum_v, sum_sq, nn)."""

    def __init__(self, group_col: str, val_col: str):
        self.group_col = group_col
        self.val_col = val_col

    def bootstrap(self, df: DataFrame) -> DataFrame:
        return moments_bootstrap(df, self.group_col, self.val_col)

    def delta(self, cdf: DataFrame) -> DataFrame:
        return moments_delta(cdf, self.group_col, self.val_col)

    def apply(
        self, state: DataFrame, delta: DataFrame, target, version=None
    ) -> DataFrame:
        return apply_moments_delta(state, delta, self.group_col)

    def bootstrap_as_delta(self, boot: DataFrame) -> DataFrame:
        return boot.select(
            self.group_col,
            F.col("docs").alias("d_docs"),
            F.col("sum_v").alias("d_sum"),
            F.col("sum_sq").alias("d_sq"),
            F.col("nn").alias("d_nn"),
        )

    def merge_sql(self, table: str, view: str) -> str:
        return moments_state_merge_sql(table, view, self.group_col)


class DistinctSpec:
    """Exact COUNT(DISTINCT): state is the counting multiset
    (group, val, cnt); read the aggregate via :func:`distinct_view`."""

    def __init__(self, group_col: str, val_col: str):
        self.group_col = group_col
        self.val_col = val_col

    def bootstrap(self, df: DataFrame) -> DataFrame:
        return distinct_bootstrap(df, self.group_col, self.val_col)

    def delta(self, cdf: DataFrame) -> DataFrame:
        return distinct_delta(cdf, self.group_col, self.val_col)

    def apply(
        self, state: DataFrame, delta: DataFrame, target, version=None
    ) -> DataFrame:
        return apply_distinct_delta(state, delta, self.group_col)

    def bootstrap_as_delta(self, boot: DataFrame) -> DataFrame:
        return boot.select(
            self.group_col, "val", F.col("cnt").alias("d_cnt")
        )

    def merge_sql(self, table: str, view: str) -> str:
        return distinct_state_merge_sql(table, view, self.group_col)


class HistogramSpec:
    """Delete-exact quantiles: state is the HDR bucket table
    (group, e, sub, lo, cnt); read estimates via :func:`quantile_view`."""

    def __init__(self, group_col: str, val_col: str):
        self.group_col = group_col
        self.val_col = val_col

    def bootstrap(self, df: DataFrame) -> DataFrame:
        return hist_bootstrap(df, self.group_col, self.val_col)

    def delta(self, cdf: DataFrame) -> DataFrame:
        return hist_delta(cdf, self.group_col, self.val_col)

    def apply(
        self, state: DataFrame, delta: DataFrame, target, version=None
    ) -> DataFrame:
        return apply_hist_delta(state, delta, self.group_col)

    def bootstrap_as_delta(self, boot: DataFrame) -> DataFrame:
        return boot.select(
            self.group_col, "e", "sub", "lo", F.col("cnt").alias("d_cnt")
        )

    def merge_sql(self, table: str, view: str) -> str:
        return hist_state_merge_sql(table, view, self.group_col)


# ------------------------------ production twins: MERGE-maintained state
#
# Like ivm.group_state_merge_sql, these keep the maintained state in a
# real catalog TABLE (Iceberg/Delta/DSv2) updated by one generated MERGE
# per wave — the deployment posture when the view must outlive the
# process. Engine-portable conditional clauses; null-safe ON keeps a
# NULL group as ONE group.


def moments_state_merge_sql(
    target_table: str, delta_view: str, group_col: str = "host"
) -> str:
    """MERGE maintaining the moments TABLE ``(group, docs, sum_v,
    sum_sq, nn)`` from a :func:`moments_delta` view: additive update,
    delete-at-zero docs, insert-positive, sums returning to NULL exactly
    when nn reaches zero (the same auxiliary trick as the DataFrame
    path)."""

    def summed(cur: str, d: str) -> str:
        return (
            f"CASE WHEN t.nn + s.d_nn = 0 THEN NULL "
            f"ELSE coalesce(t.{cur}, CAST(0 AS BIGINT)) "
            f"+ coalesce(s.{d}, CAST(0 AS BIGINT)) END"
        )

    return (
        f"MERGE INTO {target_table} t\n"
        f"USING (SELECT {group_col}, d_docs, d_sum, d_sq, d_nn "
        f"FROM {delta_view}) s\n"
        f"ON t.{group_col} <=> s.{group_col}\n"
        f"WHEN MATCHED AND t.docs + s.d_docs <= 0 THEN DELETE\n"
        f"WHEN MATCHED THEN UPDATE SET docs = t.docs + s.d_docs, "
        f"sum_v = {summed('sum_v', 'd_sum')}, "
        f"sum_sq = {summed('sum_sq', 'd_sq')}, nn = t.nn + s.d_nn\n"
        f"WHEN NOT MATCHED AND s.d_docs > 0 THEN "
        f"INSERT ({group_col}, docs, sum_v, sum_sq, nn) "
        f"VALUES (s.{group_col}, s.d_docs, s.d_sum, s.d_sq, s.d_nn)"
    )


def distinct_state_merge_sql(
    target_table: str, delta_view: str, group_col: str = "host"
) -> str:
    """MERGE maintaining the counting-multiset TABLE ``(group, val,
    cnt)`` from a :func:`distinct_delta` view — multiplicities at zero
    DELETE; the per-group distinct count is then
    ``SELECT group, count(*) FROM state GROUP BY 1``."""
    return (
        f"MERGE INTO {target_table} t\n"
        f"USING (SELECT {group_col}, val, d_cnt FROM {delta_view}) s\n"
        f"ON t.{group_col} <=> s.{group_col} AND t.val = s.val\n"
        f"WHEN MATCHED AND t.cnt + s.d_cnt <= 0 THEN DELETE\n"
        f"WHEN MATCHED THEN UPDATE SET cnt = t.cnt + s.d_cnt\n"
        f"WHEN NOT MATCHED AND s.d_cnt > 0 THEN "
        f"INSERT ({group_col}, val, cnt) "
        f"VALUES (s.{group_col}, s.val, s.d_cnt)"
    )


def hist_state_merge_sql(
    target_table: str, delta_view: str, group_col: str = "host"
) -> str:
    """MERGE maintaining the HDR histogram TABLE ``(group, e, sub, lo,
    cnt)`` from a :func:`hist_delta` view — buckets at zero DELETE.
    ``lo`` is functionally determined by (e, sub), so the ON clause
    matches on (group, e, sub)."""
    return (
        f"MERGE INTO {target_table} t\n"
        f"USING (SELECT {group_col}, e, sub, lo, d_cnt "
        f"FROM {delta_view}) s\n"
        f"ON t.{group_col} <=> s.{group_col} "
        f"AND t.e = s.e AND t.sub = s.sub\n"
        f"WHEN MATCHED AND t.cnt + s.d_cnt <= 0 THEN DELETE\n"
        f"WHEN MATCHED THEN UPDATE SET cnt = t.cnt + s.d_cnt\n"
        f"WHEN NOT MATCHED AND s.d_cnt > 0 THEN "
        f"INSERT ({group_col}, e, sub, lo, cnt) "
        f"VALUES (s.{group_col}, s.e, s.sub, s.lo, s.d_cnt)"
    )
