"""r11 optimization pin: semantic_dedup's Arrow pair pass must be
BIT-IDENTICAL to the JVM expression formulation it replaced.

The old pair pass was a within-cell self-join filtered on
``round(aggregate(zip_with(a,b,*),0.0,+) / (vn_a*vn_b), 6) >= t``; the
new pass computes the same similarities vectorized in numpy inside
``applyInPandas`` (guide §4.2). These tests reconstruct the OLD
expression path verbatim and require set-equality of the keep flags —
on random data, on exact-duplicate/antiparallel/zero vectors (NaN
sims), and across the salted (oversized-cell) path.
"""

import math
import random

import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.kmeans import kmeans_fit
from arcane_framework_scala_spark.functions.semdedup import (
    _ge_round_threshold,
    semantic_dedup,
)
from arcane_framework_scala_spark.functions.similarity import _dot, _norm


def _reference_keep(spark, rows, k, iters, threshold):
    """The pre-r11 expression-path semantic_dedup, reconstructed."""
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = kmeans_fit(emb, k=k, iters=iters)
    cent = cb.select(
        F.col("centroid_id").alias("cell"),
        F.col("embedding").alias("__cvec"),
        _norm(F.col("embedding")).alias("__cn"),
    )
    sims = (
        emb.select(
            F.col("vec_id").alias("vid"),
            F.col("embedding").alias("__vec"),
            _norm(F.col("embedding")).alias("__vn"),
        )
        .join(F.broadcast(cent))
        .select(
            "vid", "__vec", "__vn", "cell",
            F.round(
                _dot(F.col("__vec"), F.col("__cvec"))
                / (F.col("__vn") * F.col("__cn")),
                6,
            ).alias("__csim"),
        )
    )
    assigned = (
        sims.groupBy("vid")
        .agg(
            F.max_by(
                F.struct("cell", "__vec", "__vn"),
                F.struct(F.col("__csim"), (-F.col("cell")).alias("nc")),
            ).alias("best")
        )
        .select(
            "vid",
            F.col("best.cell").alias("cell"),
            F.col("best.__vec").alias("__vec"),
            F.col("best.__vn").alias("__vn"),
        )
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    pair_sim = F.round(
        _dot(F.col("a.__vec"), F.col("b.__vec"))
        / (F.col("a.__vn") * F.col("b.__vn")),
        6,
    )
    dups = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("b.vid") < F.col("a.vid")),
        )
        .filter(pair_sim >= F.lit(threshold))
        .select(F.col("a.vid").alias("vid"))
        .distinct()
    )
    out = assigned.join(
        dups.withColumn("__dup", F.lit(True)), "vid", "left"
    ).select(
        F.col("vid").alias("vec_id"),
        "cell",
        F.coalesce(~F.col("__dup"), F.lit(True)).alias("keep"),
    )
    return {(r["vec_id"], r["cell"], r["keep"]) for r in out.collect()}


def _new_keep(spark, rows, k, iters, threshold, max_cell_rows=100_000):
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        emb, k=k, iters=iters, threshold=threshold,
        max_cell_rows=max_cell_rows,
    )
    return {(r["vec_id"], r["cell"], r["keep"]) for r in out.collect()}


def _random_rows(n, dim, seed, dups_every=7):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        if i % dups_every == 3 and rows:
            # near-duplicate of an earlier vector (tiny perturbation)
            base = rows[rnd.randrange(len(rows))][1]
            vec = [x + rnd.uniform(-1e-4, 1e-4) for x in base]
        else:
            vec = [rnd.uniform(-1.0, 1.0) for _ in range(dim)]
        rows.append((i, vec))
    return rows


def test_arrow_pair_pass_matches_expression_path(spark):
    rows = _random_rows(160, 8, seed=41)
    for t in (0.9, 0.5, 0.999999):
        assert _new_keep(spark, rows, 4, 2, t) == _reference_keep(
            spark, rows, 4, 2, t
        ), f"threshold {t}"


def test_arrow_pair_pass_degenerate_vectors(spark):
    """Exact duplicates (sim exactly 1.0 — a round-boundary value) and
    antiparallel vectors (-1.0): the Arrow path must reproduce both.
    (Zero vectors are excluded: under ANSI mode the kmeans assignment
    itself raises DIVIDE_BY_ZERO on either path, so the pair pass is
    never reached for them.)"""
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0]),
        (1, [1.0, 2.0, 3.0, 4.0]),       # exact duplicate of 0
        (2, [-1.0, -2.0, -3.0, -4.0]),   # antiparallel to 0
        (3, [2.0, 1.0, 4.0, 3.0]),
        (4, [4.0, 3.0, 2.0, 1.0]),
        (5, [1.0, 2.0, 3.0, 4.000001]),  # near-duplicate of 0
    ]
    for t in (0.9, 0.5, 1.0):
        assert _new_keep(spark, rows, 2, 1, t) == _reference_keep(
            spark, rows, 2, 1, t
        ), f"threshold {t}"


def test_arrow_pair_pass_salted_path_matches(spark):
    """max_cell_rows small enough to force multi-block cells: the
    salted (a-own-block × b-replicated) grouping must produce the same
    result as the reference join AND the unsalted Arrow path."""
    rows = _random_rows(120, 6, seed=7, dups_every=5)
    ref = _reference_keep(spark, rows, 3, 2, 0.9)
    assert _new_keep(spark, rows, 3, 2, 0.9, max_cell_rows=9) == ref
    assert _new_keep(spark, rows, 3, 2, 0.9) == ref


def test_ge_round_threshold_edge():
    """x >= S must be EXACTLY round_half_up(x, 6) >= t for doubles
    around the rounding boundary."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("1e-6")
    for t in (0.9, 0.35, 0.5, 0.999999, 0.0):
        s = _ge_round_threshold(t)
        xs = [t - 5.4e-7, t - 5e-7, t - 4.9e-7, t, t + 1e-7, s]
        # plus the doubles immediately around s
        xs += [math.nextafter(s, -math.inf), math.nextafter(s, math.inf)]
        for x in xs:
            want = float(
                Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)
            ) >= t
            assert (x >= s) == want, (t, x)
