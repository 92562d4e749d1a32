"""SemDeDup (functions/semdedup.py): hand-checkable semantics, the
cluster-bounded-pairing contract, and prefit-codebook equality."""

import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.kmeans import kmeans_fit
from arcane_framework_scala_spark.functions.semdedup import semantic_dedup


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_min_id_survivor_within_cell(spark):
    """Two tight balls on orthogonal axes: ids 0/2/4 are near-identical
    on +x, ids 1/3 near-identical on +y. With k=2 the balls land in
    separate cells; each cell keeps exactly its lowest id."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.01]),
        (1, [0.0, 1.0, 0.01, 0.0]),
        (2, [1.0, 0.01, 0.0, 0.0]),
        (3, [0.01, 1.0, 0.0, 0.0]),
        (4, [1.0, 0.0, 0.01, 0.0]),
    ]
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _df(spark, rows), k=2, iters=2, threshold=0.9
        ).collect()
    }
    assert len(out) == 5  # one row per vector, always
    assert out[0]["keep"] and out[1]["keep"]
    assert not out[2]["keep"] and not out[3]["keep"] and not out[4]["keep"]
    # the x-ball shares a cell, the y-ball shares the other
    assert out[0]["cell"] == out[2]["cell"] == out[4]["cell"]
    assert out[1]["cell"] == out[3]["cell"]
    assert out[0]["cell"] != out[1]["cell"]


def test_duplicates_only_pair_within_cells(spark, sf_dir):
    """The whole point of the cluster scoping: a dropped vector must
    have a lower-id cellmate above threshold; vectors whose only
    near-dups live in OTHER cells survive. Verified by recomputing the
    within-cell pair predicate from the output's own cell assignment."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    res = semantic_dedup(emb, k=8, iters=2, threshold=0.35)
    joined = res.join(emb, "vec_id").select("vec_id", "cell", "keep", "embedding")
    a, b = joined.alias("a"), joined.alias("b")
    dot = F.aggregate(
        F.zip_with("a.embedding", "b.embedding", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(
            F.transform(f"{side}.embedding", lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    has_lower_neighbor = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .filter(F.round(dot / (norm("a") * norm("b")), 6) >= 0.35)
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )
    flagged = {r["vec_id"] for r in has_lower_neighbor.collect()}
    for r in res.collect():
        assert r["keep"] == (r["vec_id"] not in flagged), r


def test_prefit_codebook_matches_infit(spark, sf_dir):
    """Fit-once/search-many must be a pure cost optimization (the
    pq_topk prefit contract applied to SemDeDup)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = kmeans_fit(emb, k=8, iters=2).localCheckpoint()
    infit = sorted(
        map(tuple, semantic_dedup(emb, k=8, iters=2, threshold=0.35).collect())
    )
    prefit = sorted(
        map(
            tuple,
            semantic_dedup(emb, threshold=0.35, codebook=cb).collect(),
        )
    )
    assert infit == prefit


def test_oversized_cell_guard_is_result_invariant(spark):
    """Skew guard (VERDICT r4 item 3): one pathological cell holds ~60%
    of the rows. A tiny max_cell_rows must (a) actually fan the cell
    out into hash blocks (visible as the sequence/explode in the plan
    and a >1 block count for the big cell) and (b) leave the output
    byte-identical to the unguarded run."""
    import math

    # 60 near-identical vectors on +x (one dense ball = one cell after
    # k-means), 40 spread across other directions.
    rows = [(i, [1.0, 0.0001 * i, 0.0, 0.0]) for i in range(60)]
    rows += [
        (100 + i, [0.001 * i, 1.0, 0.5 * (i % 3), 0.25 * (i % 5)])
        for i in range(40)
    ]
    emb = _df(spark, rows)

    guarded = semantic_dedup(
        emb, k=4, iters=2, threshold=0.95, max_cell_rows=10
    )
    unguarded = semantic_dedup(
        emb, k=4, iters=2, threshold=0.95, max_cell_rows=10**9
    )
    g = sorted(map(tuple, guarded.collect()))
    u = sorted(map(tuple, unguarded.collect()))
    assert g == u
    assert len(g) == 100
    # dense-ball members (vid < 60) are mutually ~cos=1, so within any
    # one cell only the lowest dense-ball id survives
    ball_by_cell: dict[int, list[tuple[int, bool]]] = {}
    for vid, cell, keep in g:
        if vid < 60:
            ball_by_cell.setdefault(cell, []).append((vid, keep))
    for members in ball_by_cell.values():
        lo = min(v for v, _ in members)
        for vid, keep in members:
            assert keep == (vid == lo), (vid, lo, keep)

    # the split is IN the plan (the b-side sequence/explode replication)
    # and really engaged: the biggest cell exceeds the cap, so its block
    # count ceil(n / max_cell_rows) is > 1
    plan = guarded._jdf.queryExecution().toString()
    assert "sequence" in plan and "explode" in plan.lower()
    cell_sizes = [
        r["n"]
        for r in guarded.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    big = max(cell_sizes)
    assert big > 10 and math.ceil(big / 10) > 1  # fan-out really engaged


def test_oversized_cell_guard_hypothesis_twin(spark):
    """Hypothesis twin of the skew guard (VERDICT r4 item 3): under
    randomized corpora containing one dense pathological ball and
    randomized caps, guarded output must equal unguarded output
    exactly. Deterministic derandomized profile (the t4 twin pattern);
    examples kept small — each case is two full Spark jobs."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=5,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        dense=st.integers(min_value=8, max_value=24),
        spread=st.integers(min_value=4, max_value=12),
        cap=st.integers(min_value=2, max_value=7),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    def case(dense, spread, cap, seed):
        import random

        rng = random.Random(seed)
        rows = [
            (i, [1.0, 0.001 * rng.random(), 0.001 * rng.random(), 0.0])
            for i in range(dense)
        ]
        rows += [
            (
                100 + i,
                [rng.random() for _ in range(4)],
            )
            for i in range(spread)
        ]
        emb = _df(spark, rows)
        g = sorted(
            map(
                tuple,
                semantic_dedup(
                    emb, k=3, iters=1, threshold=0.9, max_cell_rows=cap
                ).collect(),
            )
        )
        u = sorted(
            map(
                tuple,
                semantic_dedup(
                    emb, k=3, iters=1, threshold=0.9, max_cell_rows=10**9
                ).collect(),
            )
        )
        assert g == u

    case()


def test_lsh_bucket_guard_is_result_invariant(spark):
    """The semantic_dedup max_cell_rows construction applied to
    lsh_bucket_neighbors (same skew class: a pathological bucket no
    bits setting can split): tiny cap vs unbounded must be
    byte-identical, with the fan-out visible in the plan."""
    from arcane_framework_scala_spark.functions.similarity import (
        lsh_bucket_neighbors,
    )

    # 40 near-identical vectors -> ONE sign-LSH bucket regardless of bits
    rows = [(i, [1.0, 0.0001 * i, 0.0, 0.0]) for i in range(40)]
    rows += [(100 + i, [0.01 * i, -1.0, 0.3 * (i % 3), 0.0]) for i in range(10)]
    emb = _df(spark, rows)
    guarded = lsh_bucket_neighbors(
        emb, dim=4, bits=6, threshold=0.99, max_bucket_rows=7
    )
    unguarded = lsh_bucket_neighbors(
        emb, dim=4, bits=6, threshold=0.99, max_bucket_rows=10**9
    )
    g = sorted(map(tuple, guarded.collect()))
    u = sorted(map(tuple, unguarded.collect()))
    assert g == u
    # the dense ball pairs all survive: 40 choose 2 pairs at sim ~1
    dense_pairs = [(a, b) for a, b, _ in g if a < 60 and b < 60]
    assert len(dense_pairs) == 40 * 39 // 2
    plan = guarded._jdf.queryExecution().toString()
    assert "sequence" in plan and "explode" in plan.lower()
