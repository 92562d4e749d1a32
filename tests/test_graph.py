"""Fixed-point PageRank: hand-computed recurrence + model equivalence."""

from arcane_framework_scala_spark.functions.graph import pagerank_fixed_point

FP = 1_000_000
BASE = 150_000


def _model(edges, iters):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    verts = sorted({u for u, _ in und})
    deg = {v: sum(1 for u, _ in und if u == v) for v in verts}
    pr = {v: FP for v in verts}
    for _ in range(iters):
        s = {v: 0 for v in verts}
        for u, v in und:
            s[v] += pr[u] // deg[u]
        pr = {v: BASE + (85 * s[v]) // 100 for v in verts}
    return pr


def test_pagerank_matches_model_star_graph(spark):
    # star: hub 0 connected to 1..4, plus a 5-6 pendant pair
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["vertex"]: r["pr_micro"]
        for r in pagerank_fixed_point(df, iters=3).collect()
    }
    assert got == _model(edges, 3)
    # the hub out-ranks the leaves; the pendant pair sits between
    assert got[0] > got[5] > got[1]


def test_pagerank_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 2), (2, 1), (1, 1), (1, 2)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["vertex"]: r["pr_micro"]
        for r in pagerank_fixed_point(df, iters=2).collect()
    }
    # dedup + self-loop drop -> a single symmetric edge: both stationary
    assert got == _model([(1, 2)], 2)
    assert got[1] == got[2]
