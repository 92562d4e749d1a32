"""Property-based check: kmeans_fit == a pure-Python Lloyd model.

Random small vector sets through the distributed fit must match an
in-memory implementation of the exact published rules (lowest-id init,
cosine assignment rounded to 6 with id tie-break, fixed-point int64
means, empty-cell fallback). Catches assignment-ordering and fixed-point
edge cases the corpus gate can't enumerate."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arcane_framework_scala_spark.functions.kmeans import (
    kmeans_centroids_fixed_point,
)

DIM = 3
_FP = 1_000_000

component = st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 1000.0)
vector = st.lists(component, min_size=DIM, max_size=DIM).filter(
    lambda v: any(abs(x) > 1e-9 for x in v)
)


def _micro(x: float) -> int:
    return math.floor(x * _FP)


def _model(vectors: list[list[float]], k: int, iters: int) -> dict[int, list[int]]:
    cent = {i: [_micro(x) for x in vectors[i]] for i in range(k)}
    for _ in range(iters):
        members: dict[int, list[list[float]]] = {}
        for vec in vectors:
            best = None
            for cid in sorted(cent):
                cvec = [m / _FP for m in cent[cid]]
                dot = sum(a * b for a, b in zip(vec, cvec))
                nv = math.sqrt(sum(a * a for a in vec))
                nc = math.sqrt(sum(b * b for b in cvec))
                sim = round(dot / (nv * nc), 6) if nv and nc else float("-inf")
                if best is None or sim > best[0]:
                    best = (sim, cid)
            members.setdefault(best[1], []).append(vec)
        def trunc_div(s: int, n: int) -> int:  # toward zero, like SQL div
            q = abs(s) // n
            return q if s >= 0 else -q

        for cid, vecs in members.items():
            n = len(vecs)
            cent[cid] = [
                trunc_div(sum(_micro(v[d]) for v in vecs), n) for d in range(DIM)
            ]
    return cent


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vectors=st.lists(vector, min_size=2, max_size=12),
    k=st.integers(min_value=1, max_value=3),
    iters=st.integers(min_value=1, max_value=2),
)
def test_kmeans_matches_python_model(spark, vectors, k, iters):
    k = min(k, len(vectors))
    df = spark.createDataFrame(
        list(enumerate(vectors)), "vec_id long, embedding array<double>"
    )
    got: dict[int, dict[int, int]] = {}
    rows = kmeans_centroids_fixed_point(df, k=k, iters=iters).collect()
    for r in rows:
        got.setdefault(r.centroid_id, {})[r.pos] = r.c_micro
    expect = _model(vectors, k, iters)
    for cid, cvec in expect.items():
        actual = [got[cid][d] for d in range(DIM)]
        assert actual == cvec, (cid, actual, cvec, vectors)
