"""Property-based checks: minhash / simhash == pure-Python models.

Random ASCII documents through the distributed operators must match
in-memory implementations of the published definitions (shingle
windows, affine universal-hash family, band digests, bit votes).
Catches substr off-by-ones, coefficient drift, and short-document edge
cases (text shorter than the shingle) that the corpus gate can't
enumerate."""

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arcane_framework_scala_spark.functions.dedup import (
    _mh_coeffs,
    minhash_bands,
    minhash_signature,
    simhash,
)

_P = 2_147_483_647

text_st = st.text(
    alphabet=" abcdefgh!.,0123456789", min_size=0, max_size=40
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.strip().lower())


def _shingles(text: str, k: int) -> list[str]:
    n = _norm(text)
    # sequence(1, greatest(len-k+1, 1)) -> at least one window; substr
    # truncates at the end of the string for short docs
    count = max(len(n) - k + 1, 1)
    return [n[i : i + k] for i in range(count)]


def _sig_model(text: str, num_hashes: int = 16, k: int = 5) -> list[int]:
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _P
        for s in _shingles(text, k)
    ]
    out = []
    for i in range(num_hashes):
        a, b = _mh_coeffs(i)
        out.append(min((h * a + b) % _P for h in hs))
    return out


@settings(**_SETTINGS)
@given(texts=st.lists(text_st, min_size=1, max_size=5))
def test_minhash_signature_matches_model(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = {r.doc_id: r for r in minhash_signature(df).collect()}
    for i, t in enumerate(texts):
        got = [rows[i][f"h{j}"] for j in range(16)]
        assert got == _sig_model(t), (repr(t), got, _sig_model(t))


@settings(**_SETTINGS)
@given(texts=st.lists(text_st, min_size=1, max_size=4))
def test_minhash_bands_matches_model(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.doc_id, r.band): r.bucket
        for r in minhash_bands(df, num_hashes=16, bands=4).collect()
    }
    for i, t in enumerate(texts):
        sig = _sig_model(t)
        for b in range(4):
            joined = "|".join(str(h) for h in sig[b * 4 : b * 4 + 4])
            expect = hashlib.md5(joined.encode()).hexdigest()
            assert got[(i, b)] == expect, (repr(t), b)


def _simhash_model(text: str, bits: int = 16) -> int:
    tokens = _norm(text).split(" ")
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:4], 16) for t in tokens]
    sig = 0
    for b in range(bits):
        votes = sum(2 * ((h >> b) & 1) - 1 for h in hs)
        if votes > 0:
            sig |= 1 << b
    return sig


@settings(**_SETTINGS)
@given(texts=st.lists(text_st, min_size=1, max_size=5))
def test_simhash_matches_model(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = {r.doc_id: r.simhash for r in simhash(df).collect()}
    for i, t in enumerate(texts):
        assert rows[i] == _simhash_model(t), (repr(t), rows[i], _simhash_model(t))


# ---------------------------------------------------------------------------
# Connected components == union-find model
# ---------------------------------------------------------------------------

edges_st = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1,
    max_size=25,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label every node with the component MINIMUM (the operators' contract)
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ns) for r, ns in comp.items() for n in ns}


@given(edges=edges_st)
@settings(**_SETTINGS)
def test_dedup_clusters_star_matches_union_find(spark, edges):
    from arcane_framework_scala_spark.functions.dedup import (
        dedup_clusters_star,
    )

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters_star(pairs).collect()
    }
    assert got == _uf_components(edges)


def test_canonical_best_keeps_highest_score(spark):
    """Hand-computed: the cluster survivor is the max-score member
    (ties -> lowest id); unpaired docs always survive."""
    import pyspark.sql.functions as F
    from arcane_framework_scala_spark.functions.dedup import (
        dedup_canonical_best,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    score = spark.createDataFrame(
        [(0, 5), (1, 9), (2, 9), (3, 1), (4, 1), (5, 0)],
        "doc_id long, score long",
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_canonical_best(docs, pairs, score).collect()
    )
    # cluster {0,1,2}: max score 9 tied by 1 and 2 -> keep 1
    # cluster {3,4}: tie at 1 -> keep 3; doc 5 unpaired -> kept
    assert kept == [1, 3, 5]
