"""Property-based checks: the round-4 operators (SemDeDup, DSIR
weights, quality-classifier GD) == pure-Python models.

Random inputs through the distributed operators must match in-memory
implementations of the exact fixed-point rules — a third engine next
to the Spark/DuckDB gate pair, catching flooring, tie-break and
truncating-division edges the corpus gate can't enumerate."""

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arcane_framework_scala_spark.functions.classifier import (
    quality_classifier_score,
)
from arcane_framework_scala_spark.functions.lm import dsir_weights
from arcane_framework_scala_spark.functions.semdedup import semantic_dedup

import pyspark.sql.functions as F

_FP = 1_000_000

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _trunc_div(a: int, b: int) -> int:
    """SQL div / DuckDB // semantics: truncate toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _buckets(text: str, dim: int) -> dict[int, int]:
    toks = re.split(r"\s+", text.strip().lower())
    out: dict[int, int] = {}
    for t in toks:
        b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim
        out[b] = out.get(b, 0) + 1
    return out


# ---------------------------------------------------------------------------
# DSIR weights
# ---------------------------------------------------------------------------

text_st = st.text(alphabet=" abcdef0123", min_size=1, max_size=30)


@settings(**_SETTINGS)
@given(
    texts=st.lists(text_st, min_size=2, max_size=8),
    tgt_mask=st.lists(st.booleans(), min_size=8, max_size=8),
)
def test_dsir_weights_match_model(spark, texts, tgt_mask):
    dim = 16
    rows = [
        (i, t, "tgt" if tgt_mask[i] else "web") for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: (r["n_feats"], r["weight_micro"])
        for r in dsir_weights(df, F.col("source") == "tgt", dim=dim).collect()
    }
    feats = {i: _buckets(t, dim) for i, t in enumerate(texts)}
    t_dist: dict[int, int] = {}
    r_dist: dict[int, int] = {}
    for i, f in feats.items():
        for b, c in f.items():
            r_dist[b] = r_dist.get(b, 0) + c
            if rows[i][2] == "tgt":
                t_dist[b] = t_dist.get(b, 0) + c
    tt, rt = sum(t_dist.values()), sum(r_dist.values())
    ratio = {
        b: math.floor(
            (
                math.log((t_dist.get(b, 0) + 1) / (tt + dim))
                - math.log((rn + 1) / (rt + dim))
            )
            * _FP
        )
        for b, rn in r_dist.items()
    }
    for i, f in feats.items():
        n = sum(f.values())
        w = _trunc_div(sum(c * ratio[b] for b, c in f.items()), n)
        assert got[i] == (n, w), (i, texts[i], got[i], (n, w))


# ---------------------------------------------------------------------------
# Quality classifier (logistic GD)
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    texts=st.lists(text_st, min_size=2, max_size=6),
    tgt_mask=st.lists(st.booleans(), min_size=6, max_size=6),
    iters=st.integers(min_value=1, max_value=2),
)
def test_classifier_scores_match_model(spark, texts, tgt_mask, iters):
    dim = 16
    rows = [
        (i, t, "tgt" if tgt_mask[i] else "web") for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r["score_micro"]
        for r in quality_classifier_score(
            df, F.col("source") == "tgt", iters=iters, dim=dim
        ).collect()
    }
    feats = {i: _buckets(t, dim) for i, t in enumerate(texts)}
    n_docs = len(texts)
    w = {b: 0 for f in feats.values() for b in f}
    for _ in range(iters):
        grad = {b: 0 for b in w}
        for i, f in feats.items():
            m = sum(c * w[b] for b, c in f.items())
            p = 1.0 / (1.0 + math.exp(-(m / _FP)))
            y = 1 if rows[i][2] == "tgt" else 0
            g = math.floor((p - y) * _FP)
            for b, c in f.items():
                grad[b] += c * g
        w = {b: w[b] - _trunc_div(grad[b], 2 * n_docs) for b in w}
    for i, f in feats.items():
        m = sum(c * w[b] for b, c in f.items())
        p = 1.0 / (1.0 + math.exp(-(m / _FP)))
        assert got[i] == math.floor(p * _FP), (i, texts[i], got[i])


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------

DIM = 3
component = st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 1000.0)
vector = st.lists(component, min_size=DIM, max_size=DIM).filter(
    lambda v: any(abs(x) > 1e-9 for x in v)
)


def _kmeans_model(vectors, k, iters):
    """The tests/test_kmeans_model.py Lloyd model (lowest-id init,
    unrounded-assignment ties to lowest cid, fixed-point means)."""
    cent = {
        i: [math.floor(x * _FP) for x in vectors[i]] for i in range(k)
    }
    for _ in range(iters):
        members: dict[int, list] = {}
        for vec in vectors:
            best = None
            for cid in sorted(cent):
                cvec = [m / _FP for m in cent[cid]]
                dot = sum(a * b for a, b in zip(vec, cvec))
                nv = math.sqrt(sum(a * a for a in vec))
                nc = math.sqrt(sum(b * b for b in cvec))
                sim = dot / (nv * nc) if nv and nc else float("-inf")
                if best is None or sim > best[0]:
                    best = (sim, cid)
            members.setdefault(best[1], []).append(vec)
        for cid, vecs in members.items():
            n = len(vecs)
            cent[cid] = [
                _trunc_div(
                    sum(math.floor(v[d] * _FP) for v in vecs), n
                )
                for d in range(DIM)
            ]
    return {cid: [m / _FP for m in cm] for cid, cm in cent.items()}


@settings(**_SETTINGS)
@given(
    vectors=st.lists(vector, min_size=3, max_size=10),
    k=st.integers(min_value=1, max_value=3),
    threshold=st.sampled_from([0.3, 0.7, 0.95]),
)
def test_semdedup_matches_model(spark, vectors, k, threshold):
    k = min(k, len(vectors))
    df = spark.createDataFrame(
        list(enumerate(vectors)), "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: (r["cell"], r["keep"])
        for r in semantic_dedup(
            df, k=k, iters=2, threshold=threshold
        ).collect()
    }
    cent = _kmeans_model(vectors, k, iters=2)

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    # assignment: round(csim, 6) DESC, ties -> lowest cell
    cells = {}
    for i, vec in enumerate(vectors):
        best = None
        for cid in sorted(cent):
            sim = round(cos(vec, cent[cid]), 6)
            if best is None or sim > best[0]:
                best = (sim, cid)
        cells[i] = best[1]
    for i in range(len(vectors)):
        keep = not any(
            cells[j] == cells[i]
            and j < i
            and round(cos(vectors[i], vectors[j]), 6) >= threshold
            for j in range(len(vectors))
        )
        assert got[i] == (cells[i], keep), (i, got[i], (cells[i], keep))


def test_dsir_select_approx_path_within_rank_tolerance(spark, sf_dir):
    """exact=False (the 100 TB approx_percentile path, VERDICT r4
    item 4) must agree with exact=True everywhere except rows whose
    weight sits between the two thresholds, and the selected count must
    stay within the sketch's rank tolerance of the exact count."""
    from arcane_framework_scala_spark.functions.lm import dsir_select

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pred = F.col("source").isin("src0", "src1")
    exact = {
        r["doc_id"]: (r["weight_micro"], r["selected"])
        for r in dsir_select(docs, pred, frac=0.25, dim=256).collect()
    }
    approx = {
        r["doc_id"]: (r["weight_micro"], r["selected"])
        for r in dsir_select(
            docs, pred, frac=0.25, dim=256, exact=False, accuracy=10_000
        ).collect()
    }
    assert set(exact) == set(approx)
    n = len(exact)
    n_exact = sum(sel for _, sel in exact.values())
    n_approx = sum(sel for _, sel in approx.values())
    # rank error ≤ 1/accuracy of n, plus ties at the threshold
    assert abs(n_approx - n_exact) <= max(2, (n // 10_000) + 1) + 5
    # disagreements only in the inter-threshold band
    diff_w = [w for d, (w, sel) in exact.items() if sel != approx[d][1]]
    if diff_w:
        agree_sel = [w for d, (w, sel) in exact.items()
                     if sel and approx[d][1]]
        agree_drop = [w for d, (w, sel) in exact.items()
                      if not sel and not approx[d][1]]
        assert max(diff_w) <= min(agree_sel)
        assert min(diff_w) >= max(agree_drop)
