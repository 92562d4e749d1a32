"""TF-IDF rerank: hand-checked weights, cosine properties, candidate
composition."""

import math

import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.tfidf import (
    tfidf_rerank,
    tfidf_weights,
)


def _docs(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "apple banana cherry"),
        (3, "cherry cherry date"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_weights_match_hand_computation(spark):
    w = {
        (r["doc_id"], r["term"]): r["w"]
        for r in tfidf_weights(_docs(spark)).collect()
    }
    # N=3; df(apple)=2, df(banana)=2, df(cherry)=2, df(date)=1
    idf_common = math.floor(1000 * math.log(4 / 3)) + 1000  # 1287
    idf_rare = math.floor(1000 * math.log(4 / 2)) + 1000  # 1693
    assert w[(1, "apple")] == 2 * idf_common
    assert w[(1, "banana")] == 1 * idf_common
    assert w[(3, "date")] == 1 * idf_rare
    assert w[(3, "cherry")] == 2 * idf_common


def test_identical_docs_score_full_similarity(spark):
    rows = [(1, "x y z x"), (2, "x y z x"), (3, "q r s")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_rerank(df, _pairs(spark, [(1, 2)])).collect()
    assert len(out) == 1
    # floor(1e6 * 1.0) with exact-integer dot == n2 → exactly 1_000_000
    assert out[0]["sim_micro"] == 1_000_000


def test_disjoint_vocab_scores_zero_or_absent(spark):
    out = tfidf_rerank(
        _docs(spark), _pairs(spark, [(1, 3)])
    ).collect()
    # docs 1 and 3 share no term → no dot row at all
    assert out == []


def test_scores_bounded_and_ordered_sanely(spark):
    out = {
        (r["id_a"], r["id_b"]): r["sim_micro"]
        for r in tfidf_rerank(
            _docs(spark), _pairs(spark, [(1, 2), (2, 3)])
        ).collect()
    }
    assert all(0 <= v <= 1_000_000 for v in out.values())
    # (1,2) share 2 of 3 terms incl. a double apple; (2,3) share only cherry
    assert out[(1, 2)] > out[(2, 3)]


def test_threshold_filters(spark):
    out = tfidf_rerank(
        _docs(spark), _pairs(spark, [(1, 2), (2, 3)]), threshold_micro=500_000
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


def test_rrf_fuse_hand_checked(spark):
    from arcane_framework_scala_spark.functions.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, vec_id long, rk int"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id long, vec_id long, rk int"
    )
    out = {r["vec_id"]: r for r in rrf_fuse(a, b, k_rrf=60).collect()}
    # 11 is in both lists (ranks 2 and 1) -> top fused
    assert out[11]["rrf_micro"] == 1_000_000 // 62 + 1_000_000 // 61
    assert out[10]["rrf_micro"] == 1_000_000 // 61
    assert out[12]["rrf_micro"] == 1_000_000 // 62
    assert out[11]["fused_rank"] == 1
    # 10 (1/61) beats 12 (1/62)
    assert out[10]["fused_rank"] == 2 and out[12]["fused_rank"] == 3


def test_text_topk_hand_computed(spark):
    """Hashed-cosine retrieval on a constructed corpus: the document
    sharing 3 of the query's 4 words must outrank the one sharing 1,
    and disjoint-vocabulary docs never appear. Rank contract: 1..k,
    self excluded, cos2_ppm exact-integer."""
    from arcane_framework_scala_spark.functions import lm as lm_mod

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma zz"),     # 3/4 overlap with 0
            (2, "alpha qq rr ss"),          # 1/4 overlap
            (3, "tt uu vv ww"),             # disjoint
        ],
        "doc_id long, text string",
    )
    out = sorted(
        (r["rk"], r["doc_id"], r["cos2_ppm"])
        for r in lm_mod.text_topk(docs, [0], k=4).collect()
    )
    assert [d for _, d, _ in out] == [1, 2]  # 3 absent: zero overlap
    (rk1, d1, c1), (rk2, d2, c2) = out
    assert (rk1, rk2) == (1, 2) and c1 > c2
    # exact: cos2(0,1) = (3*3*1e6) // (4*4) = 562500 (unit counts)
    assert c1 == (9 * 1_000_000) // 16


def test_text_topk_contract_on_corpus(spark, sf_dir):
    """On the driver corpus: ranks 1..k per query, self excluded,
    scores non-increasing, and a query's exact text duplicate (if any)
    scores 1e6."""
    from arcane_framework_scala_spark.functions import lm as lm_mod

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qids = [3, 17, 48]
    out = lm_mod.text_topk(docs, qids, k=5).collect()
    by_q = {}
    for r in out:
        assert r["doc_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q in qids:
        rows = sorted(by_q[q], key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["cos2_ppm"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_bm25_hand_computed(spark):
    """BM25 on a 3-doc corpus against the closed-form formula."""
    import math

    from arcane_framework_scala_spark.functions.tfidf import bm25_rerank

    docs = spark.createDataFrame(
        [(0, "x y"), (1, "x x z"), (2, "w w w")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame([(0, 1), (0, 2)], "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["bm25_micro"]
        for r in bm25_rerank(docs, cand).collect()
    }
    # shared term of (0,1) is 'x': df=2, N=3, avglen=(2+3+3)/3
    k1, b = 1.2, 0.75
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    tf, dl, avg = 2, 3, 8 / 3
    exp = math.floor(
        1_000_000.0 * idf * (tf * (k1 + 1.0))
        / (tf + k1 * ((1 - b) + b * dl / avg))
    )
    assert got[(0, 1)] == exp
    assert (0, 2) not in got  # no shared terms -> no row
