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
