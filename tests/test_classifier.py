"""Quality classifier (functions/classifier.py): the GD fit actually
learns, scoring respects the prefit contract, and the fixed-point
arithmetic is partition-order independent."""

import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.classifier import (
    quality_classifier_fit,
    quality_classifier_score,
)


def _corpus(spark):
    rows = (
        [(i, "whereas party herein covenant pursuant", "tgt") for i in range(6)]
        + [(10 + i, "banana apple pear grape melon", "web") for i in range(6)]
        + [(30, "whereas covenant banana apple", "web")]  # mixed
    )
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_fit_separates_target_from_raw(spark):
    df = _corpus(spark)
    out = {
        r["doc_id"]: r
        for r in quality_classifier_score(
            df, F.col("source") == "tgt", iters=3, dim=64
        ).collect()
    }
    tgt_scores = [out[i]["score_micro"] for i in range(6)]
    web_scores = [out[10 + i]["score_micro"] for i in range(6)]
    assert min(tgt_scores) > max(web_scores)
    assert all(out[i]["reference_like"] for i in range(6))
    assert not any(out[10 + i]["reference_like"] for i in range(6))
    # the mixed doc sits strictly between the two classes
    assert max(web_scores) < out[30]["score_micro"] < min(tgt_scores)


def test_prefit_weights_match_infit(spark):
    df = _corpus(spark)
    w = quality_classifier_fit(
        df, F.col("source") == "tgt", iters=3, dim=64
    ).localCheckpoint()
    infit = sorted(
        map(
            tuple,
            quality_classifier_score(
                df, F.col("source") == "tgt", iters=3, dim=64
            ).collect(),
        )
    )
    prefit = sorted(
        map(
            tuple,
            quality_classifier_score(df, dim=64, weights=w).collect(),
        )
    )
    assert infit == prefit


def test_fit_is_partition_independent(spark):
    df = _corpus(spark)
    base = sorted(
        map(
            tuple,
            quality_classifier_fit(
                df, F.col("source") == "tgt", iters=2, dim=64
            ).collect(),
        )
    )
    shuffled = sorted(
        map(
            tuple,
            quality_classifier_fit(
                df.repartition(5, "doc_id"),
                F.col("source") == "tgt",
                iters=2,
                dim=64,
            ).collect(),
        )
    )
    assert base == shuffled


def test_unseen_bucket_docs_score_half_not_dropped(spark):
    """Prefit (sample-fit) scoring: a doc whose tokens all hash to
    buckets the fit never saw must still get a score row at margin 0 —
    score exactly ½ — instead of being dropped by an inner join
    (ADVICE r4 item 3)."""
    fit_df = _corpus(spark)
    w = quality_classifier_fit(fit_df, F.col("source") == "tgt", iters=2, dim=4096)
    # dim=4096 over a ~10-word vocabulary leaves almost every bucket
    # unseen; pick novel tokens until we find a doc with zero overlap
    seen = {r["bucket"] for r in w.collect()}
    from arcane_framework_scala_spark.functions.lm import hashed_features

    novel = spark.createDataFrame(
        [(999, "zzzqx wvvk pqjmtr ulonnx", "web")],
        "doc_id long, text string, source string",
    )
    nb = {
        r["bucket"]
        for r in hashed_features(novel, 4096).select("bucket").collect()
    }
    assert not (nb & seen), "test setup: tokens collided with fit vocab"
    out = quality_classifier_score(novel, dim=4096, weights=w).collect()
    assert len(out) == 1
    assert out[0]["score_micro"] == 500_000
    assert not out[0]["reference_like"] or out[0]["score_micro"] >= 500_000


def test_zero_feature_docs_still_get_a_row(spark):
    """ADVICE r5: a doc whose text extracts NO features (empty or
    whitespace-only) produces no hashed_features rows, but the score
    output must still cover it — margin 0, score exactly 500000 — in
    both the Spark path and the DuckDB oracle."""
    import duckdb

    from arcane_framework_scala_spark.functions.classifier import (
        quality_classifier_score_sql,
    )

    # NULL text is the true zero-feature case: split(NULL) -> NULL ->
    # explode emits nothing (an empty STRING tokenizes to [''] in both
    # Spark and DuckDB, so it still gets the ''-bucket feature)
    rows = (
        [(i, "whereas party herein covenant pursuant", "tgt") for i in range(4)]
        + [(10 + i, "banana apple pear grape melon", "web") for i in range(4)]
        + [(90, None, "web"), (91, "", "web")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r
        for r in quality_classifier_score(
            df, F.col("source") == "tgt", iters=2, dim=64
        ).collect()
    }
    assert set(out) == {r[0] for r in rows}
    assert out[90]["score_micro"] == 500_000, out[90]
    assert out[90]["reference_like"] is True  # >= is the pinned tie rule

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?)", rows)
    sql = quality_classifier_score_sql("docs", "d.source = 'tgt'", iters=2, dim=64)
    oracle = {r[0]: r for r in con.execute(sql).fetchall()}
    assert set(oracle) == set(out)
    for d in out:
        assert oracle[d][1] == out[d]["score_micro"], d
