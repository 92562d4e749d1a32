"""The repo's central determinism claim, tested head-on: fixed-point /
md5-derived operators must produce IDENTICAL results under different
partitionings (the property that makes a 32-thread sandbox result equal
a 1000-executor cluster result)."""

import pyspark.sql.functions as F


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_pq_codes_partition_independent(spark, sf_dir):
    from arcane_framework_scala_spark.functions.pq import pq_encode, pq_fit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = pq_encode(emb, pq_fit(emb))
    shuffled = emb.repartition(13, "label")
    alt = pq_encode(shuffled, pq_fit(shuffled))
    assert base.exceptAll(alt).count() == 0
    assert alt.exceptAll(base).count() == 0


def test_bpe_merges_partition_independent(spark, sf_dir):
    from arcane_framework_scala_spark.functions.bpe import bpe_merges

    docs = _docs(spark, sf_dir)
    a = [tuple(r) for r in bpe_merges(docs, merges=3).orderBy("step").collect()]
    b = [
        tuple(r)
        for r in bpe_merges(docs.repartition(7), merges=3)
        .orderBy("step")
        .collect()
    ]
    assert a == b


def test_pagerank_partition_independent(spark, sf_dir):
    from arcane_framework_scala_spark.functions import dedup as dd
    from arcane_framework_scala_spark.functions.graph import (
        pagerank_fixed_point,
    )

    pairs = dd.minhash_candidate_pairs(_docs(spark, sf_dir))
    a = {r["vertex"]: r["pr_micro"]
         for r in pagerank_fixed_point(pairs, iters=2).collect()}
    b = {r["vertex"]: r["pr_micro"]
         for r in pagerank_fixed_point(pairs.repartition(11), iters=2).collect()}
    assert a == b


def test_winsorize_idempotent(spark):
    """Capping twice equals capping once: re-winsorizing the capped
    column changes nothing (quantiles of the capped data still span
    the cap bounds)."""
    from arcane_framework_scala_spark.functions.stats import winsorize

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(20)] + [("g", 1e9), ("g", -1e9)],
        "k string, v double",
    )
    once = winsorize(df, "k", "v").first()
    # rebuild the capped column then winsorize again
    from arcane_framework_scala_spark.functions.stats import value_quantiles

    b = value_quantiles(df, "k", "v", (0.05, 0.95)).first()
    capped = df.select(
        "k",
        F.when(F.col("v") < b["q_05"], b["q_05"])
        .when(F.col("v") > b["q_95"], b["q_95"])
        .otherwise(F.col("v"))
        .alias("v"),
    )
    twice = winsorize(capped, "k", "v").first()
    assert twice["capped_micro"] == once["capped_micro"]
    assert twice["n"] == once["n"]


def test_web_curation_partition_independent(spark, sf_dir):
    """canonicalize → url_dedup → host_cap is md5/row-deterministic:
    identical kept-row sets under a hostile repartitioning."""
    from arcane_framework_scala_spark.functions import web

    docs = _docs(spark, sf_dir).withColumn(
        "url", web.synthetic_url_column()
    )

    def pipeline(df):
        canon = web.url_canonicalize(df)
        return web.host_cap_sample(
            web.url_dedup(canon, quality_col="n_chars"), cap=5
        ).select("doc_id", "host", "host_rank")

    a = sorted(map(tuple, pipeline(docs).collect()))
    b = sorted(map(tuple, pipeline(docs.repartition(13, "lang")).collect()))
    assert a == b


def test_line_dedup_clean_partition_independent(spark, sf_dir):
    from arcane_framework_scala_spark.functions import line_dedup as ld

    docs = _docs(spark, sf_dir)

    def clean(df):
        return ld.line_dedup_clean(ld.chunk_lines(df, width=3), min_docs=2)

    a = sorted(map(tuple, clean(docs).collect()))
    b = sorted(map(tuple, clean(docs.repartition(11)).collect()))
    assert a == b


def test_ivm_partition_independent(spark, sf_dir):
    """Bootstrap + delta application lands on the same view regardless
    of the delta's partitioning (additive ints, null-safe join)."""
    from arcane_framework_scala_spark.operators import ivm
    from arcane_framework_scala_spark.operators.diff import snapshot_diff

    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    before = docs.filter("doc_id % 4 != 0")
    after = docs.filter("doc_id % 3 != 0")
    stats = ivm.group_stats_bootstrap(before, "source", "n_chars")
    cdf = snapshot_diff(before, after, keys=["doc_id"])

    def run(c):
        return sorted(
            map(
                tuple,
                ivm.apply_group_delta(
                    stats, ivm.group_delta(c, "source", "n_chars"), "source"
                ).collect(),
            )
        )

    assert run(cdf) == run(cdf.repartition(9))


def test_ivm_minmax_partition_independent(spark, sf_dir):
    """The top-2-auxiliary max/min maintenance is partitioning-blind:
    the same view lands for any delta partitioning (sorted bounded
    arrays, null-safe joins, deterministic recompute scope)."""
    from arcane_framework_scala_spark.operators import ivm_minmax as mm
    from arcane_framework_scala_spark.operators.diff import snapshot_diff

    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    before = docs.filter("doc_id % 4 != 0")
    after = docs.filter("doc_id % 3 != 0")
    state = mm.minmax_bootstrap(before, "source", "n_chars")
    cdf = snapshot_diff(before, after, keys=["doc_id"])

    def run(c):
        return sorted(
            map(
                tuple,
                mm.apply_minmax_delta(
                    state,
                    mm.minmax_delta(c, "source", "n_chars"),
                    after,
                    "source",
                    "n_chars",
                )
                .select("source", "docs", "max_size", "min_size")
                .collect(),
            )
        )

    assert run(cdf) == run(cdf.repartition(9))
