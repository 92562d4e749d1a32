"""fuzzy_contamination: paraphrase sensitivity the exact n-gram check
lacks, zero-fill contract, and the broadcast/no-self-join plan shape."""

import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.corpus import contamination
from arcane_framework_scala_spark.functions.dedup import fuzzy_contamination


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_flags_paraphrase_exact_ngrams_miss(spark):
    bench_text = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet village roofs at midnight"
    )
    # light edit: one word swapped mid-sentence — kills every word
    # 8-gram spanning it, but ~all char-5 shingles survive
    paraphrase = bench_text.replace("gently", "softly")
    unrelated = (
        "completely different subject matter involving spacecraft "
        "propulsion chemistry and long duration orbital mechanics data"
    )
    corpus = _docs(spark, [(1, paraphrase), (2, unrelated)])
    bench = _docs(spark, [(100, bench_text)])

    fz = {
        r["doc_id"]: r
        for r in fuzzy_contamination(
            corpus, bench, num_hashes=16, bands=8, min_bands=1
        ).collect()
    }
    # zero-fill contract: every corpus doc has a row
    assert set(fz) == {1, 2}
    assert fz[1]["contaminated"] and fz[1]["n_hit_bands"] >= 1
    assert not fz[2]["contaminated"] and fz[2]["n_hit_bands"] == 0

    # the gap this operator closes: a benchmark short enough that one
    # mid-text edit provably kills every word 8-gram — exact
    # contamination misses it, fuzzy still flags it
    short_b = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    short_p = short_b.replace("epsilon", "upsilon")
    c2 = _docs(spark, [(3, short_p)])
    b2 = _docs(spark, [(200, short_b)])
    assert {r["doc_id"] for r in contamination(c2, b2, n=8).collect()} == set()
    fz2 = fuzzy_contamination(c2, b2, num_hashes=16, bands=8).collect()
    assert fz2[0]["contaminated"]


def test_benchmark_side_broadcasts(spark):
    corpus = _docs(spark, [(i, f"document body number {i} with words") for i in range(20)])
    bench = _docs(spark, [(100, "document body number 3 with words")])
    plan = (
        fuzzy_contamination(corpus, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the corpus text is never self-joined: exactly the hit join and the
    # zero-fill join appear
    assert plan.count("SortMergeJoin") <= 1


def test_containment_catches_subset_duplication(spark):
    """A short doc quoted verbatim inside a much larger one has low
    Jaccard (union dominated by the big doc) but containment 1.0."""
    from arcane_framework_scala_spark.functions.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    big = quote + " " + " ".join(f"filler{i} words here" for i in range(30))
    df = spark.createDataFrame(
        [(1, quote), (2, big), (3, "completely different content piece")],
        "doc_id long, text string",
    )
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in ngram_containment_pairs(df, threshold=0.8).collect()
    }
    assert cont.get((1, 2)) == 1.0
    assert (1, 3) not in cont and (2, 3) not in cont
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    assert jac[(1, 2)] < 0.3  # jaccard misses what containment finds


def test_containment_matches_duckdb(spark, sf_dir):
    import duckdb

    from arcane_framework_scala_spark.functions.dedup import (
        ngram_containment_pairs,
        ngram_containment_pairs_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        map(tuple, ngram_containment_pairs(docs, threshold=0.6).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(
            ngram_containment_pairs_sql("documents", threshold=0.6)
        ).fetchall())
    )
    assert got == want
