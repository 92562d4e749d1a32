"""Unit tests for corpus-level line dedup (functions/line_dedup.py) and
the corpus-wide top-ngram miner (functions/corpus.py::top_ngrams)."""

import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions import corpus as cx
from arcane_framework_scala_spark.functions import line_dedup as ld


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_lines_widths(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "x")])
    got = {
        r["doc_id"]: r["lines"]
        for r in ld.chunk_lines(df, width=2).collect()
    }
    assert got[1] == ["a b", "c d", "e"]
    assert got[2] == ["x"]


def test_line_dedup_stats_counts_cross_doc_lines(spark):
    # "a b" appears in docs 1+2; "z z" only in doc 3
    df = _docs(spark, [(1, "a b q q"), (2, "a b r r"), (3, "z z s s")])
    stats = {
        r["doc_id"]: (r["n_lines"], r["dup_lines"])
        for r in ld.line_dedup_stats(
            ld.chunk_lines(df, width=2), min_docs=2
        ).collect()
    }
    assert stats[1] == (2, 1)
    assert stats[2] == (2, 1)
    assert stats[3] == (2, 0)


def test_line_dedup_clean_preserves_order_and_rows(spark):
    df = _docs(spark, [(1, "a b q q a b"), (2, "a b r r"), (3, "a b")])
    out = {
        r["doc_id"]: r["clean_text"]
        for r in ld.line_dedup_clean(
            ld.chunk_lines(df, width=2), min_docs=2
        ).collect()
    }
    # "a b" occurs in all three docs -> removed everywhere; doc 3 was
    # pure boilerplate but still gets a row (empty string)
    assert out == {1: "q q", 2: "r r", 3: ""}


def test_top_ngrams_rank_and_tiebreak(spark):
    df = _docs(
        spark,
        [(1, "a b c a b c"), (2, "a b c x y z"), (3, "x y z")],
    )
    rows = cx.top_ngrams(df, n=3, k=3).collect()
    assert [r["gram"] for r in rows][:2] == ["a b c", "x y z"]
    top = rows[0]
    assert (top["occurrences"], top["doc_freq"]) == (3, 2)


def test_top_ngrams_plans_take_ordered(spark):
    df = _docs(spark, [(1, "a b c d")])
    plan = (
        cx.top_ngrams(df, n=2, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_top_ngrams_short_docs_contribute_nothing(spark):
    # docs shorter than n words must not crash (sequence(1,0) is the
    # DESCENDING [1,0] in Spark; slice(w, 0, n) throws) — they just
    # contribute zero grams
    df = _docs(spark, [(1, "hello world"), (2, "a b c d"), (3, "x")])
    rows = cx.top_ngrams(df, n=3, k=10).collect()
    assert [r["gram"] for r in rows] == ["a b c", "b c d"]
