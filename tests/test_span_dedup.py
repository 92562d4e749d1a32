"""Span-level duplicated-n-gram dedup: hand-checked spans, merge
invariants, zero-fill for clean documents."""

import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.span_dedup import (
    duplicated_ngram_span_intervals,
    duplicated_ngram_spans,
    remove_duplicated_spans,
)

_SHARED = "alpha beta gamma delta epsilon zeta"  # 6-token shared passage


def _docs(spark):
    rows = [
        (1, f"unique one two {_SHARED} tail1 tail2"),
        (2, f"prefix {_SHARED} other words here"),
        (3, "totally different content nothing shared at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_passage_marks_exact_span(spark):
    # n=4 inside a 6-token shared passage → 3 windows, merging to one
    # span exactly covering the passage in each document
    ivals = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in duplicated_ngram_span_intervals(_docs(spark), n=4).collect()
    }
    # doc 1: passage starts at token 3 (unique one two | alpha ...)
    assert ivals[1] == (3, 9)
    # doc 2: passage starts at token 1 (prefix | alpha ...)
    assert ivals[2] == (1, 7)
    assert 3 not in ivals


def test_stats_zero_filled_and_exact(spark):
    stats = {r["doc_id"]: r for r in duplicated_ngram_spans(_docs(spark), n=4).collect()}
    assert set(stats) == {1, 2, 3}
    assert stats[1]["dup_tokens"] == 6 and stats[1]["n_spans"] == 1
    assert stats[1]["total_tokens"] == 11
    assert stats[1]["dup_ratio_milli"] == 6000 // 11
    assert stats[2]["dup_tokens"] == 6
    assert stats[3]["dup_tokens"] == 0 and stats[3]["n_spans"] == 0


def test_adjacent_windows_merge_into_single_span(spark):
    # identical docs → every position duplicated → exactly one span
    # covering the whole document
    rows = [(1, "a b c d e f g h"), (2, "a b c d e f g h")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_ngram_spans(df, n=3).collect()
    for r in out:
        assert r["dup_tokens"] == r["total_tokens"] == 8
        assert r["n_spans"] == 1
        assert r["dup_ratio_milli"] == 1000


def test_short_docs_below_n_have_no_grams(spark):
    rows = [(1, "a b"), (2, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicated_ngram_spans(df, n=4).collect()}
    assert out[1]["dup_tokens"] == 0 and out[1]["total_tokens"] == 2


def test_remove_spans_cuts_exactly_the_spans(spark):
    out = {
        r["doc_id"]: r for r in remove_duplicated_spans(_docs(spark), n=4).collect()
    }
    # doc 1: "unique one two [SHARED x6] tail1 tail2" → shared cut
    assert out[1]["clean_text"] == "unique one two tail1 tail2"
    assert out[1]["kept_tokens"] == 5 and out[1]["removed_tokens"] == 6
    assert out[2]["clean_text"] == "prefix other words here"
    # doc 3 untouched (lowercased by the shared tokenizer)
    assert out[3]["clean_text"] == "totally different content nothing shared at all"
    assert out[3]["removed_tokens"] == 0


def test_remove_spans_keeps_fully_duplicated_doc_as_empty_row(spark):
    rows = [(1, "a b c d e"), (2, "a b c d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_duplicated_spans(df, n=3).collect()}
    assert set(out) == {1, 2}
    assert out[1]["clean_text"] == "" and out[1]["kept_tokens"] == 0
    assert out[1]["removed_tokens"] == 5


def test_remove_spans_consistent_with_stats(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = {
        r["doc_id"]: r for r in duplicated_ngram_spans(docs, n=5).collect()
    }
    cleaned = {
        r["doc_id"]: r for r in remove_duplicated_spans(docs, n=5).collect()
    }
    assert set(stats) == set(cleaned)
    for i, s in stats.items():
        assert cleaned[i]["removed_tokens"] == s["dup_tokens"]
        assert cleaned[i]["kept_tokens"] == s["total_tokens"] - s["dup_tokens"]


def test_intervals_disjoint_and_in_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ivals = (
        duplicated_ngram_span_intervals(docs, n=5)
        .groupBy("doc_id")
        .agg(
            F.expr("array_sort(collect_list(struct(span_start, span_end)))").alias("s")
        )
        .collect()
    )
    totals = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id", F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("t")
        ).collect()
    }
    assert len(ivals) > 0  # non-vacuous at sf0.001
    for r in ivals:
        prev_end = -1
        for s in r["s"]:
            assert 0 <= s["span_start"] < s["span_end"] <= totals[r["doc_id"]]
            assert s["span_start"] > prev_end  # merged → strictly disjoint
            prev_end = s["span_end"]
