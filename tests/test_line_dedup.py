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


def test_line_dedup_matches_pure_python_model(spark):
    """Property: chunking + corpus-dup-line removal must equal a direct
    Python implementation on random tiny corpora (catches off-by-one
    chunk boundaries and ordering bugs the fixed gates can't)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = st.sampled_from(["a", "b", "c", "dd"])
    doc = st.lists(words, min_size=1, max_size=9).map(" ".join)

    def model(texts, width, min_docs):
        chunks = {
            i: [
                " ".join(t.split(" ")[j : j + width])
                for j in range(0, len(t.split(" ")), width)
            ]
            for i, t in enumerate(texts)
        }
        from collections import Counter

        docs_per_line = Counter()
        for lines in chunks.values():
            for line in set(lines):
                docs_per_line[line] += 1
        return {
            i: " ".join(
                l for l in lines if docs_per_line[l] < min_docs
            )
            for i, lines in chunks.items()
        }

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=st.lists(doc, min_size=1, max_size=6))
    def run(texts):
        df = _docs(spark, list(enumerate(texts)))
        got = {
            r["doc_id"]: r["clean_text"]
            for r in ld.line_dedup_clean(
                ld.chunk_lines(df, width=2), min_docs=2
            ).collect()
        }
        assert got == model(texts, 2, 2)

    run()


def test_normalize_for_dedup_matches_duckdb(spark):
    import duckdb

    from arcane_framework_scala_spark.functions.text import (
        normalize_for_dedup,
        normalize_for_dedup_sql,
    )

    texts = [
        "Hello,   WORLD!! 42 times...",
        "  tabs\tand\nnewlines  ",
        "version 2.7.1 (beta-3)",
        "ALL CAPS & symbols #1",
        "",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, text string")
    got = {r["i"]: r["n"] for r in df.select(
        "i", normalize_for_dedup("text").alias("n")).collect()}
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')".replace("\t", "' || chr(9) || '")
                     .replace("\n", "' || chr(10) || '")
                     for i, t in enumerate(texts))
    want = dict(con.execute(
        f"SELECT i, {normalize_for_dedup_sql('text')} FROM "
        f"(VALUES {vals}) t(i, text)").fetchall())
    assert got == want
    assert got[0] == "hello world 00 times"
    assert got[2] == "version 0 0 0 beta 0"
