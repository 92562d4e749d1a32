"""BPE learner: hand-computed merge semantics and token-count contract."""

import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.bpe import (
    bpe_fit,
    bpe_merges,
    bpe_token_counts,
    word_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_counts(spark):
    wc = {
        r["word"]: r["freq"]
        for r in word_counts(_docs(spark, ["a b a", "b  c"])).collect()
    }
    assert wc == {"a": 2, "b": 2, "c": 1}


def test_first_merge_is_most_frequent_pair(spark):
    # "ab" appears in 3 word occurrences -> pair (a,b) dominates
    df = _docs(spark, ["abc abd abe xy"])
    m = bpe_merges(df, merges=1).collect()[0]
    assert (m["left_sym"], m["right_sym"], m["merged"]) == ("a", "b", "ab")
    assert m["pair_count"] == 3


def test_greedy_nonoverlapping_aaaa(spark):
    """The classic overlap case: 'aaaa' under merge (a,a) must become
    ['aa','aa'] (left-to-right non-overlapping), never ['a','aa','a']
    or a triple merge."""
    df = _docs(spark, ["aaaa"])
    table, rows = bpe_fit(df, merges=1)
    m = table.collect()[0]
    assert (m["left_sym"], m["right_sym"]) == ("a", "a")
    assert m["pair_count"] == 3  # adjacent occurrences pre-merge
    syms = [
        r["sym"]
        for r in rows.filter(F.col("word") == "aaaa")
        .orderBy("pos")
        .collect()
    ]
    assert syms == ["aa", "aa"]


def test_merged_symbol_participates_next_round(spark):
    """Round 2 can merge the round-1 symbol with a neighbor."""
    df = _docs(spark, ["abab abab abc"])
    table, rows = bpe_fit(df, merges=2)
    t = {r["step"]: r for r in table.collect()}
    assert t[1]["merged"] == "ab"
    # after ab-merge: 'abab' = [ab, ab] (x2 words... occurrences), 'abc' = [ab, c]
    # pairs: (ab,ab) freq 2, (ab,c) freq 1 -> round 2 merges abab
    assert t[2]["merged"] == "abab"
    syms = [
        r["sym"]
        for r in rows.filter(F.col("word") == "abab").orderBy("pos").collect()
    ]
    assert syms == ["abab"]


def test_tiebreak_is_lexicographic(spark):
    """Equal counts -> lexicographically smallest (left, right) pair."""
    df = _docs(spark, ["dc ba"])  # pairs (d,c) and (b,a), each freq 1
    m = bpe_merges(df, merges=1).collect()[0]
    assert (m["left_sym"], m["right_sym"]) == ("b", "a")


def test_token_counts_shrink_and_match(spark):
    """Token counts = chars at 0 merges; strictly fewer after merging
    a pair that occurs in the doc."""
    df = _docs(spark, ["aa aa bb", "cc"])
    tc1 = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(df, merges=1).collect()
    }
    # merge 1 is (a,a) count 2; doc0: aa->1, aa->1, bb->2 = 4; doc1: cc = 2
    assert tc1 == {0: 4, 1: 2}


def test_out_of_pairs_is_stable(spark):
    """More merge rounds than distinct pairs: rows pass through
    unmerged instead of vanishing (the left-join guard)."""
    df = _docs(spark, ["ab"])
    table, rows = bpe_fit(df, merges=3)
    assert rows.count() == 1  # 'ab' fully merged to one symbol
    steps = {r["step"]: r["merged"] for r in table.collect()}
    assert steps[1] == "ab"
    # rounds 2-3 had no pairs: best rows are absent (empty LIMIT 1)
    assert 2 not in steps and 3 not in steps
