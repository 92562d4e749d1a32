"""Property-based check: bpe_fit == a pure-Python BPE reference.

Random tiny corpora through the relational learner must match an
in-memory implementation of the published rules: pair counts weighted
by word frequency, argmax with (count desc, pair lexicographic asc)
tie-break, greedy left-to-right non-overlapping application. Catches
run/offset edge cases (overlapping pairs, merged-symbol cascades) the
corpus gate can't enumerate."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arcane_framework_scala_spark.functions.bpe import bpe_fit

word = st.text(alphabet="ab", min_size=1, max_size=6)
corpus = st.lists(word, min_size=1, max_size=12)


def _model(words: list[str], merges: int):
    """Pure-Python BPE over a word list (each occurrence counts)."""
    from collections import Counter

    freq = Counter(words)
    syms = {w: list(w) for w in freq}
    table = []
    for step in range(1, merges + 1):
        counts: Counter = Counter()
        for w, f in freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        a, b = best
        table.append((step, a, b, a + b, counts[best]))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return table, syms


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=corpus, merges=st.integers(min_value=1, max_value=3))
def test_bpe_matches_python_model(spark, words, merges):
    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    got_table, got_rows = bpe_fit(df, merges=merges)
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"],
         r["pair_count"])
        for r in got_table.orderBy("step").collect()
    ]
    exp_table, exp_syms = _model(words, merges)
    assert got == exp_table
    got_syms: dict[str, list[str]] = {}
    for r in got_rows.orderBy("word", "pos").collect():
        got_syms.setdefault(r["word"], []).append(r["sym"])
    assert got_syms == exp_syms
