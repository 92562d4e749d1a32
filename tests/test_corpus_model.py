"""Property-based checks: corpus operators == pure-Python models.

Random word-soup documents through ``repetition_metrics`` /
``contamination`` / ``hash_split`` must match an in-memory reference
model implementing the definitions directly (Gopher §A1.1 fractions,
GPT-3 §C n-gram intersection, md5-bucket assignment). Catches
gram-window off-by-ones and hash-encoding drift that example-based
tests don't enumerate. ``normalize_name`` idempotence rides along.
"""

import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arcane_framework_scala_spark.functions.corpus import (
    contamination,
    hash_split,
    repetition_metrics,
)
from arcane_framework_scala_spark.schema.normalize import normalize_name

WORDS = ["a", "b", "c", "dd", "eee"]

doc = st.lists(st.sampled_from(WORDS), min_size=1, max_size=14).map(" ".join)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _grams(words, n):
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def _rep_model(text):
    w = text.split(" ")
    out = {"words": len(w)}
    c1 = Counter(_grams(w, 1))
    out["dup_word_ppm"] = (1_000_000 * (len(w) - len(c1))) // len(w)
    for n, name in ((2, "top_2gram_ppm"), (3, "top_3gram_ppm")):
        g = Counter(_grams(w, n))
        out[name] = (1_000_000 * max(g.values())) // sum(g.values()) if g else 0
    g5 = Counter(_grams(w, 5))
    dup = sum(c for c in g5.values() if c > 1)
    out["dup_5gram_ppm"] = (1_000_000 * dup) // sum(g5.values()) if g5 else 0
    return out


@settings(**_SETTINGS)
@given(docs=st.lists(doc, min_size=1, max_size=6))
def test_repetition_matches_model(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in repetition_metrics(df).collect()}
    for i, text in enumerate(docs):
        expect = _rep_model(text)
        actual = {k: v for k, v in got[i].items() if k != "doc_id"}
        assert actual == expect, (text, actual, expect)


@settings(**_SETTINGS)
@given(
    corpus=st.lists(doc, min_size=1, max_size=5),
    bench=st.lists(doc, min_size=1, max_size=3),
    n=st.integers(min_value=2, max_value=4),
)
def test_contamination_matches_model(spark, corpus, bench, n):
    cdf = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    bdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.hit_grams, r.bench_docs)
        for r in contamination(cdf, bdf, n=n).collect()
    }
    bgrams = [
        (100 + i, set(_grams(t.split(" "), n))) for i, t in enumerate(bench)
    ]
    expect = {}
    for i, t in enumerate(corpus):
        cg = set(_grams(t.split(" "), n))
        hits = cg & set().union(*(g for _, g in bgrams))
        docs_hit = sum(1 for _, g in bgrams if g & cg)
        if hits:
            expect[i] = (len(hits), docs_hit)
    assert got == expect


@settings(**_SETTINGS)
@given(ids=st.lists(st.integers(min_value=-(2**40), max_value=2**40), unique=True, min_size=1, max_size=30))
def test_hash_split_matches_model(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: (r.bucket, r.split) for r in hash_split(df).collect()}
    for i in ids:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 1000
        label = "train" if b < 800 else ("val" if b < 900 else "test")
        assert got[i] == (b, label), (i, got[i], (b, label))


@settings(max_examples=50, deadline=None)
@given(name=st.text(min_size=1, max_size=24))
def test_normalize_name_idempotent(name):
    once = normalize_name(name)
    assert normalize_name(once) == once
