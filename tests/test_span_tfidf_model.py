"""Property-based checks: span dedup / TF-IDF rerank == pure-Python models.

Random word-sequence documents through the distributed operators must
match in-memory implementations of the definitions (position n-grams,
interval merge, smoothed-IDF integer quantization, exact int64 dot
products). Catches slice off-by-ones, interval-merge boundary bugs
(pos == prev_end), short-document edges and weight-quantization drift
that the corpus gate can't enumerate."""

from __future__ import annotations

import math
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arcane_framework_scala_spark.functions.span_dedup import (
    duplicated_ngram_spans,
)
from arcane_framework_scala_spark.functions.tfidf import tfidf_rerank

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small vocabulary → real cross-document n-gram collisions at tiny sizes
_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
docs_st = st.lists(_doc, min_size=1, max_size=5)


def _tok(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


def _spans_model(
    texts: list[str], n: int, min_docs: int = 2
) -> dict[int, tuple[int, int, int, int]]:
    toks = {i: _tok(t) for i, t in enumerate(texts)}
    gram_docs: dict[str, set[int]] = {}
    for i, tk in toks.items():
        for p in range(max(len(tk) - n + 1, 0)):
            gram_docs.setdefault(" ".join(tk[p : p + n]), set()).add(i)
    out = {}
    for i, tk in toks.items():
        dup_pos = [
            p
            for p in range(max(len(tk) - n + 1, 0))
            if len(gram_docs[" ".join(tk[p : p + n])]) >= min_docs
        ]
        spans: list[list[int]] = []
        for p in dup_pos:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + n)
            else:
                spans.append([p, p + n])
        total = len(tk)
        dup = sum(e - s for s, e in spans)
        out[i] = (total, dup, len(spans), dup * 1000 // total if total else 0)
    return out


@settings(**_SETTINGS)
@given(texts=docs_st, n=st.integers(min_value=1, max_value=4))
def test_span_stats_match_model(spark, texts, n):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["total_tokens"],
            r["dup_tokens"],
            r["n_spans"],
            r["dup_ratio_milli"],
        )
        for r in duplicated_ngram_spans(df, n=n).collect()
    }
    assert got == _spans_model(texts, n)


def _rerank_model(
    texts: list[str], pairs: list[tuple[int, int]]
) -> dict[tuple[int, int], int]:
    n_docs = len(texts)
    tf = {i: Counter(_tok(t)) for i, t in enumerate(texts)}
    df_count = Counter(term for c in tf.values() for term in c)
    idf = {
        t: math.floor(1000 * math.log((n_docs + 1) / (d + 1))) + 1000
        for t, d in df_count.items()
    }
    w = {i: {t: c * idf[t] for t, c in cnt.items()} for i, cnt in tf.items()}
    n2 = {i: sum(v * v for v in ws.values()) for i, ws in w.items()}
    out = {}
    for a, b in pairs:
        shared = set(w[a]) & set(w[b])
        if not shared:
            continue  # no dot row at all (inner join semantics)
        dot = sum(w[a][t] * w[b][t] for t in shared)
        out[(a, b)] = math.floor(
            1_000_000.0 * dot / (math.sqrt(n2[a]) * math.sqrt(n2[b]))
        )
    return out


@settings(**_SETTINGS)
@given(texts=docs_st)
def test_tfidf_rerank_matches_model(spark, texts):
    # all-pairs candidates over a tiny corpus — the model enumerates the
    # same pairs, so inner-join absence (disjoint vocab) is covered too
    texts = [t if t.strip() else "aa" for t in texts]  # empty doc → 1 token
    pairs = [
        (a, b) for a in range(len(texts)) for b in range(len(texts)) if a < b
    ]
    if not pairs:
        return
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    cand = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["sim_micro"]
        for r in tfidf_rerank(df, cand).collect()
    }
    assert got == _rerank_model(texts, pairs)
