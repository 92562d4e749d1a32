"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language-ID, quality
scoring, token counting and document fingerprinting over a ``documents``
table. Everything here is built from JVM-side ``pyspark.sql.functions``
expressions — no Python UDFs — so the whole plan stays inside whole-stage
codegen and scales linearly with executors. Each helper has a matching
DuckDB SQL fragment generator (used by the oracle gate) computing the
identical value.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------


def token_count(text: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_count_sql(col: str = "text") -> str:
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({col}), '\\s+')) END"
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """A BPE-flavored token estimate: word pieces + digits + punctuation
    counted separately (regex split on boundaries), ~GPT-2 pre-tokenizer
    granularity without a vocab."""
    c = F.col(text) if isinstance(text, str) else text
    # contiguous letter runs, digit runs, and single non-space symbols
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def bpe_ish_token_count_sql(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9[:space:]]'))"


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
)


def quality_metrics(text: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword / digit ratios — the standard cheap
    quality signals (C4/Gopher-style heuristics). Returns named Columns."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_tokens = token_count(c)
    lower = F.lower(c)
    words = F.split(F.trim(lower), r"\s+")
    # one parsed literal array: per-element F.lit costs a py4j round trip
    # per word per quality_metrics CALL (~1 ms each, r11-measured), and
    # featurizers build this expression repeatedly (guide §5 driver time)
    stop_lits = ",".join(f"'{w}'" for w in _STOPWORDS)
    n_stop = F.size(F.array_intersect(words, F.expr(f"array({stop_lits})")))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?'\"]", ""))
    n_digit = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": F.round(n_punct / safe_chars, 6),
        "digit_ratio": F.round(n_digit / safe_chars, 6),
        # distinct-stopword hit count / tokens: cheap lexical-diversity signal
        "stopword_ratio": F.round(
            n_stop / F.greatest(n_tokens, F.lit(1)).cast("double"), 6
        ),
        "mean_word_len": F.round(
            F.length(F.regexp_replace(F.trim(c), r"\s+", ""))
            / F.greatest(n_tokens, F.lit(1)).cast("double"),
            6,
        ),
    }


def quality_metrics_sql(col: str = "text") -> dict[str, str]:
    stop = ", ".join(f"'{w}'" for w in _STOPWORDS)
    n_tokens = token_count_sql(col)
    return {
        "n_chars": f"length({col})",
        "n_tokens": n_tokens,
        "punct_ratio": (
            f"round((length({col}) - length(regexp_replace({col}, "
            f"'[.,;:!?''\"]', '', 'g'))) / greatest(length({col}), 1), 6)"
        ),
        "digit_ratio": (
            f"round((length({col}) - length(regexp_replace({col}, "
            f"'[0-9]', '', 'g'))) / greatest(length({col}), 1), 6)"
        ),
        "stopword_ratio": (
            f"round(len(list_intersect(regexp_split_to_array(trim(lower({col})), "
            f"'\\s+'), [{stop}])) / greatest({n_tokens}, 1), 6)"
        ),
        "mean_word_len": (
            f"round(length(regexp_replace(trim({col}), '\\s+', '', 'g')) "
            f"/ greatest({n_tokens}, 1), 6)"
        ),
    }


# ---------------------------------------------------------------------------
# Language identification (marker-word heuristic)
# ---------------------------------------------------------------------------

#: Highest-frequency function words per language; scored by LIKE hits so the
#: exact same predicate runs on Spark and any SQL oracle.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "to"),
    "de": ("der", "und", "die", "ist", "nicht"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "que", "los", "es"),
    "it": ("il", "che", "di", "la", "non"),
}


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts over padded lower-cased text."""
    c = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    out = {}
    for lang, markers in _LANG_MARKERS.items():
        hits = [padded.like(f"% {m} %").cast("int") for m in markers]
        total = hits[0]
        for h in hits[1:]:
            total = total + h
        out[lang] = total
    return out


def lang_id(text: Column | str) -> Column:
    """argmax language by marker hits; 'und' (undetermined) when all zero.
    Ties break to the alphabetically-last language (reversed CASE chain) —
    plain integer/CASE expressions so any SQL oracle reproduces it exactly."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    pick = F.lit(sorted(scores)[0])
    for lang in sorted(scores)[1:]:
        pick = F.when(scores[lang] == best, F.lit(lang)).otherwise(pick)
    return F.when(best <= 0, F.lit("und")).otherwise(pick)


def lang_id_sql(col: str = "text") -> str:
    score = {
        lang: " + ".join(
            f"(CASE WHEN concat(' ', lower({col}), ' ') LIKE '% {m} %' "
            f"THEN 1 ELSE 0 END)"
            for m in markers
        )
        for lang, markers in _LANG_MARKERS.items()
    }
    langs = sorted(score)
    best = "greatest(" + ", ".join(f"({score[lang]})" for lang in langs) + ")"
    # reversed-alphabetical CASE chain == Spark's tie-to-last behavior
    branches = " ".join(
        f"WHEN ({score[lang]}) = {best} THEN '{lang}'" for lang in reversed(langs[1:])
    )
    return (
        f"CASE WHEN {best} <= 0 THEN 'und' "
        f"ELSE (CASE {branches} ELSE '{langs[0]}' END) END"
    )


# ---------------------------------------------------------------------------
# Document fingerprinting (rolling-hash winnowing)
# ---------------------------------------------------------------------------


def fingerprint(
    text: Column | str, k: int = 8, *, pre_normalized: bool = False
) -> Column:
    """Winnowing-style fingerprint: the minimum md5 over all ``k``-char
    windows of the normalized text (lower, whitespace squeezed). Equal
    fingerprints ⇒ near-identical prefixes/content; cheap grouping key.

    Higher-order functions interpret their lambda per element and do NOT
    hoist loop-invariant subexpressions, so referencing the raw text here
    re-runs the normalization regexp for every window (measured 6× CPU at
    sf0.1). Callers on a hot path should project the normalization once
    (``regexp_replace(lower(trim(text)), '\\s+', ' ')``) and pass the
    projected column with ``pre_normalized=True``."""
    c = F.col(text) if isinstance(text, str) else text
    norm = c if pre_normalized else F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    windows = F.transform(idx, lambda i: F.md5(norm.substr(i, F.lit(k))))
    return F.array_min(windows)


def fingerprint_sql(col: str = "text", k: int = 8) -> str:
    return (
        f"list_min(list_transform(range(1, greatest(length(regexp_replace("
        f"lower(trim({col})), '\\s+', ' ', 'g')) - {k} + 1, 1) + 1), "
        f"i -> md5(substr(regexp_replace(lower(trim({col})), '\\s+', ' ', 'g'), "
        f"i, {k}))))"
    )


def normalize_for_dedup(text: Column | str) -> Column:
    """Dedup-normalization (the step before shingling/MinHash in the
    published recipes — Gopher/RefinedWeb fold case, punctuation, digits
    and whitespace so near-identical boilerplate hashes identically):
    lowercase → digits squashed to 0 → punctuation dropped (anything
    not a letter/digit/space) → whitespace runs collapsed → trimmed.

    Pure regexp column algebra; the unicode classes used (\\p{L},
    \\p{N}) mean the same thing to Spark's Java regex and DuckDB's RE2,
    so the twin is byte-stable on the shared plane."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.lower(c)
    c = F.regexp_replace(c, r"\p{N}", "0")
    c = F.regexp_replace(c, r"[^\p{L}\p{N} ]+", " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def normalize_for_dedup_sql(col: str = "text") -> str:
    """DuckDB twin of :func:`normalize_for_dedup`."""
    return (
        f"trim(regexp_replace(regexp_replace(regexp_replace(lower({col}), "
        f"'\\p{{N}}', '0', 'g'), '[^\\p{{L}}\\p{{N}} ]+', ' ', 'g'), "
        f"' +', ' ', 'g'))"
    )
