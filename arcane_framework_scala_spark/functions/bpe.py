"""Corpus-scale BPE (byte-pair-encoding) merge-table learning.

The tokenizer-training step of a pre-training pipeline (Sennrich et al.
2016; GPT-2's byte-level variant): repeatedly find the most frequent
adjacent symbol pair across the corpus and merge it. This implements the
learner as pure relational plans, so a 100 TB corpus can train its own
merge table without a driver-side corpus:

- the corpus collapses to **distinct words × frequency** first (one
  shuffle; Heaps' law bounds the distinct-word table to ~√corpus — the
  classic BPE trick that makes corpus size irrelevant after one pass);
- each merge round is: pair counts via ``lead`` over (word, pos) →
  1-row argmax broadcast back → **greedy left-to-right non-overlapping
  application** expressed relationally (runs of consecutive match
  positions via gaps-and-islands; within a run, every even offset
  merges — exactly the sequential semantics, e.g. ``aaaa`` under
  ``(a,a)`` → ``aa aa``);
- per-round state is the symbol-rows table, lineage-truncated with
  ``localCheckpoint`` like ``kmeans.kmeans_fit``'s Lloyd loop.

Everything is integer/string arithmetic — no floats anywhere — so the
whole iterative fit value-hashes against a DuckDB oracle (the unrolled
CTE chain from :func:`bpe_merges_sql`, the same methodology as the
k-means gate).

Scale notes: pair counting shuffles (sym, nxt) partials (map-side
combined, alphabet-bounded); the argmax is ``LIMIT 1`` over the pair
table (tiny); application is two windows over (word, pos) — the rows
table never grows. Real tokenizers run thousands of merges: same plan,
checkpoint cadence amortizes; training on a frequency-capped word
sample (standard practice) bounds the rows table further.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

__all__ = [
    "word_counts",
    "bpe_fit",
    "bpe_merges",
    "bpe_token_counts",
    "bpe_merges_sql",
    "bpe_token_counts_sql",
]


def word_counts(
    df: DataFrame, text_col: str = "text", word_col: str = "word"
) -> DataFrame:
    """Distinct whitespace words with occurrence counts: ``(word, freq)``."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias(word_col))
        .filter(F.col(word_col) != "")
        .groupBy(word_col)
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq, pos, sym): every distinct word as character rows."""
    return words.select(
        "word",
        "freq",
        F.posexplode(F.split(F.col("word"), "")).alias("pos", "sym"),
    )


def _one_round(sym_rows: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One BPE merge round → (new_sym_rows, best_pair_1row)."""
    wnd = Window.partitionBy("word").orderBy("pos")
    with_next = sym_rows.withColumn("nxt", F.lead("sym").over(wnd))
    pairs = (
        with_next.filter(F.col("nxt").isNotNull())
        .groupBy("sym", "nxt")
        .agg(F.sum("freq").alias("pcnt"))
    )
    best = (
        pairs.orderBy(F.desc("pcnt"), F.asc("sym"), F.asc("nxt"))
        .limit(1)
        .select(
            F.col("sym").alias("pa"),
            F.col("nxt").alias("pb"),
            F.col("pcnt").alias("pcnt"),
        )
        # best feeds the merge table AND the application join
        .localCheckpoint(eager=False)
    )
    # left join on a constant key: if the corpus ran out of pairs the
    # rows pass through unmerged instead of vanishing in a cross join
    m = with_next.withColumn("k", F.lit(1)).join(
        F.broadcast(best.withColumn("k", F.lit(1))), "k", "left"
    )
    is_m = F.coalesce(
        (F.col("sym") == F.col("pa")) & (F.col("nxt") == F.col("pb")),
        F.lit(False),
    )
    seq = F.sum(F.when(is_m, 1).otherwise(0)).over(
        wnd.rowsBetween(Window.unboundedPreceding, 0)
    )
    m = m.withColumn("is_m", is_m).withColumn(
        "grp", F.when(F.col("is_m"), F.col("pos") - seq)
    )
    run_start = F.min("pos").over(Window.partitionBy("word", "grp"))
    sel = F.col("is_m") & (((F.col("pos") - run_start) % 2) == 0)
    s = m.withColumn("sel", sel).withColumn(
        "drop_prev", F.lag("sel").over(wnd)
    )
    new_rows = (
        s.filter(~F.coalesce(F.col("drop_prev"), F.lit(False)))
        .select(
            "word",
            "freq",
            (F.row_number().over(wnd) - 1).alias("pos"),
            F.when(
                F.col("sel"), F.concat(F.col("pa"), F.col("pb"))
            ).otherwise(F.col("sym")).alias("sym"),
        )
    )
    return new_rows, best


def bpe_fit(
    df: DataFrame, merges: int = 5, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Learn ``merges`` BPE merges over the corpus.

    Returns ``(merge_table, final_symbol_rows)`` where merge_table is
    ``(step, left_sym, right_sym, merged, pair_count)`` and the symbol
    rows are the tokenization of every distinct word under the learned
    merges."""
    rows = _initial_symbols(word_counts(df, text_col)).localCheckpoint(
        eager=False
    )
    bests = []
    for t in range(1, merges + 1):
        rows, best = _one_round(rows)
        # the rows table feeds next round's lead() AND this round came
        # from two windows — truncate per round like the Lloyd loop
        rows = rows.localCheckpoint(eager=False)
        bests.append(
            best.select(
                F.lit(t).alias("step"),
                F.col("pa").alias("left_sym"),
                F.col("pb").alias("right_sym"),
                F.concat("pa", "pb").alias("merged"),
                F.col("pcnt").alias("pair_count"),
            )
        )
    merge_table = bests[0]
    for b in bests[1:]:
        merge_table = merge_table.unionByName(b)
    return merge_table, rows


def bpe_merges(df: DataFrame, merges: int = 5, text_col: str = "text") -> DataFrame:
    """The learned merge table alone (gate surface)."""
    return bpe_fit(df, merges, text_col)[0]


def bpe_token_counts(
    df: DataFrame,
    merges: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token counts under the learned merges:
    ``(id_col, n_tokens)`` — the corpus re-joined to the per-word
    tokenization lengths (words repeat per occurrence)."""
    _, rows = bpe_fit(df, merges, text_col)
    wlen = rows.groupBy("word").agg(F.count(F.lit(1)).alias("n_sym"))
    occ = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).filter(F.col("word") != "")
    return (
        occ.join(wlen, "word")
        .groupBy("id")
        .agg(F.sum("n_sym").alias("n_tokens"))
        .withColumnRenamed("id", id_col)
    )


# ---------------------------------------------------------------------------
# DuckDB oracles — the fit unrolled as one CTE chain per merge round
# ---------------------------------------------------------------------------


def _bpe_ctes(table: str, merges: int, text_col: str) -> list[str]:
    ctes = [
        f"""w AS (
  SELECT w AS word, count(*) AS freq
  FROM (SELECT unnest(string_split({text_col}, ' ')) AS w FROM {table})
  WHERE w != '' GROUP BY w
),
r0 AS (
  SELECT word, freq, i - 1 AS pos, c[i] AS sym
  FROM (SELECT word, freq, string_split(word, '') AS c FROM w)
  CROSS JOIN LATERAL (SELECT unnest(range(1, len(c) + 1)) AS i) AS u(i)
)"""
    ]
    for t in range(1, merges + 1):
        prev = f"r{t - 1}"
        ctes.append(
            f"""n{t} AS (
  SELECT word, freq, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM {prev}
),
best{t} AS (
  SELECT sym AS pa, nxt AS pb, CAST(sum(freq) AS BIGINT) AS pcnt
  FROM n{t} WHERE nxt IS NOT NULL
  GROUP BY sym, nxt
  ORDER BY pcnt DESC, pa, pb LIMIT 1
),
m{t} AS (
  SELECT n.*, b.pa, b.pb,
         coalesce(n.sym = b.pa AND n.nxt = b.pb, false) AS is_m
  FROM n{t} n LEFT JOIN best{t} b ON true
),
s{t} AS (
  SELECT *,
         CASE WHEN is_m THEN pos - sum(CASE WHEN is_m THEN 1 ELSE 0 END)
              OVER (PARTITION BY word ORDER BY pos ROWS UNBOUNDED PRECEDING)
         END AS grp
  FROM m{t}
),
sel{t} AS (
  SELECT *,
         is_m AND ((pos - min(pos) OVER (PARTITION BY word, grp)) % 2 = 0)
           AS sel
  FROM s{t}
),
r{t} AS (
  SELECT word, freq,
         row_number() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
         CASE WHEN sel THEN pa || pb ELSE sym END AS sym
  FROM (SELECT *, lag(sel) OVER (PARTITION BY word ORDER BY pos)
                    AS drop_prev
        FROM sel{t})
  WHERE NOT coalesce(drop_prev, false)
)"""
        )
    return ctes


def bpe_merges_sql(
    table: str = "documents", merges: int = 5, text_col: str = "text"
) -> str:
    """DuckDB oracle for :func:`bpe_merges`."""
    ctes = _bpe_ctes(table, merges, text_col)
    steps = "\nUNION ALL\n".join(
        f"SELECT {t} AS step, pa AS left_sym, pb AS right_sym, "
        f"pa || pb AS merged, pcnt AS pair_count FROM best{t}"
        for t in range(1, merges + 1)
    )
    return f"WITH {', '.join(ctes)}\n{steps}"


def bpe_token_counts_sql(
    table: str = "documents",
    merges: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`bpe_token_counts`."""
    ctes = _bpe_ctes(table, merges, text_col)
    return f"""
WITH {', '.join(ctes)},
wlen AS (SELECT word, count(*) AS n_sym FROM r{merges} GROUP BY word),
occ AS (
  SELECT {id_col} AS id, w AS word
  FROM (SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS w
        FROM {table})
  WHERE w != ''
)
SELECT id AS {id_col}, CAST(sum(n_sym) AS BIGINT) AS n_tokens
FROM occ JOIN wlen USING (word)
GROUP BY id
""".strip()
