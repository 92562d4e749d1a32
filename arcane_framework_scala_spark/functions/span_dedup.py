"""Span-level exact-substring deduplication (duplicated n-gram spans).

Document-level dedup (exact/MinHash/SimHash in :mod:`.dedup`) removes whole
near-identical documents, but web-scale training corpora are dominated by
*partial* duplication — boilerplate headers, license blocks, quoted
passages — that document-level similarity never reaches. The remedy in the
training-data literature (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better", which removes duplicated 50-token substrings
found via a suffix array) is substring-level: find token spans that occur
in more than one document and mask or drop just those spans.

A suffix array is a single-machine construction; the Spark-native
equivalent used here is the duplicated-n-gram formulation: a span is
duplicated iff every length-``n`` token window inside it occurs in ≥
``min_docs`` documents, so marking all positions whose n-gram is non-unique
and merging overlapping windows recovers maximal duplicated spans ≥ n
tokens. That turns the problem into exactly the shapes Spark executes well:

1. one ``explode`` of per-position n-gram hashes (rows ≈ total tokens);
2. one groupBy on the gram hash (md5-derived → uniform, skew-free;
   partial aggregation runs map-side) to find grams in ≥ ``min_docs`` docs;
3. one hash join back to positions (bounded: output ≤ positions);
4. per-document interval merge via window functions (classic
   gaps-and-islands: new-span flag → running sum → span groupBy), one
   shuffle on the document id.

Nothing is quadratic in the corpus and no driver materialization occurs;
at 100 TB the only adjustment worth making is swapping the md5 hex string
for ``xxhash64`` (8-byte shuffle keys instead of 32-char strings) — md5 is
kept here because the DuckDB oracle computes the identical digest, making
the operator value-hash checkable end-to-end.

No reference parity: the reference engine (file-level CDC,
``services/streaming/*``) has no substring operator family; this module is
part of the beyond-reference LLM-pipeline surface (SURVEY §7.2 item 11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

#: Tokenization shared by both engines: lowercase, trim, split on runs of
#: whitespace. Kept deliberately trivial — span dedup operates on token
#: *positions*, so any deterministic tokenizer works as long as the Spark
#: and oracle sides agree.
_TOKEN_SPLIT = r"\s+"


def _tokenized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT).alias("__toks"),
    ).withColumn("__total", F.size("__toks"))


def _position_grams(toks: DataFrame, id_col: str, n: int) -> DataFrame:
    """(id, __total, pos, gram-md5) for every n-gram start position."""
    positions = F.when(
        F.col("__total") >= n, F.sequence(F.lit(0), F.col("__total") - n)
    ).otherwise(F.array().cast("array<int>"))
    return (
        toks.withColumn("pos", F.explode(positions))
        .withColumn(
            "gram",
            F.md5(F.array_join(F.slice("__toks", F.col("pos") + 1, n), " ")),
        )
        .select(id_col, "__total", "pos", "gram")
    )


def duplicated_ngram_span_intervals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Output ``(id, span_start, span_end)`` with token-index half-open
    intervals ``[span_start, span_end)``: every length-``n`` window inside
    the span occurs in ≥ ``min_docs`` distinct documents. This is the
    masking input for substring-level corpus cleaning (cut the span,
    keep the rest of the document).
    """
    dpos = _dup_positions(df, text_col, id_col, n, min_docs)
    return _merged_spans(dpos, id_col, n).select(id_col, "span_start", "span_end")


def _dup_positions(
    df: DataFrame, text_col: str, id_col: str, n: int, min_docs: int
) -> DataFrame:
    """(id, __total, pos) for every position whose n-gram occurs in ≥
    ``min_docs`` documents."""
    pg = _position_grams(_tokenized(df, text_col, id_col), id_col, n)
    # pg feeds BOTH the gram-frequency aggregation and the join probe; the
    # explicit repartition gives the two subtrees one shared exchange
    # (ReusedExchange), so the explode+md5 pipeline — the expensive part —
    # runs once (same trick as dedup.minhash_candidate_pairs)
    pg = pg.repartition("gram")
    dup_grams = (
        pg.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("__ndocs"))
        .filter(F.col("__ndocs") >= min_docs)
        .select("gram")
    )
    return pg.join(dup_grams, "gram").select(id_col, "__total", "pos")


def _merged_spans(dpos: DataFrame, id_col: str, n: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated [pos, pos+n) windows: a window
    starting at or before the running max end extends the current span
    (pos == end means contiguous token coverage — still one span)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    numbered = dpos.withColumn(
        "__new", F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0)
    ).withColumn(
        "__span", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return numbered.groupBy(id_col, "__total", "__span").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + n).alias("span_end"),
    )


def duplicated_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-span statistics (the corpus health report).

    Output, one row per input document (zero-filled when nothing is
    duplicated): ``(id, total_tokens, dup_tokens, n_spans,
    dup_ratio_milli)`` — ``dup_tokens`` counts tokens covered by merged
    duplicated spans, ``dup_ratio_milli`` is ``dup_tokens*1000 div
    total_tokens``. All-integer output → exact oracle hash parity.
    """
    toks = _tokenized(df, text_col, id_col)
    dpos = _dup_positions(df, text_col, id_col, n, min_docs)
    spans = _merged_spans(dpos, id_col, n).select(
        id_col, (F.col("span_end") - F.col("span_start")).alias("__len")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.sum("__len").alias("dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    return (
        toks.select(id_col, F.col("__total").cast("long").alias("total_tokens"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "total_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.when(
                F.col("total_tokens") > 0,
                F.expr("coalesce(dup_tokens, 0) * 1000 div total_tokens"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dup_ratio_milli"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """The masking step: rebuild each document's text WITHOUT its
    duplicated spans — what a substring-dedup pipeline actually writes
    back to the corpus (Lee et al. cut the duplicated span and keep the
    remainder).

    Output ``(id, clean_text, kept_tokens, removed_tokens)``; a fully
    duplicated document yields empty text, never a dropped row.
    Shapes: posexplode tokens (linear), anti-join on covered positions
    (uniform (id, pos) keys), one doc-keyed groupBy whose order is made
    deterministic by sorting the (pos, token) structs — no window sort
    and no assumption about collect_list ordering."""
    toks = _tokenized(df, text_col, id_col)
    pos_tok = toks.select(
        F.col(id_col), F.posexplode("__toks").alias("pos", "tok")
    )
    covered = duplicated_ngram_span_intervals(
        df, text_col, id_col, n, min_docs
    ).select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end") - 1)
        ).alias("pos"),
    )
    kept = pos_tok.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("kept_tokens"),
    )
    return (
        toks.select(id_col, F.col("__total").cast("long").alias("__t"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
            (F.col("__t") - F.coalesce("kept_tokens", F.lit(0)))
            .cast("long")
            .alias("removed_tokens"),
        )
    )


def remove_duplicated_spans_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`remove_duplicated_spans`."""
    return f"""
WITH docs AS (
  SELECT {id_col} AS id,
         regexp_split_to_array(lower(trim({text_col})), '{_TOKEN_SPLIT}') AS t
  FROM {table}
), sized AS (
  SELECT id, t, len(t) AS total FROM docs
), pg AS (
  SELECT id, total, CAST(u.pos AS BIGINT) AS pos,
         md5(array_to_string(t[u.pos + 1 : u.pos + {n}], ' ')) AS gram
  FROM sized, UNNEST(
    CASE WHEN total >= {n} THEN range(0, total - {n} + 1) ELSE [] END
  ) AS u(pos)
), dupg AS (
  SELECT gram FROM pg GROUP BY gram HAVING count(DISTINCT id) >= {min_docs}
), dpos AS (
  SELECT id, total, pos FROM pg JOIN dupg USING (gram)
), flagged AS (
  SELECT id, pos,
         CASE WHEN pos > coalesce(
            max(pos + {n}) OVER (PARTITION BY id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         THEN 1 ELSE 0 END AS new_span
  FROM dpos
), numbered AS (
  SELECT id, pos,
         sum(new_span) OVER (PARTITION BY id ORDER BY pos
             ROWS UNBOUNDED PRECEDING) AS span_id
  FROM flagged
), spans AS (
  SELECT id, min(pos) AS span_start, max(pos) + {n} AS span_end
  FROM numbered GROUP BY id, span_id
), covered AS (
  SELECT DISTINCT id, CAST(u.pos AS BIGINT) AS pos
  FROM spans, UNNEST(range(span_start, span_end)) AS u(pos)
), pos_tok AS (
  SELECT id, CAST(u.pos AS BIGINT) AS pos, t[u.pos + 1] AS tok
  FROM sized, UNNEST(range(0, total)) AS u(pos)
), kept AS (
  SELECT p.id, p.pos, p.tok FROM pos_tok p
  ANTI JOIN covered c ON c.id = p.id AND c.pos = p.pos
), rebuilt AS (
  SELECT id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS kept_tokens
  FROM kept GROUP BY id
)
SELECT s.id AS {id_col},
       coalesce(r.clean_text, '') AS clean_text,
       coalesce(r.kept_tokens, 0) AS kept_tokens,
       CAST(s.total - coalesce(r.kept_tokens, 0) AS BIGINT) AS removed_tokens
FROM sized s LEFT JOIN rebuilt r ON r.id = s.id
"""


def duplicated_ngram_spans_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`duplicated_ngram_spans` (identical tokenizer,
    identical md5 gram keys, identical interval merge)."""
    return f"""
WITH docs AS (
  SELECT {id_col} AS id,
         regexp_split_to_array(lower(trim({text_col})), '{_TOKEN_SPLIT}') AS t
  FROM {table}
), sized AS (
  SELECT id, t, len(t) AS total FROM docs
), pg AS (
  SELECT id, total, CAST(u.pos AS BIGINT) AS pos,
         md5(array_to_string(t[u.pos + 1 : u.pos + {n}], ' ')) AS gram
  FROM sized, UNNEST(
    CASE WHEN total >= {n} THEN range(0, total - {n} + 1) ELSE [] END
  ) AS u(pos)
), dupg AS (
  SELECT gram FROM pg GROUP BY gram HAVING count(DISTINCT id) >= {min_docs}
), dpos AS (
  SELECT id, total, pos FROM pg JOIN dupg USING (gram)
), flagged AS (
  SELECT id, total, pos,
         CASE WHEN pos > coalesce(
            max(pos + {n}) OVER (PARTITION BY id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         THEN 1 ELSE 0 END AS new_span
  FROM dpos
), numbered AS (
  SELECT id, total, pos,
         sum(new_span) OVER (PARTITION BY id ORDER BY pos
             ROWS UNBOUNDED PRECEDING) AS span_id
  FROM flagged
), spans AS (
  SELECT id, total, span_id, max(pos) + {n} - min(pos) AS span_len
  FROM numbered GROUP BY id, total, span_id
), per_doc AS (
  SELECT id, CAST(sum(span_len) AS BIGINT) AS dup_tokens,
         CAST(count(*) AS BIGINT) AS n_spans
  FROM spans GROUP BY id
)
SELECT s.id AS {id_col}, CAST(s.total AS BIGINT) AS total_tokens,
       coalesce(p.dup_tokens, 0) AS dup_tokens,
       coalesce(p.n_spans, 0) AS n_spans,
       CASE WHEN s.total > 0
            THEN coalesce(p.dup_tokens, 0) * 1000 // s.total
            ELSE 0 END AS dup_ratio_milli
FROM sized s LEFT JOIN per_doc p ON p.id = s.id
"""
