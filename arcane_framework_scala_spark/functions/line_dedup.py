"""Corpus-level line deduplication (RefinedWeb §"line-wise corrections",
CCNet paragraph dedup): lines that recur across many documents are
boilerplate (headers, license blocks, navigation chrome) and get removed
from every document that carries them.

Beyond-reference surface (the reference at /root/reference is a CDC
framework). The operator works on an explicit ``lines`` array column so
real newline-delimited corpora pass ``F.split(text, '\\n')``; the driver
gates chunk the synthetic space-separated test documents into fixed-width
token pseudo-lines via :func:`chunk_lines` (the test tables carry no
newlines — the algebra under test is the corpus-wide dedup, which is
line-content agnostic).

Scale posture (100 TB): explode is narrow; the only shuffles are (1) the
line-frequency aggregation — map-side partial combine collapses repeated
boilerplate before it moves, exactly the skew that motivates the operator
— and (2) the per-document reassembly groupBy. The join of exploded lines
against the duplicated-line set is a hash join on the line string; the
duplicated set is typically tiny (boilerplate) and AQE will broadcast it.
Reassembly sorts each doc's surviving (pos, line) structs with
``array_sort`` — per-row, no window, no collect_list-order assumption.

Determinism: counts are exact integers; dup share uses the repo's fixed
ppm convention (``1_000_000 * dup // total``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions._parallel import (
    spread_for_compute as _spread,
)

_PPM = 1_000_000


def chunk_lines(
    df: DataFrame,
    text_col: str = "text",
    width: int = 3,
) -> DataFrame:
    """Append ``lines: array<string>`` — consecutive ``width``-token
    chunks of the whitespace-tokenized text (pseudo-lines for corpora
    without newlines; the final chunk may be shorter). NULL text yields
    NULL lines; '' yields the single line '' (split('', ' ') is [''])."""
    # hoist the tokenizer OUT of the chunk lambda: higher-order lambdas
    # are interpreted per element with no loop-invariant hoisting, so an
    # inline split() would re-tokenize the whole document once per chunk
    # — O(lines x tokens) work instead of O(tokens) (same trap as
    # :func:`..dedup.char_shingles`; measured ~40% off the clean query
    # at sf0.1, bit-identical output)
    tok = f"__cl_w_{width}"
    lines = F.expr(
        f"transform(sequence(1, cast(ceil(size({tok}) / {width}.0) as int)), "
        f"i -> concat_ws(' ', slice({tok}, (i - 1) * {width} + 1, {width})))"
    )
    return (
        df.withColumn(tok, F.expr(f"split({text_col}, ' ')"))
        .withColumn("lines", lines)
        .drop(tok)
    )


def chunk_lines_sql_cte(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 3,
) -> str:
    """DuckDB CTE body producing the exploded ``(id, pos, line)`` rows of
    :func:`chunk_lines` + ``posexplode`` (pos is 0-based)."""
    return f"""
w AS (SELECT {id_col} AS id, string_split({text_col}, ' ') AS w FROM {table}),
l AS (
  SELECT id, i - 1 AS pos,
         array_to_string(w[(i - 1) * {width} + 1 : (i - 1) * {width} + {width}], ' ') AS line
  FROM w
  CROSS JOIN LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) AS u(i)
  WHERE (i - 1) * {width} < len(w)
)
""".strip()


def _exploded(df: DataFrame, lines_col: str, id_col: str) -> DataFrame:
    return _spread(df.select(F.col(id_col).alias("id"), F.col(lines_col))).select(
        "id", F.posexplode(F.col(lines_col)).alias("pos", "line")
    )


def line_frequencies(
    df: DataFrame, lines_col: str = "lines", id_col: str = "doc_id"
) -> DataFrame:
    """``(line, n_docs)`` — in how many distinct documents each line
    occurs. One shuffle, map-side combined."""
    return (
        _exploded(df, lines_col, id_col)
        .groupBy("line")
        .agg(F.countDistinct("id").alias("n_docs"))
    )


def line_dedup_stats(
    df: DataFrame,
    lines_col: str = "lines",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Per-document boilerplate profile: ``(id_col, n_lines, dup_lines,
    dup_line_ppm)`` where a line is *duplicated* when it occurs in at
    least ``min_docs`` distinct documents."""
    ex = _exploded(df, lines_col, id_col)
    freq = line_frequencies(df, lines_col, id_col)
    joined = ex.join(freq, "line")
    agg = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.coalesce(
            F.sum(F.when(F.col("n_docs") >= min_docs, F.lit(1))), F.lit(0)
        ).alias("dup_lines"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        "n_lines",
        F.col("dup_lines").cast("long").alias("dup_lines"),
        F.expr(f"({_PPM} * dup_lines) div n_lines").alias("dup_line_ppm"),
    )


def line_dedup_clean(
    df: DataFrame,
    lines_col: str = "lines",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = " ",
    out_col: str = "clean_text",
) -> DataFrame:
    """Rebuild each document without its corpus-duplicated lines.

    Documents whose every line is boilerplate survive with ``out_col``
    = '' (left join back to the id set), so row count is preserved.
    """
    ex = _exploded(df, lines_col, id_col)
    freq = line_frequencies(df, lines_col, id_col)
    kept = ex.join(freq, "line").filter(F.col("n_docs") < min_docs)
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias(out_col)
    )
    ids = df.select(F.col(id_col).alias("id"))
    return (
        ids.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
        )
    )


def line_dedup_stats_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 3,
    min_docs: int = 2,
) -> str:
    """DuckDB oracle for :func:`chunk_lines` + :func:`line_dedup_stats`."""
    return f"""
WITH {chunk_lines_sql_cte(table, text_col, id_col, width)},
c AS (SELECT line, count(DISTINCT id) AS n_docs FROM l GROUP BY 1)
SELECT l.id AS {id_col},
       count(*) AS n_lines,
       CAST(coalesce(sum(CASE WHEN c.n_docs >= {min_docs} THEN 1 END), 0) AS BIGINT) AS dup_lines,
       ({_PPM} * CAST(coalesce(sum(CASE WHEN c.n_docs >= {min_docs} THEN 1 END), 0) AS BIGINT)) // count(*) AS dup_line_ppm
FROM l JOIN c USING (line)
GROUP BY 1
""".strip()


def line_dedup_clean_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 3,
    min_docs: int = 2,
    sep: str = " ",
) -> str:
    """DuckDB oracle for :func:`chunk_lines` + :func:`line_dedup_clean`."""
    return f"""
WITH {chunk_lines_sql_cte(table, text_col, id_col, width)},
c AS (SELECT line, count(DISTINCT id) AS n_docs FROM l GROUP BY 1),
kept AS (
  SELECT l.id, l.pos, l.line FROM l JOIN c USING (line)
  WHERE c.n_docs < {min_docs}
),
rebuilt AS (
  SELECT id, string_agg(line, '{sep}' ORDER BY pos) AS clean_text
  FROM kept GROUP BY id
)
SELECT d.{id_col} AS {id_col}, coalesce(r.clean_text, '') AS clean_text
FROM {table} d LEFT JOIN rebuilt r ON r.id = d.{id_col}
""".strip()
