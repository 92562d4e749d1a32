"""TF-IDF weighted lexical similarity (sparse-vector rerank stage).

The dense-embedding operators (:mod:`.similarity`) and set-overlap
operators (:mod:`.dedup`) leave one classic retrieval modality uncovered:
weighted lexical cosine — rare terms matter more than common ones. This
module scores document pairs by TF-IDF cosine, *composed* with a bounded
candidate generator (MinHash-LSH pairs, embedding buckets, …) rather than
generating pairs itself:

- Pair generation via shared terms degenerates on low-diversity corpora
  (a term shared by d docs contributes d²/2 pairs; with a small
  vocabulary that is corpus²/2 — the same blow-up
  :func:`.dedup.ngram_jaccard_pairs` documents). LSH candidate output is
  linear-ish and already bucket-bounded, so candidates-in/scores-out is
  the shape that survives 100 TB.
- Scoring a bounded pair set is two hash joins on (id, term) + one
  groupBy on the pair key — uniform keys, partial aggregation, no
  quadratic stage anywhere.

Determinism for oracle hashing: IDF is quantized to integer millis
immediately (``floor(1000·ln((N+1)/(df+1))) + 1000``, the smoothed IDF),
so term weights and dot products are exact int64 arithmetic in both
engines; only the final norm division is floating point (`sqrt`, `*`, `/`
are IEEE-correctly-rounded everywhere), and the result is floored to
integer micros.

Beyond-reference operator (SURVEY §7.2 item 11); no reference parity —
the reference has no text-scoring surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from arcane_framework_scala_spark.plans.materialize import materialize

_TOKEN_SPLIT = r"\s+"


def tfidf_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(doc, term) integer TF-IDF weights: ``(id, term, w)`` with
    ``w = tf · idf_milli`` (int64). One explode + two uniform groupBys
    (term counts, document frequencies); the corpus size joins in as a
    broadcast one-row aggregate — no driver round-trip."""
    terms = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT)
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    idf = docfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (
            F.floor(
                F.lit(1000.0)
                * F.log((F.col("__n") + 1) / (F.col("df_count") + 1))
            )
            + 1000
        ).alias("idf_milli"),
    )
    return tf.join(idf, "term").select(
        id_col, "term", (F.col("tf") * F.col("idf_milli")).alias("w")
    )


def tfidf_rerank(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_micro: int = 0,
) -> DataFrame:
    """Exact TF-IDF cosine for candidate pairs ``(id_a, id_b)``.

    Output ``(id_a, id_b, sim_micro)`` with ``sim_micro =
    floor(1e6 · dot / (‖a‖·‖b‖))`` — the rerank stage over any bounded
    candidate generator (MinHash-LSH, embedding LSH, a previous top-k)."""
    # the weight pipeline (explode + two keyed aggregations) feeds THREE
    # consumers (norms, side-A probe, side-B probe); per-consumer column
    # pruning makes the subtrees non-identical, so exchange reuse never
    # fires and the pipeline would run three times. materialize() runs it
    # exactly once; the per-(doc,term) weight table is far smaller than the
    # text it came from. Default strategy is localCheckpoint (fast, but
    # executor-loss-fragile — requires static allocation); set
    # spark.arcane.materialize.faultTolerant=true on long-running clusters
    # to use persist(MEMORY_AND_DISK) instead (plans/materialize.py).
    w = materialize(tfidf_weights(df, text_col, id_col))
    norms = w.groupBy(id_col).agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    wa = w.select(F.col(id_col).alias("id_a"), "term", F.col("w").alias("wa"))
    wb = w.select(F.col(id_col).alias("id_b"), "term", F.col("w").alias("wb"))
    dot = (
        candidates.join(wa, "id_a")
        .join(wb, ["id_b", "term"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("n2").alias("nb2"))
    return (
        dot.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.floor(
                F.lit(1_000_000.0)
                * F.col("dot")
                / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2")))
            )
            .cast("long")
            .alias("sim_micro"),
        )
        .filter(F.col("sim_micro") >= threshold_micro)
    )


def tfidf_rerank_sql(
    table: str,
    candidates_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_micro: int = 0,
) -> str:
    """DuckDB twin of :func:`tfidf_rerank`: identical tokenizer, identical
    integer-milli IDF quantization, identical floor-micro output.
    ``candidates_sql`` must yield columns ``id_a, id_b``."""
    return f"""
WITH terms AS (
  SELECT {id_col} AS id,
         unnest(regexp_split_to_array(lower(trim({text_col})), '{_TOKEN_SPLIT}')) AS term
  FROM {table}
), tf AS (
  SELECT id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY id, term
), docfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df_count FROM tf GROUP BY term
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM {table}
), idf AS (
  SELECT term,
         CAST(floor(1000.0 * ln((n_docs + 1) / CAST(df_count + 1 AS DOUBLE)))
              + 1000 AS BIGINT) AS idf_milli
  FROM docfreq, n
), w AS (
  SELECT tf.id, tf.term, tf.tf * idf.idf_milli AS w
  FROM tf JOIN idf USING (term)
), norms AS (
  SELECT id, CAST(sum(w * w) AS BIGINT) AS n2 FROM w GROUP BY id
), cand AS ({candidates_sql}
), dot AS (
  SELECT c.id_a, c.id_b, CAST(sum(a.w * b.w) AS BIGINT) AS dot
  FROM cand c
  JOIN w a ON a.id = c.id_a
  JOIN w b ON b.id = c.id_b AND b.term = a.term
  GROUP BY c.id_a, c.id_b
)
SELECT d.id_a, d.id_b,
       CAST(floor(1000000.0 * d.dot / (sqrt(na.n2) * sqrt(nb.n2))) AS BIGINT)
         AS sim_micro
FROM dot d
JOIN norms na ON na.id = d.id_a
JOIN norms nb ON nb.id = d.id_b
WHERE CAST(floor(1000000.0 * d.dot / (sqrt(na.n2) * sqrt(nb.n2))) AS BIGINT)
      >= {threshold_micro}
"""


def bm25_rerank(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1_milli: int = 1200,
    b_milli: int = 750,
) -> DataFrame:
    """Okapi BM25 for candidate pairs — the canonical lexical ranking
    function (Robertson & Zaragoza 2009), scored pairwise over a
    bounded candidate set exactly like :func:`tfidf_rerank` (same
    reasons: pair generation via shared terms blows up; candidates-in,
    scores-out survives 100 TB).

    ``score(a→b) = Σ_{t ∈ a∩b} idf_t · tf_bt·(k1+1) /
    (tf_bt + k1·(1 − b + b·len_b/avglen))`` with the standard smoothed
    ``idf = ln((N − df + 0.5)/(df + 0.5) + 1)``. Asymmetric (query side
    a, document side b) — both directions are emitted per input pair.

    Determinism: every per-term contribution is independently floored
    to integer micros BEFORE the sum, so the aggregation is an order-
    free int64 sum (the float expression per term is fixed-shape and
    IEEE-identical across engines; a float Σ would depend on row
    order). Output: ``(id_a, id_b, bm25_micro)`` = score of b against
    query a.

    Plan: the term table (explode + two keyed aggs) materializes once
    and feeds docfreq/length/probe consumers; scoring is two (id, term)
    hash joins + one pair-keyed integer aggregation."""
    terms = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT)
        ).alias("term"),
    )
    tf = materialize(
        terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    lens = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("dl").alias("__tot")
    )
    idf = docfreq.join(F.broadcast(stats)).select(
        "term",
        F.log(
            (F.col("__n") - F.col("df_count") + 0.5)
            / (F.col("df_count") + 0.5)
            + 1.0
        ).alias("idf"),
    )
    k1 = k1_milli / 1000.0
    b = b_milli / 1000.0
    # avglen as an exact float expression from the broadcast totals
    qa = tf.select(F.col(id_col).alias("id_a"), "term")
    db = (
        tf.select(F.col(id_col).alias("id_b"), "term", "tf")
        .join(lens.select(F.col(id_col).alias("id_b"), "dl"), "id_b")
    )
    contrib = (
        candidates.join(qa, "id_a")
        .join(db, ["id_b", "term"])
        .join(F.broadcast(idf), "term")
        .join(F.broadcast(stats))
        .select(
            "id_a",
            "id_b",
            F.floor(
                F.lit(1_000_000.0)
                * F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (
                        (1.0 - b)
                        + b
                        * F.col("dl")
                        / (F.col("__tot") / F.col("__n"))
                    )
                )
            )
            .cast("long")
            .alias("c_micro"),
        )
    )
    return contrib.groupBy("id_a", "id_b").agg(
        F.sum("c_micro").alias("bm25_micro")
    )


def bm25_rerank_sql(
    table: str,
    candidates_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1_milli: int = 1200,
    b_milli: int = 750,
) -> str:
    """DuckDB oracle for :func:`bm25_rerank` — identical fixed-shape
    float expression per term, floored to micros before the sum."""
    k1 = k1_milli / 1000.0
    b = b_milli / 1000.0
    return f"""
WITH cand AS MATERIALIZED ({candidates_sql}),
terms AS (
  SELECT {id_col} AS id,
         unnest(regexp_split_to_array(lower(trim({text_col})), '\\s+'))
           AS term
  FROM {table}
),
tf AS (SELECT id, term, count(*) AS tf FROM terms GROUP BY id, term),
docfreq AS (SELECT term, count(*) AS df_count FROM tf GROUP BY term),
lens AS (SELECT id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY id),
stats AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM lens),
idf AS (
  SELECT term,
         ln((s.n - df_count + 0.5) / (df_count + 0.5) + 1.0) AS idf
  FROM docfreq, stats s
),
contrib AS (
  SELECT c.id_a, c.id_b,
         CAST(floor(1000000.0 * i.idf * (tb.tf * ({k1} + 1.0)) /
              (tb.tf + {k1} * ((1.0 - {b}) + {b} * lb.dl /
               (CAST(s.tot AS DOUBLE) / s.n)))) AS BIGINT) AS c_micro
  FROM cand c
  JOIN tf ta ON ta.id = c.id_a
  JOIN tf tb ON tb.id = c.id_b AND tb.term = ta.term
  JOIN lens lb ON lb.id = c.id_b
  JOIN idf i ON i.term = ta.term
  CROSS JOIN stats s
)
SELECT id_a, id_b, CAST(sum(c_micro) AS BIGINT) AS bm25_micro
FROM contrib GROUP BY id_a, id_b
""".strip()
