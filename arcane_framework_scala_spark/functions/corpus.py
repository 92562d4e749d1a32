"""Corpus-curation operators for large-scale training-data pipelines.

Beyond-reference surface (same family as :mod:`functions.text` /
:mod:`functions.dedup`): the filters a 100 TB pre-training corpus needs
between raw scrape and tokenizer —

- **repetition_metrics** — Gopher-style within-document repetition
  signals (duplicate-word fraction, top-2/3-gram fraction, duplicated
  5-gram fraction; Rae et al. 2021 §A1.1) used to drop degenerate/looping
  documents.
- **contamination** — GPT-3-style benchmark decontamination (Brown et
  al. 2020 §C): flag corpus documents sharing any word n-gram with a
  held-out benchmark set.
- **hash_split** — deterministic, shuffle-free train/val/test assignment
  by stable key hash; reproducible across runs and engines.
- **pii_redact** — regex scrubbing of emails / phone numbers / IPv4
  addresses with per-pattern hit counts.

Everything is JVM-side ``pyspark.sql.functions`` expressions — no Python
UDFs — so plans stay inside whole-stage codegen. Each operator has a
matching DuckDB SQL generator computing identical values (the oracle
gate). Ratios are reported as exact integer parts-per-million
(``(1e6 * num) div den``) so float formatting can never diverge between
engines.

Scale notes (100 TB posture):
- ``repetition_metrics`` is explode → two keyed aggregations. The first
  groupBy key is (doc, n, gram) — hash-uniform, no skew — and map-side
  partial aggregation collapses each document's grams within a partition
  before the shuffle, so shuffled bytes ≈ distinct grams, not token
  count. Per-doc n-gram distincting never materializes a per-doc map.
- ``contamination`` broadcasts the benchmark side (eval suites are MBs);
  the corpus side streams through a broadcast-hash join and one keyed
  aggregation. ``array_distinct`` inside the projection keeps per-doc
  duplicate grams out of the join entirely.
- ``hash_split`` / ``pii_redact`` are pure narrow projections — zero
  shuffles at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions._parallel import (
    spread_for_compute as _spread,
)

_PPM = 1_000_000

# ---------------------------------------------------------------------------
# Repetition metrics (Gopher §A1.1 flavor)
# ---------------------------------------------------------------------------

_REP_NS = (1, 2, 3, 5)


def _gram_structs(n: int) -> Column:
    """array<struct<n,g>> of the document's word n-grams (``w`` bound)."""
    body = F.expr(
        f"transform(sequence(1, greatest(size(w) - {n - 1}, 1)), "
        f"i -> struct({n} as n, concat_ws(' ', slice(w, i, {n})) as g))"
    )
    empty = F.expr("array()").cast("array<struct<n:int,g:string>>")
    return F.when(F.size(F.col("w")) >= n, body).otherwise(empty)


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals as exact integer ppm.

    Output: ``(id_col, words, dup_word_ppm, top_2gram_ppm, top_3gram_ppm,
    dup_5gram_ppm)``. ``dup_word_ppm`` = fraction of word occurrences that
    are repeats; ``top_kgram_ppm`` = share of the single most frequent
    k-gram; ``dup_5gram_ppm`` = share of 5-gram occurrences appearing more
    than once. Documents shorter than k words report 0 for that metric.
    """
    base = _spread(
        df.select(
            F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("w")
        )
    )
    grams = F.flatten(F.array(*[_gram_structs(n) for n in _REP_NS]))
    exploded = base.select("id", F.explode(grams).alias("x")).select(
        "id", F.col("x.n").alias("n"), F.col("x.g").alias("g")
    )
    counts = exploded.groupBy("id", "n", "g").agg(F.count(F.lit(1)).alias("cnt"))
    # One fused per-doc aggregation over the (id, n, gram) counts: the
    # per-n rollup and the per-doc pivot collapse into conditional
    # aggregates, so the whole operator is exactly two shuffles (gram
    # counts, then ~1 partial row per doc per partition).
    n_is = lambda n: F.col("n") == n  # noqa: E731

    agg = counts.groupBy("id").agg(
        F.sum(F.when(n_is(1), F.col("cnt"))).alias("w_total"),
        F.count(F.when(n_is(1), F.lit(1))).alias("w_nd"),
        F.max(F.when(n_is(2), F.col("cnt"))).alias("g2_mx"),
        F.sum(F.when(n_is(2), F.col("cnt"))).alias("g2_total"),
        F.max(F.when(n_is(3), F.col("cnt"))).alias("g3_mx"),
        F.sum(F.when(n_is(3), F.col("cnt"))).alias("g3_total"),
        F.coalesce(
            F.sum(F.when(n_is(5) & (F.col("cnt") > 1), F.col("cnt"))), F.lit(0)
        ).alias("g5_dup"),
        F.sum(F.when(n_is(5), F.col("cnt"))).alias("g5_total"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        F.col("w_total").alias("words"),
        F.expr(f"({_PPM} * (w_total - w_nd)) div w_total").alias("dup_word_ppm"),
        F.expr(f"coalesce(({_PPM} * g2_mx) div g2_total, 0)").alias(
            "top_2gram_ppm"
        ),
        F.expr(f"coalesce(({_PPM} * g3_mx) div g3_total, 0)").alias(
            "top_3gram_ppm"
        ),
        F.expr(f"coalesce(({_PPM} * g5_dup) div g5_total, 0)").alias(
            "dup_5gram_ppm"
        ),
    )


def repetition_metrics_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB oracle computing the identical ppm values."""
    ns = ", ".join(f"({n})" for n in _REP_NS)
    return f"""
WITH w AS (SELECT {id_col} AS id, string_split({text_col}, ' ') AS w FROM {table}),
g AS (
  SELECT id, n, array_to_string(w[i:i+n-1], ' ') AS g
  FROM w
  CROSS JOIN LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) AS u(i)
  CROSS JOIN (VALUES {ns}) AS t(n)
  WHERE i <= len(w) - n + 1
),
c AS (SELECT id, n, g, count(*) AS cnt FROM g GROUP BY ALL),
p AS (
  -- CAST: DuckDB sum() yields HUGEINT, which pandas/Arrow turns into
  -- float64 and the driver's value hash then diverges on formatting
  SELECT id, n, CAST(sum(cnt) AS BIGINT) AS total, max(cnt) AS mx,
         count(*) AS nd,
         CAST(coalesce(sum(cnt) FILTER (WHERE cnt > 1), 0) AS BIGINT) AS dup
  FROM c GROUP BY ALL
),
a AS (
  SELECT id,
    max(CASE WHEN n = 1 THEN total END) AS w_total,
    max(CASE WHEN n = 1 THEN nd END) AS w_nd,
    max(CASE WHEN n = 2 THEN mx END) AS g2_mx,
    max(CASE WHEN n = 2 THEN total END) AS g2_total,
    max(CASE WHEN n = 3 THEN mx END) AS g3_mx,
    max(CASE WHEN n = 3 THEN total END) AS g3_total,
    max(CASE WHEN n = 5 THEN dup END) AS g5_dup,
    max(CASE WHEN n = 5 THEN total END) AS g5_total
  FROM p GROUP BY id
)
SELECT id AS {id_col},
  w_total AS words,
  ({_PPM} * (w_total - w_nd)) // w_total AS dup_word_ppm,
  coalesce(({_PPM} * g2_mx) // g2_total, 0) AS top_2gram_ppm,
  coalesce(({_PPM} * g3_mx) // g3_total, 0) AS top_3gram_ppm,
  coalesce(({_PPM} * g5_dup) // g5_total, 0) AS dup_5gram_ppm
FROM a
""".strip()


# ---------------------------------------------------------------------------
# Benchmark contamination (GPT-3 §C flavor)
# ---------------------------------------------------------------------------


def _distinct_grams(
    df: DataFrame, id_col: str, text_col: str, n: int, out_id: str
) -> DataFrame:
    """(out_id, g): each document's DISTINCT word n-grams. Distincting via
    ``array_distinct`` inside the projection — no extra shuffle."""
    w = F.split(F.col(text_col), " ")
    grams = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(w) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(w, i, {n}))))"
    )
    return (
        df.select(F.col(id_col).alias(out_id), w.alias("w"))
        .filter(F.size("w") >= n)
        .select(out_id, F.explode(grams).alias("g"))
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Corpus documents sharing ≥1 word ``n``-gram with the benchmark set.

    Output: ``(id_col, hit_grams, bench_docs)`` — distinct shared grams
    and distinct benchmark documents hit. The benchmark side (eval
    suites: MBs, not TBs) is broadcast; the corpus never shuffles for the
    join, only for the final per-doc aggregation.
    """
    c = _distinct_grams(_spread(corpus), id_col, text_col, n, "id")
    b = _distinct_grams(benchmark, id_col, text_col, n, "bench_id")
    return (
        c.join(F.broadcast(b), "g")
        .groupBy("id")
        .agg(
            F.countDistinct("g").alias("hit_grams"),
            F.countDistinct("bench_id").alias("bench_docs"),
        )
        .withColumnRenamed("id", id_col)
    )


def contamination_sql(
    corpus_pred: str,
    bench_pred: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> str:
    grams = f"""
  SELECT DISTINCT {id_col} AS id, array_to_string(w[i:i+{n - 1}], ' ') AS g
  FROM (SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table} WHERE {{pred}})
  CROSS JOIN LATERAL (SELECT unnest(range(1, len(w) - {n} + 2)) AS i) AS u(i)
"""
    return f"""
WITH cg AS ({grams.format(pred=corpus_pred)}),
bg AS ({grams.format(pred=bench_pred)})
SELECT cg.id AS {id_col},
       count(DISTINCT cg.g) AS hit_grams,
       count(DISTINCT bg.id) AS bench_docs
FROM cg JOIN bg USING (g)
GROUP BY cg.id
""".strip()


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    buckets: int = 1000,
    cuts: tuple[tuple[str, int], ...] = (("train", 800), ("val", 900), ("test", 1000)),
) -> DataFrame:
    """Stable split assignment: md5(key) → bucket in [0, buckets) →
    first label whose cumulative cut exceeds the bucket. Engine- and
    run-independent (pure key hash, no RNG, no shuffle); the same id_col
    value lands in the same split forever — the property a training
    pipeline needs so val/test never leak into train across re-runs.
    """
    b = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % buckets
    )
    expr = None
    for name, cut in cuts:
        expr = (
            F.when(b < cut, F.lit(name))
            if expr is None
            else expr.when(b < cut, F.lit(name))
        )
    return df.select(
        F.col(id_col), b.alias("bucket"), expr.otherwise(F.lit(None)).alias("split")
    )


def hash_split_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    buckets: int = 1000,
    cuts: tuple[tuple[str, int], ...] = (("train", 800), ("val", 900), ("test", 1000)),
) -> str:
    b = (
        f"CAST(concat('0x', substr(md5(CAST({id_col} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {buckets}"
    )
    whens = " ".join(f"WHEN {b} < {cut} THEN '{name}'" for name, cut in cuts)
    return (
        f"SELECT {id_col}, {b} AS bucket, CASE {whens} END AS split FROM {table}"
    )


def cluster_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    buckets: int = 1000,
    cuts: tuple[tuple[str, int], ...] = (("train", 800), ("val", 900), ("test", 1000)),
) -> DataFrame:
    """Leakage-proof split: hash the near-dup *cluster representative*
    instead of the document id, so every member of a near-duplicate
    cluster lands in the same split — the guard against test-set
    contamination via near-dups that a plain :func:`hash_split` cannot
    give (Lee et al. 2022 §4.2 measure exactly this leak).

    ``clusters`` is ``(id_col, cluster_col)`` from
    ``dedup.dedup_clusters``; unclustered documents key on their own
    id. Output: ``(id_col, split_key, bucket, split)``.

    Plan: one left join (clusters output is the small side only when
    near-dups are rare — it shuffles on the id either way, the same
    key as the cluster computation that produced it) + the zero-shuffle
    hash projection."""
    key = F.coalesce(F.col(cluster_col), F.col(id_col)).alias("split_key")
    b = (
        F.conv(F.substring(F.md5(F.col("split_key").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % buckets
    )
    expr = None
    for name, cut in cuts:
        expr = (
            F.when(b < cut, F.lit(name))
            if expr is None
            else expr.when(b < cut, F.lit(name))
        )
    return (
        df.select(id_col)
        .join(clusters.select(id_col, cluster_col), id_col, "left")
        .select(F.col(id_col), key)
        .select(
            id_col,
            "split_key",
            b.alias("bucket"),
            expr.otherwise(F.lit(None)).alias("split"),
        )
    )


def cluster_safe_split_sql(
    table: str,
    clusters_sql: str,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    buckets: int = 1000,
    cuts: tuple[tuple[str, int], ...] = (("train", 800), ("val", 900), ("test", 1000)),
) -> str:
    """DuckDB oracle for :func:`cluster_safe_split`."""
    b = (
        f"CAST(concat('0x', substr(md5(CAST(split_key AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {buckets}"
    )
    whens = " ".join(f"WHEN {b} < {cut} THEN '{name}'" for name, cut in cuts)
    return f"""
WITH clusters AS MATERIALIZED ({clusters_sql}),
keyed AS (
  SELECT t.{id_col}, coalesce(c.{cluster_col}, t.{id_col}) AS split_key
  FROM {table} t LEFT JOIN clusters c ON t.{id_col} = c.{id_col}
)
SELECT {id_col}, split_key, {b} AS bucket,
       CASE {whens} END AS split
FROM keyed
""".strip()


def contrastive_negatives(
    df: DataFrame,
    clusters: DataFrame | None = None,
    k: int = 4,
    oversample: int = 10,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training data:
    for every anchor document, ``k`` pseudo-random corpus negatives —
    md5-derived (no RNG; same pairs every run/engine), excluding the
    anchor itself and, when ``clusters`` (``dedup.dedup_clusters``
    output) is given, anything in the anchor's near-dup cluster (a
    near-duplicate is a *false* negative — training on it teaches the
    model to push duplicates apart).

    Mechanics: ``oversample·k`` candidate slots per anchor, candidate
    ``j`` = ``md5(anchor#j) mod n_docs`` (ids assumed dense 0..n-1, the
    corpus-table contract); slots that hit the anchor/cluster or repeat
    an earlier candidate are dropped; the first ``k`` surviving slots
    (by slot order) are the sample. Output:
    ``(id_col, rank, neg_id)`` — ≤ k rows per anchor (exactly k unless
    the exclusion zone ate the oversample, which the oversample factor
    makes vanishingly rare).

    Plan: a ×(oversample·k) narrow explode, two broadcast-size hash
    joins against the cluster map, two windows keyed on the anchor —
    no corpus self-join anywhere."""
    n = df.select(F.count(F.lit(1)).alias("__n"))
    cand = (
        df.select(F.col(id_col).alias("anchor"))
        .join(F.broadcast(n))
        .select(
            "anchor",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(oversample * k - 1)),
                    lambda j: F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("anchor").cast("string"),
                                    F.lit("#"),
                                    j.cast("string"),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.col("__n"),
                )
            ).alias("j", "neg_id"),
        )
        .filter(F.col("neg_id") != F.col("anchor"))
    )
    if clusters is not None:
        ca = clusters.select(
            F.col(id_col).alias("anchor"), F.col(cluster_col).alias("__ca")
        )
        cn = clusters.select(
            F.col(id_col).alias("neg_id"), F.col(cluster_col).alias("__cn")
        )
        cand = (
            cand.join(ca, "anchor", "left")
            .join(cn, "neg_id", "left")
            .filter(
                F.col("__ca").isNull()
                | F.col("__cn").isNull()
                | (F.col("__ca") != F.col("__cn"))
            )
            .drop("__ca", "__cn")
        )
    wdup = Window.partitionBy("anchor", "neg_id").orderBy("j")
    wrank = Window.partitionBy("anchor").orderBy("j")
    return (
        cand.withColumn("__first", F.row_number().over(wdup))
        .filter(F.col("__first") == 1)
        .withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= k)
        .select(F.col("anchor").alias(id_col), "rank", "neg_id")
    )


def contrastive_negatives_sql(
    table: str,
    clusters_sql: str | None = None,
    k: int = 4,
    oversample: int = 10,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> str:
    """DuckDB oracle for :func:`contrastive_negatives`."""
    neg = (
        f"CAST(concat('0x', substr(md5(CAST(anchor AS VARCHAR) || '#' || "
        f"CAST(s.j AS VARCHAR)), 1, 15)) AS BIGINT) % n.n"
    )
    cluster_part = ""
    cluster_filter = ""
    if clusters_sql is not None:
        cluster_part = f"clusters AS MATERIALIZED ({clusters_sql}),\n"
        cluster_filter = f"""
  AND NOT EXISTS (
    SELECT 1 FROM clusters ca JOIN clusters cn
      ON ca.{cluster_col} = cn.{cluster_col}
    WHERE ca.{id_col} = cand.anchor AND cn.{id_col} = cand.neg_id
  )"""
    return f"""
WITH {cluster_part}cand AS (
  SELECT t.{id_col} AS anchor, s.j, {neg} AS neg_id
  FROM {table} t
  CROSS JOIN (SELECT count(*) AS n FROM {table}) n
  CROSS JOIN (SELECT unnest(range(0, {oversample * k})) AS j) AS s
),
kept AS (
  SELECT anchor, j, neg_id FROM cand
  WHERE neg_id != anchor{cluster_filter}
),
dedup AS (
  SELECT anchor, j, neg_id,
         row_number() OVER (PARTITION BY anchor, neg_id ORDER BY j) AS fst
  FROM kept
)
SELECT anchor AS {id_col},
       CAST(row_number() OVER (PARTITION BY anchor ORDER BY j) AS INT)
         AS rank,
       neg_id
FROM dedup WHERE fst = 1
QUALIFY rank <= {k}
""".strip()


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows — the
    shape a tokenizer/packer consumes (stride < chunk_tokens gives
    sequence overlap for training-context continuity).

    Output: ``(id_col, chunk_id, n_tokens, chunk_text)``; the final
    window is the short tail (never dropped — data loss in a chunker is
    silent and catastrophic at corpus scale). chunk_id is the 0-based
    window index; a document shorter than one window yields exactly one
    chunk. Pure projection + explode — no shuffle; at 100 TB this runs
    entirely inside the scan stage."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    # the token array projects FIRST: the window lambda is interpreted per
    # element without loop-invariant hoisting, so capturing the split
    # expression directly would re-split the text once per chunk
    tokenized = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    )
    w = F.col("__w")
    n_chunks = F.greatest(
        (
            (F.size(w) - F.lit(chunk_tokens) + F.lit(stride) - 1)
            / F.lit(stride)
        ).cast("long")
        + 1,
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.slice(w, i * stride + 1, chunk_tokens).alias("toks"),
        ),
    )
    exploded = tokenized.select(
        F.col(id_col), F.explode(chunks).alias("c")
    )
    return exploded.select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c.toks").cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.col("c.toks")).alias("chunk_text"),
    )


def chunk_documents_sql(
    chunk_tokens: int = 32,
    stride: int = 24,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    return f"""
WITH w AS (
  SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table}
),
n AS (
  SELECT {id_col}, w,
         -- floor, not bare CAST: DuckDB CAST(double AS BIGINT) rounds
         -- while Spark's cast truncates; they agree only through floor
         -- (the negative short-doc case is clamped by greatest anyway)
         greatest(
           CAST(floor((len(w) - {chunk_tokens} + {stride} - 1) / {stride})
                AS BIGINT) + 1,
           1) AS n_chunks
  FROM w
)
SELECT {id_col}, i AS chunk_id,
       CAST(len(w[i * {stride} + 1 : i * {stride} + {chunk_tokens}]) AS BIGINT)
           AS n_tokens,
       array_to_string(w[i * {stride} + 1 : i * {stride} + {chunk_tokens}], ' ')
           AS chunk_text
FROM n CROSS JOIN LATERAL (SELECT unnest(range(0, n_chunks)) AS i) AS u(i)
""".strip()


def _pack_with_shard(
    chunks, shard_col, seq_len, id_col, chunk_col, tokens_col
):
    w = Window.partitionBy("shard").orderBy(id_col, chunk_col)
    spans = (
        chunks.select(
            shard_col.alias("shard"),
            F.col(id_col),
            F.col(chunk_col),
            F.col(tokens_col),
        )
        .withColumn("__end", F.sum(tokens_col).over(w))
        .withColumn("__start", F.col("__end") - F.col(tokens_col))
    )
    touched = spans.select(
        "shard",
        "__start",
        "__end",
        F.explode(
            F.sequence(
                F.expr(f"__start div {seq_len}"),
                F.expr(f"(__end - 1) div {seq_len}"),
            )
        ).alias("seq_id"),
    )
    overlap = F.least(
        F.col("__end"), (F.col("seq_id") + 1) * seq_len
    ) - F.greatest(F.col("__start"), F.col("seq_id") * seq_len)
    return touched.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(overlap).alias("tokens"),
    )


def pack_sequences(
    chunks: DataFrame,
    seq_len: int = 64,
    shards: int = 16,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Token-stream sequence packing accounting (the pre-training packer
    shape): chunks are laid end-to-end per hash shard and cut into
    ``seq_len``-token training sequences — chunks may straddle a cut,
    exactly like causal-LM packing. Output per ``(shard, seq_id)``:
    how many chunks touch the sequence and how many tokens it holds
    (= seq_len everywhere except each shard's tail).

    Deterministic: shard = xxhash64(doc id) mod ``shards``; the within-
    shard layout orders by (doc, chunk). One window cumsum + one explode
    of each chunk's touched-sequence range + one keyed aggregation; the
    per-shard window is the scale knob — raise ``shards`` until a
    shard's chunk stream fits a task."""
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    return _pack_with_shard(
        chunks, shard, seq_len, id_col, chunk_col, tokens_col
    )


def pack_sequences_md5(
    chunks: DataFrame,
    seq_len: int = 64,
    shards: int = 16,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """:func:`pack_sequences` with the md5 shard hash — engine-portable
    for the oracle gate (DuckDB has no xxhash64 twin); xxhash64 is the
    cheaper production default."""
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % shards
    )
    return _pack_with_shard(
        chunks, shard, seq_len, id_col, chunk_col, tokens_col
    )


def _md5_shard_expr(id_col: str, shards: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5(CAST({id_col} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {shards}"
    )


def pack_sequences_md5_sql(
    chunks_sql: str,
    seq_len: int = 64,
    shards: int = 16,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> str:
    shard = _md5_shard_expr(id_col, shards)
    return f"""
WITH chunks AS ({chunks_sql}),
spans AS (
  SELECT {shard} AS shard, {id_col}, {chunk_col}, {tokens_col},
         -- CAST: window sum() yields HUGEINT, which range() rejects and
         -- pandas would widen to float64
         CAST(sum({tokens_col}) OVER (PARTITION BY {shard}
                                      ORDER BY {id_col}, {chunk_col}
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
  FROM chunks
),
touched AS (
  SELECT shard, e - {tokens_col} AS s, e, i AS seq_id
  FROM spans
  CROSS JOIN LATERAL (
    SELECT unnest(range((e - {tokens_col}) // {seq_len}, (e - 1) // {seq_len} + 1)) AS i
  ) AS u(i)
)
SELECT shard, seq_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(least(e, (seq_id + 1) * {seq_len})
                - greatest(s, seq_id * {seq_len})) AS BIGINT) AS tokens
FROM touched GROUP BY ALL
""".strip()


def vocab_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group vocabulary statistics — the Heaps-law corpus analytics
    a data-mixture dashboard tracks: total token occurrences, distinct
    vocabulary size, hapax legomena (frequency-1 tokens — the growth
    frontier), and the top token's share in exact ppm.

    Shape: explode words → (group, word) counts (map-side combine makes
    the shuffle carry distinct words, not occurrences) → one fused
    per-group conditional rollup. Two shuffles at any scale."""
    words = _spread(
        df.select(F.col(group_col).alias("g"), F.col(text_col))
    ).select(
        "g", F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    counts = words.groupBy("g", "w").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.groupBy("g")
        .agg(
            F.sum("cnt").alias("tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.count(F.when(F.col("cnt") == 1, 1)).alias("hapax"),
            F.max("cnt").alias("top_cnt"),
        )
        .select(
            F.col("g").alias(group_col),
            "tokens",
            "vocab",
            "hapax",
            F.expr(f"({_PPM} * top_cnt) div tokens").alias("top_token_ppm"),
        )
    )


def vocab_stats_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
) -> str:
    return f"""
WITH words AS (
  SELECT {group_col} AS g, unnest(string_split({text_col}, ' ')) AS w
  FROM {table}
),
counts AS (SELECT g, w, count(*) AS cnt FROM words GROUP BY ALL)
SELECT g AS {group_col},
       CAST(sum(cnt) AS BIGINT) AS tokens,
       count(*) AS vocab,
       CAST(count(CASE WHEN cnt = 1 THEN 1 END) AS BIGINT) AS hapax,
       ({_PPM} * max(cnt)) // CAST(sum(cnt) AS BIGINT) AS top_token_ppm
FROM counts GROUP BY g
""".strip()


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default: float = 0.0,
    buckets: int = 1000,
) -> DataFrame:
    """Deterministic per-group downsampling — the data-mixture control a
    pre-training pipeline applies per source/domain. A row survives iff
    its md5 bucket falls under its group's fraction; no RNG, so the
    sample is stable across runs, engines, and partitionings (unlike
    ``df.sample``, whose selection depends on partition layout). Narrow
    filter — zero shuffles; at 100 TB the filter sits directly on the
    scan."""
    b = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % buckets
    )
    thresh = None
    for group, frac in sorted(fractions.items()):
        cut = F.lit(int(frac * buckets))
        cond = F.col(group_col) == group
        thresh = F.when(cond, cut) if thresh is None else thresh.when(cond, cut)
    thresh = (
        thresh.otherwise(F.lit(int(default * buckets)))
        if thresh is not None
        else F.lit(int(default * buckets))
    )
    return df.filter(b < thresh)


def stratified_sample_sql(
    fractions: dict[str, float],
    table: str = "documents",
    group_col: str = "source",
    id_col: str = "doc_id",
    default: float = 0.0,
    buckets: int = 1000,
) -> str:
    b = (
        f"CAST(concat('0x', substr(md5(CAST({id_col} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {buckets}"
    )
    if not fractions:  # CASE with no WHEN arms is a parse error
        return f"SELECT * FROM {table} WHERE {b} < {int(default * buckets)}"
    whens = " ".join(
        f"WHEN {group_col} = '{g}' THEN {int(f * buckets)}"
        for g, f in sorted(fractions.items())
    )
    return (
        f"SELECT * FROM {table} "
        f"WHERE {b} < (CASE {whens} ELSE {int(default * buckets)} END)"
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails / phones / IPv4s; count hits per pattern.

    Output: ``(id_col, clean_text, email_hits, phone_hits, ip_hits)``.
    Counts are measured on the original text; replacements are applied in
    PII_PATTERNS order (emails first, so an address's host part is never
    half-eaten by the IP rule). Narrow projection — no shuffle.
    """
    clean = F.col(text_col)
    hits = []
    for name, pat, repl in PII_PATTERNS:
        hits.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"{name}_hits")
        )
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(F.col(id_col), clean.alias("clean_text"), *hits)


def export_jsonl_shards(
    df: DataFrame,
    out_path: str,
    shards: int = 16,
    id_col: str = "doc_id",
    compression: str | None = "gzip",
) -> None:
    """The hand-off format at the end of a curation pipeline: the corpus
    written as deterministically hash-sharded JSON-lines, one directory
    per shard (``shard=N/``), gzip by default — what tokenizer workers
    and data-loader mixers consume.

    Shard = md5(id) mod ``shards`` (engine-portable, reproducible across
    runs and engines — the same assignment :func:`pack_sequences_md5`
    uses, so packing accounting and physical shards agree). The write is
    one ``partitionBy`` pass: shuffle-free when the upstream is already
    narrow, and each shard's files stay independently consumable. Raise
    ``shards`` with corpus size until a shard fits a downstream worker.
    """
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % shards
    )
    writer = (
        df.withColumn("shard", shard)
        .write.partitionBy("shard")
        .mode("overwrite")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(out_path)


def read_jsonl_shards(
    spark, path: str, schema: str | None = None
) -> DataFrame:
    """Read an :func:`export_jsonl_shards` directory back (shard column
    restored from the partition path). Pass ``schema`` in production —
    schema inference lists and samples every file."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema + ", shard bigint")
    return reader.json(path)


def pii_redact_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    clean = text_col
    hits = []
    for name, pat, repl in PII_PATTERNS:
        # DuckDB string literals pass backslashes through untouched — the
        # pattern goes in verbatim (only quotes need SQL escaping).
        p = pat.replace("'", "''")
        hits.append(
            f"len(regexp_extract_all({text_col}, '{p}')) AS {name}_hits"
        )
        clean = f"regexp_replace({clean}, '{p}', '{repl}', 'g')"
    return (
        f"SELECT {id_col}, {clean} AS clean_text, {', '.join(hits)} FROM {table}"
    )


# ---------------------------------------------------------------------------
# Mixture sampling with epoch upsampling
# ---------------------------------------------------------------------------


def _bucket(col_expr: Column, buckets: int) -> Column:
    """Stable uniform bucket in [0, buckets) from md5 — same trick as
    stratified_sample, shared by every deterministic-sampling operator."""
    return (
        F.conv(F.substring(F.md5(col_expr), 1, 15), 16, 10).cast("long")
        % buckets
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default: float = 1.0,
    buckets: int = 1000,
) -> DataFrame:
    """Data-mixture resampling with weights on BOTH sides of 1.0 — the
    generalization of :func:`stratified_sample` a pre-training mixture
    actually needs (Hoffmann/Llama-style recipes repeat high-quality
    sources for 2-4 epochs while downsampling the crawl): weight 0.3
    keeps a deterministic 30% of a source, weight 2.5 emits every doc
    twice plus a deterministic half of a third copy.

    Each output row carries an ``epoch`` column (0-based copy index) so
    downstream shuffling/packing can spread the copies. Copy selection is
    ``md5(id:epoch)``-bucketed — reproducible across runs, engines, and
    partition layouts, unlike rand()-based sampling.

    Scale: narrow ``explode(sequence(...))`` projection — zero shuffles;
    fan-out is bounded by ``ceil(max weight)``, and the filter on the
    fractional copy sits in the same codegen stage. At 100 TB this
    composes with the scan (no materialized intermediate)."""
    full = None
    frac = None
    for group, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative mixture weight for {group!r}: {w}")
        cond = F.col(group_col) == group
        f_i, fr_i = int(w), int(round((w - int(w)) * buckets))
        full = F.when(cond, f_i) if full is None else full.when(cond, f_i)
        frac = F.when(cond, fr_i) if frac is None else frac.when(cond, fr_i)
    d_full, d_frac = int(default), int(round((default - int(default)) * buckets))
    full = F.lit(d_full) if full is None else full.otherwise(F.lit(d_full))
    frac = F.lit(d_frac) if frac is None else frac.otherwise(F.lit(d_frac))
    with_n = df.withColumn("__full", full).withColumn("__frac", frac)
    exploded = with_n.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), F.col("__full")))
    )
    keep_frac = _bucket(
        F.concat_ws(":", F.col(id_col).cast("string"), F.col("epoch")), buckets
    ) < F.col("__frac")
    return exploded.filter(
        (F.col("epoch") < F.col("__full")) | keep_frac
    ).drop("__full", "__frac")


def mixture_sample_sql(
    weights: dict[str, float],
    table: str = "documents",
    group_col: str = "source",
    id_col: str = "doc_id",
    default: float = 1.0,
    buckets: int = 1000,
) -> str:
    def case(expr_for):
        if not weights:
            return str(expr_for(default))
        whens = " ".join(
            f"WHEN {group_col} = '{g}' THEN {expr_for(w)}"
            for g, w in sorted(weights.items())
        )
        return f"(CASE {whens} ELSE {expr_for(default)} END)"

    full = case(lambda w: int(w))
    frac = case(lambda w: int(round((w - int(w)) * buckets)))
    bucket = (
        f"CAST(concat('0x', substr(md5(concat(CAST({id_col} AS VARCHAR), "
        f"':', CAST(e.epoch AS VARCHAR))), 1, 15)) AS BIGINT) % {buckets}"
    )
    return f"""
SELECT t.*, e.epoch
FROM {table} t, unnest(range(0, {full} + 1)) AS e(epoch)
WHERE e.epoch < {full} OR {bucket} < {frac}
"""


# ---------------------------------------------------------------------------
# Composite quality filter (Gopher-rule flavor)
# ---------------------------------------------------------------------------

#: (rule name, metric key, lo, hi) — a doc passes a rule iff lo <= m <= hi.
#: Defaults are the C4/Gopher-ish cheap-heuristic band (Rae et al. 2021
#: §A1.1, Raffel et al. 2020 §2.2) adapted to the metric set of
#: functions.text.quality_metrics.
DEFAULT_QUALITY_RULES: tuple[tuple[str, str, float, float], ...] = (
    ("len", "n_chars", 64, 100_000),
    ("tokens", "n_tokens", 8, 50_000),
    ("word_len", "mean_word_len", 2.0, 12.0),
    ("stopwords", "stopword_ratio", 0.01, 1.0),
    ("punct", "punct_ratio", 0.0, 0.25),
    ("digits", "digit_ratio", 0.0, 0.30),
)


def quality_filter(
    df: DataFrame,
    rules: tuple[tuple[str, str, float, float], ...] = DEFAULT_QUALITY_RULES,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rule-based document filter with audit trail: per-rule pass flags,
    an overall ``passed`` boolean, and a stable comma-joined
    ``reject_reasons`` string (empty when passed) — the shape a curation
    pipeline needs to *tune* thresholds (group by reason, inspect
    borderline docs) rather than silently drop rows.

    All metrics come from :func:`functions.text.quality_metrics` — pure
    codegen expressions evaluated once per doc; the rules are boolean
    combinations in the same projection. Zero shuffles at any scale."""
    from arcane_framework_scala_spark.functions.text import quality_metrics

    m = quality_metrics(text_col)
    cols = [F.col(id_col)]
    flags = []
    for name, key, lo, hi in rules:
        ok = (m[key] >= F.lit(lo)) & (m[key] <= F.lit(hi))
        flags.append((name, ok))
        cols.append(ok.alias(f"ok_{name}"))
    passed = None
    for _, ok in flags:
        passed = ok if passed is None else (passed & ok)
    reasons = F.concat_ws(
        ",", *[F.when(~ok, F.lit(name)) for name, ok in flags]
    )
    return df.select(
        *cols,
        passed.alias("passed"),
        reasons.alias("reject_reasons"),
    )


def quality_filter_sql(
    rules: tuple[tuple[str, str, float, float], ...] = DEFAULT_QUALITY_RULES,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    from arcane_framework_scala_spark.functions.text import quality_metrics_sql

    m = quality_metrics_sql(text_col)
    ok_cols, ok_names = [], []
    for name, key, lo, hi in rules:
        expr = f"({m[key]} >= {lo} AND {m[key]} <= {hi})"
        ok_cols.append(f"{expr} AS ok_{name}")
        ok_names.append((name, expr))
    passed = " AND ".join(expr for _, expr in ok_names)
    reasons = ", ".join(
        f"CASE WHEN NOT {expr} THEN '{name}' END" for name, expr in ok_names
    )
    return f"""
SELECT {id_col}, {', '.join(ok_cols)},
       ({passed}) AS passed,
       concat_ws(',', {reasons}) AS reject_reasons
FROM {table}
"""


# ---------------------------------------------------------------------------
# Deterministic global shuffle → training shards
# ---------------------------------------------------------------------------


def shuffle_shards(
    df: DataFrame,
    num_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every row a training shard and a position within it, from a
    seeded content-independent permutation — the "global shuffle" step
    before tokenizer hand-off. Ordering inside a shard is by
    ``md5(seed:id)``, so the permutation is reproducible bit-for-bit on
    any engine and any partitioning; changing the seed reshuffles.

    Plan: one hash-partition shuffle on ``shard`` + a per-shard sort for
    ``row_number`` — exactly the exchange the sharded write needs anyway,
    so the sort is free at write time (``sortWithinPartitions``). Shard
    sizes are balanced by construction (uniform md5). At 100 TB pick
    ``num_shards`` ≈ total size / desired file size; each shard sorts
    independently (no global sort, no single-reducer bottleneck)."""
    h = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    shard = _bucket(
        F.concat_ws("#", F.lit(str(seed)), F.col(id_col).cast("string")),
        num_shards,
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w) - 1)
        .drop("__h")
    )


def shuffle_shards_sql(
    num_shards: int,
    seed: int = 0,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    h = f"md5(concat('{seed}', ':', CAST({id_col} AS VARCHAR)))"
    shard = (
        f"CAST(concat('0x', substr(md5(concat('{seed}', '#', "
        f"CAST({id_col} AS VARCHAR))), 1, 15)) AS BIGINT) % {num_shards}"
    )
    return f"""
SELECT * EXCLUDE (__h),
       row_number() OVER (PARTITION BY shard ORDER BY __h, {id_col}) - 1 AS pos
FROM (SELECT t.*, {shard} AS shard, {h} AS __h FROM {table} t)
"""


# ---------------------------------------------------------------------------
# Corpus-wide frequent n-gram mining (boilerplate signature discovery —
# the corpus-level companion of the per-document Gopher repetition
# metrics above; C4/RefinedWeb use the same mined lists to strip
# boilerplate and policy lines)
# ---------------------------------------------------------------------------


def top_ngrams(
    df: DataFrame,
    n: int = 3,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact global top-``k`` word ``n``-grams: ``(gram, occurrences,
    doc_freq)``, ranked by occurrences with a full deterministic
    tie-break (doc_freq desc, gram asc).

    Scale: one map-side-combined shuffle over (gram) counts, then a
    global top-k — Spark plans ``TakeOrderedAndProject`` (per-partition
    heaps + driver merge of k rows), never a full sort. The exploded
    gram stream is narrow; documents shorter than ``n`` words contribute
    nothing.
    """
    base = _spread(
        df.select(
            F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("w")
        )
    )
    # guard: sequence(1, 0) is the DESCENDING [1, 0] in Spark and
    # slice(w, 0, n) then throws — documents shorter than n words must
    # short-circuit to an empty gram array (same shape as _gram_structs)
    grams = F.when(
        F.size(F.col("w")) >= n,
        F.expr(
            f"transform(sequence(1, size(w) - {n - 1}), "
            f"i -> concat_ws(' ', slice(w, i, {n})))"
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    exploded = base.select("id", F.explode(grams).alias("gram"))
    counts = exploded.groupBy("gram").agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.countDistinct("id").alias("doc_freq"),
    )
    return counts.orderBy(
        F.col("occurrences").desc(), F.col("doc_freq").desc(), F.col("gram")
    ).limit(k)


def top_ngrams_sql(
    n: int = 3,
    k: int = 50,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`top_ngrams` (identical tie-break)."""
    return f"""
WITH w AS (SELECT {id_col} AS id, string_split({text_col}, ' ') AS w FROM {table}),
g AS (
  SELECT id, array_to_string(w[i:i+{n - 1}], ' ') AS gram
  FROM w
  CROSS JOIN LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) AS u(i)
  WHERE i <= len(w) - {n - 1}
)
SELECT gram, count(*) AS occurrences, count(DISTINCT id) AS doc_freq
FROM g GROUP BY 1
ORDER BY occurrences DESC, doc_freq DESC, gram
LIMIT {k}
""".strip()
