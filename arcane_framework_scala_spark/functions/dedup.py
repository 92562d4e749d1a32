"""Deduplication operators for training-data pipelines.

Four families, all pure DataFrame transforms (no Python UDFs, no driver
materialization):

- **Exact**: hash-groupBy on a content digest — one shuffle, map-side
  partial aggregation.
- **MinHash + LSH**: shingle → md5 base hash (once per shingle) → affine
  universal-hash signature → band buckets → bucket self-join for candidate
  pairs. Pure int64 arithmetic after the single md5, identical on every
  engine and exactly reproducible in SQL oracles.
- **SimHash**: 16-bit signature from per-token md5 bits; near-dup = equal
  signature (or Hamming ≤ d via band splits).
- **n-gram Jaccard**: exact set similarity for candidate pairs via exploded
  distinct-shingle joins — pure relational algebra.

Scale notes: every step is shuffle-on-key with uniform hash-derived keys.
LSH band join deliberately avoids the O(n²) cross join; the bucket join's
fan-out is bounded by bucket size, and AQE splits skewed buckets. For 100 TB
inputs raise ``num_hashes``/``bands`` rather than widening buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions._parallel import spread_for_compute as _spread
from arcane_framework_scala_spark.plans.materialize import materialize

#: affine MinHash family modulus — prime < 2^31 so (a*h + b) stays in int64
_MH_PRIME = 2_147_483_647


def _mh_coeffs(seed: int) -> tuple[int, int]:
    """Deterministic large multiplier/offset for hash i. The multiplier must
    be big enough that h·a wraps mod p many times — tiny multipliers leave
    the 16 mins correlated (all landing on the smallest h), which collapses
    band buckets and floods the LSH join with false candidates."""
    a = (2_654_435_761 * (seed + 1)) % _MH_PRIME
    b = (40_503 * (seed + 7) ** 2 + 17) % _MH_PRIME
    return (a or 1), b


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row (the min id) per exact content hash.

    Returns (digest, keep_id, dup_count). groupBy on md5 → uniform
    partitioning, map-side combine; survivors join back by id if full rows
    are needed."""
    digest = F.md5(F.col(content_col)).alias("digest")
    return (
        df.select(digest, F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dedup_sql(table: str, content_col: str = "text", id_col: str = "doc_id") -> str:
    return (
        f"SELECT md5({content_col}) AS digest, min({id_col}) AS keep_id, "
        f"count(*) AS dup_count FROM {table} GROUP BY md5({content_col})"
    )


# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------


def char_shingles(
    text_col: str, k: int = 5, *, pre_normalized: bool = False
) -> F.Column:
    """Distinct character k-grams of normalized text, as an array column.

    The window lambda is interpreted per element without loop-invariant
    hoisting, so on hot paths project the normalization once and pass that
    column with ``pre_normalized=True`` (same trap as
    :func:`..text.fingerprint`)."""
    c = F.col(text_col)
    norm = c if pre_normalized else F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(k))))


def _char_shingles_sql(col: str, k: int) -> str:
    norm = f"regexp_replace(lower(trim({col})), '\\s+', ' ', 'g')"
    return (
        f"list_distinct(list_transform(range(1, greatest(length({norm}) - {k} + 1, 1)"
        f" + 1), i -> substr({norm}, i, {k})))"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, h0..h{n-1}) — affine MinHash family over one md5 per shingle.

    Each shingle is hashed **once** (md5 → first 15 hex digits → int64);
    hash i is ``min over shingles of (a_i·h + b_i) mod p`` with p = 2^31-1
    and deterministic large a_i/b_i — the classic universal-hash MinHash
    family, exactly reproducible in portable SQL (pure int64 arithmetic).

    Plan shape: explode windows → hash projection → groupBy(id) with 16
    ``min`` aggregates. Spark's higher-order array functions are
    *interpreted* per element, so the equivalent array-lambda formulation
    runs ~10× slower; explode + aggregate stays inside whole-stage codegen
    with map-side partial mins, and dedupe-before-min is unnecessary
    because ``min`` is idempotent over duplicate shingles. One shuffle of
    (id, 16×int64) partial aggregates — tiny relative to the text."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    normed = _spread(df.select(F.col(id_col), norm.alias("__norm")))
    nm = F.col("__norm")
    idx = F.sequence(
        F.lit(1), F.greatest(F.length(nm) - shingle_k + 1, F.lit(1))
    )
    exploded = normed.select(
        F.col(id_col),
        F.explode(
            F.transform(idx, lambda i: nm.substr(i, F.lit(shingle_k)))
        ).alias("__sh"),
    )
    h = (
        F.conv(F.substring(F.md5(F.col("__sh")), 1, 15), 16, 10).cast("long")
        % F.lit(_MH_PRIME)
    ).alias("__h")
    hashed = exploded.select(F.col(id_col), h)

    def seeded_min(seed: int):
        a, b = _mh_coeffs(seed)
        return F.min(
            (F.col("__h") * F.lit(a) + F.lit(b)) % F.lit(_MH_PRIME)
        ).alias(f"h{seed}")

    return hashed.groupBy(id_col).agg(*[seeded_min(i) for i in range(num_hashes)])


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, band, bucket): md5 of each band's concatenated signature rows.
    Docs sharing any (band, bucket) are LSH candidate duplicates."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, text_col, id_col, num_hashes, shingle_k)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("bucket")
            )
        )
    return (
        sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bb"))
        .select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing an LSH bucket.

    Self-join on (band, bucket): shuffle key is a hash → uniform; candidate
    fan-out bounded by bucket sizes, AQE handles stragglers. The explicit
    repartition on the join keys makes both join inputs share one
    exchange, so the signature pipeline (shingle explode + 16 min-aggs,
    the expensive part) runs once instead of twice — the band table is
    small enough to broadcast, and a broadcast side never reuses the
    other side's subtree (measured ~20% faster at sf0.1)."""
    b = minhash_bands(df, text_col, id_col, num_hashes, bands, shingle_k)
    b = b.repartition("band", "bucket")
    left = b.alias("l")
    right = b.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_candidate_pairs_incremental(
    old_docs: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """Candidate pairs TOUCHING a newly arrived batch — the incremental
    dedup step a CDC-fed corpus needs: when a micro-batch lands (S8/K2
    pipeline), only pairs involving new docs can be new, so the batch's
    signatures join against the full band table instead of re-running the
    corpus-wide self-join.

    Invariant (hash-verified in the gate):
    ``pairs(old ∪ new) == pairs(old) ∪ incremental(old, new)`` — the
    incremental result is EXACTLY the full-corpus pair set minus the
    already-known old-old pairs.

    Plan: old band table computed once (at scale it is a *stored* table
    maintained by the merge — signatures are content hashes, so CDC
    updates upsert band rows by id); new bands are batch-sized. Two
    bounded joins share one exchange on (band, bucket): new×old (cross-
    generation) and new×new (within-batch), both with fan-out capped by
    bucket sizes — the corpus-wide self-join never runs again. Shuffled
    bytes ≈ batch bands + the touched buckets of the old table.
    """
    ob = minhash_bands(old_docs, text_col, id_col, num_hashes, bands, shingle_k)
    nb = minhash_bands(new_docs, text_col, id_col, num_hashes, bands, shingle_k)
    nb = materialize(nb.repartition("band", "bucket"), eager=False)
    on = ["band", "bucket"]
    l, r = F.col(f"l.{id_col}"), F.col(f"r.{id_col}")
    cross = (
        nb.alias("l")
        .join(ob.repartition("band", "bucket").alias("r"), on)
        .select(
            F.least(l, r).alias("id_a"), F.greatest(l, r).alias("id_b")
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    within = (
        nb.alias("l")
        .join(nb.alias("r"), on)
        .filter(l < r)
        .select(l.alias("id_a"), r.alias("id_b"))
    )
    return cross.unionAll(within).distinct()


def fuzzy_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    min_bands: int = 1,
) -> DataFrame:
    """Near-duplicate benchmark decontamination: flag corpus documents
    whose MinHash LSH signature collides with any benchmark document in
    ≥ ``min_bands`` bands — the fuzzy sibling of
    :func:`corpus.contamination` (exact shared word n-grams), catching
    PARAPHRASED/lightly-edited eval leakage that exact n-gram matching
    misses (the GPT-3 appendix-C / Llama decontamination concern; LSH
    banding per Broder 1997, the same family as ``minhash_bands``).

    Output: one row per corpus doc — ``(id_col, n_hit_bands,
    contaminated)``; every input doc gets a row (LEFT join, zero-filled),
    so the flag is directly usable as a filter.

    Scale shape: the benchmark side (eval suites — MBs) collapses to a
    DISTINCT (band, bucket) table and broadcasts; the corpus pays the
    signature aggregation (shingle explode + ``num_hashes`` map-side
    mins — the :func:`minhash_signature` plan) and ONE id-keyed groupBy
    of band hits. No corpus self-join, no text shuffle, fan-out bounded
    by bands."""
    cb = minhash_bands(corpus, text_col, id_col, num_hashes, bands, shingle_k)
    bb = (
        minhash_bands(benchmark, text_col, id_col, num_hashes, bands, shingle_k)
        .select("band", "bucket")
        .distinct()
    )
    hits = (
        cb.join(F.broadcast(bb), ["band", "bucket"])
        .groupBy(id_col)
        .agg(F.count_distinct("band").alias("__nb"))
    )
    n = F.coalesce(F.col("__nb"), F.lit(0)).cast("long")
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            n.alias("n_hit_bands"),
            (n >= F.lit(int(min_bands))).alias("contaminated"),
        )
    )


def minhash_signature_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 5,
) -> str:
    sh = _char_shingles_sql(text_col, shingle_k)
    base = (
        f"list_transform({sh}, s -> CAST(concat('0x', substr(md5(s), 1, 15)) "
        f"AS BIGINT) % {_MH_PRIME})"
    )
    sigs = ", ".join(
        "list_min(list_transform(base_h, h -> (h * {a} + {b}) % {p})) AS h{i}".format(
            a=_mh_coeffs(i)[0], b=_mh_coeffs(i)[1], p=_MH_PRIME, i=i
        )
        for i in range(num_hashes)
    )
    return (
        f"SELECT {id_col}, {sigs} FROM "
        f"(SELECT {id_col}, {base} AS base_h FROM {table})"
    )


def minhash_candidate_pairs_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> str:
    rows_per_band = num_hashes // bands
    sig = minhash_signature_sql(table, text_col, id_col, num_hashes, shingle_k)
    band_rows = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS band, md5(concat_ws('|', "
        + ", ".join(f"h{b * rows_per_band + r}" for r in range(rows_per_band))
        + f")) AS bucket FROM sig"
        for b in range(bands)
    )
    return (
        f"WITH sig AS ({sig}), bands AS ({band_rows}) "
        f"SELECT DISTINCT l.{id_col} AS id_a, r.{id_col} AS id_b "
        f"FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket "
        f"AND l.{id_col} < r.{id_col}"
    )


def fuzzy_contamination_sql(
    corpus_pred: str,
    bench_pred: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    min_bands: int = 1,
) -> str:
    """DuckDB oracle for :func:`fuzzy_contamination` — identical MinHash
    family, banding, and LEFT-join zero-fill."""
    rows_per_band = num_hashes // bands

    def band_rows(src: str) -> str:
        return " UNION ALL ".join(
            f"SELECT {id_col}, {b} AS band, md5(concat_ws('|', "
            + ", ".join(f"h{b * rows_per_band + r}" for r in range(rows_per_band))
            + f")) AS bucket FROM {src}"
            for b in range(bands)
        )

    csig = minhash_signature_sql(
        f"(SELECT * FROM {table} WHERE {corpus_pred})",
        text_col, id_col, num_hashes, shingle_k,
    )
    bsig = minhash_signature_sql(
        f"(SELECT * FROM {table} WHERE {bench_pred})",
        text_col, id_col, num_hashes, shingle_k,
    )
    return f"""
WITH csig AS ({csig}),
bsig AS ({bsig}),
cbands AS ({band_rows('csig')}),
bb AS (SELECT DISTINCT band, bucket FROM ({band_rows('bsig')})),
hits AS (
  SELECT c.{id_col}, CAST(count(DISTINCT c.band) AS BIGINT) AS nb
  FROM cbands c JOIN bb USING (band, bucket)
  GROUP BY c.{id_col}
)
SELECT d.{id_col},
       coalesce(h.nb, 0) AS n_hit_bands,
       coalesce(h.nb, 0) >= {min_bands} AS contaminated
FROM (SELECT {id_col} FROM {table} WHERE {corpus_pred}) d
LEFT JOIN hits h USING ({id_col})
""".strip()


# ---------------------------------------------------------------------------
# Candidate pairs → dedup clusters (connected components)
# ---------------------------------------------------------------------------


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(doc_id, cluster_id) for every id in the candidate-pair graph, where
    ``cluster_id`` is the minimum id of its connected component — the step
    that turns pairwise near-dup candidates (LSH/Jaccard/embedding) into
    dedup groups with one canonical survivor per group.

    Hash-to-min label propagation: every node starts labeled min(self,
    neighbors); each round pushes labels across edges and keeps the min.
    Rounds needed = graph diameter, and near-dup components are dense
    (bucket co-membership ≈ cliques), so 2-4 rounds converge in practice;
    each round is one shuffle join on uniform id keys plus a map-side-
    combined min. Convergence is detected by the (monotonically
    decreasing) label sum — an O(1) driver scalar per round, not a row
    diff. ``localCheckpoint`` cuts lineage so the plan doesn't grow with
    iterations. For graphs with long chains (pathological for near-dup
    data) switch to the O(log n) alternating large-star/small-star
    variant; the per-round join shape is identical.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # eager: the pair-generation pipeline upstream (LSH join etc.) is the
    # expensive part — materialize it exactly once before iterating
    edges = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nbr_min"))
        .select(
            F.col("src").alias("id"),
            F.least("src", "nbr_min").alias("label"),
        )
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iterations):
        prop = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("label").alias("prop_label"))
        )
        labels = (
            labels.join(prop, labels.id == prop.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("prop_label", F.col("label"))
                ).alias("label"),
            )
            # lazy: the convergence-check aggregation right below is the
            # action that materializes the checkpoint — one job per round
            # instead of a dedicated checkpoint job + the agg job
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def dedup_clusters_sql(pairs_sql: str) -> str:
    """DuckDB oracle: exact connected components via recursive transitive
    closure over the same pair set. O(Σ component²) rows — fine for oracle
    scales, never for production (that's what the iterative operator is
    for)."""
    # MATERIALIZED is load-bearing: without it DuckDB re-inlines the pair
    # pipeline into every recursion step (measured 55 s → 4.6 s at sf0.01)
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED ({pairs_sql}),
edges AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
"""


def dedup_clusters_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction — same output contract as :func:`dedup_clusters`
    ((doc_id, cluster_id=min id of component) for every node in the pair
    graph) but O(log² n) rounds on ANY graph shape, including the long
    chains that make plain label propagation need diameter-many rounds.

    Algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — public paper; re-derived here as DataFrame ops):

    - edges are kept oriented large→small (``u > v``);
    - **large-star**: for every center ``c`` of the symmetric adjacency,
      connect each strictly-larger neighbor to ``m = min(N(c) ∪ {c})``;
    - **small-star**: for every center ``u`` of the oriented edges,
      connect ``u`` and each of its (smaller) neighbors to the minimum
      of the closed neighborhood;
    - repeat until the edge set is a fixed point — at that point the
      graph is a disjoint union of stars rooted at each component's
      minimum id.

    Each half-round is one shuffle groupBy (map-side-combined ``min``) +
    one shuffle join on the same key, then a ``distinct`` that also keeps
    the edge count from ballooning; all keys are ids, uniformly
    distributed for hash-derived doc ids. Convergence is detected with an
    O(1) driver scalar triple (count, Σu, Σv) — a fixed point leaves all
    three unchanged, and a collision would only cost one extra round
    because the triple is re-checked every round (``max_iterations``
    bounds the loop regardless). The per-round ``materialize`` keeps the
    plan from growing superlinearly with iterations, same as
    :func:`dedup_clusters`.

    Use this variant when component diameter is unknown or adversarial;
    for the dense clique-ish components LSH emits, plain
    :func:`dedup_clusters` converges in fewer shuffles.
    """
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    edges = materialize(
        e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct(),
        eager=True,
    )
    # every node of the ORIGINAL graph — the loop rewires edges, so the
    # final labeling must join back onto this frozen node set
    nodes = materialize(
        edges.select("u").unionAll(edges.select(F.col("v").alias("u"))).distinct(),
        eager=True,
    )

    def _signature(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)), F.sum("u"), F.sum("v")
        ).first()
        return (row[0], row[1], row[2])

    sig = _signature(edges)
    for _ in range(max_iterations):
        # -- large-star ----------------------------------------------------
        sym = edges.unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )  # (center, neighbor)
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # self-loops (v == m == u's min when u is its own min) drop here
        large = large.filter(F.col("u") != F.col("v"))
        # -- small-star ----------------------------------------------------
        # oriented edges already have every neighbor < center, so the
        # closed-neighborhood min is just min(v)
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(smins.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        edges = materialize(small, eager=False)
        new_sig = _signature(edges)  # the action that materializes
        if new_sig == sig:
            break
        sig = new_sig
    roots = edges.groupBy("u").agg(F.min("v").alias("lbl"))
    return nodes.join(roots, "u", "left").select(
        F.col("u").alias("doc_id"),
        F.coalesce("lbl", F.col("u")).alias("cluster_id"),
    )


def dedup_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The end of the near-dup pipeline: the corpus itself with every
    non-canonical cluster member removed (the min-id member of each
    connected component survives; docs in no pair are untouched).

    Plan: ``dedup_clusters`` labels only the nodes that appear in a pair,
    so the drop list is the duplicate population, not the corpus; the
    removal is one LEFT ANTI join on the uniform id key. AQE broadcasts
    the drop side when it is small (the common case — duplicate members
    are a fraction of the corpus); a corpus-scale drop list degrades
    gracefully to a shuffled anti join on the same key.
    """
    clusters = dedup_clusters(pairs, id_a=id_a, id_b=id_b)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(drop, on=id_col, how="left_anti")


def dedup_canonical_sql(
    table: str,
    pairs_sql: str,
    id_col: str = "doc_id",
) -> str:
    """Oracle: anti-join against the exact transitive-closure clusters."""
    return f"""
WITH clusters AS MATERIALIZED ({dedup_clusters_sql(pairs_sql)})
SELECT t.* FROM {table} t
WHERE NOT EXISTS (
  SELECT 1 FROM clusters c
  WHERE c.doc_id = t.{id_col} AND c.doc_id != c.cluster_id
)
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """(id, simhash): per-token md5 → first-4-hex-digit integer → bit votes.

    bit b of the signature = majority sign of ((token_hash >> b) & 1).
    Token multiset from whitespace split of normalized text. All built-in
    expressions; two narrow projections — the token-hash array
    materializes first, because embedding its expression in all ``bits``
    vote aggregates would re-split and re-md5 the text once per bit
    (measured 2.4× at sf0.1)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    hashes = F.transform(
        F.split(norm, " "),
        lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int"),
    )
    hashed = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), hashes.alias("__h")
    )

    def bit_vote(b: int):
        # sum over tokens of (2*bit - 1); >0 → signature bit set.
        # closure keeps the merge lambda at arity 2 (aggregate contract)
        return F.aggregate(
            F.col("__h"),
            F.lit(0),
            lambda acc, h: acc + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    bit_votes = []
    for b in range(bits):
        votes = bit_vote(b)
        bit_votes.append(F.when(votes > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    sig = bit_votes[0]
    for v in bit_votes[1:]:
        sig = sig + v
    return hashed.select(F.col(id_col), sig.alias("simhash"))


def simhash_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> str:
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    hashes = (
        f"list_transform(string_split({norm}, ' '), "
        f"t -> CAST(concat('0x', substr(md5(t), 1, 4)) AS INTEGER))"
    )
    bit_terms = []
    for b in range(bits):
        votes = (
            f"list_sum(list_transform({hashes}, "
            f"h -> ((h // {1 << b}) % 2) * 2 - 1))"
        )
        bit_terms.append(f"(CASE WHEN {votes} > 0 THEN {1 << b} ELSE 0 END)")
    sig = " + ".join(bit_terms)
    return f"SELECT {id_col}, CAST({sig} AS INT) AS simhash FROM {table}"


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    max_shingle_df: int = 50,
) -> DataFrame:
    """Exact Jaccard over distinct char-k-gram sets for candidate pairs.

    Candidates come from shingles with document frequency ≤
    ``max_shingle_df`` (or from the caller's ``candidates`` frame, e.g.
    MinHash-LSH output). This is the prefix-filtering idea from the
    similarity-join literature, and it is what keeps the operator alive at
    scale: a shingle shared by d documents contributes d²/2 pairs to a
    naive self-join — stopwordish k-grams shared by the whole corpus turn
    that into corpus²/2 (billions of rows at 5k docs, observed as an
    executor OOM at sf0.1). Rare shingles bound per-shingle fan-out at
    max_df²/2 while losing only pairs whose *entire* overlap is
    ultra-common k-grams — which at meaningful thresholds are not
    near-duplicates. The Jaccard itself is exact: intersections count ALL
    shingles, restricted to candidate pairs.

    Output (id_a, id_b, jaccard ≥ threshold), jaccard rounded to 6
    decimals. Shuffles: explode+distinct, df-count, candidate join,
    pair-intersection count — all on uniform hash-like keys."""
    inter = _pair_shingle_overlap(
        df, text_col, id_col, k, candidates, max_shingle_df
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    max_shingle_df: int = 50,
) -> DataFrame:
    """Broder containment over the same shingle machinery: C(a,b) =
    |A∩B| / min(|A|, |B|) — the metric that catches SUBSET duplication
    (a document quoted or embedded inside a larger one), which Jaccard
    misses because the union is dominated by the larger doc. Same
    prefix-filtered candidate generation and exact intersection as
    :func:`ngram_jaccard_pairs`; output (id_a, id_b, containment ≥
    threshold) rounded to 6 decimals."""
    inter = _pair_shingle_overlap(
        df, text_col, id_col, k, candidates, max_shingle_df
    )
    return (
        inter.withColumn(
            "containment",
            F.round(
                F.col("inter")
                / F.least(F.col("size_a"), F.col("size_b")).cast("double"),
                6,
            ),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def _pair_shingle_overlap(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    candidates: DataFrame | None,
    max_shingle_df: int,
) -> DataFrame:
    """Shared tail of the exact set-similarity joins: candidate pairs
    (prefix-filtered unless supplied) with exact shingle-set overlap —
    ``(id_a, id_b, inter, size_a, size_b)``."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    # exploded feeds FOUR consumers (sizes, the rare-shingle filter, and
    # both intersection probes) with different prunings, so exchange reuse
    # can't fire; materialize() computes the distinct (id, shingle) set
    # once — same pattern and fault-tolerance switch as tfidf's weight
    # table (plans/materialize.py)
    exploded = materialize(
        _spread(df.select(F.col(id_col), norm.alias("__norm")))
        .select(
            F.col(id_col),
            F.explode(char_shingles("__norm", k, pre_normalized=True)).alias("sh"),
        )
        .distinct()
    )
    sizes = exploded.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    if candidates is None:
        rare = (
            exploded.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df_count"))
            .filter(F.col("df_count") <= max_shingle_df)
            .select("sh")
        )
        rare_ex = exploded.join(rare, "sh")
        l, r = rare_ex.alias("l"), rare_ex.alias("r")
        candidates = (
            l.join(
                r,
                (F.col("l.sh") == F.col("r.sh"))
                & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
            )
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
            )
            .distinct()
        )
    # exact intersection, candidate pairs only: expand side A's shingles,
    # then hash-join side B on the composite (id, shingle) key
    ea = exploded.select(F.col(id_col).alias("id_a"), "sh")
    eb = exploded.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        candidates.join(ea, "id_a")
        .join(eb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return inter.join(sa, "id_a").join(sb, "id_b")


def ngram_jaccard_pairs_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.5,
    max_shingle_df: int = 50,
) -> str:
    sh = _char_shingles_sql(text_col, k)
    return f"""
WITH exploded AS (
  SELECT DISTINCT {id_col} AS id, unnest({sh}) AS sh FROM {table}
), sizes AS (
  SELECT id, count(*) AS set_size FROM exploded GROUP BY id
), rare AS (
  SELECT sh FROM exploded GROUP BY sh HAVING count(*) <= {max_shingle_df}
), rare_ex AS (
  SELECT e.id, e.sh FROM exploded e JOIN rare USING (sh)
), cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM rare_ex l JOIN rare_ex r ON l.sh = r.sh AND l.id < r.id
), inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN exploded a ON a.id = c.id_a
  JOIN exploded b ON b.id = c.id_b AND b.sh = a.sh
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b,
       round(i / CAST(sa.set_size + sb.set_size - i AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(i / CAST(sa.set_size + sb.set_size - i AS DOUBLE), 6) >= {threshold}
"""


def ngram_containment_pairs_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.8,
    max_shingle_df: int = 50,
) -> str:
    """DuckDB twin of :func:`ngram_containment_pairs`."""
    sh = _char_shingles_sql(text_col, k)
    return f"""
WITH exploded AS (
  SELECT DISTINCT {id_col} AS id, unnest({sh}) AS sh FROM {table}
), sizes AS (
  SELECT id, count(*) AS set_size FROM exploded GROUP BY id
), rare AS (
  SELECT sh FROM exploded GROUP BY sh HAVING count(*) <= {max_shingle_df}
), rare_ex AS (
  SELECT e.id, e.sh FROM exploded e JOIN rare USING (sh)
), cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM rare_ex l JOIN rare_ex r ON l.sh = r.sh AND l.id < r.id
), inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN exploded a ON a.id = c.id_a
  JOIN exploded b ON b.id = c.id_b AND b.sh = a.sh
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b,
       round(i / CAST(least(sa.set_size, sb.set_size) AS DOUBLE), 6) AS containment
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(i / CAST(least(sa.set_size, sb.set_size) AS DOUBLE), 6) >= {threshold}
"""


def prefix_filter_recall(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    max_shingle_df: int = 50,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Price the prefix filter's recall (the ``dedup_minhash_quality``
    companion for the df-cap): what candidate pairs does
    ``max_shingle_df`` lose, and how similar are they really?

    Takes MinHash-LSH candidate pairs as the recall yardstick, computes
    each pair's EXACT shingle Jaccard, and reports per integer-floored
    Jaccard decile (``bucket = (|∩|·10) div |∪|``, all-integer so both
    engines agree): ``(bucket, n_lsh, n_prefix, n_missed)`` — LSH pairs
    in the bucket, how many the prefix filter also generates, and how
    many it misses. A healthy cap shows misses concentrated in LOW
    buckets (pairs whose entire overlap is ultra-common shingles are not
    near-duplicates — the documented trade); misses in high buckets say
    the cap is too tight for this corpus. Pairs sharing zero shingles
    (pure band-hash collisions) have no exact Jaccard and are excluded
    by both engines alike.

    Diagnostic-scale contract: candidate-pair-bounded work (two
    candidate generations + two hash joins against the shingle table);
    at 100 TB run it over a sampled slice to TUNE the cap, not inline in
    the dedup pipeline."""
    lsh = minhash_candidate_pairs(
        df, text_col, id_col, num_hashes, bands, k
    ).select("id_a", "id_b")
    ov = _pair_shingle_overlap(df, text_col, id_col, k, lsh, max_shingle_df)
    pfx = _pair_shingle_overlap(
        df, text_col, id_col, k, None, max_shingle_df
    ).select("id_a", "id_b", F.lit(True).alias("__hit"))
    return (
        ov.join(pfx, ["id_a", "id_b"], "left")
        .select(
            F.expr("(inter * 10) div (size_a + size_b - inter)").alias(
                "bucket"
            ),
            "__hit",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_lsh"),
            F.sum(
                F.when(F.col("__hit"), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_prefix"),
            F.sum(
                F.when(F.col("__hit").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_missed"),
        )
    )


def prefix_filter_recall_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    max_shingle_df: int = 50,
    num_hashes: int = 16,
    bands: int = 4,
) -> str:
    """DuckDB twin of :func:`prefix_filter_recall`."""
    lsh = minhash_candidate_pairs_sql(
        table, text_col, id_col, num_hashes, bands, k
    )
    sh = _char_shingles_sql(text_col, k)
    return f"""
WITH lsh AS ({lsh}),
exploded AS (
  SELECT DISTINCT {id_col} AS id, unnest({sh}) AS sh FROM {table}
), sizes AS (
  SELECT id, count(*) AS set_size FROM exploded GROUP BY id
), rare AS (
  SELECT sh FROM exploded GROUP BY sh HAVING count(*) <= {max_shingle_df}
), rare_ex AS (
  SELECT e.id, e.sh FROM exploded e JOIN rare USING (sh)
), pfx AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM rare_ex l JOIN rare_ex r ON l.sh = r.sh AND l.id < r.id
), inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM lsh c
  JOIN exploded a ON a.id = c.id_a
  JOIN exploded b ON b.id = c.id_b AND b.sh = a.sh
  GROUP BY c.id_a, c.id_b
), scored AS (
  SELECT (i.i * 10) // (sa.set_size + sb.set_size - i.i) AS bucket,
         p.id_a IS NOT NULL AS hit
  FROM inter i
  JOIN sizes sa ON sa.id = i.id_a
  JOIN sizes sb ON sb.id = i.id_b
  LEFT JOIN pfx p ON p.id_a = i.id_a AND p.id_b = i.id_b
)
SELECT bucket, count(*) AS n_lsh,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_prefix,
       CAST(sum(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT) AS n_missed
FROM scored GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(keep_id, dup_id, sim): near-duplicate vector pairs above
    ``threshold``, found via sign-LSH buckets (approximate by design — the
    bucket join replaces the O(n²) cross join; recall rises with fewer
    bits, cost with more). keep_id is the smaller id, the survivor under
    min-id dedup policy."""
    from arcane_framework_scala_spark.functions.similarity import (
        lsh_bucket_neighbors,
    )

    pairs = lsh_bucket_neighbors(
        embeddings, dim=dim, bits=bits, id_col=id_col, vec_col=vec_col,
        threshold=threshold,
    )
    return pairs.select(
        F.col("id_a").alias("keep_id"), F.col("id_b").alias("dup_id"), "sim"
    )


def embedding_near_dup_sql(
    table: str,
    threshold: float = 0.9,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> str:
    from arcane_framework_scala_spark.functions.similarity import (
        lsh_bucket_neighbors_sql,
    )

    inner = lsh_bucket_neighbors_sql(
        table, dim=dim, bits=bits, id_col=id_col, vec_col=vec_col,
        threshold=threshold,
    )
    return (
        f"SELECT id_a AS keep_id, id_b AS dup_id, sim FROM ({inner})"
    )


def build_band_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    pfx_chars: int = 1,
) -> None:
    """Persist the corpus's LSH band table as a partition-pruned index —
    the dedup sibling of the persisted IVF index: signatures are content
    hashes, so the table is append/upsert-maintained by the CDC merge and
    NEVER recomputed corpus-wide. Layout: parquet partitioned by
    ``(band, pfx)`` where pfx = first ``pfx_chars`` hex chars of the
    bucket digest — an incoming batch touches only the partitions its
    own buckets hash into, so an incremental query reads
    |touched partitions| ≈ batch-bucket spread, not the corpus.

    ``pfx_chars`` sizes the layout to the corpus: 1 (default, bands × 16
    partitions) up to ~10 M docs; 2 (bands × 256) for 100 TB-class
    corpora where each partition still holds many row groups. Too-fine
    partitioning is a measured failure mode, not a free knob: at sf0.1
    the 2-char layout spent ~15 s creating 1023 near-empty files and the
    probe re-opened all of them — 10× the whole query's useful work.

    The layout parameters are persisted to ``<path>/_INDEX_META.json``
    (underscore-prefixed — Spark's scanner ignores it) and re-read at
    probe time: a probe whose pruning prefix or signature scheme differs
    from the stored layout would SILENTLY return empty/wrong candidate
    pairs (1-char filter values match zero 2-char partitions), so the
    probe defaults to the stored values and raises on an explicit
    mismatch rather than missing duplicates."""
    b = minhash_bands(docs, text_col, id_col, num_hashes, bands, shingle_k)
    (
        b.withColumn("pfx", F.substring("bucket", 1, pfx_chars))
        # align the data partitioning with the layout partitioning: ONE
        # shuffle so each (band, pfx) directory is written by exactly one
        # task → one file per directory. Without this every upstream task
        # writes its own sliver into every directory it touches — up to
        # tasks × bands × 256 tiny files (measured 23 s at sf0.1, pure
        # file-creation overhead). At 100 TB the same repartition sizes
        # files by shuffle-partition count instead of task fan-out.
        .repartition("band", "pfx")
        .write.mode("overwrite")
        .partitionBy("band", "pfx")
        .parquet(path)
    )
    _write_index_meta(
        path,
        {
            "pfx_chars": pfx_chars,
            "num_hashes": num_hashes,
            "bands": bands,
            "shingle_k": shingle_k,
        },
    )


def append_band_index(
    index_path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Extend a persisted band index with a new batch — the maintenance
    half of the incremental-dedup story (build once, then every CDC
    batch probes AND appends, so the index tracks the corpus without a
    corpus-wide rebuild). Signatures are content hashes, so the new
    rows are computed from the batch alone; the write is partition-
    aligned appending (same ``(band, pfx)`` layout, one shuffle, new
    files land inside the directories the batch's buckets touch —
    untouched partitions gain nothing).

    Layout parameters always come from the stored ``_INDEX_META.json``
    (raises when absent: appending with guessed parameters would mix
    signature schemes in one table and silently corrupt every later
    probe). Append each batch exactly ONCE — the caller's CDC ordering
    (T9 version guards upstream) is what makes replays safe to skip;
    re-appending a batch duplicates its band rows, which inflates
    candidate multiplicity but never loses a pair (probes dedup pairs).
    """
    meta = _read_index_meta(index_path)
    if meta is None:
        raise ValueError(
            f"no {_INDEX_META_FILE} under {index_path!r} — appending "
            "with guessed layout parameters would corrupt the index; "
            "build it with build_band_index() first"
        )
    b = minhash_bands(
        new_docs,
        text_col,
        id_col,
        meta["num_hashes"],
        meta["bands"],
        meta["shingle_k"],
    )
    (
        b.withColumn("pfx", F.substring("bucket", 1, meta["pfx_chars"]))
        .repartition("band", "pfx")
        .write.mode("append")
        .partitionBy("band", "pfx")
        .parquet(index_path)
    )


_INDEX_META_FILE = "_INDEX_META.json"


def _write_index_meta(path: str, meta: dict) -> None:
    import json
    import os

    with open(os.path.join(path, _INDEX_META_FILE), "w") as f:
        json.dump(meta, f)


def _read_index_meta(path: str) -> dict | None:
    import json
    import os

    try:
        with open(os.path.join(path, _INDEX_META_FILE)) as f:
            return json.load(f)
    except (FileNotFoundError, NotADirectoryError):
        return None  # pre-metadata index (r6 layout) / not an index dir
    except json.JSONDecodeError as e:
        # a truncated/corrupt sidecar must not masquerade as an opaque
        # parse failure — probing with wrong layout params would return
        # EMPTY pairs, which is exactly what the meta guard exists to stop
        raise ValueError(
            f"corrupt {_INDEX_META_FILE} under {path!r} ({e}); rebuild "
            "the band index with build_band_index()"
        ) from e


def minhash_candidate_pairs_indexed(
    spark,
    index_path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int | None = None,
    bands: int | None = None,
    shingle_k: int | None = None,
    pfx_chars: int | None = None,
    precomputed_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental candidate pairs against a PERSISTED band index — same
    contract as :func:`minhash_candidate_pairs_incremental` (pairs
    touching the new batch; full == old ∪ incremental), but the old side
    is the stored index with planning-time partition pruning: the batch's
    (band, pfx) set (bounded by bands × 16^pfx_chars, collected as
    metadata) becomes a partition filter, so the scan reads only touched
    partitions.

    The layout/signature parameters default to the values persisted by
    :func:`build_band_index` in ``_INDEX_META.json`` — pass them only to
    assert an expectation; a mismatch with the stored layout raises
    ``ValueError`` (silently pruning with the wrong prefix width, or
    hashing with a different scheme, would return EMPTY/garbage pairs —
    missed duplicates with no error).

    ``precomputed_bands``: the batch's (id, band, bucket) table, already
    MATERIALIZED by the caller with the index's exact signature scheme
    (``minhash_bands`` with the stored num_hashes/bands/shingle_k).
    Callers that build the index in the same session compute the batch
    signatures CONCURRENTLY with the index-build job (guide §2.6 — the
    two jobs are independent; the signature job back-fills the build's
    task tail) and pass them here so the probe skips recomputing them.
    The pruning prefix is always re-derived from ``bucket`` with the
    STORED ``pfx_chars``, so a caller cannot desynchronize the layout."""
    meta = _read_index_meta(index_path) or {}
    resolved = {}
    for name, passed, fallback in (
        ("num_hashes", num_hashes, 16),
        ("bands", bands, 4),
        ("shingle_k", shingle_k, 5),
        ("pfx_chars", pfx_chars, 1),
    ):
        stored = meta.get(name)
        if passed is not None and stored is not None and passed != stored:
            raise ValueError(
                f"band index at {index_path} was built with {name}={stored} "
                f"but the probe requested {name}={passed}; rebuild the index "
                f"or drop the argument to adopt the stored layout"
            )
        resolved[name] = passed if passed is not None else (
            stored if stored is not None else fallback
        )
    num_hashes, bands, shingle_k, pfx_chars = (
        resolved["num_hashes"], resolved["bands"],
        resolved["shingle_k"], resolved["pfx_chars"],
    )
    if precomputed_bands is not None:
        # pfx re-derived with the STORED width — the caller supplies
        # signatures, never the pruning layout
        nb = precomputed_bands.withColumn(
            "pfx", F.substring("bucket", 1, pfx_chars)
        )
    else:
        # no pre-checkpoint repartition: localCheckpoint discards
        # outputPartitioning (UnknownPartitioning — measured r11), so a
        # keyed repartition here only added an exchange to the
        # materialize job without the joins ever reusing it (r12)
        nb = materialize(
            minhash_bands(
                new_docs, text_col, id_col, num_hashes, bands, shingle_k
            ).withColumn("pfx", F.substring("bucket", 1, pfx_chars)),
            eager=True,
        )
    touched = [
        (r["band"], r["pfx"])
        for r in nb.select("band", "pfx").distinct().collect()
    ]  # metadata-sized: ≤ bands × 256
    idx = spark.read.parquet(index_path)
    # an OR-of-conjunctions on the partition columns — this shape reaches
    # the scan as a partition filter (struct().isin() does NOT). Built as
    # a BALANCED tree: a linear or-chain of hundreds of terms overflows
    # the column-node converter's recursion at plan time.
    terms = [
        (F.col("band") == b) & (F.col("pfx") == p) for b, p in touched
    ]
    while len(terms) > 1:
        terms = [
            terms[i] | terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    pruned = idx.filter(terms[0] if terms else F.lit(False))
    on = ["band", "bucket"]
    l, r = F.col(f"l.{id_col}"), F.col(f"r.{id_col}")
    # no repartition on the pruned index side: when the batch-vs-index
    # join broadcasts (the pruned scan is the sized side) the old
    # REPARTITION_BY_COL fed a full shuffle INTO the BroadcastExchange —
    # pure waste (plans/r12); when it sort-merges at scale, the join
    # plans its own exchange on the same keys, so removal is neutral
    cross = (
        nb.alias("l")
        .join(pruned.alias("r"), on)
        .select(F.least(l, r).alias("id_a"), F.greatest(l, r).alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    within = (
        nb.alias("l").join(nb.alias("r"), on).filter(l < r)
        .select(l.alias("id_a"), r.alias("id_b"))
    )
    return cross.unionAll(within).distinct()


# ---------------------------------------------------------------------------
# MinHash estimator quality (tuning diagnostic)
# ---------------------------------------------------------------------------


def minhash_estimate_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """How good is the MinHash sketch? Per exact-Jaccard decile over the
    LSH candidate pairs: pair count and the signature estimate's error
    statistics — ``(bucket, n_pairs, sum_err_ppm, sum_abs_err_ppm,
    max_abs_err_ppm)`` where ``est_ppm = matches·1e6 div num_hashes``
    and ``exact_ppm = |∩|·1e6 div |∪|``. The knob-tuning companion to
    ``sim_pair_dist_stats``: it tells you whether ``num_hashes`` is
    enough for the threshold you filter at (E[|err|] ~ 1/√num_hashes ≈
    0.25 at 16 hashes — visible directly in ``sum_abs_err_ppm/n``).

    Every statistic is an integer SUM (no division of possibly-negative
    totals — Spark's ``div`` truncates while DuckDB's ``//`` floors, so
    signed means are left to the reader). Plan: the candidate pairs +
    two hash joins against the signature table (16-int rows) + two
    joins against shingle sets for the exact intersection — all keyed
    on doc ids, bounded by |candidates|.
    """
    pairs = minhash_candidate_pairs(
        df, text_col, id_col, num_hashes, bands, shingle_k
    )
    sig = minhash_signature(df, text_col, id_col, num_hashes, shingle_k)
    sa = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_hashes)],
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_hashes)],
    )
    matches = None
    for i in range(num_hashes):
        t = (F.col(f"a{i}") == F.col(f"b{i}")).cast("long")
        matches = t if matches is None else matches + t
    est = pairs.join(sa, "id_a").join(sb, "id_b").select(
        "id_a", "id_b", matches.alias("m")
    ).select(
        "id_a", "id_b",
        F.expr(f"(1000000 * m) div {num_hashes}").alias("est_ppm"),
    )
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(char_shingles(text_col, shingle_k)).alias("sh"),
    )
    sizes = exploded.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    ea = exploded.select(F.col("id").alias("id_a"), "sh")
    eb = exploded.select(F.col("id").alias("id_b"), "sh")
    inter = (
        pairs.join(ea, "id_a")
        .join(eb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    za = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("za"))
    zb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("zb"))
    per = (
        est.join(inter, ["id_a", "id_b"], "left")
        .join(za, "id_a")
        .join(zb, "id_b")
        .select(
            "est_ppm",
            F.expr(
                "(1000000 * coalesce(i, 0)) div (za + zb - coalesce(i, 0))"
            ).alias("exact_ppm"),
        )
        .withColumn("err", F.col("est_ppm") - F.col("exact_ppm"))
    )
    return (
        per.groupBy(F.expr("exact_ppm div 100000").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("err").alias("sum_err_ppm"),
            F.sum(F.abs(F.col("err"))).alias("sum_abs_err_ppm"),
            F.max(F.abs(F.col("err"))).alias("max_abs_err_ppm"),
        )
    )


def minhash_estimate_quality_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> str:
    """DuckDB oracle for :func:`minhash_estimate_quality`."""
    sh = _char_shingles_sql(text_col, shingle_k)
    m = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return f"""
WITH pairs AS MATERIALIZED (
  {minhash_candidate_pairs_sql(table, text_col, id_col, num_hashes, bands, shingle_k)}
),
sig AS MATERIALIZED (
  {minhash_signature_sql(table, text_col, id_col, num_hashes, shingle_k)}
),
est AS (
  SELECT p.id_a, p.id_b,
         (1000000 * ({m})) // {num_hashes} AS est_ppm
  FROM pairs p
  JOIN sig sa ON sa.{id_col} = p.id_a
  JOIN sig sb ON sb.{id_col} = p.id_b
),
exploded AS (
  SELECT {id_col} AS id, unnest({sh}) AS sh FROM {table}
),
sizes AS (SELECT id, count(*) AS sz FROM exploded GROUP BY id),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS i
  FROM pairs p
  JOIN exploded a ON a.id = p.id_a
  JOIN exploded b ON b.id = p.id_b AND b.sh = a.sh
  GROUP BY p.id_a, p.id_b
),
per AS (
  SELECT e.est_ppm,
         (1000000 * coalesce(i.i, 0)) // (za.sz + zb.sz - coalesce(i.i, 0))
           AS exact_ppm
  FROM est e
  LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
  JOIN sizes za ON za.id = e.id_a
  JOIN sizes zb ON zb.id = e.id_b
)
SELECT exact_ppm // 100000 AS bucket,
       count(*) AS n_pairs,
       CAST(sum(est_ppm - exact_ppm) AS BIGINT) AS sum_err_ppm,
       CAST(sum(abs(est_ppm - exact_ppm)) AS BIGINT) AS sum_abs_err_ppm,
       CAST(max(abs(est_ppm - exact_ppm)) AS BIGINT) AS max_abs_err_ppm
FROM per
GROUP BY bucket
""".strip()


def dedup_canonical_best(
    df: DataFrame,
    pairs: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Quality-priority canonicalization: within each near-dup cluster
    keep the member with the HIGHEST ``score`` (ties → lowest id)
    instead of :func:`dedup_canonical`'s arbitrary min-id survivor —
    when duplicates differ in extraction quality, this is the variant a
    curation pipeline actually wants (keep the clean copy, drop the
    boilerplate-ridden one).

    ``score`` is ``(id_col, score_col)`` — any integer/exact-comparable
    quality signal (``corpus_lm_score`` surprisal negated, Gopher-rule
    pass counts, PageRank micro units…).

    Plan: clusters label only paired docs; one join to scores, one
    ``max_by`` hash aggregation per cluster picks the survivor, one
    LEFT ANTI against the loser list — every key uniform, drop side
    small in the common case (same shape as :func:`dedup_canonical`).
    """
    clusters = dedup_clusters(pairs, id_a=id_a, id_b=id_b)
    scored = clusters.join(
        score.select(F.col(id_col).alias("doc_id"), score_col), "doc_id"
    )
    winner = scored.groupBy("cluster_id").agg(
        F.max_by(
            F.col("doc_id"),
            F.struct(F.col(score_col), (-F.col("doc_id")).alias("nid")),
        ).alias("keep_id")
    )
    drop = (
        clusters.join(winner, "cluster_id")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return df.join(drop, on=id_col, how="left_anti")


def dedup_canonical_best_sql(
    table: str,
    pairs_sql: str,
    score_sql: str,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> str:
    """Oracle: winner-per-cluster via the exact closure + a window."""
    return f"""
WITH clusters AS MATERIALIZED ({dedup_clusters_sql(pairs_sql)}),
score AS MATERIALIZED ({score_sql}),
ranked AS (
  SELECT c.doc_id, c.cluster_id,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY s.{score_col} DESC, c.doc_id) AS rk
  FROM clusters c JOIN score s ON s.{id_col} = c.doc_id
),
drop AS (SELECT doc_id FROM ranked WHERE rk > 1)
SELECT t.* FROM {table} t
WHERE NOT EXISTS (SELECT 1 FROM drop d WHERE d.doc_id = t.{id_col})
""".strip()
