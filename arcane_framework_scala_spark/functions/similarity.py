"""Embedding similarity search: brute-force cosine top-k + sign-LSH scale path.

The baseline is exact brute-force cosine against a small query set — the
query side broadcasts, so the big side never shuffles; ranking is a window
per query. The scale path is random-hyperplane (sign) LSH: signatures come
from deterministic ±1 hyperplanes derived from md5 (seeded, reproducible on
any engine — no runtime RNG), bucket join replaces the O(n²) cross join.

Numeric note: dot products fold left-to-right in double on both Spark
(`aggregate`) and DuckDB (`list_sum(list_transform(...))`) — verified
bit-identical — so similarity values and rank orders match the oracle
exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions._parallel import spread_for_compute as _spread


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float/double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


_DOT_SQL = (
    "list_sum(list_transform(range(1, len({a})+1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_NORM_SQL = (
    "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def cosine_similarity_sql(a: str, b: str) -> str:
    dot = _DOT_SQL.format(a=a, b=b)
    return f"({dot} / ({_NORM_SQL.format(a=a)} * {_NORM_SQL.format(a=b)}))"


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization per vector: ``q = floor(x * 127 /
    max_abs)``, plus the per-row scale needed to dequantize. 4× storage
    reduction for an ANN corpus (the standard vector-store compression);
    exact integer output so the driver gate hash-checks it. Narrow
    projection — zero shuffles; max_abs is a per-row array fold, not an
    aggregation. Scale is exported in exact micro-units (int64) to stay
    float-format-proof."""
    c = F.col(vec_col)
    max_abs = F.array_max(F.transform(c, lambda x: F.abs(x.cast("double"))))
    q = F.transform(
        c,
        lambda x: F.floor(
            x.cast("double") * F.lit(127.0) / F.col("__ma")
        ).cast("int"),
    )
    return (
        df.select(F.col(id_col), c, max_abs.alias("__ma"))
        .filter(F.col("__ma") > 0)
        .select(
            F.col(id_col),
            q.alias("q8"),
            F.floor(F.col("__ma") * 1_000_000).cast("long").alias(
                "scale_micro"
            ),
        )
    )


def quantize_embeddings_sql(
    table: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    return f"""
SELECT {id_col},
       list_transform({vec_col},
         x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / ma) AS INT)) AS q8,
       CAST(floor(ma * 1000000) AS BIGINT) AS scale_micro
FROM (
  SELECT {id_col}, {vec_col},
         list_max(list_transform({vec_col}, x -> abs(CAST(x AS DOUBLE)))) AS ma
  FROM {table}
)
WHERE ma > 0
""".strip()


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    (query_id, vec_id, sim, rk): rank by sim desc with vec_id tiebreak —
    fully deterministic. The query side is tiny → broadcast hash join; the
    corpus streams through one stage, then one shuffle for the per-query
    window."""
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    pairs = _spread(embeddings).join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    sim = pairs.select(
        "query_id",
        id_col,
        F.round(cosine_similarity(F.col("__qvec"), F.col(vec_col)), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        sim.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "sim", "rk")
    )


def brute_force_topk_sql(
    table: str,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    sim = cosine_similarity_sql("q.qvec", f"e.{vec_col}")
    return f"""
WITH q AS (
  SELECT {id_col} AS query_id, {vec_col} AS qvec FROM {table}
  WHERE {id_col} IN ({ids})
), ranked AS (
  SELECT q.query_id, e.{id_col}, round({sim}, 6) AS sim,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY round({sim}, 6) DESC, e.{id_col}) AS rk
  FROM q JOIN {table} e ON e.{id_col} != q.query_id
)
SELECT query_id, {id_col}, sim, CAST(rk AS INT) AS rk FROM ranked WHERE rk <= {k}
"""


# ---------------------------------------------------------------------------
# Sign-LSH (random hyperplanes, deterministic)
# ---------------------------------------------------------------------------


def _lit_num_array(values) -> Column:
    """A literal numeric array as ONE parsed expression. The
    ``F.array(*[F.lit(v) for v in values])`` form costs one py4j round
    trip PER element (~0.5 ms each — a 512-entry table burned ~0.5 s of
    driver time per call, measured r11); a single ``F.expr`` string
    parses JVM-side in ~2 ms with identical literal values. Ints render
    as bigint (``L``), floats via ``repr`` (shortest round-trip — parses
    back to the identical double) with a ``D`` suffix."""
    parts = []
    for v in values:
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise TypeError(f"numeric literals only, got {type(v)}")
        if isinstance(v, int):
            parts.append(f"{v}L")
        else:
            r = repr(v)
            if "inf" in r or "nan" in r:
                raise ValueError("non-finite literal in array")
            parts.append(r + "D")
    return F.expr("array(" + ",".join(parts) + ")")


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """±1 hyperplanes derived from md5 — reproducible everywhere, no RNG."""
    planes = []
    for b in range(bits):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}|{b}|{i}".encode()).digest()[0]
            row.append(1.0 if h % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def _bucket_expr(vec_col: str, dim: int, bits: int, seed: int) -> Column:
    """Sign-LSH bucket id as a single expression: `bits` dot products
    against literal planes (Catalyst folds them), summed as bit weights."""
    planes = hyperplanes(dim, bits, seed)
    bit_cols = []
    for b, plane in enumerate(planes):
        proj = _dot(F.col(vec_col), _lit_num_array(plane))
        bit_cols.append(F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
    bucket = bit_cols[0]
    for c in bit_cols[1:]:
        bucket = bucket + c
    return bucket.cast("int")


def lsh_signature(
    embeddings: DataFrame,
    dim: int,
    bits: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): sign bits of projections onto the seeded hyperplanes.
    Planes are literals folded by Catalyst — per-row cost is `bits` dot
    products, no shuffle."""
    return _spread(embeddings).select(
        F.col(id_col), _bucket_expr(vec_col, dim, bits, seed).alias("bucket")
    )


def _bucket_sql(vec_col: str, dim: int, bits: int, seed: int) -> str:
    planes = hyperplanes(dim, bits, seed)
    terms = []
    for b, plane in enumerate(planes):
        arr = "[" + ", ".join(str(v) for v in plane) + "]"
        proj = _DOT_SQL.format(a=vec_col, b=arr)
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << b} ELSE 0 END)")
    return f"CAST({' + '.join(terms)} AS INT)"


def lsh_signature_sql(
    table: str,
    dim: int,
    bits: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    bucket = _bucket_sql(vec_col, dim, bits, seed)
    return f"SELECT {id_col}, {bucket} AS bucket FROM {table}"


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus
    into ``n_centroids`` cells, probe the ``n_probe`` nearest cells per
    query, exact cosine only within probed cells.

    Default centroids are the ``n_centroids`` lowest-id vectors — a
    deterministic stand-in for a k-means codebook; pass
    ``centroids=kmeans.kmeans_fit(...)`` (``(centroid_id, <vec_col>)``)
    for a trained codebook — the plan shape is identical either way.

    Plan shape: the codebook broadcasts to the assignment join with norms
    precomputed, so every cosine is a single dot-product fold over carried
    norm columns (not dot + two norm folds). The corpus never shuffles for
    candidates either: probe rows (|queries| × n_probe) broadcast to the
    inverted lists, and only scored (query_id, id, sim) triples — never
    vectors — reach a shuffle. Candidate volume is corpus × n_probe /
    n_centroids per query, the IVF contract. Fully deterministic: rank
    ties break on id.

    A literal-codebook variant (collect centroids, assign via a sorted
    array of per-cell structs — zero assignment join/window) was measured
    2× SLOWER at sf0.1: the literal-heavy interpreted expression tree
    loses to the codegen-friendly join + Tungsten window sort, the same
    lesson as the rejected dot-product unrolling (docs/SCALE.md)."""
    cent_src = (
        centroids
        if centroids is not None
        else embeddings.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col)
        )
    )
    cent = cent_src.select(
        "centroid_id",
        F.col(vec_col).alias("__cvec"),
        _norm(F.col(vec_col)).alias("__cn"),
    )

    def assign(df: DataFrame, take: int, out_id: str) -> DataFrame:
        sims = (
            df.select(
                F.col(id_col).alias(out_id),
                F.col(vec_col).alias(f"__{out_id}_vec"),
                _norm(F.col(vec_col)).alias(f"__{out_id}_n"),
            )
            .join(F.broadcast(cent))
            .select(
                out_id,
                f"__{out_id}_vec",
                f"__{out_id}_n",
                "centroid_id",
                F.round(
                    _dot(F.col(f"__{out_id}_vec"), F.col("__cvec"))
                    / (F.col(f"__{out_id}_n") * F.col("__cn")),
                    6,
                ).alias("__csim"),
            )
        )
        w = Window.partitionBy(out_id).orderBy(F.desc("__csim"), F.asc("centroid_id"))
        return (
            sims.withColumn("__crk", F.row_number().over(w))
            .filter(F.col("__crk") <= take)
            .drop("__csim", "__crk")
        )

    lists = assign(_spread(embeddings), 1, "corpus_id")
    probes = assign(embeddings.filter(F.col(id_col).isin(query_ids)), n_probe, "query_id")
    cand = lists.join(F.broadcast(probes), "centroid_id").filter(
        F.col("corpus_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("corpus_id").alias(id_col),
        F.round(
            _dot(F.col("__query_id_vec"), F.col("__corpus_id_vec"))
            / (F.col("__query_id_n") * F.col("__corpus_id_n")),
            6,
        ).alias("sim"),
    ).distinct()  # a corpus vector reachable via 2 probes scores once
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "sim", "rk")
    )


def build_ivf_index(
    embeddings: DataFrame,
    out_path: str,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> None:
    """Materialize the inverted file on storage: every corpus vector
    assigned to its nearest centroid (same rounding/tie rules as
    :func:`ivf_topk`), written **partitioned by** ``centroid_id`` with the
    norm precomputed, plus the codebook alongside.

    This is the 100 TB shape of IVF: at search time only the probed
    partitions are listed and read — parquet partition pruning turns the
    corpus scan into ``n_probe / n_centroids`` of the data, and the norm
    column amortizes the norm fold across every future search. Build cost
    is one broadcast assignment join + one partitioned write; rebuild on
    codebook refresh.
    """
    cent_src = (
        centroids
        if centroids is not None
        else embeddings.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col)
        )
    )
    cent = cent_src.select(
        "centroid_id",
        F.col(vec_col).alias("__cvec"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    sims = (
        _spread(embeddings)
        .select(
            F.col(id_col),
            F.col(vec_col),
            _norm(F.col(vec_col)).alias("vec_norm"),
        )
        .join(F.broadcast(cent))
        .select(
            id_col,
            vec_col,
            "vec_norm",
            "centroid_id",
            F.round(
                _dot(F.col(vec_col), F.col("__cvec"))
                / (F.col("vec_norm") * F.col("__cn")),
                6,
            ).alias("__csim"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__csim"), F.asc("centroid_id"))
    lists = (
        sims.withColumn("__crk", F.row_number().over(w))
        .filter(F.col("__crk") == 1)
        .select("centroid_id", id_col, vec_col, "vec_norm")
    )
    # lists and codebook are INDEPENDENT write jobs (both hang off the
    # embeddings scan) — run them concurrently so the k-row codebook
    # write back-fills the lists job's task tail (guide §2.6; r11)
    from concurrent.futures import ThreadPoolExecutor

    def _w_lists() -> None:
        lists.write.partitionBy("centroid_id").mode("overwrite").parquet(
            out_path + "/lists"
        )

    def _w_cb() -> None:
        cent_src.write.mode("overwrite").parquet(out_path + "/codebook")

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(f) for f in (_w_lists, _w_cb)]
        for f in futs:
            f.result()


def ivf_index_topk(
    spark,
    index_path: str,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a :func:`build_ivf_index` index; result semantics identical
    to :func:`ivf_topk` over the same codebook (round-6 cosine, rank ties
    on id, cross-probe duplicates scored once).

    Scale shape: the probed centroid ids are collected to the driver
    (|queries| × n_probe ints — metadata-scale, the same planning collect
    an Iceberg partition filter performs) and pushed into the scan as a
    partition filter, so only the probed inverted lists are read. Query
    vectors are |queries| rows; everything they touch broadcasts.
    """
    cent_src = spark.read.parquet(index_path + "/codebook")
    cent = cent_src.select(
        "centroid_id",
        F.col(vec_col).alias("__cvec"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    lists = spark.read.parquet(index_path + "/lists")
    queries = lists.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.col("vec_norm").alias("__qn"),
    )
    probes = (
        queries.join(F.broadcast(cent))
        .select(
            "query_id",
            "__qvec",
            "__qn",
            "centroid_id",
            F.round(
                _dot(F.col("__qvec"), F.col("__cvec"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ).alias("__csim"),
        )
        .withColumn(
            "__crk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("__csim"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("__crk") <= n_probe)
        .drop("__csim", "__crk")
    )
    # ONE evaluation of the probe subtree (r12): collect the |queries| ×
    # n_probe assignment rows (vectors included — metadata-scale) and
    # rebuild them as a local relation; the old form collected the
    # DISTINCT probed cells and then re-ran the query×codebook join +
    # window a second time inside the search job's broadcast (guide §5;
    # doubles round-trip bit-exactly through collect/createDataFrame)
    probe_rows = probes.collect()
    probes = spark.createDataFrame(probe_rows, probes.schema)
    probed_cids = sorted({r["centroid_id"] for r in probe_rows})
    cand = (
        lists.filter(F.col("centroid_id").isin(probed_cids))
        .join(F.broadcast(probes), "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
    )
    scored = cand.select(
        "query_id",
        id_col,
        F.round(
            _dot(F.col("__qvec"), F.col(vec_col))
            / (F.col("__qn") * F.col("vec_norm")),
            6,
        ).alias("sim"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "sim", "rk")
    )


def ivf_topk_sql(
    table: str,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_sql: str | None = None,
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    csim = cosine_similarity_sql(f"e.{vec_col}", f"c.{vec_col}")
    qsim = cosine_similarity_sql("q.qvec", f"l.vec")
    cent_body = (
        cent_sql
        if cent_sql is not None
        else f"SELECT {id_col} AS centroid_id, {vec_col} FROM {table} "
        f"WHERE {id_col} < {n_centroids}"
    )
    return f"""
WITH cent AS (
  SELECT * FROM ({cent_body})
), assigned AS (
  SELECT e.{id_col} AS vid, e.{vec_col} AS vec, c.centroid_id,
         row_number() OVER (PARTITION BY e.{id_col}
                            ORDER BY round({csim}, 6) DESC, c.centroid_id) AS crk
  FROM {table} e JOIN cent c ON true
), lists AS (
  SELECT vid, vec, centroid_id FROM assigned WHERE crk <= 1
), probes AS (
  SELECT vid AS query_id, vec AS qvec, centroid_id FROM assigned
  WHERE crk <= {n_probe} AND vid IN ({ids})
), scored AS (
  SELECT DISTINCT q.query_id, l.vid AS {id_col}, round({qsim}, 6) AS sim
  FROM probes q JOIN lists l ON l.centroid_id = q.centroid_id
  WHERE l.vid != q.query_id
)
SELECT query_id, {id_col}, sim, CAST(rk AS INT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, {id_col}) AS rk FROM scored)
WHERE rk <= {k}
"""


def lsh_bucket_neighbors(
    embeddings: DataFrame,
    dim: int,
    bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.7,
    max_bucket_rows: int = 100_000,
) -> DataFrame:
    """Approximate all-pairs similarity: exact cosine within LSH buckets.

    (id_a, id_b, sim) for same-bucket pairs with sim ≥ threshold. The
    bucket join bounds candidate fan-out (expected n²/2^bits per bucket);
    raise ``bits`` as the corpus grows — 100 TB guidance: keep expected
    bucket size ≤ ~1k rows so intra-bucket pairing stays cheap.

    ``max_bucket_rows`` is the skew guard for PATHOLOGICAL buckets the
    bits knob cannot fix (a near-duplicate-rich ball or a zero-vector
    pile hashes to ONE bucket no matter how many planes): buckets above
    the cap are salted into ``ceil(n/cap)`` hash blocks — the a-side
    keeps its block, the b-side replicates per block — so every pair
    still meets exactly once, per-task build side is bounded, and the
    output is byte-identical for any setting (the ``semantic_dedup``
    ``max_cell_rows`` construction; oracle unaffected).

    One pass over the input computes (id, vec, norm, bucket) — norm and
    bucket are plain projections; the projection is materialized once
    (lazy localCheckpoint) and feeds the bucket-count table and both
    self-join sides, so the bits+1 HOF folds per row run once. Per
    candidate pair the cost is a single dot product plus one
    multiply+divide: sim = dot(a, b) / (|a|·|b|) — the oracle uses the
    identical formula so float rounding matches.

    NOTE: do NOT repartition("bucket") to force exchange sharing (the
    trick minhash_candidate_pairs uses): with 2^bits buckets and small
    ``bits`` the key cardinality is below the core count, so the
    repartition serializes the pair join onto few partitions — measured
    2× slower at bits=6."""
    from arcane_framework_scala_spark.plans.materialize import materialize

    e = materialize(
        _spread(embeddings).select(
            F.col(id_col),
            F.col(vec_col),
            _norm(F.col(vec_col)).alias("__n"),
            _bucket_expr(vec_col, dim, bits, seed).alias("bucket"),
        ),
        eager=False,
    )
    # ≤ 2^bits rows — broadcast to both sides
    blocks = (
        e.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "bucket",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("__cnt") / F.lit(int(max_bucket_rows))),
            )
            .cast("int")
            .alias("__nb"),
        )
    )
    # B=1 fast path (VERDICT r5 item 1): the blocks table is
    # metadata-sized, so one scalar aggregate tells us whether ANY bucket
    # exceeds the cap. When none does (the common case — the guard exists
    # for pathological balls/zero-vector piles), skip the guard machinery
    # entirely: no broadcast join, no pmod, no per-row explode(sequence).
    # The collect also forces the lazy localCheckpoint of ``e``, which
    # every consumer below reuses, so the extra job is amortized. Output
    # is byte-identical on both paths (hypothesis twin pins it).
    max_nb = blocks.agg(F.max("__nb")).first()[0] or 1
    if max_nb <= 1:
        l = e.select(
            F.col("bucket"),
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
            F.col("__n").alias("na"),
        )
        r = e.select(
            F.col("bucket").alias("bucket_r"),
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"),
            F.col("__n").alias("nb"),
        )
        pairs = l.join(
            r,
            (F.col("bucket") == F.col("bucket_r"))
            & (F.col("id_a") < F.col("id_b")),
        )
    else:
        l = (
            e.join(F.broadcast(blocks), "bucket")
            .select(
                F.col("bucket"),
                F.pmod(F.hash(F.col(id_col)), F.col("__nb")).alias("__blk"),
                F.col(id_col).alias("id_a"),
                F.col(vec_col).alias("va"),
                F.col("__n").alias("na"),
            )
        )
        r = (
            e.join(F.broadcast(blocks), "bucket")
            .select(
                F.col("bucket").alias("bucket_r"),
                F.explode(
                    F.sequence(F.lit(0), F.col("__nb") - F.lit(1))
                ).alias("__blk_r"),
                F.col(id_col).alias("id_b"),
                F.col(vec_col).alias("vb"),
                F.col("__n").alias("nb"),
            )
        )
        pairs = l.join(
            r,
            (F.col("bucket") == F.col("bucket_r"))
            & (F.col("__blk") == F.col("__blk_r"))
            & (F.col("id_a") < F.col("id_b")),
        )
    sim = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
    )
    return (
        pairs.select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .distinct()
    )


def lsh_bucket_neighbors_sql(
    table: str,
    dim: int,
    bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.7,
) -> str:
    norm = _NORM_SQL.format(a=vec_col)
    bucket = _bucket_sql(vec_col, dim, bits, seed)
    dot = _DOT_SQL.format(a=f"a.{vec_col}", b=f"b.{vec_col}")
    sim = f"round({dot} / (a.n * b.n), 6)"
    return f"""
WITH e AS (SELECT {id_col}, {vec_col}, {norm} AS n, {bucket} AS bucket
           FROM {table})
SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b, {sim} AS sim
FROM e a JOIN e b ON a.bucket = b.bucket AND a.{id_col} < b.{id_col}
WHERE {sim} >= {threshold}
"""


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (hybrid retrieval)
# ---------------------------------------------------------------------------


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k_rrf: int = 60,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rk",
) -> DataFrame:
    """Reciprocal-rank fusion of two per-query rankings (the standard
    hybrid-retrieval combiner: dense + lexical, exact + quantized, …).

    ``rrf_micro = Σ_lists 1_000_000 div (k_rrf + rank)`` — integer
    division end-to-end, so the fused scores and ranks are exact in any
    SQL oracle. Candidates absent from one list contribute 0 for it
    (full-outer union of the two lists). Output: ``(query, id, rrf_micro,
    fused_rank)`` with a total-order tiebreak on the id.

    Scale: both inputs are already top-k-bounded per query (k·queries
    rows); the fuse is one full-outer hash join on (query, id) plus one
    per-query window — negligible next to the rankers themselves."""
    a = ranked_a.select(query_col, id_col, F.col(rank_col).alias("__rka"))
    b = ranked_b.select(query_col, id_col, F.col(rank_col).alias("__rkb"))
    fused = a.join(b, [query_col, id_col], "full_outer").select(
        query_col,
        id_col,
        (
            F.coalesce(
                F.expr(f"1000000 div ({k_rrf} + __rka)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 div ({k_rrf} + __rkb)"), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf_micro"), F.asc(id_col)
    )
    return fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))


def rrf_fuse_sql(
    ranked_a_sql: str,
    ranked_b_sql: str,
    k_rrf: int = 60,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rk",
) -> str:
    """DuckDB twin of :func:`rrf_fuse`; the two inputs are SQL snippets
    yielding ``(query_col, id_col, rank_col)``."""
    return f"""
WITH ra AS ({ranked_a_sql}),
rb AS ({ranked_b_sql}),
fused AS (
  SELECT coalesce(ra.{query_col}, rb.{query_col}) AS {query_col},
         coalesce(ra.{id_col}, rb.{id_col}) AS {id_col},
         CAST(coalesce(1000000 // ({k_rrf} + ra.{rank_col}), 0)
            + coalesce(1000000 // ({k_rrf} + rb.{rank_col}), 0) AS BIGINT)
           AS rrf_micro
  FROM ra FULL JOIN rb
    ON ra.{query_col} = rb.{query_col} AND ra.{id_col} = rb.{id_col}
)
SELECT {query_col}, {id_col}, rrf_micro,
       CAST(row_number() OVER (PARTITION BY {query_col}
            ORDER BY rrf_micro DESC, {id_col}) AS INT) AS fused_rank
FROM fused
"""


# ---------------------------------------------------------------------------
# ANN quality measurement
# ---------------------------------------------------------------------------


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query recall@k of an approximate top-k result against the
    exact one — the metric that closes the ANN loop (an index whose
    recall is unmeasured is a guess, not an operator). Both inputs are
    (query_id, vec_id, ...) top-k frames, e.g. :func:`ivf_topk` vs
    :func:`brute_force_topk`.

    Returns ``(query_id, hits, k, recall_ppm)`` with recall as exact
    integer parts-per-million (engine-stable, no float formatting).

    Plan: inner join on (query_id, id) — both sides are n_queries·k
    rows, so at any corpus scale this is a broadcast join over
    metadata-sized inputs; the expensive parts are the upstream top-k
    operators themselves."""
    a = approx.select("query_id", F.col(id_col).alias("__aid"))
    e = exact.select("query_id", F.col(id_col).alias("__aid"))
    hits = (
        a.join(e, ["query_id", "__aid"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    base = e.select("query_id").distinct()
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.lit(k).cast("long").alias("k"),
            F.expr(f"(1000000 * coalesce(hits, 0)) div {k}").alias(
                "recall_ppm"
            ),
        )
    )


def recall_at_k_sql(
    approx_sql: str,
    exact_sql: str,
    k: int,
    id_col: str = "vec_id",
) -> str:
    return f"""
WITH a AS MATERIALIZED ({approx_sql}),
e AS MATERIALIZED ({exact_sql}),
hits AS (
  SELECT a.query_id, count(*) AS hits
  FROM a JOIN e ON a.query_id = e.query_id AND a.{id_col} = e.{id_col}
  GROUP BY a.query_id
)
SELECT b.query_id,
       CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       CAST({k} AS BIGINT) AS k,
       (1000000 * coalesce(h.hits, 0)) // {k} AS recall_ppm
FROM (SELECT DISTINCT query_id FROM e) b LEFT JOIN hits h USING (query_id)
"""


def knn_label_accuracy(
    topk: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-quality eval: majority-vote kNN classification per
    query. Joins a top-k result (query_id, vec_id, rk) with a label
    table twice (neighbor labels + the query's own label) and reports
    (query_id, true_label, predicted_label, votes, correct) — the
    standard "do nearest neighbors share my label" probe for embedding
    sanity at corpus scale.

    Ties break to the SMALLEST label (deterministic on every engine).
    All joins are on ids (broadcast-able label side or uniform hash);
    the vote aggregation is rows = queries × k, metadata-sized."""
    lbl = labels.select(
        F.col(id_col).alias("__lid"), F.col(label_col).alias("__lbl")
    )
    votes = (
        topk.join(lbl, topk[id_col] == F.col("__lid"))
        .groupBy("query_id", "__lbl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    best = (
        votes.groupBy("query_id")
        .agg(
            F.max_by(
                F.struct(F.col("__lbl").alias("l"), F.col("votes").alias("v")),
                F.struct(F.col("votes"), (-F.col("__lbl")).alias("nl")),
            ).alias("best")
        )
        .select(
            "query_id",
            F.col("best.l").alias("predicted_label"),
            F.col("best.v").alias("votes"),
        )
    )
    truth = lbl.select(
        F.col("__lid").alias("query_id"), F.col("__lbl").alias("true_label")
    )
    return (
        best.join(truth, "query_id")
        .select(
            "query_id", "true_label", "predicted_label", "votes",
            (F.col("true_label") == F.col("predicted_label")).alias("correct"),
        )
    )


def knn_label_accuracy_sql(
    topk_sql: str,
    table: str = "embeddings",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> str:
    return f"""
WITH topk AS MATERIALIZED ({topk_sql}),
votes AS (
  SELECT t.query_id, e.{label_col} AS lbl, count(*) AS votes
  FROM topk t JOIN {table} e ON t.{id_col} = e.{id_col}
  GROUP BY t.query_id, e.{label_col}
),
best AS (
  SELECT query_id, lbl AS predicted_label, votes
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY votes DESC, lbl ASC) AS rn
        FROM votes) WHERE rn = 1
)
SELECT b.query_id, e.{label_col} AS true_label, b.predicted_label, b.votes,
       (e.{label_col} = b.predicted_label) AS correct
FROM best b JOIN {table} e ON b.query_id = e.{id_col}
"""
