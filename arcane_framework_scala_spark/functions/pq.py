"""Product quantization (PQ) with asymmetric-distance search (ADC).

The FAISS IVF-PQ workhorse, Spark-first: split each ``dim``-d embedding
into ``m`` subspaces, fit an independent deterministic k-means codebook
per subspace (``kmeans.kmeans_fit`` — fixed-point Lloyd, so the whole
fit is engine-reproducible), encode every vector as ``m`` small codes,
and answer top-k queries from a per-query lookup table (LUT) of
query-to-centroid dot products — the vectors themselves never touch the
search join.

Why this matters at 100 TB: a 64-d float corpus is 256 B/vector; PQ at
``m=4, ksub=8`` is 4 codes (≤4 B). The search plan joins the code table
(narrow ints) against a broadcast LUT of ``|queries|·m·ksub`` rows and
aggregates ``m`` integer partials per (query, vector) — no vector math
in the hot path, no shuffle of embeddings, candidate cost linear in
corpus size with a tiny constant. Compose with ``similarity.ivf_topk``
cells to prune the linear scan (IVF-PQ proper).

Determinism (repo rules, see ``kmeans.py``): LUT entries and centroid
norm-squares are ``floor(x·1e6)`` int64; per-pair sums are integer;
the final approximate cosine is ONE fixed float expression over those
ints (bit-identical across engines); ranking is on the floored
``score_micro`` with an id tiebreak, so ordering never compares raw
doubles.

Approximation contract: ``score = Σ_j q_j·c_{j,code_j} /
(‖q‖ · sqrt(Σ_j ‖c_{j,code_j}‖²))`` — the standard ADC estimate of
cosine with the reconstructed vector ``x̂ = (c_{1,code_1}, …)``.
Accuracy is measured, not assumed: pytest pins recall vs
``brute_force_topk`` on the driver embeddings (the same methodology as
``sim_ivf_recall``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.kmeans import (
    kmeans_codebook_sql,
)
from arcane_framework_scala_spark.functions.similarity import (
    _DOT_SQL,
    _NORM_SQL,
    _dot,
    _norm,
    _spread,
)

__all__ = [
    "pq_fit",
    "pq_encode",
    "pq_topk",
    "pq_rerank_topk",
    "ivfpq_topk",
    "build_ivfpq_index",
    "ivfpq_index_topk",
    "ivfpq_index_rerank",
    "ivfpq_topk_sql",
    "ivfpq_rerank_topk_sql",
    "pq_codes_sql",
    "pq_topk_sql",
    "pq_rerank_topk_sql",
]

_FP = 1_000_000


def _sub_rows(
    df: DataFrame, m: int, d: int, id_col: str, vec_col: str, out_id: str
) -> DataFrame:
    """Explode each vector into its ``m`` subvectors:
    ``(out_id, sub, svec)`` — a narrow ×m projection, no shuffle."""
    structs = [
        F.struct(
            F.lit(s).cast("int").alias("sub"),
            F.slice(F.col(vec_col), s * d + 1, d).alias("svec"),
        )
        for s in range(m)
    ]
    return df.select(F.col(id_col).alias(out_id), F.inline(F.array(*structs)))


def pq_fit(
    df: DataFrame,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace codebooks: ``(sub, centroid_id, cvec)``.

    Implemented as ONE grouped Lloyd fit — ``sub`` rides along as part
    of the centroid key, so all ``m`` subspaces train in the same
    ``iters`` plan stages instead of ``m`` sequential fits (measured
    ~3× faster at sf0.1 with bit-identical output: the fixed-point
    arithmetic of ``kmeans.kmeans_fit`` is partition- and
    grouping-independent, and the per-subspace DuckDB oracle chains
    still hash-match). Same conventions as ``kmeans_fit``: lowest-id
    init, ties to lowest centroid, int64 micro accumulation, empty
    cells keep their previous centroid."""
    from arcane_framework_scala_spark.plans.materialize import materialize

    d = dim // m
    emb = materialize(
        _sub_rows(df, m, d, id_col, vec_col, "vid").select(
            "vid", "sub", F.col("svec").alias("vec"),
            _norm(F.col("svec")).alias("vn"),
        ),
        eager=False,
    )

    def with_float_view(cmicro_df: DataFrame) -> DataFrame:
        cvec = F.transform(
            F.col("cmicro"), lambda x: x.cast("double") / F.lit(float(_FP))
        )
        return cmicro_df.withColumn("cvec", cvec).withColumn(
            "cn", _norm(F.col("cvec"))
        )

    cent = with_float_view(
        emb.filter(F.col("vid") < ksub).select(
            "sub",
            F.col("vid").cast("long").alias("cid"),
            F.transform(
                F.col("vec"),
                lambda x: F.floor(x.cast("double") * F.lit(float(_FP))).cast(
                    "long"
                ),
            ).alias("cmicro"),
        )
    )
    for _ in range(iters):
        sims = emb.join(F.broadcast(cent), "sub").select(
            "vid",
            "sub",
            "vec",
            "cid",
            (
                _dot(F.col("vec"), F.col("cvec"))
                / (F.col("vn") * F.col("cn"))
            ).alias("csim"),
        )
        assigned = (
            sims.groupBy("vid", "sub")
            .agg(
                F.max_by(
                    F.struct("cid", "vec"),
                    F.struct(F.col("csim"), (-F.col("cid")).alias("nc")),
                ).alias("best")
            )
            .select(
                "sub",
                F.col("best.cid").alias("cid"),
                F.col("best.vec").alias("vec"),
            )
        )
        stats = assigned.select(
            "sub", "cid", F.posexplode("vec").alias("pos", "val")
        ).groupBy("sub", "cid", "pos").agg(
            F.sum(
                F.floor(
                    F.col("val").cast("double") * F.lit(float(_FP))
                ).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        means = stats.select("sub", "cid", "pos", F.expr("s div n").alias("mv"))
        newc = means.groupBy("sub", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                lambda s: s["mv"],
            ).alias("cmicro")
        )
        cent = with_float_view(
            cent.alias("p")
            .join(newc.alias("nw"), ["sub", "cid"], "left")
            .select(
                "sub",
                "cid",
                F.coalesce(F.col("nw.cmicro"), F.col("p.cmicro")).alias(
                    "cmicro"
                ),
            )
        )
        cent = cent.localCheckpoint(eager=False)
    return cent.select(
        "sub", F.col("cid").alias("centroid_id"), F.col("cvec")
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector's subvectors to their nearest centroid
    (cosine, ties → lowest centroid id): ``(id_col, sub, code)``.

    Plan: subvector rows × broadcast codebook, winner per (id, sub) via
    ``max_by`` hash aggregation (map-side combined — never a sort
    window over the ×ksub fan-out)."""
    d = dim // m
    cb = codebooks.withColumn("cn", _norm(F.col("cvec")))
    rows = _sub_rows(df, m, d, id_col, vec_col, "vid").withColumn(
        "sn", _norm(F.col("svec"))
    )
    sims = rows.join(F.broadcast(cb), "sub").select(
        "vid",
        "sub",
        "centroid_id",
        (_dot(F.col("svec"), F.col("cvec")) / (F.col("sn") * F.col("cn"))).alias(
            "csim"
        ),
    )
    return (
        sims.groupBy("vid", "sub")
        .agg(
            F.max_by(
                F.col("centroid_id"),
                F.struct(
                    F.col("csim"), (-F.col("centroid_id")).alias("nc")
                ),
            ).alias("code")
        )
        .withColumnRenamed("vid", id_col)
    )


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: ``(query_id, vec_id, score_micro, rk)`` — approximate
    cosine ranked descending with id tiebreak, self excluded (the
    ``brute_force_topk`` conventions).

    ``codebooks`` — optional prefit ``pq_fit`` output (the production
    shape: train offline once, search many times). When omitted the
    codebook is fit in-query, which charges the Lloyd fit to every
    search call."""
    d = dim // m
    cb = (
        codebooks
        if codebooks is not None
        else pq_fit(embeddings, m, ksub, iters, dim, id_col, vec_col)
    )
    # norm² of each centroid in micro units — int64 from the fixed float
    # expression, so the per-vector Σ is an integer sum
    cbx = cb.withColumn(
        "cnsq_micro",
        F.floor(
            F.aggregate(
                F.transform(
                    F.col("cvec"), lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            * F.lit(float(_FP))
        ).cast("long"),
    )
    # reuse ONE codebook evaluation for encode + LUT: the Lloyd lineage
    # is iters-deep and feeds two consumers (cf. kmeans_fit's own note)
    cbx = cbx.localCheckpoint(eager=False)
    codes = pq_encode(embeddings, cbx.select("sub", "centroid_id", "cvec"),
                      m, dim, id_col, vec_col)
    qsub = _sub_rows(
        embeddings.filter(F.col(id_col).isin(query_ids)),
        m, d, id_col, vec_col, "query_id",
    )
    lut = qsub.join(F.broadcast(cbx), "sub").select(
        "query_id",
        "sub",
        F.col("centroid_id").alias("code"),
        F.floor(_dot(F.col("svec"), F.col("cvec")) * F.lit(float(_FP)))
        .cast("long")
        .alias("dm"),
        "cnsq_micro",
    )
    cand = _spread(codes).join(F.broadcast(lut), ["sub", "code"])
    agg = cand.groupBy("query_id", id_col).agg(
        F.sum("dm").alias("s_micro"),
        F.sum("cnsq_micro").alias("nsq_micro"),
    )
    qn = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), _norm(F.col(vec_col)).alias("qn")
    )
    score = (F.col("s_micro") / F.lit(float(_FP))) / (
        F.col("qn") * F.sqrt(F.col("nsq_micro") / F.lit(float(_FP)))
    )
    scored = (
        agg.join(F.broadcast(qn), "query_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.floor(score * F.lit(float(_FP))).cast("long").alias(
                "score_micro"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "score_micro", "rk")
    )


def pq_rerank_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = 100,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """The production PQ pattern: ADC builds a ``shortlist``-sized
    candidate set from codes alone, then exact cosine reranks ONLY the
    shortlist — ``|queries|·shortlist`` full dot products instead of
    ``|queries|·N``. Output matches ``brute_force_topk``:
    ``(query_id, vec_id, sim, rk)``.

    Measured on the driver's uniform-random embeddings (ANN's worst
    case — no cluster structure, similarity gaps are tiny):
    ADC@10 recall 0.20, rerank-of-ADC@100 recall 0.62 vs exact top-10
    (deterministic, so these are exact, not averages). Real embedding
    corpora cluster heavily and sit far above this floor."""
    cand = pq_topk(
        embeddings, query_ids, shortlist, m, ksub, iters, dim, id_col,
        vec_col, codebooks,
    ).select("query_id", id_col)
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    qn = _norm(F.col("__qvec"))
    xn = _norm(F.col(vec_col))
    scored = (
        cand.join(embeddings.select(id_col, vec_col), id_col)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(
                _dot(F.col("__qvec"), F.col(vec_col)) / (qn * xn), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "sim", "rk")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """The full FAISS composition: IVF coarse cells prune the corpus to
    the probed lists, PQ/ADC scores ONLY those candidates from codes —
    the linear ADC pass of :func:`pq_topk` becomes
    ``corpus × n_probe / n_centroids`` per query, with still no vector
    math in the hot path.

    Simplification vs FAISS: codes quantize the raw vectors, not the
    cell residuals (cosine ADC over raw codes — the residual variant
    needs per-cell codebooks and buys accuracy, not plan shape).

    Coarse assignment mirrors ``similarity.ivf_topk`` exactly
    (``round(csim, 6)``, centroid-id tiebreak), so IVF-PQ's candidate
    sets equal IVF's. At 100 TB, store the code table partitioned by
    cell (``similarity.build_ivf_index`` does this for vectors) and the
    probe becomes a partition-pruned read instead of this gate's
    vid-keyed join."""
    from arcane_framework_scala_spark.functions.similarity import _spread

    d = dim // m
    cent = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cell"),
        F.col(vec_col).alias("__cellvec"),
        _norm(F.col(vec_col)).alias("__celln"),
    )

    def assign(df: DataFrame, take: int, out_id: str) -> DataFrame:
        sims = (
            df.select(
                F.col(id_col).alias(out_id),
                F.col(vec_col).alias("__v"),
                _norm(F.col(vec_col)).alias("__vn"),
            )
            .join(F.broadcast(cent))
            .select(
                out_id,
                "cell",
                F.round(
                    _dot(F.col("__v"), F.col("__cellvec"))
                    / (F.col("__vn") * F.col("__celln")),
                    6,
                ).alias("__csim"),
            )
        )
        w = Window.partitionBy(out_id).orderBy(
            F.desc("__csim"), F.asc("cell")
        )
        return (
            sims.withColumn("__crk", F.row_number().over(w))
            .filter(F.col("__crk") <= take)
            .select(out_id, "cell")
        )

    assigned = assign(_spread(embeddings), 1, "vid")
    probes = assign(
        embeddings.filter(F.col(id_col).isin(query_ids)), n_probe, "query_id"
    )
    cand = assigned.join(F.broadcast(probes), "cell").filter(
        F.col("vid") != F.col("query_id")
    ).select("query_id", "vid")

    cb = (
        codebooks
        if codebooks is not None
        else pq_fit(embeddings, m, ksub, iters, dim, id_col, vec_col)
    )
    cbx = cb.withColumn(
        "cnsq_micro",
        F.floor(
            F.aggregate(
                F.transform(
                    F.col("cvec"), lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            * F.lit(float(_FP))
        ).cast("long"),
    ).localCheckpoint(eager=False)
    codes = pq_encode(
        embeddings, cbx.select("sub", "centroid_id", "cvec"),
        m, dim, id_col, vec_col,
    ).withColumnRenamed(id_col, "vid")
    qsub = _sub_rows(
        embeddings.filter(F.col(id_col).isin(query_ids)),
        m, d, id_col, vec_col, "query_id",
    )
    lut = qsub.join(F.broadcast(cbx), "sub").select(
        "query_id",
        "sub",
        F.col("centroid_id").alias("code"),
        F.floor(_dot(F.col("svec"), F.col("cvec")) * F.lit(float(_FP)))
        .cast("long")
        .alias("dm"),
        "cnsq_micro",
    )
    scored_parts = (
        cand.join(codes, "vid")
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "vid")
        .agg(
            F.sum("dm").alias("s_micro"),
            F.sum("cnsq_micro").alias("nsq_micro"),
        )
    )
    qn = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), _norm(F.col(vec_col)).alias("qn")
    )
    score = (F.col("s_micro") / F.lit(float(_FP))) / (
        F.col("qn") * F.sqrt(F.col("nsq_micro") / F.lit(float(_FP)))
    )
    scored = scored_parts.join(F.broadcast(qn), "query_id").select(
        "query_id",
        F.col("vid").alias(id_col),
        F.floor(score * F.lit(float(_FP))).cast("long").alias("score_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "score_micro", "rk")
    )


def _with_cnsq(cb: DataFrame) -> DataFrame:
    """Codebook + per-centroid ‖c‖² in int64 micro (the ADC denominator
    partial — shared by pq_topk / ivfpq_topk / the persisted index)."""
    return cb.withColumn(
        "cnsq_micro",
        F.floor(
            F.aggregate(
                F.transform(
                    F.col("cvec"), lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            * F.lit(float(_FP))
        ).cast("long"),
    )


def build_ivfpq_index(
    embeddings: DataFrame,
    out_path: str,
    n_centroids: int = 8,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
) -> None:
    """Materialize the IVF-PQ index (build once, search many — the
    production shape ``similarity.build_ivf_index`` proves for float
    vectors, here for 4-byte codes):

    - ``{out}/codes``  — long-format PQ codes ``(vid, sub, code)``
      written **PARTITIONED BY** the coarse ``cell``, so a search reads
      ``n_probe / n_centroids`` of the code table via parquet partition
      pruning — and the codes are ints, ~64× narrower than the vectors;
    - ``{out}/cells``  — the coarse centroid table;
    - ``{out}/codebooks`` — the PQ codebooks with ``cnsq_micro``
      precomputed (the fit never re-runs at search time).

    Cell assignment and encoding mirror :func:`ivfpq_topk` bit-for-bit
    (round-6 cosine, ties → lowest cell / lowest code), so
    :func:`ivfpq_index_topk` hash-matches the in-memory composition."""
    cent = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cell"),
        F.col(vec_col).alias("cellvec"),
    )
    cx = cent.select(
        "cell", "cellvec", _norm(F.col("cellvec")).alias("__celln")
    )
    sims = (
        _spread(embeddings)
        .select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("__v"),
            _norm(F.col(vec_col)).alias("__vn"),
        )
        .join(F.broadcast(cx))
        .select(
            "vid",
            "cell",
            F.round(
                _dot(F.col("__v"), F.col("cellvec"))
                / (F.col("__vn") * F.col("__celln")),
                6,
            ).alias("__csim"),
        )
    )
    assigned = (
        sims.groupBy("vid")
        .agg(
            F.max_by(
                F.col("cell"),
                F.struct(F.col("__csim"), (-F.col("cell")).alias("nc")),
            ).alias("cell")
        )
    )
    cb = (
        codebooks
        if codebooks is not None
        else pq_fit(embeddings, m, ksub, iters, dim, id_col, vec_col)
    )
    # EAGER checkpoint (k·m rows): the codebook feeds two of the three
    # concurrent write jobs below — settling it first makes the overlap
    # race-free (a lazy checkpoint materialized by two jobs at once can
    # double-compute)
    cbx = _with_cnsq(cb).localCheckpoint(eager=True)
    codes = pq_encode(
        embeddings, cbx.select("sub", "centroid_id", "cvec"),
        m, dim, id_col, vec_col,
    ).withColumnRenamed(id_col, "vid")
    # the three index tables are INDEPENDENT write jobs — submit them
    # from a pool so the tiny cells/codebooks writes back-fill executors
    # idled by the codes job's task tail (guide §2.6; r11)
    from concurrent.futures import ThreadPoolExecutor

    def _w_codes() -> None:
        (
            codes.join(assigned, "vid")
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(out_path + "/codes")
        )

    def _w_cells() -> None:
        cent.write.mode("overwrite").parquet(out_path + "/cells")

    def _w_cb() -> None:
        cbx.write.mode("overwrite").parquet(out_path + "/codebooks")

    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [pool.submit(f) for f in (_w_codes, _w_cells, _w_cb)]
        for f in futs:
            f.result()


def _coarse_probes(
    queries: DataFrame,
    cent: DataFrame,
    n_probe: int,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, DataFrame, list]:
    """Shared coarse planning step for the persisted-index searchers:
    assign each query its ``n_probe`` nearest cells (round-6 cosine,
    ties on cell id — the :func:`ivf_topk` convention) and collect the
    distinct probed cell ids for partition pruning. Returns
    ``(q, probes, probed)`` where ``q`` is the normalized query side,
    ``probes`` is (query_id, cell), and ``probed`` the driver-side id
    list (|queries| × n_probe ints — metadata-scale, the same
    planning-time collect an Iceberg partition filter performs).

    Factored out (ADVICE r5) so :func:`ivfpq_index_rerank` plans ONE
    probe assignment instead of recomputing the query×cells join and a
    second collect after :func:`ivfpq_index_topk` already ran it.

    The returned ``probes`` frame is a LOCAL RELATION rebuilt from the
    collected rows (r12): the old form collected the DISTINCT cells for
    pruning and then re-evaluated the whole probe subtree (query scan ×
    broadcast cells join × window) a second time inside every search
    job that broadcast it. One collect of the |queries| × n_probe
    assignment rows feeds both consumers — same values, one evaluation
    (guide §5; the same metadata-scale collect-and-localize shape as
    kmeans_fit's r11 codebook rebuild)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    cx = cent.select(
        "cell", "cellvec", _norm(F.col("cellvec")).alias("__celln")
    )
    probes = (
        q.join(F.broadcast(cx))
        .select(
            "query_id",
            "cell",
            F.round(
                _dot(F.col("__qvec"), F.col("cellvec"))
                / (F.col("__qn") * F.col("__celln")),
                6,
            ).alias("__csim"),
        )
        .withColumn(
            "__crk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("__csim"), F.asc("cell")
                )
            ),
        )
        .filter(F.col("__crk") <= n_probe)
        .select("query_id", "cell")
    )
    rows = probes.collect()  # |queries| × n_probe — metadata-scale
    probes_local = queries.sparkSession.createDataFrame(
        rows, probes.schema
    )
    probed = sorted({r["cell"] for r in rows})
    return q, probes_local, probed


def ivfpq_index_topk(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_plan: tuple[DataFrame, DataFrame, list] | None = None,
) -> DataFrame:
    """Search a :func:`build_ivfpq_index` index. ``queries`` is a
    ``(id_col, vec_col)`` DataFrame (queries arrive from outside the
    index — the index stores codes, not vectors). Result semantics are
    identical to :func:`ivfpq_topk` over the same cells + codebooks:
    ``(query_id, vec_id, score_micro, rk)``, self excluded.

    Scale shape: probed cell ids are collected to the driver
    (|queries| × n_probe ints — the same planning-time collect an
    Iceberg partition filter performs) and pushed into the codes scan as
    a partition filter; the LUT and probe tables broadcast; the ADC
    aggregation touches only probed-cell code rows. Search I/O =
    ``n_probe / n_centroids`` of an already-~64×-compressed table."""
    cent = spark.read.parquet(index_path + "/cells")
    cbx = spark.read.parquet(index_path + "/codebooks")
    codes = spark.read.parquet(index_path + "/codes")
    # m and subvector width from the codebook itself (k·m rows —
    # metadata-scale). Read it driver-side via pyarrow instead of a
    # Spark aggregate job: one fewer job per search, the same
    # planning-cost class as the jar-free readers' footer reads (r11).
    # The fast path is taken ONLY for an explicitly-local absolute path
    # (ADVICE r11): a relative path or a non-local default filesystem
    # would let a coincidentally-present local dir yield wrong (m, d)
    # silently — those resolve through the Spark aggregate below.
    import glob as _glob

    import pyarrow.parquet as _pq

    _local = index_path.removeprefix("file://")
    _files = (
        sorted(_glob.glob(os.path.join(_local, "codebooks", "*.parquet")))
        if os.path.isabs(_local)
        and (index_path.startswith("file://") or "://" not in index_path)
        else []
    )
    if _files:
        m = 0
        d = 0
        for _f in _files:
            t = _pq.ParquetFile(_f).read(columns=["sub", "cvec"])
            subs = t.column("sub").to_pylist()
            if subs:
                m = max(m, max(subs) + 1)
            for cv in t.column("cvec").to_pylist():
                if cv is not None:
                    d = max(d, len(cv))
    else:  # non-local index storage: fall back to the aggregate job
        meta = cbx.agg(
            (F.max("sub") + 1).alias("m"), F.max(F.size("cvec")).alias("d")
        ).collect()[0]
        m, d = int(meta["m"]), int(meta["d"])

    # planning-time partition pruning: probed cells only (reuse the
    # caller's probe plan when provided — ADVICE r5)
    q, probes, probed = (
        probe_plan
        if probe_plan is not None
        else _coarse_probes(queries, cent, n_probe, id_col, vec_col)
    )
    lut = (
        _sub_rows(queries, m, d, id_col, vec_col, "query_id")
        .join(F.broadcast(cbx), "sub")
        .select(
            "query_id",
            "sub",
            F.col("centroid_id").alias("code"),
            F.floor(_dot(F.col("svec"), F.col("cvec")) * F.lit(float(_FP)))
            .cast("long")
            .alias("dm"),
            "cnsq_micro",
        )
    )
    scored_parts = (
        codes.filter(F.col("cell").isin(probed))
        .join(F.broadcast(probes), "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "vid")
        .agg(
            F.sum("dm").alias("s_micro"),
            F.sum("cnsq_micro").alias("nsq_micro"),
        )
    )
    qn = q.select("query_id", F.col("__qn").alias("qn"))
    score = (F.col("s_micro") / F.lit(float(_FP))) / (
        F.col("qn") * F.sqrt(F.col("nsq_micro") / F.lit(float(_FP)))
    )
    scored = scored_parts.join(F.broadcast(qn), "query_id").select(
        "query_id",
        F.col("vid").alias(id_col),
        F.floor(score * F.lit(float(_FP))).cast("long").alias("score_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "score_micro", "rk")
    )


def ivfpq_index_rerank(
    spark,
    pq_index_path: str,
    vec_index_path: str,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 100,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The complete persisted serving path: partition-pruned ADC over
    the :func:`build_ivfpq_index` code table produces a ``shortlist``,
    then exact cosine reranks ONLY the shortlist against the float
    vectors stored in a :func:`similarity.build_ivf_index` layout —
    reading just the probed cells of BOTH indexes.

    This is :func:`pq_rerank_topk`'s accuracy recipe (codes propose,
    floats decide) composed with both persisted index layouts: total
    search I/O = ``n_probe / n_centroids`` of the ~64×-compressed code
    table plus the same fraction of the vector table, and the exact
    pass touches ``|queries| × shortlist`` vectors, never the corpus.
    Output matches ``brute_force_topk``: ``(query_id, vec_id, sim, rk)``.

    The two indexes MUST share the coarse centroid convention or the
    shortlist's candidates may live outside the probed partitions of the
    vector index and silently drop; that requirement is now VALIDATED at
    search time (ADVICE r5): both metadata tables (pq ``cells``, vec
    ``codebook`` — each ≤ n_centroids rows) are collected and compared,
    and a mismatch raises ``ValueError`` instead of returning fewer
    than k rows."""
    from arcane_framework_scala_spark.functions.similarity import (
        _dot as _sdot,
    )

    cent = spark.read.parquet(pq_index_path + "/cells")
    vcb = spark.read.parquet(vec_index_path + "/codebook")
    pq_cells = {
        (int(r["cell"]), tuple(r["cellvec"])) for r in cent.collect()
    }
    vec_cells = {
        (int(r["centroid_id"]), tuple(r[vec_col])) for r in vcb.collect()
    }
    if pq_cells != vec_cells:
        raise ValueError(
            "ivfpq_index_rerank: the PQ index and the vector index were "
            "built with DIFFERENT coarse centroids "
            f"({len(pq_cells)} vs {len(vec_cells)} cells, "
            f"{len(pq_cells & vec_cells)} shared) — rebuild one of them "
            "with the other's centroids so probed partitions agree"
        )

    # ONE coarse probe assignment, shared with the shortlist search
    # (ADVICE r5 — previously recomputed the query×cells join + collect)
    probe_plan = _coarse_probes(queries, cent, n_probe, id_col, vec_col)
    q, _probes, probed = probe_plan
    cand = ivfpq_index_topk(
        spark, pq_index_path, queries, k=shortlist, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col, probe_plan=probe_plan,
    ).select("query_id", id_col)
    # vector index stores (centroid_id, id, vec, vec_norm) partitioned by
    # centroid_id — read only the probed cells
    lists = spark.read.parquet(vec_index_path + "/lists").filter(
        F.col("centroid_id").isin(probed)
    )
    scored = (
        cand.join(lists.select(id_col, vec_col, "vec_norm"), id_col)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(
                _sdot(F.col("__qvec"), F.col(vec_col))
                / (F.col("__qn") * F.col("vec_norm")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "sim", "rk")
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------


def _cb_union_sql(
    table: str, m: int, ksub: int, iters: int, dim: int,
    id_col: str, vec_col: str,
) -> str:
    """(sub, centroid_id, cvec) — per-subspace trained codebooks; each
    subspace's Lloyd chain is a self-contained nested WITH, so no CTE
    name collisions."""
    d = dim // m
    parts = []
    for s in range(m):
        sliced = (
            f"(SELECT {id_col} AS vec_id, "
            f"list_slice({vec_col}, {s * d + 1}, {(s + 1) * d}) AS embedding "
            f"FROM {table})"
        )
        cb = kmeans_codebook_sql(sliced, k=ksub, iters=iters)
        parts.append(
            f"SELECT {s} AS sub, centroid_id, embedding AS cvec FROM {cb}"
        )
    return " UNION ALL ".join(parts)


def pq_codes_sql(
    table: str = "embeddings",
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`pq_encode` over trained codebooks."""
    d = dim // m
    csim = (
        f"({_DOT_SQL.format(a='r.svec', b='c.cvec')} / "
        f"({_NORM_SQL.format(a='r.svec')} * {_NORM_SQL.format(a='c.cvec')}))"
    )
    return f"""
WITH cb AS ({_cb_union_sql(table, m, ksub, iters, dim, id_col, vec_col)}),
sr AS (
  SELECT {id_col} AS vid, s.sub,
         list_slice({vec_col}, s.sub * {d} + 1, (s.sub + 1) * {d}) AS svec
  FROM {table}
  CROSS JOIN (SELECT unnest(range(0, {m})) AS sub) AS s
)
SELECT vid AS {id_col}, sub, code FROM (
  SELECT r.vid, r.sub, c.centroid_id AS code,
         row_number() OVER (PARTITION BY r.vid, r.sub
                            ORDER BY {csim} DESC, c.centroid_id) AS rk
  FROM sr r JOIN cb c ON r.sub = c.sub
) WHERE rk = 1
""".strip()


def pq_topk_sql(
    table: str = "embeddings",
    query_ids: list[int] | None = None,
    k: int = 10,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`pq_topk` — the identical integer LUT/ADC
    arithmetic, so the ranking hash-matches."""
    d = dim // m
    ids = ", ".join(str(i) for i in query_ids or [])
    csim = (
        f"({_DOT_SQL.format(a='r.svec', b='c.cvec')} / "
        f"({_NORM_SQL.format(a='r.svec')} * {_NORM_SQL.format(a='c.cvec')}))"
    )
    qdot = _DOT_SQL.format(a="q.svec", b="c.cvec")
    sqn = (
        "list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * "
        "CAST(x AS DOUBLE)))"
    )
    return f"""
WITH cb AS ({_cb_union_sql(table, m, ksub, iters, dim, id_col, vec_col)}),
cbx AS (
  SELECT sub, centroid_id, cvec,
         CAST(floor({sqn} * {_FP}.0) AS BIGINT) AS cnsq_micro
  FROM cb
),
sr AS (
  SELECT {id_col} AS vid, s.sub,
         list_slice({vec_col}, s.sub * {d} + 1, (s.sub + 1) * {d}) AS svec
  FROM {table}
  CROSS JOIN (SELECT unnest(range(0, {m})) AS sub) AS s
),
codes AS (
  SELECT vid, sub, code FROM (
    SELECT r.vid, r.sub, c.centroid_id AS code,
           row_number() OVER (PARTITION BY r.vid, r.sub
                              ORDER BY {csim} DESC, c.centroid_id) AS rk
    FROM sr r JOIN cbx c ON r.sub = c.sub
  ) WHERE rk = 1
),
lut AS (
  SELECT q.vid AS query_id, q.sub, c.centroid_id AS code,
         CAST(floor({qdot} * {_FP}.0) AS BIGINT) AS dm,
         c.cnsq_micro
  FROM (SELECT * FROM sr WHERE vid IN ({ids})) q
  JOIN cbx c ON q.sub = c.sub
),
agg AS (
  SELECT l.query_id, co.vid,
         CAST(sum(l.dm) AS BIGINT) AS s_micro,
         CAST(sum(l.cnsq_micro) AS BIGINT) AS nsq_micro
  FROM codes co JOIN lut l ON co.sub = l.sub AND co.code = l.code
  GROUP BY l.query_id, co.vid
),
qn AS (
  SELECT {id_col} AS query_id, {_NORM_SQL.format(a=vec_col)} AS qn
  FROM {table} WHERE {id_col} IN ({ids})
),
scored AS (
  SELECT a.query_id, a.vid,
         CAST(floor(((s_micro / {_FP}.0) /
                     (qn.qn * sqrt(nsq_micro / {_FP}.0))) * {_FP}.0)
              AS BIGINT) AS score_micro
  FROM agg a JOIN qn ON a.query_id = qn.query_id
  WHERE a.vid != a.query_id
)
SELECT query_id, vid AS {id_col}, score_micro, CAST(rk AS INT) AS rk FROM (
  SELECT query_id, vid, score_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, vid) AS rk
  FROM scored
) WHERE rk <= {k}
""".strip()


def ivfpq_topk_sql(
    table: str = "embeddings",
    query_ids: list[int] | None = None,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`ivfpq_topk` — IVF candidate CTEs (the
    ``ivf_topk_sql`` conventions) composed with the PQ ADC arithmetic."""
    d = dim // m
    ids = ", ".join(str(i) for i in query_ids or [])
    from arcane_framework_scala_spark.functions.similarity import (
        cosine_similarity_sql,
    )

    cellsim = cosine_similarity_sql(f"e.{vec_col}", f"c.{vec_col}")
    csim = (
        f"({_DOT_SQL.format(a='r.svec', b='c.cvec')} / "
        f"({_NORM_SQL.format(a='r.svec')} * {_NORM_SQL.format(a='c.cvec')}))"
    )
    qdot = _DOT_SQL.format(a="q.svec", b="c.cvec")
    sqn = (
        "list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * "
        "CAST(x AS DOUBLE)))"
    )
    return f"""
WITH cent AS (
  SELECT {id_col} AS centroid_id, {vec_col} FROM {table}
  WHERE {id_col} < {n_centroids}
),
cellasg AS (
  SELECT e.{id_col} AS vid, c.centroid_id AS cell,
         row_number() OVER (PARTITION BY e.{id_col}
                            ORDER BY round({cellsim}, 6) DESC,
                                     c.centroid_id) AS crk
  FROM {table} e JOIN cent c ON true
),
assigned AS (SELECT vid, cell FROM cellasg WHERE crk = 1),
probes AS (
  SELECT vid AS query_id, cell FROM cellasg
  WHERE crk <= {n_probe} AND vid IN ({ids})
),
cand AS (
  SELECT DISTINCT p.query_id, a.vid
  FROM assigned a JOIN probes p ON a.cell = p.cell
  WHERE a.vid != p.query_id
),
cb AS ({_cb_union_sql(table, m, ksub, iters, dim, id_col, vec_col)}),
cbx AS (
  SELECT sub, centroid_id, cvec,
         CAST(floor({sqn} * {_FP}.0) AS BIGINT) AS cnsq_micro
  FROM cb
),
sr AS (
  SELECT {id_col} AS vid, s.sub,
         list_slice({vec_col}, s.sub * {d} + 1, (s.sub + 1) * {d}) AS svec
  FROM {table}
  CROSS JOIN (SELECT unnest(range(0, {m})) AS sub) AS s
),
codes AS (
  SELECT vid, sub, code FROM (
    SELECT r.vid, r.sub, c.centroid_id AS code,
           row_number() OVER (PARTITION BY r.vid, r.sub
                              ORDER BY {csim} DESC, c.centroid_id) AS rk
    FROM sr r JOIN cbx c ON r.sub = c.sub
  ) WHERE rk = 1
),
lut AS (
  SELECT q.vid AS query_id, q.sub, c.centroid_id AS code,
         CAST(floor({qdot} * {_FP}.0) AS BIGINT) AS dm,
         c.cnsq_micro
  FROM (SELECT * FROM sr WHERE vid IN ({ids})) q
  JOIN cbx c ON q.sub = c.sub
),
agg AS (
  SELECT ca.query_id, ca.vid,
         CAST(sum(l.dm) AS BIGINT) AS s_micro,
         CAST(sum(l.cnsq_micro) AS BIGINT) AS nsq_micro
  FROM cand ca
  JOIN codes co ON ca.vid = co.vid
  JOIN lut l ON l.query_id = ca.query_id AND l.sub = co.sub
            AND l.code = co.code
  GROUP BY ca.query_id, ca.vid
),
qn AS (
  SELECT {id_col} AS query_id, {_NORM_SQL.format(a=vec_col)} AS qn
  FROM {table} WHERE {id_col} IN ({ids})
),
scored AS (
  SELECT a.query_id, a.vid,
         CAST(floor(((s_micro / {_FP}.0) /
                     (qn.qn * sqrt(nsq_micro / {_FP}.0))) * {_FP}.0)
              AS BIGINT) AS score_micro
  FROM agg a JOIN qn ON a.query_id = qn.query_id
)
SELECT query_id, vid AS {id_col}, score_micro, CAST(rk AS INT) AS rk FROM (
  SELECT query_id, vid, score_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, vid) AS rk
  FROM scored
) WHERE rk <= {k}
""".strip()


def ivfpq_rerank_topk_sql(
    table: str = "embeddings",
    query_ids: list[int] | None = None,
    k: int = 10,
    shortlist: int = 100,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`ivfpq_index_rerank` — the IVF-PQ
    shortlist SQL nested as the candidate source, exact cosine on the
    shortlist only (the :func:`pq_rerank_topk_sql` shape with the
    IVF-pruned ADC inside)."""
    ids = ", ".join(str(i) for i in query_ids or [])
    adc = ivfpq_topk_sql(
        table, query_ids, shortlist, n_centroids, n_probe, m, ksub,
        iters, dim, id_col, vec_col,
    )
    from arcane_framework_scala_spark.functions.similarity import (
        cosine_similarity_sql,
    )

    sim = cosine_similarity_sql("q.qvec", f"e.{vec_col}")
    return f"""
WITH cand AS (SELECT query_id, {id_col} FROM ({adc})),
q AS (
  SELECT {id_col} AS query_id, {vec_col} AS qvec FROM {table}
  WHERE {id_col} IN ({ids})
),
scored AS (
  SELECT c.query_id, c.{id_col}, round({sim}, 6) AS sim
  FROM cand c
  JOIN {table} e ON e.{id_col} = c.{id_col}
  JOIN q ON q.query_id = c.query_id
)
SELECT query_id, {id_col}, sim, CAST(rk AS INT) AS rk FROM (
  SELECT query_id, {id_col}, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, {id_col}) AS rk
  FROM scored
) WHERE rk <= {k}
""".strip()


def pq_rerank_topk_sql(
    table: str = "embeddings",
    query_ids: list[int] | None = None,
    k: int = 10,
    shortlist: int = 100,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`pq_rerank_topk` — the ADC shortlist SQL
    nested as a candidate source, exact cosine on the shortlist only."""
    ids = ", ".join(str(i) for i in query_ids or [])
    adc = pq_topk_sql(
        table, query_ids, shortlist, m, ksub, iters, dim, id_col, vec_col
    )
    from arcane_framework_scala_spark.functions.similarity import (
        cosine_similarity_sql,
    )

    sim = cosine_similarity_sql("q.qvec", f"e.{vec_col}")
    return f"""
WITH cand AS (SELECT query_id, {id_col} FROM ({adc})),
q AS (
  SELECT {id_col} AS query_id, {vec_col} AS qvec FROM {table}
  WHERE {id_col} IN ({ids})
),
scored AS (
  SELECT c.query_id, c.{id_col}, round({sim}, 6) AS sim
  FROM cand c
  JOIN {table} e ON e.{id_col} = c.{id_col}
  JOIN q ON q.query_id = c.query_id
)
SELECT query_id, {id_col}, sim, CAST(rk AS INT) AS rk FROM (
  SELECT query_id, {id_col}, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, {id_col}) AS rk
  FROM scored
) WHERE rk <= {k}
""".strip()
