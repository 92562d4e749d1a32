"""Deterministic distributed k-means (spherical / cosine) for IVF codebooks.

``similarity.ivf_topk`` quantizes the corpus against a codebook; round 1
shipped a lowest-id stand-in with "swap in trained k-means offline". This
is that trainer, built so the *whole iterative fit is bit-reproducible
across engines and partitionings* — which makes even an iterative
algorithm value-hash checkable against a DuckDB oracle (the unrolled CTE
chain from :func:`kmeans_centroids_sql`):

- **Init**: the ``k`` lowest-id vectors (no RNG).
- **Assign**: cosine to each broadcast centroid, compared at full double
  precision (the fold and norms are the identical IEEE expression in
  both engines, so the bits match; a ``round(csim, 6)`` here would
  reintroduce Spark-HALF_UP vs DuckDB-half-even divergence at half
  boundaries), ties to the lowest centroid id.
- **Update**: per-dimension means accumulated in **fixed-point int64**
  (``floor(val·1e6)`` summed as longs, mean = truncating integer
  division). Float addition is not associative, so a double-sum's value
  depends on partitioning; integer sums don't — this is what buys
  run-to-run and engine-to-engine determinism. Centroids LIVE as micro
  ints between iterations; doubles are derived only by the exact
  ``micro / 1e6`` (both steps bit-identical in every engine — a
  ``round(mean, 6)`` variant was measured drifting 1 micro-unit on
  2/512 dims from Spark HALF_UP vs DuckDB half-even).
- **Empty cells** keep their previous centroid (standard Lloyd fallback).
- **Fixed iteration count** — no float-threshold stopping rule to flap.

Scale: the corpus never crosses the driver boundary. Per iteration: one
broadcast assignment join (codebook is k×dim), one (cid, pos)
aggregation whose shuffle carries k·dim map-side partials per partition
(not N·dim rows), and a k·dim int64 collect of the fixed-point means —
METADATA-scale, the same per-round driver round trip Spark MLlib's
KMeans makes (r11: this replaced a per-iteration codebook-rebuild
subplan of two more exchanges, a join and a localCheckpoint; values are
bit-identical because the floor/sum/`div` all stay JVM expressions and
only final int64s are collected). Train on a sample at 100 TB (any
deterministic filter works as the sampler); the plan shape is
iteration-count linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.similarity import (
    _dot,
    _norm,
    cosine_similarity_sql,
)
from arcane_framework_scala_spark.plans.materialize import materialize

_FP = 1_000_000  # fixed-point scale (micro-units)


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit ``k`` spherical-k-means centroids; returns
    ``(centroid_id, <vec_col> array<double>)``, deterministic in every
    environment (see module docstring).

    EAGER execution (r11, ADVICE r11): each Lloyd round collects the
    k·dim int64 means (metadata-scale, MLlib's own shape) and rebuilds
    the codebook as a local relation, so calling this function RUNS the
    fit — ``iters + 1`` jobs — rather than returning a lazy plan.
    Plan-only callers (EXPLAIN, plan audits, dry runs) pay the fit at
    call time; the returned codebook itself is a free local plan."""
    # Lloyd re-reads the corpus every iteration; materialize the slim
    # (id, vec, norm) projection ONCE instead of re-scanning parquet and
    # re-computing norms per round — on a cluster this is the standard
    # persist-the-training-set move (MEMORY_AND_DISK via the
    # materialize fault-tolerance switch), and `iters` scans of storage
    # become one. Lazy: the first iteration's assignment join is the
    # action that fills the blocks.
    emb = materialize(
        df.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            _norm(F.col(vec_col)).alias("vn"),
        ),
        eager=False,
    )

    spark = df.sparkSession

    def with_float_view(cmicro_df: DataFrame) -> DataFrame:
        cvec = F.transform(
            F.col("cmicro"), lambda x: x.cast("double") / F.lit(float(_FP))
        )
        return cmicro_df.withColumn("cvec", cvec).withColumn(
            "cn", _norm(F.col("cvec"))
        )

    def cent_frame(micro: dict[int, list[int]]) -> DataFrame:
        # LocalRelation of the k·dim fixed-point centroids: the float
        # view (cvec = cmicro / 1e6, cn) stays the IDENTICAL JVM
        # expression chain, so no float ever crosses the driver boundary
        rows = [(cid, micro[cid]) for cid in sorted(micro)]
        return with_float_view(
            spark.createDataFrame(rows, "cid long, cmicro array<long>")
        )

    # Init: the k lowest-id vectors, floored to micro IN THE JVM (the
    # same F.floor(x·1e6) expression as before) and collected — k·dim
    # int64s, metadata-scale.
    init = (
        emb.filter(F.col("vid") < k)
        .select(
            F.col("vid").cast("long").alias("cid"),
            F.transform(
                F.col("vec"),
                lambda x: F.floor(x.cast("double") * F.lit(float(_FP))).cast(
                    "long"
                ),
            ).alias("cmicro"),
        )
        .collect()
    )
    micro = {int(r["cid"]): list(r["cmicro"]) for r in init}
    for _ in range(iters):
        cent = cent_frame(micro)
        sims = emb.join(F.broadcast(cent)).select(
            "vid",
            "vec",
            "cid",
            (
                _dot(F.col("vec"), F.col("cvec"))
                / (F.col("vn") * F.col("cn"))
            ).alias("csim"),
        )
        # winner per vid via hash aggregation, not a sort window: max_by on
        # (csim, -cid) is the same total order (ties → lowest cid; Spark
        # ranks NaN largest in both codepaths), but partial aggregation
        # collapses the k× fan-out map-side instead of shuffling and
        # sorting all N·k rows
        assigned = (
            sims.groupBy("vid")
            .agg(
                F.max_by(
                    F.struct("cid", "vec"),
                    F.struct(F.col("csim"), (-F.col("cid")).alias("nc")),
                ).alias("best")
            )
            .select(F.col("best.cid").alias("cid"), F.col("best.vec").alias("vec"))
        )
        stats = assigned.select(
            "cid", F.posexplode("vec").alias("pos", "val")
        ).groupBy("cid", "pos").agg(
            F.sum(
                F.floor(
                    F.col("val").cast("double") * F.lit(float(_FP))
                ).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        # the update is k·dim int64 means — METADATA-scale, the same
        # shape Spark MLlib's KMeans collects every Lloyd round. `div`
        # stays the JVM expression (engine-exact integral division);
        # collecting it replaces the old per-iteration codebook-rebuild
        # subplan (groupBy(cid) + left join prev + localCheckpoint —
        # 2 extra exchanges and a checkpoint per round) with one driver
        # round trip. Empty cells keep their previous centroid exactly
        # as the old coalesce did (r11; values bit-identical, pinned by
        # the unchanged DuckDB oracle chain).
        means = stats.select(
            "cid", "pos", F.expr("s div n").alias("m")
        ).collect()
        upd: dict[int, dict[int, int]] = {}
        for r in means:
            upd.setdefault(int(r["cid"]), {})[int(r["pos"])] = int(r["m"])
        for cid, by_pos in upd.items():
            micro[cid] = [by_pos[p] for p in sorted(by_pos)]
    return cent_frame(micro).select(
        F.col("cid").alias("centroid_id"),
        F.col("cmicro"),
        F.col("cvec").alias(vec_col),
    )


def kmeans_centroids_fixed_point(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Gate-friendly flat view: ``(centroid_id, pos, c_micro int64)`` —
    the fitted codebook exploded per dimension in fixed-point micro
    units, so value hashing never touches float formatting."""
    cent = kmeans_fit(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    return cent.select(
        "centroid_id", F.posexplode("cmicro").alias("pos", "c_micro")
    )


def _kmeans_ctes(
    table: str, k: int, iters: int, id_col: str, vec_col: str
) -> tuple[list[str], str]:
    """Shared CTE chain for the DuckDB oracles; returns (ctes, fview)."""
    fview = (
        f"list_transform(cmicro, x -> CAST(x AS DOUBLE) / {_FP}.0)"
    )
    csim = cosine_similarity_sql("e.vec", "c.cvec")
    ctes = [
        f"""e AS (SELECT {id_col} AS vid, {vec_col} AS vec FROM {table}),
c0 AS (SELECT CAST({id_col} AS BIGINT) AS cid,
              list_transform({vec_col},
                             x -> CAST(floor(CAST(x AS DOUBLE) * {_FP}.0) AS BIGINT)) AS cmicro
       FROM {table} WHERE {id_col} < {k})"""
    ]
    for t in range(1, iters + 1):
        prev, cur = f"c{t - 1}", f"c{t}"
        ctes.append(
            f"""a{t} AS (
  SELECT vid, vec, cid FROM (
    SELECT e.vid, e.vec, c.cid,
           row_number() OVER (PARTITION BY e.vid
                              ORDER BY {csim} DESC, c.cid) AS rk
    FROM e JOIN (SELECT cid, {fview} AS cvec FROM {prev}) c ON true
  ) WHERE rk = 1
),
s{t} AS (
  SELECT cid, i - 1 AS pos,
         CAST(sum(CAST(floor(CAST(vec[i] AS DOUBLE) * {_FP}.0) AS BIGINT)) AS BIGINT) AS s,
         count(*) AS n
  FROM a{t} CROSS JOIN LATERAL (SELECT unnest(range(1, len(vec) + 1)) AS i) AS u(i)
  GROUP BY cid, i
),
n{t} AS (
  SELECT cid, list(s // n ORDER BY pos) AS cmicro
  FROM s{t} GROUP BY cid
),
{cur} AS (
  SELECT p.cid, coalesce(nw.cmicro, p.cmicro) AS cmicro
  FROM {prev} p LEFT JOIN n{t} nw ON p.cid = nw.cid
)"""
        )
    return ctes, fview


def kmeans_centroids_sql(
    table: str,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle: the fit unrolled as one CTE chain per iteration
    (assign → fixed-point update → rebuild), final codebook exploded to
    ``(centroid_id, pos, c_micro)``. Reproduces :func:`kmeans_fit`
    exactly because every accumulation is integer and every float step
    is the identical expression."""
    ctes, _ = _kmeans_ctes(table, k, iters, id_col, vec_col)
    return f"""
WITH {", ".join(ctes)}
SELECT cid AS centroid_id, i - 1 AS pos, cmicro[i] AS c_micro
FROM c{iters} CROSS JOIN LATERAL (SELECT unnest(range(1, len(cmicro) + 1)) AS i) AS u(i)
""".strip()


def kmeans_codebook_sql(
    table: str,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The fitted codebook as a nestable subquery yielding
    ``(centroid_id, <vec_col> DOUBLE[])`` — plug into
    ``similarity.ivf_topk_sql(cent_sql=...)``."""
    ctes, fview = _kmeans_ctes(table, k, iters, id_col, vec_col)
    return f"""(
WITH {", ".join(ctes)}
SELECT cid AS centroid_id, {fview} AS {vec_col} FROM c{iters}
)""".strip()
