"""Fixed-point PageRank over a document graph — link-analysis quality
scoring for corpus curation.

Web-scale curation pipelines weight documents by link authority
(Common Crawl's harmonic-centrality ranks, OPIC scores); this is that
operator over any edge list — here the near-dup candidate graph doubles
as the demo input, but hyperlink/citation edges are the production use.

All arithmetic is int64 fixed-point (micro units) so the iterative
computation is engine- and partition-independent (the ``kmeans.py``
methodology applied to power iteration):

    pr'(v) = floor(0.15·1e6) + (85 · Σ_{u→v} (pr(u) div deg(u))) div 100

with integer division at every step. ``pr`` starts at 1.0 (1e6 micro).
Isolated vertices keep the damping base. This is PageRank's fixed-point
cousin, not a float replica — the ranking behavior is the same, the
bits are reproducible.

Scale shape: per iteration ONE (edge ⋈ rank) hash join keyed on the
source vertex + ONE destination-keyed aggregation — the textbook
Pregel-in-DataFrames step. Degrees compute once. ``localCheckpoint``
per round truncates the iterative lineage exactly like the Lloyd loop.
At 100 TB: ranks/degrees are (id, int) pairs — orders of magnitude
smaller than the corpus; skewed hubs salt like any hot key
(`operators/salting.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

__all__ = ["pagerank_fixed_point", "pagerank_sql"]

_FP = 1_000_000
_BASE = 150_000  # floor(0.15 * 1e6)


def _undirect(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Both directions of an undirected edge list, self-loops dropped."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    return fwd.unionByName(rev).filter(F.col("u") != F.col("v")).distinct()


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(vertex, pr_micro) after ``iters`` damped power iterations over
    the undirected graph (both directions of each edge)."""
    e = _undirect(edges, src, dst).localCheckpoint(eager=False)
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    verts = e.select(F.col("u").alias("vertex")).distinct()
    ranks = verts.withColumn("pr", F.lit(_FP).cast("long")).localCheckpoint(
        eager=False
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.u == ranks.vertex)
            .join(deg, "u")
            .select(F.col("v"), F.expr("pr div deg").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            verts.join(contrib, verts.vertex == contrib.v, "left")
            .select(
                "vertex",
                (
                    F.lit(_BASE)
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                ).cast("long").alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("vertex", F.col("pr").alias("pr_micro"))


def pagerank_sql(
    pairs_sql: str,
    iters: int = 3,
    src: str = "id_a",
    dst: str = "id_b",
) -> str:
    """DuckDB oracle: the identical integer recurrence unrolled."""
    ctes = [
        f"""pairs AS MATERIALIZED ({pairs_sql}),
e AS (
  SELECT DISTINCT u, v FROM (
    SELECT {src} AS u, {dst} AS v FROM pairs
    UNION ALL
    SELECT {dst} AS u, {src} AS v FROM pairs
  ) WHERE u != v
),
deg AS (SELECT u, count(*) AS deg FROM e GROUP BY u),
verts AS (SELECT DISTINCT u AS vertex FROM e),
r0 AS (SELECT vertex, CAST({_FP} AS BIGINT) AS pr FROM verts)"""
    ]
    for t in range(1, iters + 1):
        prev = f"r{t - 1}"
        ctes.append(
            f"""c{t} AS (
  SELECT e.v, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
  FROM e JOIN {prev} p ON e.u = p.vertex JOIN deg d ON e.u = d.u
  GROUP BY e.v
),
r{t} AS (
  SELECT verts.vertex,
         CAST({_BASE} + (85 * coalesce(c{t}.s, 0)) // 100 AS BIGINT) AS pr
  FROM verts LEFT JOIN c{t} ON verts.vertex = c{t}.v
)"""
        )
    return (
        f"WITH {', '.join(ctes)}\n"
        f"SELECT vertex, pr AS pr_micro FROM r{iters}"
    )
