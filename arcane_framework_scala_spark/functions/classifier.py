"""Quality classifier: logistic regression over hashed text features,
trained in-engine by fixed-point gradient descent.

The GPT-3 / CCNet quality-filter recipe (public: Brown et al. 2020
§Appendix A; the fasttext filter in CCNet, Wenzek et al. 2020): train a
linear classifier that separates a small high-quality REFERENCE domain
from the raw corpus, then keep documents the classifier scores
reference-like. This is the discriminative sibling of the repo's two
other quality signals — generative surprisal (``lm.unigram_logprob``)
and distribution-ratio importance (``lm.dsir_weights``).

Spark-first, deterministic (the kmeans/pq fixed-point playbook — see
docs/DETERMINISM.md):

- features are the sparse hashed unigram counts (``lm.hashed_features``,
  md5-bucketed, engine-portable);
- the weight vector lives in int64 MICRO units; each GD iteration
  computes per-doc margins as pure integer dot products
  (``Σ cnt·w_micro``), squashes through ONE float sigmoid expression,
  floors the per-doc residual to micro, and integer-sums the per-bucket
  gradient — so partition order never moves a weight;
- the learning-rate step is integer division (``grad div (2·N)`` for
  lr = ½ averaged), bit-identical across engines;
- per-iteration ``localCheckpoint`` (lazy) truncates the lineage the
  same way ``kmeans_fit`` does.

Scale: the weight vector is ``dim`` rows — broadcast to the margin
join every iteration; gradients are one map-side-combined groupBy per
iteration over the sparse features (shuffle rows ≤ dim). The corpus
never moves; iteration count is fixed and small. At 100 TB, fit on a
sample (the fit-once/prefit pattern every trainer in this repo uses)
and score the full corpus with the broadcast weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.lm import (
    hashed_features,
    hashed_features_sql,
)

__all__ = [
    "quality_classifier_fit",
    "quality_classifier_score",
    "quality_classifier_score_sql",
]

_FP = 1_000_000


def quality_classifier_fit(
    df: DataFrame,
    target_pred,
    iters: int = 3,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    feats: DataFrame | None = None,
) -> DataFrame:
    """Train the logistic weights: ``(bucket, w_micro int64)``.
    ``target_pred`` rows are the positive (reference-domain) class;
    everything else is negative. lr = ½, averaged over N docs.
    ``feats`` accepts an already-materialized ``hashed_features`` output
    (the score path passes its own so the text featurization runs ONCE
    per query instead of once per consumer — r11, guide §5); ids must be
    unique in ``df``, the same assumption the fit itself makes."""
    from arcane_framework_scala_spark.plans.materialize import materialize

    own_feats = feats is None
    if own_feats:
        feats = hashed_features(df, dim, text_col, id_col)
    labels = df.select(
        F.col(id_col),
        F.when(target_pred, F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    if not own_feats:
        # caller-materialized feats leave fx unmaterialized, so the
        # 2·iters+1 consumers would each re-scan df and re-evaluate
        # target_pred; one narrow (id, y) checkpoint makes the per-
        # iteration cost independent of target_pred complexity
        # (ADVICE r11; guide §5)
        labels = materialize(labels, eager=False)
    n_docs = df.count()  # 1 scalar, fixed for the whole fit
    fx = feats.join(labels, id_col)
    if own_feats:
        fx = materialize(fx, eager=False)  # iters consumers of the join
    # (caller-materialized feats: the label join is a cheap broadcast
    # over checkpointed rows, so fx needs no second materialization)

    w = fx.select("bucket").distinct().select(
        "bucket", F.lit(0).cast("long").alias("w_micro")
    )
    for _ in range(iters):
        margins = (
            fx.join(F.broadcast(w), "bucket")
            .groupBy(id_col, "y")
            .agg(F.sum(F.col("cnt") * F.col("w_micro")).alias("m_micro"))
        )
        # residual: ONE float expression over the integer margin, floored
        # back to micro — (sigmoid(m) − y) ∈ (−1, 1)
        resid = margins.select(
            F.col(id_col),
            F.floor(
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(-(F.col("m_micro") / F.lit(float(_FP))))
                    )
                    - F.col("y")
                )
                * F.lit(float(_FP))
            )
            .cast("long")
            .alias("g_micro"),
        )
        grad = (
            fx.join(resid, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("cnt") * F.col("g_micro")).alias("grad"))
        )
        w = (
            w.join(grad, "bucket", "left")
            .select(
                "bucket",
                (
                    F.col("w_micro")
                    - F.expr(f"coalesce(grad, 0L) div {2 * n_docs}")
                ).alias("w_micro"),
            )
            .localCheckpoint(eager=False)
        )
    return w


def quality_classifier_score(
    df: DataFrame,
    target_pred=None,
    iters: int = 3,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: DataFrame | None = None,
) -> DataFrame:
    """Score every document: ``(doc_id, score_micro, reference_like)``
    where score = sigmoid of the weight dot product, floored to micro,
    and ``reference_like`` = score ≥ ½. ``weights`` accepts a prefit
    ``quality_classifier_fit`` output (fit-once production shape);
    otherwise ``target_pred`` is required and the fit runs in-query."""
    feats = hashed_features(df, dim, text_col, id_col)
    if weights is None:
        if target_pred is None:
            raise ValueError("need target_pred (to fit) or prefit weights")
        # ONE text featurization for fit AND scoring (r11): materialize
        # the sparse features and hand them to the fit — the old plan
        # ran the explode+md5+groupBy text pass once for the fit's fx
        # and AGAIN for the scoring margins
        from arcane_framework_scala_spark.plans.materialize import (
            materialize,
        )

        feats = materialize(feats, eager=False)
        weights = quality_classifier_fit(
            df, target_pred, iters, dim, text_col, id_col, feats=feats
        )
    # LEFT join + coalesce(0): with prefit (sample-fit) weights, a doc
    # whose tokens all hash to buckets unseen at fit time must still get
    # a score row — at margin 0, i.e. score ½ — not silently vanish
    # (ADVICE r4 item 3). The in-query-fit path covers every corpus
    # bucket, so this is a no-op there.
    margins = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("cnt") * F.coalesce(F.col("w_micro"), F.lit(0))
            ).alias("m_micro")
        )
    )
    # Every doc gets a row (ADVICE r5): a doc with ZERO extracted
    # features (empty/whitespace text) yields no hashed_features rows at
    # all, so the aggregate above has nothing to group — LEFT-join back
    # to the corpus ids with margin 0, i.e. score 500000, the same
    # "know-nothing" default the unseen-bucket coalesce gives.
    margins = (
        df.select(id_col)
        .join(margins, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("m_micro"), F.lit(0))
            .cast("long")
            .alias("m_micro"),
        )
    )
    score = F.floor(
        (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.col("m_micro") / F.lit(float(_FP)))))
        )
        * F.lit(float(_FP))
    ).cast("long")
    return margins.select(
        F.col(id_col),
        score.alias("score_micro"),
        (score >= F.lit(_FP // 2)).alias("reference_like"),
    )


def quality_classifier_score_sql(
    table: str,
    target_where: str,
    iters: int = 3,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle: the fit unrolled one CTE pair (residual, weights)
    per iteration — identical integer margins, the identical single
    sigmoid expression, identical flooring and lr division."""
    feats = hashed_features_sql(table, dim, text_col, id_col)
    sig = "(1.0 / (1.0 + exp(-(m_micro / 1000000.0))))"
    ctes = [
        f"feats AS MATERIALIZED ({feats})",
        f"""fx AS MATERIALIZED (
  SELECT f.{id_col}, f.bucket, f.cnt,
         CASE WHEN {target_where} THEN 1 ELSE 0 END AS y
  FROM feats f JOIN {table} d USING ({id_col})
)""",
        f"n AS (SELECT count(*) AS n_docs FROM {table})",
        """w0 AS (SELECT DISTINCT bucket, CAST(0 AS BIGINT) AS w_micro
       FROM fx)""",
    ]
    for t in range(1, iters + 1):
        p, c = f"w{t - 1}", f"w{t}"
        ctes.append(
            f"""r{t} AS (
  SELECT {id_col},
         CAST(floor(({sig} - y) * 1000000.0) AS BIGINT) AS g_micro
  FROM (SELECT fx.{id_col}, fx.y,
               CAST(sum(fx.cnt * {p}.w_micro) AS BIGINT) AS m_micro
        FROM fx JOIN {p} USING (bucket)
        GROUP BY fx.{id_col}, fx.y)
),
{c} AS (
  SELECT {p}.bucket,
         CAST({p}.w_micro
              - coalesce(g.grad, 0) // (2 * (SELECT n_docs FROM n))
              AS BIGINT) AS w_micro
  FROM {p}
  LEFT JOIN (SELECT fx.bucket,
                    CAST(sum(fx.cnt * r{t}.g_micro) AS BIGINT) AS grad
             FROM fx JOIN r{t} USING ({id_col})
             GROUP BY fx.bucket) g ON {p}.bucket = g.bucket
)"""
        )
    # zero-feature docs coalesce to margin 0 after the LEFT join back to
    # the corpus ids (the Spark side's "every doc gets a row" contract)
    sig0 = sig.replace("m_micro", "coalesce(m_micro, 0)")
    return f"""
WITH {", ".join(ctes)},
margins AS (
  SELECT f.{id_col},
         CAST(sum(f.cnt * coalesce(w.w_micro, 0)) AS BIGINT) AS m_micro
  FROM feats f LEFT JOIN w{iters} w USING (bucket)
  GROUP BY f.{id_col}
),
scores AS (
  SELECT d.{id_col},
         CAST(floor({sig0} * 1000000.0) AS BIGINT) AS score_micro
  FROM (SELECT {id_col} FROM {table}) d
  LEFT JOIN margins USING ({id_col})
)
SELECT {id_col}, score_micro, score_micro >= 500000 AS reference_like
FROM scores
""".strip()
