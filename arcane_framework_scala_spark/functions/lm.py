"""Corpus language-model scoring (CCNet-style quality signal).

A unigram LM fitted on the corpus itself, scoring every document by its
mean token negative-log-probability — the cheap statistical stand-in for
the "perplexity under a reference LM" filter of CCNet/CC-100 pipelines
(Wenzek et al. 2020): documents whose token distribution diverges from
the corpus (gibberish, boilerplate, wrong language) score high and get
filtered or bucketed (head/middle/tail).

Two passes over the tokens, both relational:

1. **fit**: explode tokens → one groupBy(token) count + a 1-row total —
   the model is the (token, count) table. At 100 TB the distinct-token
   table is vocabulary-sized (Heaps-law sublinear, ~10^7-10^8 rows),
   broadcastable after a frequency cut or joined as a normal hash join.
2. **score**: re-explode, join token → count (broadcast when the vocab
   side fits, shuffle-hash otherwise), per-doc
   ``avg(-ln(count / total))``. Laplace-smoothed (+1) so unseen tokens
   (when scoring NEW docs against a FROZEN model) stay finite.

Float caveat, by design: ``ln`` is transcendental, so scores are
engine-equal only to rounding (the gate rounds to 6 decimals — ulp-level
libm differences and float-sum ordering vanish at that precision; exact
integer parity is impossible for a log score and not worth faking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def _tokens(text_col: str):
    return F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ).alias("__tok")


def unigram_model(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(token, n) counts over the whitespace-tokenized lowercased corpus
    — the fitted model. One explode + one map-side-combined groupBy."""
    return (
        df.select(_tokens(text_col))
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("__tok").alias("token"), "n")
    )


def unigram_logprob(
    df: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, avg_neg_logprob) — mean token surprisal under the
    unigram model (self-fitted when ``model`` is None). Lower = more
    corpus-typical; rank or threshold for head/middle/tail bucketing."""
    if model is None:
        model = unigram_model(df, text_col)
    total = model.agg(F.sum("n").alias("__total"))
    toks = df.select(F.col(id_col), _tokens(text_col)).select(
        F.col(id_col), F.col("__tok").alias("token")
    )
    scored = (
        toks.join(F.broadcast(model), "token", "left")
        .join(F.broadcast(total))
        # Laplace +1: finite for tokens absent from a frozen model
        .select(
            F.col(id_col),
            (
                -F.log(
                    (F.coalesce(F.col("n"), F.lit(0)) + 1)
                    / (F.col("__total") + 1)
                )
            ).alias("__nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("__nll"), 6).alias("avg_neg_logprob"),
    )


def unigram_logprob_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin; identical smoothing and rounding."""
    toks = (
        f"SELECT {id_col}, unnest(regexp_split_to_array(trim(lower({text_col})), "
        f"'\\s+')) AS token FROM {table}"
    )
    return f"""
WITH toks AS ({toks}),
model AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
total AS (SELECT sum(n) AS t FROM model)
SELECT {id_col}, count(*) AS n_tokens,
       round(avg(-ln((coalesce(m.n, 0) + 1) / (total.t + 1))), 6)
           AS avg_neg_logprob
FROM toks LEFT JOIN model m USING (token), total
GROUP BY {id_col}
"""


def hashed_features(
    df: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick featurizer (HashingVectorizer / VW style): tokens
    hash into ``dim`` buckets, value = in-doc count — the fixed-width,
    vocabulary-free text representation cheap linear classifiers train
    on at corpus scale. Emitted SPARSE as (id, bucket, cnt) rows — the
    natural relational form (dense arrays would be ~99% zeros and the
    driver gate cannot hash array cells anyway); densify at the model
    boundary if the trainer wants vectors.

    The bucket hash is the engine-portable md5→int64 used everywhere
    else in this package (xxhash64 differs across engines). One explode
    + one map-side-combined groupBy — shuffle rows ≤ docs × dim, in
    practice ≈ docs × distinct-tokens-per-doc."""
    toks = df.select(F.col(id_col), _tokens(text_col))
    bucket = (
        F.conv(F.substring(F.md5(F.col("__tok")), 1, 15), 16, 10)
        .cast("long") % dim
    ).alias("bucket")
    return (
        toks.select(F.col(id_col), bucket)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hashed_features_sql(
    table: str, dim: int = 1024, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    toks = (
        f"SELECT {id_col}, unnest(regexp_split_to_array(trim(lower({text_col})), "
        f"'\\s+')) AS tok FROM {table}"
    )
    bucket = (
        f"CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % {dim}"
    )
    return f"""
SELECT {id_col}, {bucket} AS bucket, count(*) AS cnt
FROM ({toks}) GROUP BY {id_col}, {bucket}
"""


def lm_buckets(
    df: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's head/middle/tail split: score every doc by unigram
    surprisal, cut the corpus at the exact ⅓ / ⅔ score terciles, label
    each doc's bucket. Head = most corpus-typical third.

    Scale note: the cut uses two percentile THRESHOLDS broadcast from a
    1-row aggregate, then a narrow comparison — never a global
    ``ntile`` window (which funnels the corpus through one task). The
    thresholds use exact interpolated ``percentile`` here (gate-
    verifiable); swap ``approx_percentile`` at 100 TB — bucket edges
    move by the sketch error, which is the accepted trade."""
    from arcane_framework_scala_spark.plans.materialize import materialize

    # doc-sized score table, two consumers (threshold agg + label join):
    # materialize once instead of re-running the surprisal chain (r11)
    scores = materialize(
        unigram_logprob(df, model=model, text_col=text_col, id_col=id_col),
        eager=False,
    )
    th = scores.agg(
        F.expr("percentile(avg_neg_logprob, 0.333)").alias("t1"),
        F.expr("percentile(avg_neg_logprob, 0.667)").alias("t2"),
    )
    s = F.col("avg_neg_logprob")
    return (
        scores.join(F.broadcast(th))
        .select(
            id_col,
            "n_tokens",
            "avg_neg_logprob",
            F.when(s <= F.col("t1"), F.lit("head"))
            .when(s <= F.col("t2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def lm_buckets_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    scores = unigram_logprob_sql(table, text_col, id_col)
    return f"""
WITH scores AS MATERIALIZED ({scores}),
th AS (SELECT quantile_cont(avg_neg_logprob, 0.333) AS t1,
              quantile_cont(avg_neg_logprob, 0.667) AS t2 FROM scores)
SELECT {id_col}, n_tokens, avg_neg_logprob,
       CASE WHEN avg_neg_logprob <= t1 THEN 'head'
            WHEN avg_neg_logprob <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scores, th
"""


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram-LM surprisal: mean -ln P(w_i | w_{i-1}) with Laplace
    smoothing over the corpus vocabulary — the next step up from
    :func:`unigram_logprob` (repetitive boilerplate looks fine to a
    unigram model but has predictable transitions; gibberish has
    unpredictable ones — the bigram score separates both).

    P(b|a) = (c(a,b) + 1) / (c(a,·) + V). Three relational passes, all
    keyed shuffles: token positions via posexplode, bigram counts,
    context counts + vocab size (broadcast). Scale: the bigram table is
    the big intermediate — O(distinct bigrams); at 100 TB cut the tail
    (count=1 bigrams dominate and contribute a constant smoothing term)
    or hash the context space."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("pos", "tok"),
    )
    nxt = toks.select(
        F.col(id_col), (F.col("pos") + 1).alias("pos"),
        F.col("tok").alias("prev"),
    )
    pairs = toks.join(nxt, [id_col, "pos"]).select(
        F.col(id_col), "prev", F.col("tok").alias("cur")
    )
    big = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("nb"))
    ctx = big.groupBy("prev").agg(F.sum("nb").alias("nc"))
    vocab = toks.agg(
        F.countDistinct("tok").cast("long").alias("__v")
    )
    scored = (
        pairs.join(F.broadcast(big), ["prev", "cur"])
        .join(F.broadcast(ctx), "prev")
        .join(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (
                -F.log((F.col("nb") + 1) / (F.col("nc") + F.col("__v")))
            ).alias("__nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__nll"), 6).alias("avg_neg_logprob"),
    )


def bigram_logprob_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    toks = (
        f"SELECT {id_col}, generate_subscripts(a, 1) AS pos, unnest(a) AS tok "
        f"FROM (SELECT {id_col}, regexp_split_to_array(trim(lower({text_col})), "
        f"'\\s+') AS a FROM {table})"
    )
    return f"""
WITH toks AS MATERIALIZED ({toks}),
pairs AS (
  SELECT t.{id_col}, p.tok AS prev, t.tok AS cur
  FROM toks t JOIN toks p
    ON t.{id_col} = p.{id_col} AND t.pos = p.pos + 1
),
big AS (SELECT prev, cur, count(*) AS nb FROM pairs GROUP BY prev, cur),
ctx AS (SELECT prev, sum(nb) AS nc FROM big GROUP BY prev),
vocab AS (SELECT count(DISTINCT tok) AS v FROM toks)
SELECT p.{id_col}, count(*) AS n_bigrams,
       round(avg(-ln((b.nb + 1) / (c.nc + vocab.v))), 6) AS avg_neg_logprob
FROM pairs p JOIN big b USING (prev, cur) JOIN ctx c USING (prev), vocab
GROUP BY p.{id_col}
"""


def text_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Model-free document similarity search: cosine over hashing-trick
    features — the retrieval baseline that needs no embedding model
    (HashingVectorizer + cosine, the classic sparse-lexical pipeline).

    Plan: the sparse feature table joins ITSELF only through the query
    side — query buckets (|q|·dim rows, broadcast) hash-join the corpus
    buckets, so candidate volume is corpus × query-overlap, never
    corpus². All similarity arithmetic is integer (count products and
    squared-norm sums); the rank key is cos²·1e6 as an exact integer
    ppm (num² · 1e6 div (‖q‖²·‖d‖²)) with id tiebreak. Self excluded,
    zero-overlap pairs naturally absent.

    Output: ``(query_id, id_col, cos2_ppm, rk)``."""
    feats = hashed_features(df, dim, text_col, id_col)
    nsq = feats.groupBy(id_col).agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("nsq")
    )
    q = feats.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        "bucket",
        F.col("cnt").alias("qcnt"),
    )
    num = (
        feats.join(F.broadcast(q), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("cnt") * F.col("qcnt")).alias("num"))
    )
    qn = nsq.select(
        F.col(id_col).alias("query_id"), F.col("nsq").alias("qnsq")
    )
    scored = (
        num.join(F.broadcast(qn), "query_id")
        .join(nsq, id_col)
        .select(
            "query_id",
            id_col,
            F.expr("(num * num * 1000000) div (qnsq * nsq)").alias(
                "cos2_ppm"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos2_ppm"), F.asc(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "cos2_ppm", "rk")
    )


def text_topk_sql(
    table: str = "documents",
    query_ids: list[int] | None = None,
    k: int = 10,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`text_topk`."""
    ids = ", ".join(str(i) for i in query_ids or [])
    return f"""
WITH f AS MATERIALIZED ({hashed_features_sql(table, dim, text_col, id_col)}),
nsq AS (
  SELECT {id_col}, CAST(sum(cnt * cnt) AS BIGINT) AS nsq
  FROM f GROUP BY {id_col}
),
q AS (SELECT {id_col} AS query_id, bucket, cnt AS qcnt FROM f
      WHERE {id_col} IN ({ids})),
num AS (
  SELECT q.query_id, f.{id_col},
         CAST(sum(f.cnt * q.qcnt) AS BIGINT) AS num
  FROM f JOIN q ON f.bucket = q.bucket AND f.{id_col} != q.query_id
  GROUP BY q.query_id, f.{id_col}
),
scored AS (
  SELECT n.query_id, n.{id_col},
         (n.num * n.num * 1000000) // (qn.nsq * dn.nsq) AS cos2_ppm
  FROM num n
  JOIN nsq qn ON qn.{id_col} = n.query_id
  JOIN nsq dn ON dn.{id_col} = n.{id_col}
)
SELECT query_id, {id_col}, cos2_ppm, CAST(rk AS INT) AS rk FROM (
  SELECT query_id, {id_col}, cos2_ppm,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos2_ppm DESC, {id_col}) AS rk
  FROM scored
) WHERE rk <= {k}
""".strip()


def dsir_weights(
    df: DataFrame,
    target_pred,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    score every document by how much its hashed-n-gram distribution
    looks like a TARGET domain (``target_pred`` rows) relative to the
    raw corpus. ``(doc_id, n_feats, weight_micro)`` where weight is the
    mean per-token log-ratio ``ln p_target(b) − ln p_raw(b)`` over the
    doc's buckets, in int64 micro units.

    Determinism: each bucket's log-ratio is ONE float expression floored
    to micro (the kmeans/pq fixed-point rule), the per-doc accumulation
    is ``sum(cnt · ratio_micro) div sum(cnt)`` — all-integer, so
    partition order never moves the result. Laplace +1 / +dim smoothing
    keeps unseen buckets finite.

    Scale: two broadcast joins of ``dim``-row distributions against the
    sparse (id, bucket, cnt) features; one map-side-combined groupBy per
    distribution and one per doc. No shuffle carries text.

    ``id_col`` values must be UNIQUE in ``df`` (the same assumption
    ``quality_classifier_fit`` documents): the target distribution is
    derived by LEFT-joining a target-id flag onto the feature rows, so
    an id duplicated among target docs would duplicate feature rows and
    inflate n_feats and the final weights (ADVICE r11)."""
    from arcane_framework_scala_spark.plans.materialize import materialize

    # ONE evaluation of the featurizer for ALL consumers (r11, guide
    # §5/§8): the old plan re-ran the text explode + md5 + groupBy once
    # per consumer (target dist, raw dist, final weight join — and
    # dsir_select doubled the whole tree again: 6 text passes, ~36
    # exchanges at sf0.1). Materialize the sparse (id, bucket, cnt)
    # features — ~10× narrower than the text they derive from, the
    # standard extract-features-once shape — and fold BOTH distributions
    # into one pass by carrying a target flag on the feature rows.
    # Values are bit-identical: tn/rn/tt/rt are the same int64 sums
    # feeding the same float expression.
    feats = materialize(
        hashed_features(df, dim, text_col, id_col).join(
            df.filter(target_pred).select(
                F.col(id_col), F.lit(True).alias("__tgt")
            ),
            id_col,
            "left",
        ),
        eager=False,
    )
    dists = feats.groupBy("bucket").agg(
        F.sum("cnt").alias("rn"),
        F.sum(F.when(F.col("__tgt"), F.col("cnt"))).alias("tn"),
    )
    # coalesce: an EMPTY target domain must yield finite (uniformly
    # negative) weights via the Laplace floor, not NULLs
    tots = dists.agg(
        F.coalesce(F.sum("tn"), F.lit(0)).alias("tt"),
        F.coalesce(F.sum("rn"), F.lit(0)).alias("rt"),
    )
    ratio = (
        dists.join(F.broadcast(tots))
        .select(
            "bucket",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("tn"), F.lit(0)) + 1)
                        / (F.col("tt") + dim)
                    )
                    - F.log((F.col("rn") + 1) / (F.col("rt") + dim))
                )
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("ratio_micro"),
        )
    )
    return (
        feats.select(id_col, "bucket", "cnt")
        .join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.expr("sum(cnt * ratio_micro) div sum(cnt)").alias(
                "weight_micro"
            ),
        )
    )


def dsir_select(
    df: DataFrame,
    target_pred,
    frac: float = 0.25,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """DSIR selection flag: keep the top ``frac`` of the corpus by
    importance weight. The cut is a percentile THRESHOLD broadcast from
    a 1-row aggregate (the ``lm_buckets`` pattern — never a global rank
    window); ties at the threshold all survive, so the flag is a pure
    function of the weight.

    ``exact=True`` uses ``percentile`` — a single-reducer sort over the
    distinct weights, fine up to ~10⁸ docs and required for the DuckDB
    ``quantile_cont`` oracle match. The 100 TB path is ``exact=False``:
    ``approx_percentile`` (t-digest-style mergeable sketch, partial-
    aggregated map-side, driver holds only the sketch) with rank error
    ≤ 1/``accuracy`` — the threshold may differ from the exact one by
    that rank tolerance, the flag semantics are otherwise identical
    (VERDICT r4 item 4: the scale swap is a flag, not an edit)."""
    from arcane_framework_scala_spark.plans.materialize import materialize

    # the doc-sized weight table feeds the percentile aggregate AND the
    # selection join — materialize it once (r11; the guide-§8 "decide on
    # the small table" shape) instead of re-running the whole DSIR chain
    # for each consumer
    w = materialize(
        dsir_weights(df, target_pred, dim, text_col, id_col), eager=False
    )
    pct_fn = (
        f"percentile(weight_micro, {1.0 - frac})"
        if exact
        else f"approx_percentile(weight_micro, {1.0 - frac}, {accuracy})"
    )
    th = w.agg(F.expr(pct_fn).alias("th"))
    return (
        w.join(F.broadcast(th))
        .select(
            id_col,
            "n_feats",
            "weight_micro",
            (F.col("weight_micro") >= F.col("th")).alias("selected"),
        )
    )


def dsir_select_sql(
    table: str,
    target_where: str,
    frac: float = 0.25,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`dsir_select` — identical smoothing,
    flooring, integer accumulation, and percentile cut."""
    feats = hashed_features_sql(table, dim, text_col, id_col)
    return f"""
WITH feats AS MATERIALIZED ({feats}),
tgt AS (SELECT f.* FROM feats f
        JOIN (SELECT {id_col} FROM {table} WHERE {target_where}) t
        USING ({id_col})),
t_dist AS (SELECT bucket, sum(cnt) AS tn FROM tgt GROUP BY bucket),
r_dist AS (SELECT bucket, sum(cnt) AS rn FROM feats GROUP BY bucket),
t_tot AS (SELECT coalesce(sum(tn), 0) AS tt FROM t_dist),
r_tot AS (SELECT coalesce(sum(rn), 0) AS rt FROM r_dist),
ratio AS (
  SELECT r.bucket,
         CAST(floor((ln((coalesce(t.tn, 0) + 1) / (tt + {dim}))
                     - ln((r.rn + 1) / (rt + {dim}))) * 1000000.0)
              AS BIGINT) AS ratio_micro
  FROM r_dist r LEFT JOIN t_dist t USING (bucket), t_tot, r_tot
),
w AS (
  SELECT {id_col}, CAST(sum(cnt) AS BIGINT) AS n_feats,
         CAST(sum(cnt * ratio_micro) // sum(cnt) AS BIGINT) AS weight_micro
  FROM feats JOIN ratio USING (bucket)
  GROUP BY {id_col}
),
th AS (SELECT quantile_cont(weight_micro, {1.0 - frac}) AS th FROM w)
SELECT {id_col}, n_feats, weight_micro,
       weight_micro >= th AS selected
FROM w, th
""".strip()
