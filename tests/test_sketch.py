"""HyperLogLog sketch (functions/sketch.py): engine-exact registers and
estimates vs DuckDB, merge associativity/idempotence, and accuracy
bounds in both the linear-counting and raw-estimator ranges."""

import duckdb
import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.sketch import (
    HLL_M,
    hll_distinct,
    hll_distinct_sql,
    hll_estimate,
    hll_merge,
    hll_sketch,
    hll_sketch_sql,
)


def _ids(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.col("id").cast("long").alias("x")
    )


def test_registers_and_estimate_match_duckdb(spark):
    df = _ids(spark, 3000).withColumn("g", (F.col("x") % 3).cast("long"))
    sp_regs = sorted(
        map(tuple, hll_sketch(df, "x", ["g"]).collect())
    )
    sp_est = sorted(map(tuple, hll_distinct(df, "x", ["g"]).collect()))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT range AS x, range % 3 AS g "
        "FROM range(3000)"
    )
    dk_regs = sorted(map(tuple, con.execute(
        hll_sketch_sql("t", "x", ["g"])).fetchall()))
    dk_est = sorted(map(tuple, con.execute(
        hll_distinct_sql("t", "x", ["g"])).fetchall()))
    assert sp_regs == dk_regs
    assert sp_est == dk_est


def test_merge_equals_direct_and_is_idempotent(spark):
    df = _ids(spark, 4000).withColumn("g", (F.col("x") % 4).cast("long"))
    sharded = hll_sketch(df, "x", ["g"]).localCheckpoint()
    merged = hll_merge(sharded.select("idx", "r"))
    direct = hll_sketch(df, "x")
    m = {r["idx"]: r["r"] for r in merged.collect()}
    d = {r["idx"]: r["r"] for r in direct.collect()}
    assert m == d
    # idempotent: merging the merge with itself changes nothing
    twice = hll_merge(merged.unionByName(merged))
    assert {r["idx"]: r["r"] for r in twice.collect()} == m


def test_small_range_uses_linear_counting(spark):
    # 40 distinct values << m=512: raw HLL overestimates wildly; the
    # literal-table linear count must land within ~10%
    df = _ids(spark, 40)
    est = hll_estimate(hll_sketch(df, "x")).collect()[0]
    assert abs(est["est_micro"] / 1e6 - 40) / 40 < 0.10, est


def test_large_range_accuracy_within_3_sigma(spark):
    # sigma = 1.04/sqrt(m) ~= 4.6% for m=512; allow 3 sigma
    n = 50_000
    df = _ids(spark, n)
    est = hll_estimate(hll_sketch(df, "x")).collect()[0]
    rel = abs(est["est_micro"] / 1e6 - n) / n
    assert rel < 3 * 1.04 / (HLL_M ** 0.5), (est, rel)


def test_nulls_are_skipped(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,)], "x bigint"
    )
    regs = hll_sketch(df, "x")
    # only the two non-null values contribute registers
    assert regs.count() <= 2
    est = hll_estimate(regs).collect()[0]
    assert abs(est["est_micro"] / 1e6 - 2) < 0.5, est


def test_cms_never_underestimates_and_matches_duckdb(spark):
    from arcane_framework_scala_spark.functions.sketch import (
        cms_lookup,
        cms_lookup_sql,
        cms_sketch,
        cms_sketch_sql,
    )

    # zipf-ish: value v appears v+1 times, 200 distinct values
    df = (
        _ids(spark, 200)
        .select(F.explode(F.sequence(F.lit(0), F.col("x"))).alias("rep"),
                F.col("x"))
        .select("x")
    )
    sk = cms_sketch(df, "x").localCheckpoint()
    est = cms_lookup(sk, df.distinct(), "x")
    exact = df.groupBy("x").agg(F.count(F.lit(1)).alias("n"))
    j = est.join(exact, "x").collect()
    assert all(r["est_n"] >= r["n"] for r in j)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT x FROM (SELECT range AS x FROM range(200)), "
        "LATERAL (SELECT unnest(range(x + 1)) AS rep)"
    )
    dk = sorted(map(tuple, con.execute(cms_lookup_sql(
        cms_sketch_sql("t", "x"), "SELECT DISTINCT x FROM t", "x"
    )).fetchall()))
    sp = sorted(map(tuple, est.collect()))
    assert sp == dk


def test_cms_merge_equals_direct(spark):
    from arcane_framework_scala_spark.functions.sketch import (
        cms_merge,
        cms_sketch,
    )

    df = _ids(spark, 2000).withColumn("g", (F.col("x") % 5).cast("long"))
    sharded = cms_sketch(df, "x", group_cols=["g"]).localCheckpoint()
    merged = {
        (r["j"], r["idx"]): r["cnt"]
        for r in cms_merge(sharded.select("j", "idx", "cnt")).collect()
    }
    direct = {
        (r["j"], r["idx"]): r["cnt"]
        for r in cms_sketch(df, "x").collect()
    }
    assert merged == direct


def test_cms_weighted(spark):
    from arcane_framework_scala_spark.functions.sketch import (
        cms_lookup,
        cms_sketch,
    )

    df = spark.createDataFrame(
        [(1, 10), (1, 5), (2, 7)], "x bigint, w bigint"
    )
    sk = cms_sketch(df, "x", weight_col="w")
    est = {r["x"]: r["est_n"] for r in cms_lookup(sk, df.select("x").distinct(), "x").collect()}
    assert est[1] >= 15 and est[2] >= 7


def test_kmv_estimate_and_intersection_match_duckdb(spark):
    from arcane_framework_scala_spark.functions.sketch import (
        kmv_estimate,
        kmv_estimate_sql,
        kmv_intersect,
        kmv_intersect_sql,
        kmv_sketch,
        kmv_sketch_sql,
    )

    A = _ids(spark, 5001)
    B = _ids(spark, 6001, start=3000)
    sa = kmv_sketch(A, "x").localCheckpoint()
    sb = kmv_sketch(B, "x").localCheckpoint()
    ea = kmv_estimate(sa).collect()[0]
    ix = kmv_intersect(sa, sb).collect()[0]
    # accuracy: ~4.4% RSE at k=512; allow 3 sigma
    assert abs(ea["est_micro"] / 1e6 - 5001) / 5001 < 0.14, ea
    assert abs(ix["est_micro"] / 1e6 - 2000) / 2000 < 0.20, ix

    con = duckdb.connect()
    con.execute("CREATE TABLE a AS SELECT range AS x FROM range(0, 5001)")
    con.execute("CREATE TABLE b AS SELECT range AS x FROM range(3000, 9001)")
    qa, qb = kmv_sketch_sql("a", "x"), kmv_sketch_sql("b", "x")
    assert (ea["n_sample"], ea["est_micro"]) == con.execute(
        kmv_estimate_sql(qa)
    ).fetchall()[0]
    assert (ix["n_common"], ix["est_micro"]) == con.execute(
        kmv_intersect_sql(qa, qb)
    ).fetchall()[0]


def test_kmv_small_sets_are_exact(spark):
    from arcane_framework_scala_spark.functions.sketch import (
        kmv_estimate,
        kmv_intersect,
        kmv_sketch,
    )

    A = _ids(spark, 100)
    B = _ids(spark, 100, start=60)
    sa, sb = kmv_sketch(A, "x"), kmv_sketch(B, "x")
    # below k the sketch IS the distinct hash set: estimates are exact
    assert kmv_estimate(sa).collect()[0]["est_micro"] == 100 * 1_000_000
    assert kmv_intersect(sa, sb).collect()[0]["est_micro"] == 40 * 1_000_000


def test_kmv_merge_equals_sketch_of_union(spark):
    from arcane_framework_scala_spark.functions.sketch import (
        kmv_merge,
        kmv_sketch,
    )

    A = _ids(spark, 3000)
    B = _ids(spark, 3000, start=1500)
    merged = sorted(
        r["h"]
        for r in kmv_merge(
            kmv_sketch(A, "x").unionByName(kmv_sketch(B, "x"))
        ).collect()
    )
    direct = sorted(
        r["h"] for r in kmv_sketch(A.unionByName(B), "x").collect()
    )
    assert merged == direct


def test_kmv_grouped_matches_duckdb(spark):
    from arcane_framework_scala_spark.functions.sketch import (
        kmv_estimate,
        kmv_estimate_sql,
        kmv_sketch,
        kmv_sketch_sql,
    )

    df = _ids(spark, 4000).withColumn("g", (F.col("x") % 3).cast("long"))
    sp = sorted(map(tuple, kmv_estimate(
        kmv_sketch(df, "x", ["g"]), ["g"]).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT range AS x, range % 3 AS g FROM range(4000)"
    )
    dk = sorted(map(tuple, con.execute(
        kmv_estimate_sql(kmv_sketch_sql("t", "x", ["g"]), ["g"])
    ).fetchall()))
    assert sp == dk


def test_log_hist_quantiles_match_duckdb_and_bound_error(spark):
    from arcane_framework_scala_spark.functions.sketch import (
        log_hist_quantiles,
        log_hist_quantiles_sql,
        log_histogram,
        log_histogram_sql,
    )

    df = spark.range(1, 50001).select(
        ((F.col("id") * F.col("id")) % 999983).alias("x")
    )
    q = log_hist_quantiles(log_histogram(df, "x"), [50, 90, 99])
    sp = {r["pct"]: r["est"] for r in q.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT (x*x) % 999983 AS x "
        "FROM (SELECT range AS x FROM range(1, 50001))"
    )
    dk = dict(con.execute(log_hist_quantiles_sql(
        log_histogram_sql("t", "x"), [50, 90, 99])).fetchall())
    assert sp == dk
    # bucket lower bound is within one 2^-5 relative bucket of exact
    exact = df.selectExpr(
        "percentile(x, array(0.5, 0.9, 0.99)) AS p"
    ).collect()[0]["p"]
    for pct, ex in zip((50, 90, 99), exact):
        assert sp[pct] <= ex
        assert sp[pct] >= ex * (1 - 2 ** -5) - 2, (pct, sp[pct], ex)


def test_log_hist_merge_equals_direct(spark):
    from arcane_framework_scala_spark.functions.sketch import (
        log_hist_merge,
        log_histogram,
    )

    df = spark.range(0, 10000).select(F.col("id").alias("x"))
    parts = log_histogram(
        df.withColumn("g", (F.col("x") % 4).cast("long")), "x", ["g"]
    )
    merged = sorted(map(tuple, log_hist_merge(parts.drop("g")).collect()))
    direct = sorted(map(tuple, log_histogram(df, "x").collect()))
    assert merged == direct


def test_log_hist_zero_and_small_values_exact(spark):
    from arcane_framework_scala_spark.functions.sketch import (
        log_hist_quantiles,
        log_histogram,
    )

    # values below 2^HDR_BITS get exact single-value buckets
    df = spark.createDataFrame([(v,) for v in [0, 1, 1, 2, 3, 31]], "x bigint")
    h = log_histogram(df, "x")
    assert h.count() == 5  # one bucket per distinct small value
    q = {r["pct"]: r["est"] for r in log_hist_quantiles(h, [50, 100]).collect()}
    assert q[50] == 1 and q[100] == 31


def test_sketch_merge_laws_hypothesis(spark):
    """Property twin for ALL four sketches: under randomized value sets
    and arbitrary shardings, shard-then-merge must equal the direct
    sketch of the union — the associativity/idempotence contract the
    100 TB rollup depends on. Derandomized profile, few examples (each
    case runs several Spark jobs)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from arcane_framework_scala_spark.functions.sketch import (
        cms_merge,
        cms_sketch,
        hll_merge,
        hll_sketch,
        kmv_merge,
        kmv_sketch,
        log_hist_merge,
        log_histogram,
    )

    @settings(
        max_examples=4,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        n=st.integers(min_value=1, max_value=400),
        shards=st.integers(min_value=2, max_value=5),
        dup=st.integers(min_value=1, max_value=3),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    def case(n, shards, dup, seed):
        import random

        rng = random.Random(seed)
        vals = [rng.randrange(0, 10_000) for _ in range(n)] * dup
        df = spark.createDataFrame(
            [(v, rng.randrange(shards)) for v in vals], "x bigint, s bigint"
        ).localCheckpoint()
        whole = df.select("x")

        m = hll_merge(hll_sketch(df, "x", ["s"]).drop("s"))
        d = hll_sketch(whole, "x")
        assert sorted(map(tuple, m.collect())) == sorted(
            map(tuple, d.collect())
        )

        m = cms_merge(cms_sketch(df, "x", group_cols=["s"]).drop("s"))
        d = cms_sketch(whole, "x")
        assert sorted(map(tuple, m.collect())) == sorted(
            map(tuple, d.collect())
        )

        m = kmv_merge(kmv_sketch(df, "x", ["s"]).drop("s"))
        d = kmv_sketch(whole, "x")
        assert sorted(r["h"] for r in m.collect()) == sorted(
            r["h"] for r in d.collect()
        )

        m = log_hist_merge(log_histogram(df, "x", ["s"]).drop("s"))
        d = log_histogram(whole, "x")
        assert sorted(map(tuple, m.collect())) == sorted(
            map(tuple, d.collect())
        )

    case()
