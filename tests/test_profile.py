"""profile_table: hand-computed metrics, null handling, approx path."""

from arcane_framework_scala_spark.plans.profile import profile_table


def _get(rows, col, metric):
    for r in rows:
        if r["column"] == col and r["metric"] == metric:
            return r["value"]
    raise KeyError((col, metric))


def test_profile_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "x"), (2, None, "y"), (2, -1.25, None)],
        "a long, b double, c string",
    )
    rows = profile_table(df).collect()
    assert len(rows) == 15  # 3 cols x 5 metrics
    assert _get(rows, "a", "n_rows") == "3"
    assert _get(rows, "a", "n_null") == "0"
    assert _get(rows, "a", "n_distinct") == "2"
    assert _get(rows, "a", "min") == "1" and _get(rows, "a", "max") == "2"
    assert _get(rows, "b", "n_null") == "1"
    # floor-micro images of the NUMERIC extremes
    assert _get(rows, "b", "min") == str(int(-1.25 * 1_000_000))
    assert _get(rows, "b", "max") == str(int(2.5 * 1_000_000))
    assert _get(rows, "c", "n_null") == "1"
    assert _get(rows, "c", "min") == "x" and _get(rows, "c", "max") == "y"


def test_profile_single_aggregation_plan(spark):
    """The whole profile is ONE aggregate job — no per-column scans:
    exactly one parquet/LocalTableScan leaf in the plan."""
    df = spark.createDataFrame([(1, "x")], "a long, c string")
    plan = profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1  # single leaf
    # the exact-distinct Expand (documented trade) appears exactly once
    assert plan.count("Expand") == 1


def test_profile_approx_path(spark):
    df = spark.range(0, 1000).selectExpr("id", "id % 7 AS g")
    rows = profile_table(df, approx=True).collect()
    nd = int(_get(rows, "g", "n_distinct"))
    assert 6 <= nd <= 8  # approx_count_distinct of 7
    assert _get(rows, "g", "min") == "0"
