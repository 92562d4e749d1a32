"""snapshot_diff: hand-computed CDF semantics."""

from arcane_framework_scala_spark.operators.diff import snapshot_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, ver long, v string")


def test_all_four_outcomes(spark):
    before = _df(spark, [("a", 1, "x"), ("b", 1, "y"), ("c", 1, "z")])
    after = _df(spark, [("a", 2, "x2"), ("c", 1, "z"), ("d", 1, "w")])
    got = {
        r["k"]: (r["op"], r["old_ver"], r["new_ver"], r["old_v"], r["new_v"])
        for r in snapshot_diff(before, after, keys=["k"]).collect()
    }
    assert got == {
        "a": ("update", 1, 2, "x", "x2"),
        "b": ("delete", 1, None, "y", None),
        "d": ("insert", None, 1, None, "w"),
    }
    assert "c" not in got  # identical rows are silent


def test_null_safe_compare(spark):
    """NULL -> value and value -> NULL are updates; NULL == NULL is not."""
    before = spark.createDataFrame(
        [("a", None), ("b", "y"), ("c", None)], "k string, v string"
    )
    after = spark.createDataFrame(
        [("a", "x"), ("b", None), ("c", None)], "k string, v string"
    )
    got = {r["k"]: r["op"] for r in
           snapshot_diff(before, after, keys=["k"]).collect()}
    assert got == {"a": "update", "b": "update"}


def test_default_compare_cols_exclude_keys(spark):
    before = _df(spark, [("a", 1, "x")])
    after = _df(spark, [("a", 1, "x")])
    out = snapshot_diff(before, after, keys=["k"])
    assert out.count() == 0
    assert out.columns == ["k", "op", "old_ver", "old_v", "new_ver", "new_v"]
