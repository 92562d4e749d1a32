"""gap_fill: grid completeness, LOCF, leading-gap NULLs, is_filled."""

import pyspark.sql.functions as F

from arcane_framework_scala_spark.operators.resample import gap_fill

_NS = 1_000_000_000


def test_gap_fill_locf_and_flags(spark):
    # key A observes buckets 0 and 3 (values 1.0, 9.0); key B only bucket 2.
    rows = [
        ("A", 5 * _NS, 1.0),
        ("A", 8 * _NS, 0.5),      # same bucket 0 → max-reduce keeps 1.0
        ("A", 35 * _NS, 9.0),     # bucket 3
        ("B", 25 * _NS, 7.0),     # bucket 2
    ]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = {
        (r["k"], r["bucket_start_sec"]): (r["v"], r["is_filled"])
        for r in gap_fill(df, "k", "ts", "v", bucket_seconds=10).collect()
    }
    # full grid: 2 keys x buckets 0..3
    assert len(out) == 8
    assert out[("A", 0)] == (1.0, False)   # in-bucket max of 1.0/0.5
    assert out[("A", 10)] == (1.0, True)   # carried forward
    assert out[("A", 20)] == (1.0, True)
    assert out[("A", 30)] == (9.0, False)
    # B before its first observation: NULL value, still on the grid
    assert out[("B", 0)] == (None, True)
    assert out[("B", 10)] == (None, True)
    assert out[("B", 20)] == (7.0, False)
    assert out[("B", 30)] == (7.0, True)


def test_gap_fill_single_bucket_stream(spark):
    df = spark.createDataFrame(
        [("A", 5 * _NS, 2.0)], "k string, ts long, v double"
    )
    rows = gap_fill(df, "k", "ts", "v", bucket_seconds=60).collect()
    assert len(rows) == 1
    assert rows[0]["v"] == 2.0 and not rows[0]["is_filled"]
