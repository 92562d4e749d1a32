"""Z-order key: locality, bit-exactness, and the pruning payoff."""

import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.layout import zorder_key


def test_zorder_interleave_hand_computed(spark):
    # 2 cols, bits=2: values normalized onto 0..3
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (2, 1)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["zkey"]
        for r in zorder_key(df, ["x", "y"], bits=2).collect()
    }
    # interleave: bit i of x -> 2i, bit i of y -> 2i+1
    def z(x, y):
        out = 0
        for i in range(2):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    assert got == {(x, y): z(x, y) for (x, y) in got}


def test_zorder_clusters_both_dimensions(spark):
    """Files cut along sorted zkey cover tight rectangles: the max
    per-bucket span of BOTH columns must be far below the full range
    (single-column sort would leave the other column's span ~full)."""
    rows = [(i % 64, (i * 37) % 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long")
    z = zorder_key(df, ["x", "y"], bits=6)
    bucketed = z.withColumn("bucket", F.floor(F.col("zkey") / 256))
    spans = (
        bucketed.groupBy("bucket")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .agg(F.max("sx").alias("mx"), F.max("sy").alias("my"))
        .first()
    )
    # 16 buckets over a 64x64 grid: each covers a 16x16 tile
    assert spans["mx"] <= 16 and spans["my"] <= 16


def test_zorder_width_guard(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)
