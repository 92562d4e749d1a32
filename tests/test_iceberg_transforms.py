"""Iceberg partition transforms (sources/iceberg_transforms.py):
spec-exact murmur3 bucketing (Appendix B test vectors), truncate /
temporal transforms, the hidden-partitioned writer, and transform-aware
planner pruning."""

import ctypes
import os
from datetime import date, datetime, timezone

import pyspark.sql.functions as F
import pytest

from arcane_framework_scala_spark.sources import iceberg_reader as ir
from arcane_framework_scala_spark.sources import iceberg_transforms as tf


def _s32(x):
    return ctypes.c_int32(x).value


def test_murmur3_spec_vectors():
    """The Iceberg spec's own Appendix-B hash examples, byte-exact —
    int and long MUST agree (both hash the 8-byte long form)."""
    assert _s32(tf.murmur3_32(tf._bucket_bytes(34, "int"))) == 2017239379
    assert _s32(tf.murmur3_32(tf._bucket_bytes(34, "long"))) == 2017239379
    assert (
        _s32(tf.murmur3_32(tf._bucket_bytes(date(2017, 11, 16), "date")))
        == -653330422
    )
    ts = datetime(2017, 11, 16, 22, 31, 8, tzinfo=timezone.utc)
    assert (
        _s32(tf.murmur3_32(tf._bucket_bytes(ts, "timestamp")))
        == -2047944441
    )
    assert (
        _s32(tf.murmur3_32(tf._bucket_bytes("iceberg", "string")))
        == 1210000089
    )


def test_scalar_transforms():
    assert tf.truncate_value(-1, 10, "int") == -10  # floored, not toward 0
    assert tf.truncate_value(17, 10, "long") == 10
    assert tf.truncate_value("abcdefg", 3, "string") == "abc"
    d = datetime(2017, 11, 16, 22, 31, 8)
    assert tf.temporal_value(d, "day") == 17486
    assert tf.temporal_value(d, "hour") == 17486 * 24 + 22
    assert tf.temporal_value(d, "month") == (2017 - 1970) * 12 + 10
    assert tf.temporal_value(d, "year") == 47
    assert tf.transform_value("bucket[16]", None, "long") is None
    assert tf.is_order_preserving("truncate[8]")
    assert tf.is_order_preserving("day")
    assert not tf.is_order_preserving("bucket[8]")


def test_column_transforms_match_scalars(spark):
    """The Arrow-vectorized / JVM column forms must agree with the
    scalar planner forms on every row — the invariant pruning
    correctness rests on."""
    df = spark.range(500).select(
        (F.col("id") * 37 % 1000 - 500).alias("v"),
        F.concat(F.lit("u"), (F.col("id") % 97).cast("string")).alias("s"),
        (
            F.lit(datetime(2024, 1, 1))
            + F.make_interval(hours=F.col("id") % 500)
        ).alias("ts"),
    )
    rows = df.select(
        "v", "s", "ts",
        tf.transform_col("bucket[16]", F.col("v"), "long").alias("bv"),
        tf.transform_col("bucket[8]", F.col("s"), "string").alias("bs"),
        tf.transform_col("bucket[8]", F.col("ts"), "timestamp").alias("bt"),
        tf.transform_col("day", F.col("ts"), "timestamp").alias("dd"),
        tf.transform_col("hour", F.col("ts"), "timestamp").alias("hh"),
        tf.transform_col("truncate[100]", F.col("v"), "long").alias("tv"),
    ).collect()
    for r in rows:
        assert r.bv == tf.bucket_value(r.v, 16, "long")
        assert r.bs == tf.bucket_value(r.s, 8, "string")
        assert r.bt == tf.bucket_value(r.ts, 8, "timestamp")
        assert r.dd == tf.temporal_value(r.ts, "day")
        assert r.hh == tf.temporal_value(r.ts, "hour")
        assert r.tv == tf.truncate_value(r.v, 100, "long")


def test_partitioned_writer_roundtrip_and_pruning(spark, tmp_path):
    df = spark.range(1500).select(
        F.col("id"),
        (F.col("id") * 37 % 400 - 200).alias("v"),
        (
            F.lit(datetime(2024, 1, 1))
            + F.make_interval(hours=F.col("id") % 720)
        ).alias("ts"),
    )
    out = str(tmp_path / "ice [b]")
    assert tf.write_iceberg_partitioned(
        spark, df, out, [("v", "bucket[4]"), ("ts", "day")]
    ) == 1
    back = ir.read_iceberg(spark, out)
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0

    every = ir.active_files(out)
    assert len(every) > 8
    # bucket: point probes prune to ~1/4 of the files
    planned = ir.plan_data_files(out, "v", -163, -163)
    assert 0 < len(planned) <= len(every) // 2
    got = {r.id for r in ir.read_iceberg_range(spark, out, "v", -163, -163).collect()}
    assert got == {r.id for r in df.filter("v = -163").collect()}
    # bucket gives NO range evidence: a range plan may not lose rows
    rng = {r.id for r in ir.read_iceberg_range(spark, out, "v", -10, 10).collect()}
    assert rng == {r.id for r in df.filter("v between -10 and 10").collect()}
    # day: order-preserving, ranges prune
    lo, hi = datetime(2024, 1, 10), datetime(2024, 1, 20)
    planned2 = ir.plan_data_files(out, "ts", lo, hi)
    assert 0 < len(planned2) < len(every)
    got2 = ir.read_iceberg_range(spark, out, "ts", lo, hi)
    want2 = df.filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
    assert got2.exceptAll(want2).count() == 0
    assert want2.exceptAll(got2).count() == 0


def test_transform_table_supports_mor_deletes(spark, tmp_path):
    """Row-level deletes compose with hidden partitioning: a position
    delete on a bucket[N]+day table applies through the same read."""
    from arcane_framework_scala_spark.sources import iceberg_mor as im

    df = spark.range(400).select(
        F.col("id"),
        (F.col("id") % 50).alias("v"),
        (
            F.lit(datetime(2024, 1, 1))
            + F.make_interval(hours=F.col("id"))
        ).alias("ts"),
    )
    out = str(tmp_path / "ice")
    tf.write_iceberg_partitioned(spark, df, out, [("v", "bucket[4]")])
    assert im.commit_position_deletes(spark, out, "id % 5 = 0") == 2
    got = {r.id for r in ir.read_iceberg(spark, out).collect()}
    assert got == {i for i in range(400) if i % 5}
    # pruned point read still applies the deletes
    got2 = {
        r.id for r in ir.read_iceberg_range(spark, out, "v", 10, 10).collect()
    }
    assert got2 == {i for i in range(400) if i % 50 == 10 and i % 5}


def test_writer_refuses_existing_table(spark, tmp_path):
    df = spark.range(10).select(F.col("id"))
    out = str(tmp_path / "ice")
    tf.write_iceberg_partitioned(spark, df, out, [("id", "bucket[2]")])
    with pytest.raises(ir.IcebergError, match="table exists"):
        tf.write_iceberg_partitioned(spark, df, out, [("id", "bucket[2]")])
