"""Unit tests for the hypertable rollup cascade incl. HLL sketch merging."""

import pyspark.sql.functions as F
import pytest

from arcane_framework_scala_spark.operators.event_windows import ensure_epoch_ns
from arcane_framework_scala_spark.operators.rollup_cascade import (
    rollup_base,
    rollup_cascade,
    rollup_up,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return ensure_epoch_ns(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _exact(df, seconds):
    """Direct-from-raw rollup at a level (no cascade) for comparison."""
    return rollup_base(df, seconds)


def test_cascade_equals_direct_on_exact_columns(events):
    cascade = rollup_cascade(events, levels=(60, 3600, 86_400))
    for level in (3600, 86_400):
        via_cascade = {
            (r.bucket, r.event_type): (r.n, r.value_milli_sum, r.vmin_milli, r.vmax_milli)
            for r in cascade[level].collect()
        }
        direct = {
            (r.bucket, r.event_type): (r.n, r.value_milli_sum, r.vmin_milli, r.vmax_milli)
            for r in _exact(events, level).collect()
        }
        assert via_cascade == direct, level


def test_hll_union_equals_direct_sketch_estimate(events):
    """Merging finer sketches upward must estimate exactly what a sketch
    built directly at the coarse level estimates (same library, same
    stream) — sketch merge is lossless w.r.t. the sketch."""
    cascade = rollup_cascade(events, levels=(3600, 86_400))
    merged = {
        (r.bucket, r.event_type): r.est
        for r in cascade[86_400]
        .select(
            "bucket", "event_type",
            F.hll_sketch_estimate("users_hll").alias("est"),
        )
        .collect()
    }
    direct = {
        (r.bucket, r.event_type): r.est
        for r in _exact(events, 86_400)
        .select(
            "bucket", "event_type",
            F.hll_sketch_estimate("users_hll").alias("est"),
        )
        .collect()
    }
    assert merged == direct


def test_hll_estimate_close_to_truth(events):
    got = (
        rollup_base(events, 86_400)
        .select(
            "bucket", "event_type",
            F.hll_sketch_estimate("users_hll").alias("est"),
        )
        .collect()
    )
    truth = {
        (r.bucket, r.event_type): r.exact
        for r in events.groupBy(
            (F.col("ts") - F.col("ts") % (86_400 * 10**9)).alias("raw_bucket"),
            "event_type",
        )
        .agg(F.countDistinct("user_id").alias("exact"))
        .withColumn("bucket", F.expr("raw_bucket div 1000000000"))
        .collect()
    }
    for r in got:
        exact = truth[(r.bucket, r.event_type)]
        assert abs(r.est - exact) <= max(2, 0.05 * exact), (r, exact)


def test_rollup_up_rejects_non_multiple_levels(events):
    base = rollup_base(events, 60)
    with pytest.raises(ValueError, match="multiple"):
        rollup_up(base, 60, 90)
