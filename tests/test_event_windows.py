"""Event-time operators: exact nanos bucketing, sessionization invariants,
and the streaming windowed aggregation with watermark (real readStream)."""

import pyspark.sql.functions as F

from arcane_framework_scala_spark.operators.event_windows import (
    ensure_epoch_ns,
    sessionize,
    tumbling_window,
    windowed_event_stats,
    windowed_stream_stats,
)


def test_tumbling_window_exact_at_nanos_scale(spark):
    # epoch nanos beyond double's 53-bit mantissa: the naive double route
    # would land 1706313599999999999 (1 ns before midnight) in the next day
    rows = [
        (1_706_313_599_999_999_999,),  # 2024-01-26T23:59:59.999999999
        (1_706_313_600_000_000_000,),  # 2024-01-27T00:00:00
    ]
    df = spark.createDataFrame(rows, "ts long")
    out = [r[0] for r in df.select(tumbling_window("ts", 86_400)).collect()]
    assert out == [1_706_227_200, 1_706_313_600]


def test_sessionize_gap_splits(spark):
    base = 1_700_000_000
    rows = [
        (1, (base + s) * 1_000_000_000)
        for s in [0, 10, 20, 3000, 3010]  # gap of 2980s > 1800 → 2 sessions
    ] + [(2, (base + 5) * 1_000_000_000)]
    df = spark.createDataFrame(rows, "user_id long, ts long")
    sess = {(r["user_id"], r["session_id"]): r for r in sessionize(df, 1800).collect()}
    assert len([k for k in sess if k[0] == 1]) == 2
    s1 = sess[(1, base)]
    assert s1["session_end"] == base + 20 and s1["n_events"] == 3
    s2 = sess[(1, base + 3000)]
    assert s2["n_events"] == 2
    assert sess[(2, base + 5)]["n_events"] == 1


def test_windowed_stream_matches_batch(spark, sf_dir, tmp_path):
    """The same windowed agg over a file stream (availableNow) equals the
    batch computation — modulo the HLL distinct, which batch replicates."""
    events = ensure_epoch_ns(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = str(tmp_path / "stream_src")
    events.write.parquet(src, mode="overwrite")

    ts_typed = lambda df: df.withColumn(  # noqa: E731
        "ts_t", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(src)
    )
    agg = windowed_stream_stats(
        ts_typed(stream), window_seconds=86_400, ts_col="ts_t"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): r
        for r in spark.table("winagg").collect()
    }

    batch = ts_typed(events)
    expected = {
        (r["window_start"], r["event_type"]): r
        for r in (
            batch.groupBy(
                F.window("ts_t", "86400 seconds").start.alias("window_start"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.approx_count_distinct("user_id").alias("approx_users"),
                F.sum(F.floor(F.col("value") * 1000).cast("long")).alias(
                    "value_milli_sum"
                ),
            )
            .collect()
        )
    }
    assert set(got) == set(expected)
    for k, r in got.items():
        assert r["n"] == expected[k]["n"]
        assert r["value_milli_sum"] == expected[k]["value_milli_sum"]
        assert r["approx_users"] == expected[k]["approx_users"]


def test_funnel_respects_order_and_horizon(spark):
    """Sequential-match semantics: steps must occur strictly after the
    previous step and within the horizon; depth counts reached steps."""
    import __spark_entry__ as entry

    NS = 1_000_000_000
    day = 86_400 * NS
    rows = [
        # u1: full funnel in order
        (1, 1, 0 * day, "view"), (2, 1, 1 * day, "click"), (3, 1, 2 * day, "purchase"),
        # u2: click BEFORE view → depth 1
        (4, 2, 1 * day, "click"), (5, 2, 2 * day, "view"),
        # u3: click 8 days after view → outside 7-day horizon → depth 1
        (6, 3, 0 * day, "view"), (7, 3, 8 * day, "click"),
        # u4: no view at all → absent from the funnel
        (8, 4, 0 * day, "purchase"),
    ]
    df = spark.createDataFrame(
        [(e, t, u, k, 0.0, "{}") for e, u, t, k in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    import tempfile, uuid, os
    d = os.path.join(tempfile.gettempdir(), f"funnel_{uuid.uuid4().hex}")
    df.write.parquet(os.path.join(d, "events.parquet"))
    got = {r["user_id"]: r for r in entry.queries()["t_funnel"](spark, d).collect()}
    assert got[1]["depth"] == 3 and got[1]["t3"] == 2 * 86_400
    assert got[2]["depth"] == 1 and got[2]["t2"] == -1
    assert got[3]["depth"] == 1
    assert 4 not in got


def test_retention_triangle_hand_computed(spark):
    import __spark_entry__ as entry

    NS = 1_000_000_000
    day = 86_400 * NS
    rows = [  # u1 active d0,d1; u2 active d0,d2; u3 active d1
        (1, 1, 0 * day), (2, 1, 1 * day),
        (3, 2, 0 * day), (4, 2, 2 * day),
        (5, 3, 1 * day),
    ]
    df = spark.createDataFrame(
        [(e, t, u, "view", 0.0, "{}") for e, u, t in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    import tempfile, uuid, os
    d = os.path.join(tempfile.gettempdir(), f"ret_{uuid.uuid4().hex}")
    df.write.parquet(os.path.join(d, "events.parquet"))
    got = {
        (r["cohort"], r["offset"]): r["users"]
        for r in entry.queries()["t_retention"](spark, d).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}
