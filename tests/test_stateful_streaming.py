"""applyInPandasWithState: cross-batch first-seen dedup on a real stream."""

import pyspark.sql.functions as F


from arcane_framework_scala_spark.streaming.stateful import stateful_first_seen


def test_first_seen_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: keys a,b — batch 2 (separate file): b again + c
    spark.createDataFrame(
        [("a", 1), ("b", 2)], "k string, v int"
    ).write.parquet(f"{src}/b1")
    spark.createDataFrame(
        [("b", 99), ("c", 3)], "k string, v int"
    ).write.parquet(f"{src}/b2")

    stream = (
        spark.readStream.schema("k string, v int")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = stateful_first_seen(stream, "k")
    q = (
        out.writeStream.format("memory")
        .queryName("firstseen")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["k"]: r["v"] for r in spark.table("firstseen").collect()}
    # each key exactly once; b kept its first-batch value when batches were
    # processed in file order, but either way exactly one b survives
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"] == 1 and rows["c"] == 3
    assert rows["b"] in (2, 99)


def test_first_seen_within_single_batch_deterministic(spark, tmp_path):
    src = str(tmp_path / "src1")
    ckpt = str(tmp_path / "ckpt1")
    spark.createDataFrame(
        [("x", 5), ("x", 2), ("x", 9)], "k string, v int"
    ).write.parquet(f"{src}/b1")
    stream = (
        spark.readStream.schema("k string, v int")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stateful_first_seen(stream, "k")
        .writeStream.format("memory")
        .queryName("firstseen1")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("firstseen1").collect()
    assert len(rows) == 1
    assert rows[0]["v"] == 2  # lowest by string sort: "2" < "5" < "9"


def test_stream_exact_dedup_suppresses_within_horizon(spark, tmp_path):
    """Duplicates arriving within the watermark delay collapse to one
    emitted row; the dedup key is the subset column."""
    import os

    from arcane_framework_scala_spark.streaming.stateful import (
        stream_exact_dedup,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 100), (1, 101), (2, 102), (2, 103), (3, 104)],
        "k long, sts long",
    ).coalesce(1).write.parquet(f"{src}/b0")
    stream = (
        spark.readStream.schema("k long, sts long")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = stream_exact_dedup(
        stream.withColumn("tsc", F.timestamp_seconds("sts")),
        subset=["k"],
        event_time_col="tsc",
        delay="10 minutes",
    ).select("k")
    q = (
        out.writeStream.format("memory")
        .queryName("sdd1")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(r["k"] for r in spark.table("sdd1").collect()) == [1, 2, 3]


def test_stream_exact_dedup_on_rocksdb_state_store(spark, tmp_path):
    """The documented 100 TB path (docs/SCALE.md "Streaming"): the same
    bounded-state dedup with the RocksDB state-store provider actually
    configured — proves the scale configuration runs, not just reads
    well. Results must equal the default (HDFS-backed) provider's."""
    import os

    from arcane_framework_scala_spark.streaming.stateful import (
        stream_exact_dedup,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 100), (1, 101), (2, 102), (3, 104), (3, 105)],
        "k long, sts long",
    ).coalesce(1).write.parquet(f"{src}/b0")
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema("k long, sts long")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        out = stream_exact_dedup(
            stream.withColumn("tsc", F.timestamp_seconds("sts")),
            subset=["k"],
            event_time_col="tsc",
            delay="10 minutes",
        ).select("k")
        q = (
            out.writeStream.format("memory")
            .queryName("sdd_rocks")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_rocks"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", prev
        )
    assert sorted(r["k"] for r in spark.table("sdd_rocks").collect()) == [
        1, 2, 3,
    ]


def test_watermark_drop_metric_observable(spark, tmp_path):
    """The state-operator progress metrics expose late-row drops: two
    sequential files, the second entirely behind the closed watermark;
    Spark's numRowsDroppedByWatermark must count it (the T12-flavor
    observability a production stream alerts on)."""
    import json
    import os
    import time

    src = str(tmp_path / "wmsrc")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 10_000), (2, 10_060)], "k long, sts long"
    ).coalesce(1).write.parquet(f"{src}/b0")
    for f in os.listdir(f"{src}/b0"):
        if f.endswith(".parquet"):
            os.rename(f"{src}/b0/{f}", f"{src}/00.parquet")
    # the new watermark applies with one batch of lag (cf. the
    # t_stream_late_data gate), so an intermediate batch locks it in
    # before the late row arrives two batches behind
    spark.createDataFrame(
        [(9, 10_070)], "k long, sts long"
    ).coalesce(1).write.parquet(f"{src}/b1")
    for f in os.listdir(f"{src}/b1"):
        if f.endswith(".parquet"):
            os.rename(f"{src}/b1/{f}", f"{src}/01.parquet")
    spark.createDataFrame(
        [(3, 100)], "k long, sts long"  # far behind the watermark
    ).coalesce(1).write.parquet(f"{src}/b2")
    for f in os.listdir(f"{src}/b2"):
        if f.endswith(".parquet"):
            os.rename(f"{src}/b2/{f}", f"{src}/02.parquet")
    t0 = 1_000_000_000
    os.utime(f"{src}/00.parquet", (t0, t0))
    os.utime(f"{src}/01.parquet", (t0 + 1000, t0 + 1000))
    os.utime(f"{src}/02.parquet", (t0 + 2000, t0 + 2000))

    stream = (
        spark.readStream.schema("k long, sts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    agg = (
        stream.withColumn("tsc", F.timestamp_seconds("sts"))
        .withWatermark("tsc", "10 seconds")
        .groupBy(F.window("tsc", "30 seconds"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_drop_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped >= 1, [json.dumps(p) for p in q.recentProgress]
