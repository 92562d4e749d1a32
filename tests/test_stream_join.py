"""Stream-stream interval join: completeness + cross-batch state proof."""

import pyspark.sql.functions as F


def test_stream_stream_join_matches_batch(spark, sf_dir):
    import __spark_entry__ as entry

    got = entry.q_t_stream_stream_join(spark, sf_dir).collect()
    ev = entry._read(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000000000").alias("sec"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("sec").alias("vs"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("sec").alias("ps"),
    )
    exp = (
        v.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("ps") >= F.col("vs"))
            & (F.col("ps") <= F.col("vs") + 1800),
        )
        .select("view_id", "purchase_id")
        .collect()
    )
    assert {(r["view_id"], r["purchase_id"]) for r in got} == {
        (r["view_id"], r["purchase_id"]) for r in exp
    }
    assert len(got) == len(exp) > 0
    # at sf0.001 every match pairs a batch-0 row with a batch-1 row
    # (event_id parity = staged micro-batch): the join state store did
    # the cross-batch work, not a single-batch coincidence
    assert any(r["view_id"] % 2 != r["purchase_id"] % 2 for r in got)
