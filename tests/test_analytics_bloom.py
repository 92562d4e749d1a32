"""Bloom probe, ROLLUP report, rolling RANGE windows, partition advisor."""

import hashlib

import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.bloom import (
    bloom_bits,
    bloom_probe,
)
from arcane_framework_scala_spark.operators.analytics import (
    rolling_user_stats,
    rollup_event_stats,
)
from arcane_framework_scala_spark.plans.advisor import partition_advisor


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_true_hits_are_flagged(spark):
    """A corpus doc sharing an 8-gram with the benchmark must flag it."""
    shared = "a b c d e f g h"
    corpus = _docs(spark, [(1, shared + " x y z"), (2, "p q r s t u v w x")])
    bench = _docs(spark, [(10, shared)])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_flagged"])
        for r in bloom_probe(corpus, bench).collect()
    }
    assert got[1][1] >= 1  # the shared gram is Bloom-positive
    assert got[1][0] == 4  # 11 words -> 4 distinct 8-grams
    assert got[2] == (2, 0)  # disjoint vocab, m=2^20 -> no FP here


def test_bloom_model_matches_python(spark):
    """Bit positions match an independent pure-Python md5 model."""
    bench = _docs(spark, [(1, "w1 w2 w3 w4 w5 w6 w7 w8")])
    got = sorted(
        r["pos"] for r in bloom_bits(bench, n=8, m=1 << 20, k=3).collect()
    )
    g = "w1 w2 w3 w4 w5 w6 w7 w8"
    exp = sorted(
        {
            int(hashlib.md5(f"{g}#{i}".encode()).hexdigest()[:15], 16)
            % (1 << 20)
            for i in range(3)
        }
    )
    assert got == exp


def test_rollup_levels_are_consistent(spark, sf_dir):
    """Per-(type,day) rows sum to the per-type rows sum to the total."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from arcane_framework_scala_spark.operators.event_windows import (
        ensure_epoch_ns,
    )

    out = rollup_event_stats(ensure_epoch_ns(ev)).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
    assert len(by_gid[3]) == 1  # grand total
    total = by_gid[3][0]
    assert total["event_type"] == "(all)" and total["day"] == -1
    assert sum(r["n_events"] for r in by_gid[1]) == total["n_events"]
    assert sum(r["n_events"] for r in by_gid[0]) == total["n_events"]
    assert sum(r["value_micro"] for r in by_gid[0]) == total["value_micro"]


def test_rolling_window_hand_computed(spark):
    """RANGE frame includes ties at the same second and the full hour."""
    ns = 1_000_000_000
    rows = [
        (1, 100, 0 * ns, 1.0),
        (2, 100, 1800 * ns, 2.0),
        (3, 100, 3600 * ns, 3.0),   # 0s is 3600s earlier -> included
        (4, 100, 3601 * ns, 4.0),   # 0s falls out
        (5, 100, 3601 * ns, 6.0),   # tie second: both rows in each frame
        (6, 200, 0 * ns, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    got = {r["event_id"]: (r["w_n"], r["w_avg_micro"])
           for r in rolling_user_stats(df).collect()}
    assert got[1] == (1, 1_000_000)
    assert got[2] == (2, 1_500_000)
    assert got[3] == (3, 2_000_000)
    # frame for 4 and 5: events at 1800, 3600, 3601, 3601
    assert got[4] == (4, (2 + 3 + 4 + 6) * 1_000_000 // 4)
    assert got[5] == got[4]
    assert got[6] == (1, 9_000_000)


def test_partition_advisor_arithmetic(spark):
    """6 longs/row * 1M rows -> 48 MB -> 1 file @512MB, 32 partitions."""
    df = spark.range(0, 1_000_000).select(
        *[F.col("id").alias(f"c{i}") for i in range(6)]
    )
    row = partition_advisor(df).first()
    assert row["total_rows"] == 1_000_000
    assert row["est_bytes"] == 48_000_000
    assert row["n_files"] == 1
    assert row["rows_per_file"] == 1_000_000
    assert row["shuffle_partitions"] == 32


def test_partition_advisor_scales_to_big_tables(spark):
    """The clamp engages: 1 TB estimated -> 2000 partitions, 2048 files."""
    from arcane_framework_scala_spark.plans.advisor import (
        partition_advisor_sql,
    )
    import duckdb

    # oracle-side only: the arithmetic is engine-portable, so drive the
    # big-number path through the SQL twin on a synthetic 1-row stats base
    one_tb = 1 << 40
    sql = partition_advisor_sql("t", (), fixed_width=one_tb)
    con = duckdb.connect()
    con.sql("CREATE TEMP TABLE t AS SELECT 1 AS x")
    got = con.sql(sql).fetchone()
    total_rows, est_bytes, n_files, rows_per_file, parts = got
    assert est_bytes == one_tb
    assert n_files == (one_tb + (512 << 20) - 1) // (512 << 20)
    assert parts == 2000


def test_winsorize_hand_computed(spark):
    """10 values 0..9 in one group: p05=0.45, p95=8.55 -> value 0
    clamps up, value 9 clamps down, everything else passes through."""
    import math

    from arcane_framework_scala_spark.functions.stats import winsorize

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(10)], "k string, v double"
    )
    r = winsorize(df, "k", "v").first()
    assert r["n"] == 10
    assert r["n_capped_lo"] == 1 and r["n_capped_hi"] == 1
    exp = math.floor(0.45 * 1e6) + math.floor(8.55 * 1e6) + sum(
        i * 1_000_000 for i in range(1, 9)
    )
    assert r["capped_micro"] == exp


def test_ewma_pow2_hand_computed(spark, sf_dir):
    """EWMA with alpha=1/2 over an explicit sequence: each event's value
    is the integer-shift-decayed sum of its 8-event history."""
    import __spark_entry__ as entry
    import pyspark.sql.functions as F

    ns = 1_000_000_000
    rows = [(i, 1, i * ns, 1.0) for i in range(10)]  # constant value 1.0
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    # expected: sum over j=0..min(t,7) of 1e6 div 2^j
    def exp_at(t):
        return sum(1_000_000 // (2 ** j) for j in range(min(t, 7) + 1))

    # write rows to a temp dir shaped like the events table and drive
    # the gate itself (same codepath the driver runs)
    import tempfile, os
    d = tempfile.mkdtemp(prefix="ewma_t_")
    df.withColumn("event_type", F.lit("view")).withColumn(
        "props", F.lit("{}")
    ).write.parquet(os.path.join(d, "events.parquet"))
    got = {r["event_id"]: r["ewma_micro"]
           for r in entry.q_t_ewma_pow2(spark, d).collect()}
    for t in range(10):
        assert got[t] == exp_at(t), (t, got[t], exp_at(t))


def test_categorical_drift_matches_model(spark):
    """JSD against a NumPy-free hand model: identical day distributions
    -> 0; a category appearing from nothing -> positive, <= ln2 micro;
    exact per-category floor accumulation reproduced in Python."""
    import math

    import pyspark.sql.functions as F

    from arcane_framework_scala_spark.functions.stats import (
        categorical_drift,
    )

    rows = []
    # day 0: 4xA 4xB ; day 1: identical ; day 2: 8xC (total shift)
    for d, cats in [(0, "AAAABBBB"), (1, "AAAABBBB"), (2, "CCCCCCCC")]:
        for i, c in enumerate(cats):
            rows.append((d * 86_400 * 10**9 + i, c))
    df = spark.createDataFrame(rows, "ts long, event_type string")
    out = {
        r["day"]: r
        for r in categorical_drift(
            df, day_col=F.expr("ts div 1000000000 div 86400")
        ).collect()
    }
    assert set(out) == {1, 2}  # day 0 has no predecessor
    assert out[1]["jsd_micro"] == 0 and out[1]["n_cats"] == 2
    # day 2 vs day 1: disjoint supports -> JSD = ln 2 exactly;
    # per-category floored-micro model:
    def term(p, q):
        m = (p + q) / 2.0
        t = (0.5 * p * math.log(p / m) if p > 0 else 0.0) + (
            0.5 * q * math.log(q / m) if q > 0 else 0.0
        )
        return math.floor(t * 1_000_000.0)

    expected = term(0.0, 0.5) + term(0.0, 0.5) + term(1.0, 0.0)
    assert out[2]["n_cats"] == 3
    assert out[2]["jsd_micro"] == expected
    assert abs(out[2]["jsd_micro"] - math.floor(math.log(2) * 1e6)) <= 3
