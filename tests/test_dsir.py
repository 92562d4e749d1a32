"""DSIR importance resampling (functions/lm.py::dsir_weights/select):
target-likeness ordering, selection-fraction contract, and partition
independence of the all-integer accumulation."""

import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.lm import dsir_select, dsir_weights


def _corpus(spark):
    rows = (
        # target domain: legal-ish vocabulary
        [(i, "whereas party herein covenant pursuant", "tgt") for i in range(4)]
        # raw filler: disjoint vocabulary
        + [(10 + i, "banana apple pear grape melon", "web") for i in range(8)]
        # a web doc that LOOKS like the target — must outrank the filler
        + [(30, "whereas covenant pursuant banana", "web")]
    )
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_target_lookalikes_rank_highest(spark):
    df = _corpus(spark)
    w = {
        r["doc_id"]: r["weight_micro"]
        for r in dsir_weights(df, F.col("source") == "tgt", dim=64).collect()
    }
    # every target doc and the lookalike outweigh every filler doc
    fillers = [w[10 + i] for i in range(8)]
    for d in [0, 1, 2, 3, 30]:
        assert w[d] > max(fillers), (d, w)
    # the pure-target docs outweigh the mixed lookalike
    assert w[0] > w[30]


def test_selection_fraction_and_tie_policy(spark):
    df = _corpus(spark)
    out = dsir_select(df, F.col("source") == "tgt", frac=0.4, dim=64).collect()
    assert len(out) == 13  # one row per doc
    sel = {r["doc_id"] for r in out if r["selected"]}
    # top-40% of 13 docs ≈ 5.2 → the 5 high scorers, plus any threshold
    # ties (the 8 fillers are identical, so they sit together below)
    assert sel == {0, 1, 2, 3, 30}


def test_weights_are_partition_independent(spark):
    df = _corpus(spark)
    base = sorted(
        map(tuple, dsir_weights(df, F.col("source") == "tgt", dim=64).collect())
    )
    shuffled = sorted(
        map(
            tuple,
            dsir_weights(
                df.repartition(7, "text"), F.col("source") == "tgt", dim=64
            ).collect(),
        )
    )
    assert base == shuffled
