#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query wall times.

Each query is forced end-to-end with a noop datasource write (full
materialization of every column, no driver collect)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "m3_merge_upsert",
    "m1_merge_sqlserver",
    "w1_dedup_latest",
    "m4_overwrite_backfill",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5ish",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "text_quality",
    "doc_fingerprint",
    "sim_cosine_topk",
    "sim_lsh_neighbors",
    "sim_ivf_topk",
    "dedup_embedding_cosine",
    "t_window_agg",
    "mm_image_features",
]

#: second section (r3+): the heaviest formerly-ungated queries. Kept
#: separate so HEADLINE's total stays comparable across every round.
HEADLINE2 = [
    "corpus_pack",
    "t_rollup_cascade",
    "sim_ivf_trained_topk",
    # r3-continuation additions (heaviest of the new operator families)
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "corpus_bpe_merges",
    "dedup_bloom_probe",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    import __spark_entry__ as entry_mod
    from arcane_framework_scala_spark import get_session

    spark = get_session("arcane-bench", extra_conf={"spark.ui.enabled": "false"})
    qs = entry_mod.queries()
    # untimed warmup: JVM + codegen + parquet footer caches, so the first
    # timed query measures the operator rather than session startup
    qs["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        best = None
        for _ in range(2):  # best-of-2: damp page-cache/JIT variance
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    timings2: dict[str, float] = {}
    for name in HEADLINE2:
        fn = qs[name]
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings2[name] = round(best, 3)
        print(f"# {name}: {timings2[name]}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "headline2_total": round(sum(timings2.values()), 3),
                "headline2_queries": timings2,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
