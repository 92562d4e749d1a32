"""Plan-quality regression tests: pin the physical-plan properties the
scale design depends on (docs/SCALE.md "Plan audit"). These fail when a
refactor silently degrades a broadcast to a shuffle join, drops parquet
filter pushdown, or adds a Python eval node to a JVM-only pipeline."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from arcane_framework_scala_spark.plans import audit_plan

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    return entry_mod.queries()


def test_dimension_joins_broadcast(spark, queries):
    """Every dim join in the TPC-H-shaped queries must be a broadcast
    hash join; a sort-merge join on a dimension means the explicit
    broadcast() hints regressed."""
    for name, min_bhj in (("tpch_q3", 2), ("tpch_q5ish", 4)):
        a = audit_plan(queries[name](spark, SF_DIR))
        assert a.broadcast_joins >= min_bhj, (name, a.plan)
        assert a.sort_merge_joins == 0, (name, a.plan)
        assert a.nested_loop_joins == 0, (name, a.plan)


def test_filters_reach_parquet_scans(spark, queries):
    """Date/key predicates must be pushed into the scan, not evaluated
    post-scan (PushedFilters non-empty on every filtered scan)."""
    a = audit_plan(queries["tpch_q3"](spark, SF_DIR))
    assert a.pushed_filter_scans >= 3, a.plan
    a = audit_plan(queries["m5_shard_combine"](spark, SF_DIR))
    assert a.pushed_filter_scans == 8, a.plan


def test_merge_apply_shape(spark, queries):
    """The CDC merge is one full-outer SMJ (cannot broadcast) plus the
    simulated target build; no nested-loop fallback, no Python nodes,
    and no more than 2 exchanges — both merge branches hang off the
    shared repartition(merge_key), and the target agg, W1 window, and
    join all reuse that partitioning (r3 plan fix)."""
    a = audit_plan(queries["m3_merge_upsert"](spark, SF_DIR))
    assert a.nested_loop_joins == 0, a.plan
    assert a.python_nodes == 0, a.plan
    assert a.exchanges <= 2, a.plan


def test_reference_surface_stays_jvm_side(spark, queries):
    """No Python eval nodes in any reference-surface or text/dedup query —
    pandas UDFs are reserved for multimodal decode, where they are the
    design."""
    for name in (
        "w1_dedup_latest",
        "tpch_q1",
        "dedup_exact",
        "text_quality",
        "doc_fingerprint",
        "dedup_minhash_signature",
        "s9_json_explode",
    ):
        a = audit_plan(queries[name](spark, SF_DIR))
        assert a.python_nodes == 0, (name, a.plan)


def test_single_agg_queries_have_one_exchange(spark, queries):
    """Plain groupBy aggregations need exactly one shuffle (partial agg
    map-side, final agg post-exchange)."""
    for name in ("tpch_q1", "dedup_exact", "a2_agg_version_stats"):
        a = audit_plan(queries[name](spark, SF_DIR))
        assert a.exchanges == 1, (name, a.plan)


def test_brute_force_topk_nested_loop_is_intentional(spark, queries):
    """sim_cosine_topk joins on a non-equi condition (id != query_id)
    against a broadcast query side — the nested-loop is the design (query
    side is tiny and bounded); pin it so the exception stays visible."""
    a = audit_plan(queries["sim_cosine_topk"](spark, SF_DIR))
    assert a.nested_loop_joins <= 1, a.plan
    assert a.sort_merge_joins == 0, a.plan


def test_expensive_plans_hold_at_sf01(spark, queries):
    """The same plan-shape pins, built against sf0.1 inputs — the scale
    where a regression actually costs wall-clock. Plans are only built
    (explain, no execution), so this stays cheap; stats-driven planner
    choices (broadcast thresholds, AQE inputs) see the real sf0.1 file
    sizes here rather than the tiny test fixture."""
    sf01 = "/root/testdata/sf0.1"
    a = audit_plan(queries["dedup_minhash_lsh_pairs"](spark, sf01))
    assert a.python_nodes == 0, a.plan
    assert a.nested_loop_joins == 0, a.plan  # bucketed join, never all-pairs
    a = audit_plan(queries["sim_lsh_neighbors"](spark, sf01))
    # ≤4 static scans: the checkpointed projection's lineage prints per
    # consumer (counts + both join sides) but runs once (r5 skew guard)
    assert a.scans <= 4 and a.python_nodes == 0 and a.exchanges <= 3, a.plan
    a = audit_plan(queries["sim_ivf_topk"](spark, sf01))
    assert a.python_nodes == 0 and a.sort_merge_joins == 0, a.plan
    a = audit_plan(queries["m3_merge_upsert"](spark, sf01))
    assert a.nested_loop_joins == 0 and a.python_nodes == 0, a.plan
    assert a.exchanges <= 2, a.plan
    for name, min_bhj in (("tpch_q3", 2), ("tpch_q5ish", 4)):
        a = audit_plan(queries[name](spark, sf01))
        assert a.broadcast_joins >= min_bhj, (name, a.plan)
        assert a.sort_merge_joins == 0, (name, a.plan)


def test_lsh_neighbors_single_pass(spark, queries):
    """lsh_bucket_neighbors computes (norm, bucket) in the same projection
    as the scan and (r5) lazily checkpoints it once for the bucket-count
    guard table and both self-join sides — the static plan prints the
    lineage per consumer (≤4 scans) but the runtime computes the
    projection ONCE; no id-keyed join back to a signature table,
    everything JVM-side. r6: with no bucket over the cap the B=1 fast
    path must plan the PLAIN bucket self-join — no blocks broadcast, no
    per-row explode(sequence) (VERDICT r5 item 1)."""
    for name in ("sim_lsh_neighbors", "dedup_embedding_cosine"):
        a = audit_plan(queries[name](spark, SF_DIR))
        assert a.scans <= 4, (name, a.plan)
        assert a.python_nodes == 0, (name, a.plan)
        assert a.exchanges <= 3, (name, a.plan)
        assert a.cartesian_products == 0, (name, a.plan)
        assert "sequence" not in a.plan.lower(), (name, a.plan)


def test_lsh_guard_path_still_plans_blocks(spark):
    """Force the guard (cap below the densest bucket) and pin its shape:
    blocks broadcast to both sides, b-side explode(sequence) fan-out, no
    cartesian — the r5 salted block-pairing, now only planned when a
    bucket actually exceeds max_bucket_rows."""
    from arcane_framework_scala_spark.functions.similarity import (
        lsh_bucket_neighbors,
    )

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    a = audit_plan(
        lsh_bucket_neighbors(
            emb, dim=dim, bits=2, threshold=0.7, max_bucket_rows=5
        )
    )
    assert "sequence" in a.plan.lower(), a.plan
    assert a.broadcast_joins >= 2, a.plan
    assert a.cartesian_products == 0, a.plan
    assert a.python_nodes == 0, a.plan


def test_corpus_operators_plan_shapes(spark, queries):
    """Corpus-curation family: repetition is explode + two keyed
    aggregations (3 exchanges incl. the small-file spread, no Python);
    contamination joins the benchmark side as a broadcast; hash split and
    PII redaction are shuffle-free narrow projections."""
    a = audit_plan(queries["corpus_repetition"](spark, SF_DIR))
    assert a.python_nodes == 0, a.plan
    assert a.exchanges <= 3, a.plan
    a = audit_plan(queries["corpus_contamination"](spark, SF_DIR))
    assert a.broadcast_joins >= 1, a.plan
    assert a.sort_merge_joins == 0, a.plan
    assert a.python_nodes == 0, a.plan
    for name in ("corpus_hash_split", "corpus_pii_redact"):
        a = audit_plan(queries[name](spark, SF_DIR))
        assert a.exchanges == 0, (name, a.plan)
        assert a.python_nodes == 0, (name, a.plan)


def test_span_dedup_plan_shapes(spark, queries):
    """Span dedup: no pair-wise or nested-loop stage anywhere (the whole
    point of the n-gram formulation), everything JVM-side; the stats
    variant stays within explode → gram agg → join-back → doc window."""
    for name in ("dedup_span_stats", "dedup_span_clean"):
        a = audit_plan(queries[name](spark, SF_DIR))
        assert a.nested_loop_joins == 0, (name, a.plan)
        assert a.cartesian_products == 0, (name, a.plan)
        assert a.python_nodes == 0, (name, a.plan)


def test_tfidf_rerank_scores_only_candidates(spark, queries):
    """TF-IDF rerank must stay candidate-bounded: hash joins only (no
    nested-loop over doc pairs), no Python nodes. The static plan still
    prints the weight pipeline's lineage under each of its three
    consumers (the lazy localCheckpoint dedupes at execution, not at
    explain time), so the scan ceiling pins against *adding* consumers,
    not against the checkpoint's runtime single-compute."""
    a = audit_plan(queries["sim_tfidf_rerank"](spark, SF_DIR))
    assert a.nested_loop_joins == 0, a.plan
    assert a.cartesian_products == 0, a.plan
    assert a.python_nodes == 0, a.plan
    assert a.scans <= 6, a.plan


def test_kmeans_training_stays_broadcast_and_jvm(spark, queries):
    """Every k-means Lloyd iteration assigns via a *broadcast* cross
    join against the k-row codebook (BroadcastNestedLoop by design — the
    brute-force/IVF pattern); what must never appear is a non-broadcast
    CartesianProduct, a Python node, or a corpus-sized SMJ, at sf0.1
    plan-build scale."""
    a = audit_plan(queries["sim_ivf_trained_topk"](spark, "/root/testdata/sf0.1"))
    assert a.python_nodes == 0, a.plan
    assert a.cartesian_products == 0, a.plan


def test_newly_gated_heavy_queries_plan_shapes(spark, queries):
    """r3 gate additions hold the same discipline: no Python nodes, no
    cartesian products; packing and the rollup cascade stay pure keyed
    exchanges, temporal joins never degrade to an unbounded NLJ over the
    fact side, canonical dedup removes via an anti join (no extra corpus
    scans beyond docs + pair pipeline)."""
    for name in ("corpus_pack", "t_rollup_cascade", "t_asof_join", "t_range_join"):
        a = audit_plan(queries[name](spark, SF_DIR))
        assert a.python_nodes == 0, (name, a.plan)
        assert a.cartesian_products == 0, (name, a.plan)
    a = audit_plan(queries["dedup_canonical"](spark, SF_DIR))
    assert a.python_nodes == 0, a.plan
    assert a.cartesian_products == 0, a.plan


def test_salted_join_broadcasts_exploded_dim(spark, queries):
    """salted_join must broadcast the salt-exploded dim (big side never
    shuffles for the join); two_phase_agg adds its two keyed exchanges."""
    a = audit_plan(queries["skew_salted_agg"](spark, SF_DIR))
    assert a.broadcast_joins >= 1, a.plan
    assert a.sort_merge_joins == 0, a.plan
    assert a.python_nodes == 0, a.plan


def test_aqe_splits_skewed_join_at_runtime(spark):
    """docs/SCALE.md claims AQE handles runtime-discovered skew (salting
    is only for *known* pathological keys). Prove it: a 95%-hot join key
    under lowered skew thresholds must show 'skewed' AQEShuffleRead in
    the final adaptive plan."""
    import pyspark.sql.functions as F

    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        big = spark.range(200_000).select(
            F.when(F.col("id") % 20 < 19, 0).otherwise(F.col("id") % 50).alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("w")
        )
        j = big.join(dim, "k")
        j.collect()  # same query execution -> final adaptive plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skewed" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_r3_corpus_additions_plan_shapes(spark, queries):
    """Round-3 curation family: mixture resampling and the quality
    filter are shuffle-free narrow projections (the explode fan-out and
    all rule evaluation stay in the scan stage); shard shuffle is
    exactly one exchange (the hash partition on shard that the sharded
    write needs anyway) plus the per-shard sort."""
    for name in ("corpus_mixture_sample", "corpus_quality_filter"):
        a = audit_plan(queries[name](spark, SF_DIR))
        assert a.exchanges == 0, (name, a.plan)
        assert a.python_nodes == 0, (name, a.plan)
    a = audit_plan(queries["corpus_shuffle_shards"](spark, SF_DIR))
    assert a.exchanges == 1, a.plan
    assert a.python_nodes == 0, a.plan


def test_recall_joins_stay_metadata_sized(spark, queries):
    """recall@k composes ivf/brute-force top-k (whose broadcast
    nested-loop joins over the 5-row query side are the documented
    intentional shape) with a hits join on (query_id, id). What must
    never appear: a CartesianProduct (a non-broadcast corpus×corpus
    pairing) or a Python node."""
    a = audit_plan(queries["sim_ivf_recall"](spark, SF_DIR))
    assert "CartesianProduct" not in a.plan, a.plan
    assert a.python_nodes == 0, a.plan


def test_global_anti_pattern_sweep(spark, queries):
    """Blanket regression gate over EVERY registry query's physical plan
    (streaming gates excluded — they execute micro-batch pipelines and
    return memory-table reads): no CartesianProduct anywhere, no Python
    eval nodes outside the multimodal family (Arrow mapInPandas is the
    design there), and no single-partition global window (`WindowExec`
    warning shape: Window with empty partitionBy over the full set —
    top-k must be TakeOrdered)."""
    import re

    SKIP_PREFIXES = (
        "t7_", "t_stream_", "t_stateful", "t1_", "t2_",
        "corpus_jsonl",  # executes a write+readback, plan is the readback
        "s11_orc",       # same: round-trip through a temp ORC dir
    )
    PYTHON_OK_PREFIX = "mm_"  # multimodal: Arrow mapInPandas IS the design
    # r11: SemDeDup's within-cell pair pass is the grouped Arrow kernel
    # (ONE FlatMapGroupsInPandas, functions/semdedup.py) — allowed by
    # name with an exact count so any OTHER Python node still fails
    ARROW_PAIR_PASS = {"dedup_semantic", "dedup_semantic_prefit"}
    checked = 0
    for name, fn in queries.items():
        if name.startswith(SKIP_PREFIXES):
            continue
        a = audit_plan(fn(spark, SF_DIR))
        assert a.cartesian_products == 0, (name, a.plan)
        if name in ARROW_PAIR_PASS:
            assert a.python_nodes == 1, (name, a.plan)
            assert "FlatMapGroupsInPandas" in a.plan, (name, a.plan)
        elif not name.startswith(PYTHON_OK_PREFIX):
            assert a.python_nodes == 0, (name, a.plan)
        # a Window node with no PARTITION BY spec = everything in one task
        for m in re.finditer(r"Arguments: \[[^\]]*windowspecdefinition\(([^)]*)\)", a.plan):
            spec = m.group(1)
            # windowspecdefinition(partitionCols..., orderCol ASC..., frame)
            # single-partition shape has the order column first with no
            # partition columns before it: detect 'specifiedwindowframe' as
            # the only other arg
            assert not spec.strip().startswith(("value#", "totalprice")), (
                name, spec)
        checked += 1
    assert checked >= 70, checked


def test_m8_capstone_plan_stays_materialized(spark, queries):
    """The CDC→corpus capstone must keep the merged corpus materialized:
    un-materialized it recomputed the full-outer merge subtree per
    consumer (15 scans / 26 exchanges at sf0.001); the pinned ceiling
    catches that regression."""
    a = audit_plan(queries["m8_cdc_corpus_vertical"](spark, SF_DIR))
    assert a.scans <= 6, a.plan
    assert a.exchanges <= 18, a.plan
    assert a.cartesian_products == 0 and a.python_nodes == 0, a.plan


def test_r3_continuation_plan_shapes(spark, queries):
    """This round's additions: JL projection is a zero-shuffle codegen
    projection; the Bloom probe's corpus path is 3 broadcast joins and
    exactly ONE wide exchange (the per-doc agg) after the bit-set
    checkpoint; ROLLUP is a single-pass aggregation (2 exchanges:
    partial->final, never a 3-scan union); the rolling RANGE window is
    one exchange; PQ search ends in a WindowGroupLimit (top-k pushdown
    prunes per-partition BEFORE the query-keyed exchange)."""
    a = audit_plan(queries["sim_jl_project"](spark, SF_DIR))
    assert a.exchanges == 0 and a.python_nodes == 0, a.plan

    a = audit_plan(queries["dedup_bloom_probe"](spark, SF_DIR))
    assert a.broadcast_joins == 3, a.plan
    assert a.exchanges <= 1, a.plan

    a = audit_plan(queries["t_grouping_sets"](spark, SF_DIR))
    assert a.scans == 1, a.plan
    assert a.exchanges <= 2, a.plan

    a = audit_plan(queries["t_moving_avg"](spark, SF_DIR))
    assert a.exchanges == 1, a.plan

    a = audit_plan(queries["sim_pq_topk"](spark, SF_DIR))
    assert "WindowGroupLimit" in a.plan, a.plan
    assert a.cartesian_products == 0, a.plan

    a = audit_plan(queries["a9_partition_advisor"](spark, SF_DIR))
    assert a.scans == 1 and a.exchanges <= 1, a.plan


def test_r4_semdedup_and_dsir_plan_shapes(spark, queries):
    """Round-4 additions. SemDeDup: the pairwise stage must be an
    equi-join on cell (hash-joinable — never a corpus×corpus cartesian),
    everything JVM-side; the static plan prints the assignment lineage
    per consumer (lazy localCheckpoint dedupes at runtime, the tfidf
    note), so only the anti-pattern invariants are pinned. DSIR: the
    dim-row distribution joins broadcast; the selection threshold is a
    broadcast 1-row aggregate, never a global rank window."""
    a = audit_plan(queries["dedup_semantic"](spark, SF_DIR))
    assert a.cartesian_products == 0, a.plan
    # r11: the within-cell pair pass is the grouped Arrow kernel
    # (ONE FlatMapGroupsInPandas — functions/semdedup.py
    # _cell_pair_dups_fn, equivalence pinned in tests/test_semdedup_arrow
    # .py); any OTHER Python node creeping in is still a regression
    assert a.python_nodes == 1, a.plan
    assert "FlatMapGroupsInPandas" in a.plan, a.plan
    a = audit_plan(queries["corpus_dsir_select"](spark, SF_DIR))
    assert a.cartesian_products == 0, a.plan
    assert a.python_nodes == 0, a.plan
    # r11: the doc-sized weight table is materialized once (the old plan
    # re-ran the whole feats chain for the threshold aggregate AND the
    # selection join — 6 text passes); the audited selection plan is now
    # the checkpointed weights × ONE broadcast 1-row threshold (a 1-row
    # build side plans as BroadcastNestedLoopJoin — keyless, bounded)
    assert "BroadcastExchange" in a.plan, a.plan
    assert a.nested_loop_joins <= 1, a.plan
    assert "row_number" not in a.plan, a.plan


def test_r5_additions_plan_shapes(spark, queries):
    """Round-5 additions. fuzzy_contamination: benchmark band table
    broadcasts, no cartesian, no Python, no corpus self-join blow-up
    (the only joins are the broadcast hit join and the zero-fill id
    join). dedup_semantic: no cell holds more than max_cell_rows at
    these SFs, so the r6 B=1 fast path must plan the PLAIN within-cell
    pairing — no explode(sequence) guard fan-out (VERDICT r5 item 1);
    the guard path's shape is pinned separately with a forced tiny cap.
    Checked at sf0.001 AND sf0.1."""
    a = audit_plan(queries["corpus_fuzzy_contamination"](spark, SF_DIR))
    assert a.cartesian_products == 0, a.plan
    assert a.python_nodes == 0, a.plan
    assert a.broadcast_joins >= 1, a.plan

    # r11: the pair pass is the grouped Arrow kernel — exactly ONE
    # FlatMapGroupsInPandas per plan (see test_r4 note); the B=1 /
    # guard-path distinction (explode(sequence) fan-out) is unchanged
    for sf in (SF_DIR, "/root/testdata/sf0.1"):
        a = audit_plan(queries["dedup_semantic"](spark, sf))
        assert a.cartesian_products == 0, a.plan
        assert a.python_nodes == 1, a.plan
        assert "FlatMapGroupsInPandas" in a.plan, a.plan
        assert "sequence" not in a.plan.lower(), a.plan  # B=1 fast path

    # guard path, forced: cap below the densest cell → blocks join +
    # explode(sequence) planned, still no cartesian, still one kernel
    from arcane_framework_scala_spark.functions.semdedup import semantic_dedup

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    a = audit_plan(
        semantic_dedup(emb, k=3, iters=1, threshold=0.9, max_cell_rows=5)
    )
    assert "sequence" in a.plan.lower(), a.plan
    assert a.cartesian_products == 0, a.plan
    assert a.python_nodes == 1, a.plan

    a = audit_plan(queries["dedup_semantic_prefit"](spark, SF_DIR))
    assert a.cartesian_products == 0, a.plan
    assert a.python_nodes == 1, a.plan
    assert "FlatMapGroupsInPandas" in a.plan, a.plan


def test_semantic_prefit_cost_is_fit_free(spark):
    """r7 bisect of the r6 prefit regression (VERDICT r6 item 3): per
    semantic_dedup() call the work splits into (a) the eager
    checkpoint-materialization job — Lloyd fit (ONLY when no codebook is
    passed) + assignment + the B=1 guard's metadata-sized count — and
    (b) the timed pair-join query, which reads the checkpoint three
    times (both self-join sides + the keep join) and is therefore
    PLAN-IDENTICAL between prefit and fit-included. The prefit artifact
    removes exactly the fit; the per-call assignment is irreducible by
    design (production deduplicates a NEW corpus per call against the
    fixed codebook). The r6 +23% was bench-host drift on job (a), not a
    re-planned fit: this pin proves the prefit downstream plan contains
    no Lloyd aggregation tree, only ExistingRDD checkpoint scans, and
    matches the fit-included plan shape node-for-node."""
    from arcane_framework_scala_spark.functions.kmeans import kmeans_fit
    from arcane_framework_scala_spark.functions.semdedup import semantic_dedup
    import re

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    cb = kmeans_fit(emb, k=8, iters=2).localCheckpoint(eager=True)
    pre = semantic_dedup(emb, threshold=0.35, codebook=cb)
    full = semantic_dedup(emb, threshold=0.35, k=8, iters=2)
    pp = pre._jdf.queryExecution().executedPlan().toString()
    fp = full._jdf.queryExecution().executedPlan().toString()

    def shape(plan):
        # node names only, stripped of expr ids — the comparable skeleton
        return [
            re.match(r"[\s*+:-]*([A-Za-z]+)", ln).group(1)
            for ln in plan.splitlines()
            if re.match(r"[\s*+:-]*[A-Za-z]", ln)
        ]

    assert shape(pp) == shape(fp)
    # the timed query reads the checkpoint, not the corpus (the fit and
    # assignment live in the already-run materialization job). r11: the
    # Arrow pair kernel replaced the two self-join reads with ONE grouped
    # read, so the checkpoint is scanned twice (pair input + keep join)
    assert pp.count("ExistingRDD") == 2, pp
    assert "Scan parquet" not in pp, pp


def test_a16_drift_stays_aggregate_scale(spark, queries):
    """Drift monitor: the event table is scanned once into a map-side
    combined aggregate; everything after operates on days×categories
    rows, with the per-day totals pair broadcast. No cartesian, no
    Python, and at most the two aggregation exchanges plus the
    full-outer cat join."""
    a = audit_plan(queries["a16_category_drift"](spark, SF_DIR))
    assert a.cartesian_products == 0, a.plan
    assert a.python_nodes == 0, a.plan
    assert a.broadcast_joins >= 1, a.plan


def test_persisted_index_scans_are_partition_pruned(spark, queries):
    """VERDICT r5 item 3: the persisted-index docstrings promise the
    probe set reaches the stored table as a PARTITION filter (the
    Iceberg-partition-pruning analogue the reference's MERGE IN-lists
    rely on, models/queries/MergeQuerySegment.scala:54-71). Pin it: a
    regression to full-scan shows up as an empty PartitionFilters list
    on the codes/lists/band scans.

    sim_ivfpq_index_topk probes 2 of 8 cells; rerank additionally prunes
    the float-vector index; dedup_index_pairs pushes the batch's
    (band, pfx) buckets as an OR-of-conjunctions filter."""
    import re

    a = audit_plan(queries["sim_ivfpq_index_topk"](spark, SF_DIR))
    assert a.partition_filter_scans >= 1, a.plan
    cell_filters = [p for p in a.partition_filters if "cell" in p]
    assert cell_filters, a.partition_filters
    # pruned < total: the probe filter enumerates fewer cell ids than
    # the 8 centroids the gate builds the index with
    in_list = re.search(r"IN \(([\d,]+)\)", cell_filters[0])
    assert in_list, cell_filters[0]
    probed = set(in_list.group(1).split(","))
    assert 0 < len(probed) < 8, cell_filters[0]

    a = audit_plan(queries["sim_ivfpq_index_rerank"](spark, SF_DIR))
    # both persisted tables pruned: the PQ codes scan (cell) AND the
    # vector index lists scan (centroid_id)
    assert a.partition_filter_scans >= 2, (a.partition_filters, a.plan)
    assert any("cell" in p for p in a.partition_filters), a.partition_filters
    assert any(
        "centroid_id" in p for p in a.partition_filters
    ), a.partition_filters

    a = audit_plan(queries["dedup_index_pairs"](spark, SF_DIR))
    assert a.partition_filter_scans >= 1, a.plan
    assert any("band" in p for p in a.partition_filters), a.partition_filters


def test_sketch_gates_plan_shapes(spark, queries):
    """r6 sketch family: every sketch build is ONE map-side-combinable
    aggregation (plus metadata-scale post-processing) — no Python
    nodes, no cartesian blow-ups, and the CMS lookup joins its ≤ d×w
    counter table as a broadcast. The KMV ungrouped bottom-k must plan
    as TakeOrderedAndProject (distributed partial top-k), never a
    single-partition global Sort."""
    a = audit_plan(queries["a17_hll_distinct"](spark, SF_DIR))
    assert a.python_nodes == 0, a.plan
    assert a.cartesian_products == 0, a.plan

    a = audit_plan(queries["a18_cms_heavy_hitters"](spark, SF_DIR))
    assert a.python_nodes == 0, a.plan
    assert a.cartesian_products == 0, a.plan
    assert a.broadcast_joins >= 1, a.plan  # counter-table lookup

    a = audit_plan(queries["a19_kmv_overlap"](spark, SF_DIR))
    assert a.python_nodes == 0, a.plan
    assert a.cartesian_products == 0, a.plan
    assert "TakeOrderedAndProject" in a.plan, a.plan

    a = audit_plan(queries["a20_log_hist_quantiles"](spark, SF_DIR))
    assert a.python_nodes == 0, a.plan
    assert a.cartesian_products == 0, a.plan


def test_web_family_plan_shapes(spark, queries):
    """Late-r6 web-curation family: canonicalization is shuffle-free;
    the host/URL-keyed operators pay exactly their one key shuffle (+1
    for the row_number window's sort reuse) and stay JVM-side."""
    a = audit_plan(queries["web_url_canonical"](spark, SF_DIR))
    assert a.exchanges == 0, a.plan
    assert a.python_nodes == 0, a.plan

    # host_stats pays 2: the exact countDistinct(canon_url) expands to
    # Spark's standard two-phase distinct aggregate ((host, url) partial,
    # then host) — inherent to exactness, not a regression
    for name, max_ex in (("web_host_cap", 1), ("web_url_dedup", 1),
                         ("web_host_stats", 2)):
        a = audit_plan(queries[name](spark, SF_DIR))
        assert a.exchanges <= max_ex, (name, a.plan)
        assert a.python_nodes == 0, (name, a.plan)
        assert a.nested_loop_joins == 0, (name, a.plan)


def test_line_dedup_plan_shapes(spark, queries):
    """Corpus line dedup: hash joins only (no cartesian/nested-loop),
    no Python nodes; the clean variant's reassembly is an aggregate,
    not a window over the corpus."""
    for name in ("corpus_line_dedup", "corpus_line_dedup_clean"):
        a = audit_plan(queries[name](spark, SF_DIR))
        assert a.nested_loop_joins == 0, (name, a.plan)
        assert a.cartesian_products == 0, (name, a.plan)
        assert a.python_nodes == 0, (name, a.plan)


def test_ivm_delta_apply_is_view_sized(spark):
    """The IVM merge step must plan against the view + delta only: one
    full-outer join, no base-table scan, no Python nodes."""
    from arcane_framework_scala_spark.operators import ivm
    from arcane_framework_scala_spark.operators.diff import snapshot_diff

    before = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, host string, n long"
    )
    after = spark.createDataFrame(
        [(1, "a", 11), (3, "c", 5)], "k long, host string, n long"
    )
    out = ivm.apply_group_delta(
        ivm.group_stats_bootstrap(before, "host", "n"),
        ivm.group_delta(snapshot_diff(before, after, keys=["k"]), "host", "n"),
        "host",
    )
    a = audit_plan(out)
    assert a.python_nodes == 0, a.plan
    assert a.nested_loop_joins == 0, a.plan


def test_cube_is_one_pass(spark, queries):
    """CUBE(etype, dow) must plan as Expand + ONE aggregate shuffle —
    not a 4-way self-union of scans."""
    a = audit_plan(queries["a22_grouping_cube"](spark, SF_DIR))
    assert a.scans == 1, a.plan
    assert "Expand" in a.plan, a.plan
    assert a.exchanges <= 1, a.plan


def test_window_suite_shares_one_window(spark, queries):
    """All six window functions share one (partition, order) spec: one
    exchange + one sort, a single Window node."""
    a = audit_plan(queries["a23_window_suite"](spark, SF_DIR))
    assert a.exchanges == 1, a.plan
    assert a.plan.count("(4) Window") + a.plan.count("Window (") <= 2, a.plan
    assert a.python_nodes == 0, a.plan


def test_pruned_cow_hydrate_filter_is_partition_pruned(spark, tmp_path):
    """The r7 pruned-CoW merge hydrates its rewrite group with a
    balanced OR of null-safe partition-equality terms — pin that this
    exact filter shape reaches the scan as PartitionFilters (directory
    pruning, zero DataFilters), because the whole group-pruning story
    collapses to a full scan if Catalyst ever stops recognizing it."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, f"e{i % 4}") for i in range(100)], "k long, event_type string"
    )
    path = str(tmp_path / "pp")
    df.write.partitionBy("event_type").parquet(path)
    base = spark.read.parquet(path)
    terms = [
        F.col("event_type").eqNullSafe(F.lit(v)) for v in ("e1", "e3")
    ]
    plan = (
        base.filter(terms[0] | terms[1])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan, plan
    assert "PartitionFilters: []" not in scan[0], scan[0]
    assert "<=>" in scan[0], scan[0]          # the null-safe terms landed
    assert "DataFilters: []" in scan[0], scan[0]  # nothing left post-prune


def test_r8_additions_plan_shapes(spark, queries, tmp_path):
    """r8 families: html extraction is a shuffle-free JVM projection;
    the profile/histogram IVM applies are state-sized joins with no
    Python nodes; the jar-free Delta reader's scan accepts predicate
    pushdown like any parquet table."""
    import json
    import os

    import pyspark.sql.functions as F

    from arcane_framework_scala_spark.functions import web

    # html_extract: narrow regexp chain — zero exchanges, zero Python
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = audit_plan(
        docs.select(web.html_extract(F.col("text")).alias("t"))
    )
    assert a.exchanges == 0, a.plan
    assert a.python_nodes == 0, a.plan

    # profile/histogram IVM applies: view-sized, JVM-side, no loops
    from arcane_framework_scala_spark.operators import ivm_profile as ip
    from arcane_framework_scala_spark.operators.diff import snapshot_diff

    before = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, host string, n long"
    )
    after = spark.createDataFrame(
        [(1, "a", 11), (3, "c", 5)], "k long, host string, n long"
    )
    cdf = snapshot_diff(before, after, keys=["k"])
    for out in (
        ip.apply_moments_delta(
            ip.moments_bootstrap(before, "host", "n"),
            ip.moments_delta(cdf, "host", "n"),
            "host",
        ),
        ip.apply_distinct_delta(
            ip.distinct_bootstrap(before, "host", "n"),
            ip.distinct_delta(cdf, "host", "n"),
            "host",
        ),
        ip.apply_hist_delta(
            ip.hist_bootstrap(before, "host", "n"),
            ip.hist_delta(cdf, "host", "n"),
            "host",
        ),
    ):
        a = audit_plan(out)
        assert a.python_nodes == 0, a.plan
        assert a.nested_loop_joins == 0, a.plan
        assert a.cartesian_products == 0, a.plan

    # delta_reader: filters push down into the parquet scan it plans
    from arcane_framework_scala_spark.sources import delta_reader as dr

    t = str(tmp_path / "dt")
    os.makedirs(os.path.join(t, "_delta_log"))
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(t, "w"))
    part = next(
        f for f in os.listdir(os.path.join(t, "w"))
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    os.replace(os.path.join(t, "w", part), os.path.join(t, "f1.parquet"))
    schema_json = json.dumps(
        {"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ]}
    )
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        ) + "\n")
        f.write(json.dumps(
            {"metaData": {"id": "t", "format": {"provider": "parquet",
                                                "options": {}},
                          "schemaString": schema_json,
                          "partitionColumns": [], "configuration": {}}}
        ) + "\n")
        f.write(json.dumps(
            {"add": {"path": "f1.parquet", "dataChange": True}}
        ) + "\n")
    plan = (
        dr.read_delta(spark, t).filter("id = 1")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,1)]" in plan, plan
