"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2 or
a beyond-reference LLM-pipeline operator; ``oracle_sql()`` holds the DuckDB
equivalent. CDC operators are simulated over the driver's ``events`` /
``lineitem`` tables (the reference's sources are external systems — SQL
Server, ADLS — so the change-feed *shape* is derived deterministically from
the data; the operator under test is the engine transform, not the I/O).

Determinism rules used throughout (so value hashes match the oracle):
- no raw double aggregation in outputs — ``floor(x*scale)`` to bigint first;
- timestamps leave queries as formatted strings or epoch seconds;
- every ranking has a total-order tiebreak.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F  # noqa: F401

# The gate implementations live in gates/ (split by registry section,
# VERDICT r8 item 7); the chained star import reproduces the original
# single-file namespace exactly -- q_* callables, _SQL oracle fragments
# and helper builders alike.
from gates.g6_webcorpus import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full blob-CDC upsert vertical at sf0.001."""
    return q_m3_merge_upsert(spark, "/root/testdata/sf0.001")


# r11 GATE WINDOW (VERDICT r10 item 1): scripts/plan_window.py --emit
# verbatim, pure staleness order — the 30-row r6 cohort first (extinct
# after this window), then the stalest r7 rows. r11-born gates are
# appended by displacing the freshest tail entries of the proposal
# (never-checked gates MUST sit inside the window — the registry
# contract test enforces it). Max registry staleness after the driver
# runs this window stays <=4.
_GATE_WINDOW_R11 = [
    "p6_name_normalize",
    "a2_agg_version_stats",
    "p7_json_extract",
    "text_quality",
    "token_counts",
    "lang_id",
    "doc_fingerprint",
    "dedup_minhash_signature",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_span_stats",
    "sim_tfidf_rerank",
    "dedup_span_clean",
    "sim_rrf_hybrid",
    "sim_lsh_buckets",
    "sim_lsh_neighbors",
    "mm_image_features",
    "mm_audio_features",
    "web_url_canonical",
    "web_host_stats",
    "web_host_cap",
    "web_url_dedup",
    "corpus_line_dedup",
    "corpus_line_dedup_clean",
    "corpus_top_ngrams",
    "m9_web_ingest_vertical",
    "a21_host_stats_ivm",
    "a22_grouping_cube",
    "a23_window_suite",
    "p13_set_ops",
    "s1_mssql_changes",
    "s6_cdm_vertical",
    "m1_merge_sqlserver",
    "m2_merge_synapse",
    "m3_merge_upsert",
    "m7_real_merge_vertical",
    "t1_polling_vertical",
    "t2_crash_replay",
    "t7_stream_merge_vertical",
    "t9_replay_idempotent",
    "corpus_pipeline_e2e",
    "dedup_clusters_star",
    "mm_frame_sample",
    "s9_avro_json",
    # r11-born gates displace the proposal's freshest tail entries
    # (sim_ivf_trained_topk, sim_quantize_int8, dedup_embedding_cosine,
    # t_window_agg, sim_kmeans_centroids, sim_ivf_topk out — all
    # r7-green, staleness exactly 4 after r11, first in line for r12;
    # sim_ivf_topk additionally runs in bench h1 every round): never-
    # checked gates must sit in the window
    "t_ivm_delta_feed",
    "x14_iceberg_idless_eqdelete",
    "s21_delta_widened_mapping",
    "t_ivm_iceberg_changelog",
    "t_iceberg_cdc_poll",
    "x15_restore_rollback",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING MATTERS: the gate window list above defines the first 50
    # entries; the remainder keep their registration order. r2-r5 windows
    # are recorded in CORRECTNESS_r0*.json.
    full = {
        # --- r5 GATE WINDOW slots 1-36: every remaining
        #     never-driver-checked entry (VERDICT r4 item 1) ---
        "corpus_jsonl_roundtrip": q_corpus_jsonl_roundtrip,
        "corpus_lm_score": q_corpus_lm_score,
        "corpus_hashed_features": q_corpus_hashed_features,
        "corpus_lm_buckets": q_corpus_lm_buckets,
        "corpus_top_terms": q_corpus_top_terms,
        "t_debounce": q_t_debounce,
        "corpus_bigram_score": q_corpus_bigram_score,
        "corpus_length_histogram": q_corpus_length_histogram,
        "dedup_cluster_stats": q_dedup_cluster_stats,
        "corpus_lang_mix": q_corpus_lang_mix,
        "corpus_dedup_card": q_corpus_dedup_card,
        "mm_sniff": q_mm_sniff,
        "dedup_shingle_df_stats": q_dedup_shingle_df_stats,
        "p11_zorder_key": q_p11_zorder_key,
        "s12_binary_ingest": q_s12_binary_ingest,
        "s13_text_lines": q_s13_text_lines,
        "a11_profile": q_a11_profile,
        "a12_histogram": q_a12_histogram,
        "p12_zorder_layout_report": q_p12_zorder_layout_report,
        "a13_winsorize": q_a13_winsorize,
        "t_ewma_pow2": q_t_ewma_pow2,
        "s15_partitioned_roundtrip": q_s15_partitioned_roundtrip,
        "corpus_shard_manifest": q_corpus_shard_manifest,
        "a14_freshness": q_a14_freshness,
        "t_dwell_time": q_t_dwell_time,
        "corpus_novelty": q_corpus_novelty,
        "a15_daily_growth": q_a15_daily_growth,
        "corpus_dup_by_source": q_corpus_dup_by_source,
        "t_active_users": q_t_active_users,
        "dedup_semantic": q_dedup_semantic,
        "corpus_dsir_select": q_corpus_dsir_select,
        "corpus_quality_classifier": q_corpus_quality_classifier,
        "t4_shaper_chain": q_t4_shaper_chain,
        "s3_tsql_surfaces": q_s3_tsql_surfaces,
        "t12_metrics_wire": q_t12_metrics_wire,
        "t10_graceful_stop": q_t10_graceful_stop,
        # --- r5 GATE WINDOW slots 37-50: stalest r2-era rows, freshness
        #     re-proof (oracles unchanged since r2) ---
        "s8_blob_enrich": q_blob_enrich,
        "dedup_exact": q_exact_dedup,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5ish": q_tpch_q5ish,
        "x1_maintenance_vertical": q_x1_maintenance_vertical,
        "k1_staging_writer": q_k1_staging_writer,
        "m6_shard_resume": q_m6_shard_resume,
        "w2_backfill_dedup": q_w2_backfill_dedup,
        # --- r5-born gates (never checked — must sit inside the window;
        #     displace five stale fillers) ---
        "sim_ivfpq_index_topk": q_sim_ivfpq_index_topk,
        "corpus_fuzzy_contamination": q_corpus_fuzzy_contamination,
        "dedup_semantic_prefit": q_dedup_semantic_prefit,
        "a16_category_drift": q_a16_category_drift,
        "a17_hll_distinct": q_a17_hll_distinct,
        "a18_cms_heavy_hitters": q_a18_cms_heavy_hitters,
        "a19_kmv_overlap": q_a19_kmv_overlap,
        "a20_log_hist_quantiles": q_a20_log_hist_quantiles,
        "sim_ivfpq_index_rerank": q_sim_ivfpq_index_rerank,
        # --- ever driver-green (r1∪r2∪r3∪r4 CORRECTNESS rows stand;
        #     oracles unchanged) ---
        "m4_overwrite_backfill": q_m4_overwrite_backfill,
        "a3_table_stats": q_a3_table_stats,
        "m5_shard_combine": q_m5_shard_combine,
        "s7_cdm_csv_parse": q_s7_cdm_csv_parse,
        "o4_watermark_rows": q_o4_watermark_rows,
        "sim_pq_codes": q_sim_pq_codes,
        "sim_pq_topk": q_sim_pq_topk,
        "sim_pq_rerank": q_sim_pq_rerank,
        "sim_pq_recall": q_sim_pq_recall,
        "sim_ivfpq_topk": q_sim_ivfpq_topk,
        "corpus_bpe_merges": q_corpus_bpe_merges,
        "corpus_bpe_tokens": q_corpus_bpe_tokens,
        "corpus_bpe_pack": q_corpus_bpe_pack,
        "dedup_bloom_probe": q_dedup_bloom_probe,
        "dedup_bloom_fpr": q_dedup_bloom_fpr,
        "t_stream_stream_join": q_t_stream_stream_join,
        "t_stream_static_join": q_t_stream_static_join,
        "w4_time_travel": q_w4_time_travel,
        "w5_change_feed": q_w5_change_feed,
        "x5_retention_report": q_x5_retention_report,
        "t_incremental_agg": q_t_incremental_agg,
        "corpus_cluster_split": q_corpus_cluster_split,
        "corpus_negatives": q_corpus_negatives,
        "graph_pagerank": q_graph_pagerank,
        "t_nearest_join": q_t_nearest_join,
        "t_gapfill": q_t_gapfill,
        "t_grouping_sets": q_t_grouping_sets,
        "t_moving_avg": q_t_moving_avg,
        "a8_value_quantiles": q_a8_value_quantiles,
        "w3_scd2_history": q_w3_scd2_history,
        "dedup_incremental_pairs": q_dedup_incremental_pairs,
        "dedup_index_pairs": q_dedup_index_pairs,
        "dedup_canonical_best": q_dedup_canonical_best,
        "dedup_minhash_quality": q_dedup_minhash_quality,
        "sim_jl_project": q_sim_jl_project,
        "sim_knn_eval": q_sim_knn_eval,
        "sim_text_topk": q_sim_text_topk,
        "sim_bm25_rerank": q_sim_bm25_rerank,
        "sim_cluster_quality": q_sim_cluster_quality,
        "sim_pair_dist_stats": q_sim_pair_dist_stats,
        "tpch_q6": q_tpch_q6,
        "tpch_q18ish": q_tpch_q18ish,
        "tpch_q4ish": q_tpch_q4ish,
        "tpch_q22ish": q_tpch_q22ish,
        "t_funnel": q_t_funnel,
        "t_retention": q_t_retention,
        "t_anomaly": q_t_anomaly,
        "t_event_pivot": q_t_event_pivot,
        "t_lag_features": q_t_lag_features,
        "a9_partition_advisor": q_a9_partition_advisor,
        "a10_regression": q_a10_regression,
        "mm_scene_cuts": q_mm_scene_cuts,
        "mm_audio_segments": q_mm_audio_segments,
        "s11_auth_mapping": q_s11_auth_mapping,
        "a6_shard_estimate": q_a6_shard_estimate,
        "mm_frame_sample": q_mm_frame_sample,
        "s9_avro_json": q_s9_avro_json,
        "sim_ivf_topk": q_ivf_topk,
        "sim_kmeans_centroids": q_sim_kmeans_centroids,
        "sim_ivf_trained_topk": q_sim_ivf_trained_topk,
        "sim_quantize_int8": q_sim_quantize_int8,
        "dedup_embedding_cosine": q_embedding_near_dup,
        "t_window_agg": q_window_agg,
        "t_sessionize": q_sessionize,
        "corpus_repetition": q_corpus_repetition,
        "corpus_contamination": q_corpus_contamination,
        "corpus_hash_split": q_corpus_hash_split,
        "corpus_pii_redact": q_corpus_pii_redact,
        "corpus_curation_pipeline": q_corpus_curation_pipeline,
        "p10_bucketed_join": q_p10_bucketed_join,
        "skew_salted_agg": q_skew_salted_agg,
        "corpus_stratified_sample": q_corpus_stratified_sample,
        "corpus_vocab_stats": q_corpus_vocab_stats,
        "corpus_chunk": q_corpus_chunk,
        "corpus_pack": q_corpus_pack,
        "s11_orc_roundtrip": q_s11_orc_roundtrip,
        "t_asof_join": q_t_asof_join,
        "t_range_join": q_t_range_join,
        "t_rollup_cascade": q_t_rollup_cascade,
        "t7_stream_window_agg": q_t7_stream_window_agg,
        "t7_stream_merge_vertical": q_t7_stream_merge_vertical,
        "t1_stream_trigger_vertical": q_t1_stream_trigger_vertical,
        "t_stream_sessionize": q_t_stream_sessionize,
        "t_stream_late_data": q_t_stream_late_data,
        "t_stateful_first_seen": q_t_stateful_first_seen,
        "mm_resize": q_mm_resize,
        "m7_real_merge_vertical": q_m7_real_merge_vertical,
        "m1_merge_sqlserver": q_m1_merge_sqlserver,
        "m2_merge_synapse": q_m2_merge_synapse,
        "t9_replay_idempotent": q_t9_replay_idempotent,
        "t2_crash_replay": q_t2_crash_replay,
        "t1_polling_vertical": q_t1_polling_vertical,
        "s1_mssql_changes": q_mssql_changes,
        "w1_dedup_latest": q_w1_dedup_latest,
        "m3_merge_upsert": q_m3_merge_upsert,
        "s6_cdm_vertical": q_s6_cdm_vertical,
        "m8_cdc_corpus_vertical": q_m8_cdc_corpus_vertical,
        "dedup_canonical": q_dedup_canonical,
        "sim_ivf_index_topk": q_sim_ivf_index_topk,
        "dedup_clusters_star": q_dedup_clusters_star,
        "corpus_mixture_sample": q_corpus_mixture_sample,
        "corpus_quality_filter": q_corpus_quality_filter,
        "corpus_shuffle_shards": q_corpus_shuffle_shards,
        "sim_ivf_recall": q_sim_ivf_recall,
        "t_stream_hll": q_t_stream_hll,
        "t_hll_state_merge": q_t_hll_state_merge,
        "m8_lakehouse_vertical": q_m8_lakehouse_vertical,
        "m10_pruned_cow_merge": q_m10_pruned_cow_merge,
        "t_stream_dedup": q_t_stream_dedup,
        "corpus_pipeline_e2e": q_corpus_pipeline_e2e,
        "s2_backfill_scan": q_s2_backfill_scan,
        "dedup_minhash_lsh_pairs": q_minhash_lsh_pairs,
        "dedup_clusters": q_dedup_clusters,
        "sim_cosine_topk": q_cosine_topk,
        "s9_json_explode": q_s9_json_explode,
        "s10_blob_csv": q_s10_blob_csv,
        "p1_field_filter": q_field_filter,
        "p6_name_normalize": q_name_normalize,
        "a2_agg_version_stats": q_agg_version_stats,
        "p7_json_extract": q_json_extract,
        "text_quality": q_text_quality,
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_fingerprint,
        "dedup_minhash_signature": q_minhash_signature,
        "dedup_simhash": q_simhash,
        "dedup_ngram_jaccard": q_ngram_jaccard,
        "dedup_span_stats": q_dedup_span_stats,
        "sim_tfidf_rerank": q_sim_tfidf_rerank,
        "dedup_span_clean": q_dedup_span_clean,
        "sim_rrf_hybrid": q_sim_rrf_hybrid,
        "sim_lsh_buckets": q_lsh_buckets,
        "sim_lsh_neighbors": q_lsh_neighbors,
        "mm_image_features": q_mm_image_features,
        "mm_audio_features": q_mm_audio_features,
        # --- r6-born web-curation / line-dedup / ngram-mining gates ---
        "web_url_canonical": q_web_url_canonical,
        "web_host_stats": q_web_host_stats,
        "web_host_cap": q_web_host_cap,
        "web_url_dedup": q_web_url_dedup,
        "corpus_line_dedup": q_corpus_line_dedup,
        "corpus_line_dedup_clean": q_corpus_line_dedup_clean,
        "corpus_top_ngrams": q_corpus_top_ngrams,
        "m9_web_ingest_vertical": q_m9_web_ingest_vertical,
        "a21_host_stats_ivm": q_a21_host_stats_ivm,
        "t_ivm_state_merge": q_t_ivm_state_merge,
        "t_ivm_minmax": q_t_ivm_minmax,
        "t_ivm_profile": q_t_ivm_profile,
        "t_ivm_quantile": q_t_ivm_quantile,
        "t_ivm_live_maintain": q_t_ivm_live_maintain,
        "t_ivm_live_deletes": q_t_ivm_live_deletes,
        "x6_manifest_plan": q_x6_manifest_plan,
        "x7_snapshot_audit": q_x7_snapshot_audit,
        "m11_file_pruned_merge": q_m11_file_pruned_merge,
        "dedup_index_append": q_dedup_index_append,
        "web_html_extract": q_web_html_extract,
        "s16_delta_log_scan": q_s16_delta_log_scan,
        "s18_iceberg_scan": q_s18_iceberg_scan,
        "x8_iceberg_prune": q_x8_iceberg_prune,
        "x9_iceberg_mor": q_x9_iceberg_mor,
        "x10_iceberg_transforms": q_x10_iceberg_transforms,
        "x11_iceberg_expire": q_x11_iceberg_expire,
        "s19_delta_dv": q_s19_delta_dv,
        "s20_delta_id_mapping": q_s20_delta_id_mapping,
        "t_ivm_iceberg_feed": q_t_ivm_iceberg_feed,
        "t_ivm_delta_feed": q_t_ivm_delta_feed,
        "t_ivm_iceberg_changelog": q_t_ivm_iceberg_changelog,
        "t_iceberg_cdc_poll": q_t_iceberg_cdc_poll,
        "x12_iceberg_evolution": q_x12_iceberg_evolution,
        "x13_iceberg_evolved_mor": q_x13_iceberg_evolved_mor,
        "x14_iceberg_idless_eqdelete": q_x14_iceberg_idless_eqdelete,
        "s21_delta_widened_mapping": q_s21_delta_widened_mapping,
        "x15_restore_rollback": q_x15_restore_rollback,
        "s17_xml_ingest": q_s17_xml_ingest,
        "t3_shaped_trigger_vertical": q_t3_shaped_trigger_vertical,
        "a24_host_concentration": q_a24_host_concentration,
        "web_blocklist": q_web_blocklist,
        "text_normalize": q_text_normalize,
        "dedup_containment": q_dedup_containment,
        "dedup_prefix_recall": q_dedup_prefix_recall,
        "a22_grouping_cube": q_a22_grouping_cube,
        "a23_window_suite": q_a23_window_suite,
        "p13_set_ops": q_p13_set_ops,
    }
    assert len(_GATE_WINDOW_R11) == 50, len(_GATE_WINDOW_R11)
    front = {n: full[n] for n in _GATE_WINDOW_R11}
    return {**front, **{n: f for n, f in full.items() if n not in front}}


# Web-curation oracles (r6-born): same synthetic URL arithmetic as the
# gates, then the functions' own DuckDB twins.
_WEB_CANON_INNER_SQL = web.url_canonicalize_sql(
    f"SELECT *, {web.synthetic_url_sql()} AS url FROM documents"
)
_WEB_URL_CANONICAL_SQL = (
    "SELECT doc_id, url, scheme, host, domain, canon_url "
    f"FROM ({_WEB_CANON_INNER_SQL})"
)
_WEB_HOST_STATS_SQL = web.host_stats_sql(
    f"SELECT * FROM ({_WEB_CANON_INNER_SQL})", size_col="n_chars"
)
_WEB_HOST_CAP_SQL = (
    "SELECT doc_id, host, host_rank FROM ("
    + web.host_cap_sample_sql(f"SELECT * FROM ({_WEB_CANON_INNER_SQL})", cap=5)
    + ")"
)
_WEB_URL_DEDUP_SQL = (
    "SELECT doc_id, host, canon_url, n_chars FROM ("
    + web.url_dedup_sql(
        f"SELECT * FROM ({_WEB_CANON_INNER_SQL})", quality_col="n_chars"
    )
    + ")"
)
_CORPUS_LINE_DEDUP_SQL = ld.line_dedup_stats_sql(width=3, min_docs=2)
_CORPUS_LINE_DEDUP_CLEAN_SQL = ld.line_dedup_clean_sql(width=3, min_docs=2)
_CORPUS_TOP_NGRAMS_SQL = cx.top_ngrams_sql(n=3, k=50)


def oracle_sql() -> dict[str, str]:
    return {
        "web_url_canonical": _WEB_URL_CANONICAL_SQL,
        "m9_web_ingest_vertical": _M9_WEB_INGEST_SQL.format(
            canon=_WEB_CANON_INNER_SQL
        ),
        "a21_host_stats_ivm": _A21_HOST_STATS_IVM_SQL.format(
            canon=_WEB_CANON_INNER_SQL
        ),
        "t_ivm_state_merge": _A21_HOST_STATS_IVM_SQL.format(
            canon=_WEB_CANON_INNER_SQL
        ),
        "t_ivm_minmax": _T_IVM_MINMAX_SQL.format(
            canon=_WEB_CANON_INNER_SQL
        ),
        "t_ivm_profile": _T_IVM_PROFILE_SQL.format(
            canon=_WEB_CANON_INNER_SQL
        ),
        "t_ivm_live_maintain": _T_IVM_LIVE_SQL.format(
            canon=_WEB_CANON_INNER_SQL
        ),
        "t_ivm_live_deletes": _T_IVM_LIVE_DELETES_SQL.format(
            canon=_WEB_CANON_INNER_SQL
        ),
        "t_ivm_quantile": _t_ivm_quantile_sql().format(
            canon=_WEB_CANON_INNER_SQL
        ),
        "x6_manifest_plan": _X6_MANIFEST_SQL,
        "x7_snapshot_audit": _X7_SNAPSHOT_AUDIT_SQL,
        "m11_file_pruned_merge": _M11_FILE_PRUNED_SQL,
        "dedup_index_append": _DEDUP_INDEX_APPEND_SQL,
        "web_html_extract": _WEB_HTML_EXTRACT_SQL,
        "s16_delta_log_scan": _S16_DELTA_LOG_SQL,
        "s18_iceberg_scan": _S18_ICEBERG_SQL,
        "x8_iceberg_prune": _X8_ICEBERG_PRUNE_SQL,
        "x9_iceberg_mor": _X9_ICEBERG_MOR_SQL,
        "x10_iceberg_transforms": _X10_ICEBERG_TRANSFORMS_SQL,
        "x11_iceberg_expire": _X11_ICEBERG_EXPIRE_SQL,
        "s19_delta_dv": _S19_DELTA_DV_SQL,
        "s20_delta_id_mapping": _S20_DELTA_ID_MAPPING_SQL,
        "t_ivm_iceberg_feed": _T_IVM_ICEBERG_FEED_SQL,
        "t_ivm_delta_feed": _T_IVM_DELTA_FEED_SQL,
        "x14_iceberg_idless_eqdelete": _X14_ICEBERG_IDLESS_EQDELETE_SQL,
        "s21_delta_widened_mapping": _S21_DELTA_WIDENED_MAPPING_SQL,
        "x15_restore_rollback": _X15_RESTORE_ROLLBACK_SQL,
        "t_ivm_iceberg_changelog": _T_IVM_ICEBERG_CHANGELOG_SQL,
        "t_iceberg_cdc_poll": _T_ICEBERG_CDC_POLL_SQL,
        "x12_iceberg_evolution": _X12_ICEBERG_EVOLUTION_SQL,
        "x13_iceberg_evolved_mor": _X13_ICEBERG_EVOLVED_MOR_SQL,
        "s17_xml_ingest": _S17_XML_SQL,
        "t3_shaped_trigger_vertical": _T1_STREAM_SQL,
        "a24_host_concentration": stats_mod.concentration_report_sql(
            _WEB_HOST_STATS_SQL, "docs"
        ),
        "web_blocklist": _WEB_BLOCKLIST_SQL.format(
            canon=_WEB_CANON_INNER_SQL
        ),
        "text_normalize": (
            "SELECT doc_id, "
            + tx.normalize_for_dedup_sql("text")
            + " AS norm_text FROM documents"
        ),
        "dedup_containment": dd.ngram_containment_pairs_sql(
            "documents", threshold=0.8
        ),
        "dedup_prefix_recall": dd.prefix_filter_recall_sql("documents"),
        "a22_grouping_cube": _A22_GROUPING_CUBE_SQL,
        "a23_window_suite": _A23_WINDOW_SUITE_SQL,
        "p13_set_ops": _P13_SET_OPS_SQL,
        "web_host_stats": _WEB_HOST_STATS_SQL,
        "web_host_cap": _WEB_HOST_CAP_SQL,
        "web_url_dedup": _WEB_URL_DEDUP_SQL,
        "corpus_line_dedup": _CORPUS_LINE_DEDUP_SQL,
        "corpus_line_dedup_clean": _CORPUS_LINE_DEDUP_CLEAN_SQL,
        "corpus_top_ngrams": _CORPUS_TOP_NGRAMS_SQL,
        "s11_auth_mapping": _S11_AUTH_SQL,
        "a6_shard_estimate": _A6_SHARD_SQL,
        "t4_shaper_chain": _T4_SHAPER_SQL,
        "s3_tsql_surfaces": _S3_TSQL_SQL,
        "t12_metrics_wire": _T12_METRICS_SQL,
        "t10_graceful_stop": _M1_SQL,
        "dedup_semantic": sd.semantic_dedup_sql(
            "embeddings", k=8, iters=2, threshold=0.35
        ),
        # prefit codebook is bit-identical to the in-query fit
        # (kmeans_fit is a deterministic fixed point) — same oracle
        "dedup_semantic_prefit": sd.semantic_dedup_sql(
            "embeddings", k=8, iters=2, threshold=0.35
        ),
        "corpus_fuzzy_contamination": dd.fuzzy_contamination_sql(
            "doc_id % 10 != 0", "doc_id % 10 = 0",
            num_hashes=16, bands=4,
        ),
        "a16_category_drift": stats_mod.categorical_drift_sql(
            "events", cat_col="event_type"
        ),
        "a17_hll_distinct": _a17_hll_sql(),
        "a18_cms_heavy_hitters": _a18_cms_sql(),
        "a19_kmv_overlap": _a19_kmv_sql(),
        "a20_log_hist_quantiles": _a20_log_hist_sql(),
        "corpus_dsir_select": lm_mod.dsir_select_sql(
            "documents", "source IN ('src0', 'src1')", frac=0.25, dim=256
        ),
        "corpus_quality_classifier": clf.quality_classifier_score_sql(
            "documents", "source IN ('src0', 'src1')", iters=3, dim=256
        ),
        "s8_blob_enrich": _LINEITEM_ENRICHED_SQL,
        "s1_mssql_changes": _mssql_changes_sql(),
        "w1_dedup_latest": f"""
SELECT "ARCANE_MERGE_KEY", "SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION",
       user_id, event_type, value
FROM (SELECT *, rank() OVER (PARTITION BY "ARCANE_MERGE_KEY"
                             ORDER BY "SYS_CHANGE_VERSION" DESC) AS rk
      FROM ({_mssql_changes_sql()}))
WHERE rk = 1
""",
        "w2_backfill_dedup": _W2_SQL,
        "m1_merge_sqlserver": _M1_SQL,
        "m2_merge_synapse": _M2_SQL,
        "m3_merge_upsert": _M3_SQL,
        "m4_overwrite_backfill": _M4_SQL,
        "s2_backfill_scan": _S2_SQL,
        "s7_cdm_csv_parse": _S7_SQL,
        "s9_json_explode": _S9_SQL,
        "m5_shard_combine": _M5_SQL,
        "t9_replay_idempotent": _M1_SQL,
        "s6_cdm_vertical": _S6_SQL,
        "t2_crash_replay": _M1_SQL,
        "t1_polling_vertical": _M1_SQL,
        "x1_maintenance_vertical": _LINEITEM_ENRICHED_SQL,
        "a3_table_stats": _A3_SQL,
        "s10_blob_csv": _S10_SQL,
        "k1_staging_writer": _LINEITEM_ENRICHED_SQL,
        "o4_watermark_rows": _SYNAPSE_CHANGES_SQL,
        # all versions tie at createdon=100 → W2 rank keeps every row; the
        # resume/combine/swap must therefore reproduce the full enrichment
        "m6_shard_resume": _LINEITEM_ENRICHED_SQL,
        "p1_field_filter": _FIELD_FILTER_SQL,
        "p6_name_normalize": _NAME_NORMALIZE_SQL,
        "a2_agg_version_stats": _AGG_VERSION_SQL,
        "tpch_q1": _TPCH_Q1_SQL,
        "tpch_q3": _TPCH_Q3_SQL,
        "tpch_q5ish": _TPCH_Q5ISH_SQL,
        "p7_json_extract": _JSON_EXTRACT_SQL,
        "text_quality": _text_quality_sql(),
        "token_counts": _TOKEN_COUNTS_SQL,
        "lang_id": _LANG_ID_SQL,
        "doc_fingerprint": _FINGERPRINT_SQL,
        "dedup_exact": dd.exact_dedup_sql("documents"),
        "dedup_minhash_signature": dd.minhash_signature_sql("documents"),
        "dedup_minhash_lsh_pairs": dd.minhash_candidate_pairs_sql("documents"),
        "dedup_clusters": dd.dedup_clusters_sql(
            dd.minhash_candidate_pairs_sql("documents")
        ),
        "dedup_clusters_star": dd.dedup_clusters_sql(
            dd.minhash_candidate_pairs_sql("documents")
        ),
        "dedup_canonical": dd.dedup_canonical_sql(
            "(SELECT doc_id, md5(text) AS digest FROM documents)",
            dd.minhash_candidate_pairs_sql("documents"),
        ),
        "dedup_simhash": dd.simhash_sql("documents"),
        "dedup_ngram_jaccard": dd.ngram_jaccard_pairs_sql("documents", threshold=0.5),
        "dedup_span_stats": _span_dedup_sql(),
        "sim_tfidf_rerank": _tfidf_rerank_sql(),
        "dedup_span_clean": _span_clean_sql(),
        "m7_real_merge_vertical": _M7_SQL,
        "sim_rrf_hybrid": _rrf_hybrid_sql(),
        "sim_cosine_topk": sim.brute_force_topk_sql(
            "embeddings", _COSINE_QUERY_IDS, k=10
        ),
        "sim_ivf_recall": sim.recall_at_k_sql(
            sim.ivf_topk_sql(
                "embeddings", _COSINE_QUERY_IDS, k=10, n_centroids=8, n_probe=2
            ),
            sim.brute_force_topk_sql("embeddings", _COSINE_QUERY_IDS, k=10),
            k=10,
        ),
        "sim_lsh_buckets": sim.lsh_signature_sql("embeddings", dim=64, bits=16),
        "sim_lsh_neighbors": sim.lsh_bucket_neighbors_sql(
            "embeddings", dim=64, bits=8, threshold=0.0
        ),
        "mm_image_features": _MM_IMAGE_FEATURES_SQL,
        "mm_audio_features": _MM_AUDIO_FEATURES_SQL,
        "mm_resize": _MM_RESIZE_SQL,
        "s9_avro_json": _S9_AVRO_JSON_SQL,
        "mm_frame_sample": _MM_FRAME_SAMPLE_SQL,
        "sim_ivf_topk": sim.ivf_topk_sql(
            "embeddings", _COSINE_QUERY_IDS, k=10, n_centroids=8, n_probe=2
        ),
        # identical semantics to sim_ivf_topk by construction — the index is
        # a materialization, so the same oracle must match
        "sim_ivf_index_topk": sim.ivf_topk_sql(
            "embeddings", _COSINE_QUERY_IDS, k=10, n_centroids=8, n_probe=2
        ),
        "sim_kmeans_centroids": km.kmeans_centroids_sql(
            "embeddings", k=8, iters=3
        ),
        "sim_ivf_trained_topk": sim.ivf_topk_sql(
            "embeddings", _COSINE_QUERY_IDS, k=10, n_centroids=8, n_probe=2,
            cent_sql=km.kmeans_codebook_sql("embeddings", k=8, iters=3),
        ),
        "sim_quantize_int8": f"""
SELECT vec_id, i - 1 AS pos, q8[i] AS q8_val, scale_micro
FROM ({sim.quantize_embeddings_sql("embeddings")})
CROSS JOIN LATERAL (SELECT unnest(range(1, len(q8) + 1)) AS i) AS u(i)
""".strip(),
        "dedup_embedding_cosine": dd.embedding_near_dup_sql(
            "embeddings", threshold=0.35, bits=4
        ),
        "t_window_agg": _WINDOW_AGG_SQL,
        "t_sessionize": sessionize_sql("events", gap_seconds=1800),
        "corpus_repetition": cx.repetition_metrics_sql(),
        "corpus_contamination": cx.contamination_sql(
            "doc_id % 10 != 0", "doc_id % 10 = 0", n=8
        ),
        "corpus_hash_split": cx.hash_split_sql(),
        "corpus_pii_redact": _PII_REDACT_SQL,
        "corpus_curation_pipeline": _CURATION_SQL,
        "p10_bucketed_join": _P10_BUCKETED_SQL,
        "skew_salted_agg": _SKEW_SALTED_SQL,
        "corpus_stratified_sample": cx.stratified_sample_sql(
            _SAMPLE_FRACTIONS, default=0.1
        ),
        "corpus_mixture_sample": (
            "SELECT doc_id, source, epoch, md5(text) AS digest FROM ("
            + cx.mixture_sample_sql(_MIXTURE_WEIGHTS, default=0.0)
            + ")"
        ),
        "corpus_quality_filter": cx.quality_filter_sql(),
        "corpus_shuffle_shards": (
            "SELECT doc_id, shard, pos FROM ("
            + cx.shuffle_shards_sql(num_shards=8, seed=7)
            + ")"
        ),
        "corpus_vocab_stats": cx.vocab_stats_sql(),
        "corpus_chunk": cx.chunk_documents_sql(chunk_tokens=32, stride=24),
        "corpus_pack": cx.pack_sequences_md5_sql(
            cx.chunk_documents_sql(chunk_tokens=32, stride=24),
            seq_len=64,
            shards=16,
        ),
        "s11_orc_roundtrip": _S11_ORC_SQL,
        "t_asof_join": _t_asof_join_sql(),
        "t_range_join": _t_range_join_sql(),
        "t_rollup_cascade": _t_rollup_cascade_sql(),
        "t7_stream_window_agg": _T7_STREAM_SQL,
        "t7_stream_merge_vertical": _M1_SQL,
        "t1_stream_trigger_vertical": _T1_STREAM_SQL,
        "t_stream_sessionize": sessionize_sql("events", gap_seconds=1800),
        "t_stream_late_data": _T_STREAM_LATE_SQL,
        "t_stream_hll": _t_stream_hll_sql(),
        "t_hll_state_merge": _t_hll_state_sql(),
        "m8_lakehouse_vertical": _M8_LAKEHOUSE_SQL,
        "m10_pruned_cow_merge": _M10_PRUNED_COW_SQL,
        "t_stream_dedup": _T_STREAM_DEDUP_SQL,
        "tpch_q6": _TPCH_Q6_SQL,
        "tpch_q18ish": _TPCH_Q18_SQL,
        "t_gapfill": _T_GAPFILL_SQL,
        "a8_value_quantiles": stats_mod.value_quantiles_sql(
            "events", "event_type", "value"
        ),
        "dedup_incremental_pairs": _DEDUP_INCR_SQL,
        "m8_cdc_corpus_vertical": _M8_SQL,
        "corpus_lm_score": lm_mod.unigram_logprob_sql("documents"),
        "corpus_hashed_features": lm_mod.hashed_features_sql("documents", dim=256),
        "mm_audio_segments": _MM_AUDIO_SEGMENTS_SQL,
        "corpus_lm_buckets": lm_mod.lm_buckets_sql("documents"),
        "s12_binary_ingest": _S12_BINARY_SQL,
        "s13_text_lines": _S13_TEXT_SQL,
        "corpus_top_terms": _CORPUS_TOP_TERMS_SQL,
        "t_lag_features": _T_LAG_SQL,
        "t_debounce": _T_DEBOUNCE_SQL,
        "t_funnel": _T_FUNNEL_SQL,
        "corpus_bigram_score": lm_mod.bigram_logprob_sql("documents"),
        "t_retention": _T_RETENTION_SQL,
        "t_event_pivot": _T_EVENT_PIVOT_SQL,
        "corpus_length_histogram": _corpus_length_histogram_sql(),
        "dedup_cluster_stats": _dedup_cluster_stats_sql(),
        "dedup_index_pairs": _DEDUP_INCR_SQL,
        "t_anomaly": _T_ANOMALY_SQL,
        "w3_scd2_history": _w3_scd2_sql(),
        "corpus_lang_mix": _corpus_lang_mix_sql(),
        "sim_pair_dist_stats": _sim_pair_dist_sql(),
        "corpus_dedup_card": _corpus_dedup_card_sql(),
        "mm_sniff": _MM_SNIFF_SQL,
        "dedup_shingle_df_stats": _dedup_shingle_df_sql(),
        "p11_zorder_key": layout_mod.zorder_key_sql(
            "lineitem", ["l_orderkey", "l_partkey"], bits=8,
            select_cols=["l_orderkey", "l_linenumber", "l_partkey"],
        ),
        "sim_knn_eval": sim.knn_label_accuracy_sql(
            sim.brute_force_topk_sql("embeddings", _COSINE_QUERY_IDS, k=10)
        ),
        "corpus_pipeline_e2e": _corpus_pipeline_e2e_sql(),
        "t_stateful_first_seen": _T_STATEFUL_FIRST_SEEN_SQL,
        "corpus_jsonl_roundtrip": _CORPUS_JSONL_SQL,
        "dedup_bloom_probe": bloom_mod.bloom_probe_sql(
            "doc_id % 10 != 0", "doc_id % 10 = 0"
        ),
        "t_grouping_sets": analytics_mod.rollup_event_stats_sql("events"),
        "t_moving_avg": analytics_mod.rolling_user_stats_sql("events"),
        "a9_partition_advisor": advisor_mod.partition_advisor_sql(
            "lineitem",
            ("l_returnflag", "l_linestatus"),
            fixed_width=68,
        ),
        "sim_pq_codes": pq_mod.pq_codes_sql("embeddings", m=4, ksub=8, iters=2),
        "sim_pq_topk": pq_mod.pq_topk_sql(
            "embeddings", _COSINE_QUERY_IDS, k=10, m=4, ksub=8, iters=2
        ),
        "sim_pq_rerank": pq_mod.pq_rerank_topk_sql(
            "embeddings", _COSINE_QUERY_IDS, k=10, shortlist=50,
            m=4, ksub=8, iters=2,
        ),
        "corpus_bpe_merges": bpe_mod.bpe_merges_sql("documents", merges=5),
        "corpus_bpe_tokens": bpe_mod.bpe_token_counts_sql(
            "documents", merges=5
        ),
        "t_stream_stream_join": _T_STREAM_SSJ_SQL,
        "w4_time_travel": _W4_SQL,
        "w5_change_feed": _W5_SQL,
        "tpch_q4ish": _TPCH_Q4_SQL,
        "tpch_q22ish": _TPCH_Q22_SQL,
        "sim_jl_project": projection_mod.jl_project_sql("embeddings"),
        "sim_ivfpq_topk": pq_mod.ivfpq_topk_sql(
            "embeddings", _COSINE_QUERY_IDS, k=10,
            n_centroids=8, n_probe=2, m=4, ksub=8, iters=2,
        ),
        # identical search semantics over the persisted index — the
        # in-memory composition's oracle must hash-match by construction
        "sim_ivfpq_index_topk": pq_mod.ivfpq_topk_sql(
            "embeddings", _COSINE_QUERY_IDS, k=10,
            n_centroids=8, n_probe=2, m=4, ksub=8, iters=2,
        ),
        "sim_ivfpq_index_rerank": pq_mod.ivfpq_rerank_topk_sql(
            "embeddings", _COSINE_QUERY_IDS, k=10, shortlist=50,
            n_centroids=8, n_probe=2, m=4, ksub=8, iters=2,
        ),
        "a10_regression": _A10_SQL,
        "a11_profile": profile_mod.profile_table_sql("orders", _A11_KINDS),
        "corpus_cluster_split": cx.cluster_safe_split_sql(
            "documents",
            dd.dedup_clusters_sql(dd.minhash_candidate_pairs_sql("documents")),
        ),
        "graph_pagerank": graph_mod.pagerank_sql(
            dd.minhash_candidate_pairs_sql("documents"), iters=3
        ),
        "corpus_negatives": cx.contrastive_negatives_sql(
            "documents",
            dd.dedup_clusters_sql(dd.minhash_candidate_pairs_sql("documents")),
            k=4,
        ),
        "t_stream_static_join": _T_STREAM_STATIC_SQL,
        "dedup_minhash_quality": dd.minhash_estimate_quality_sql("documents"),
        "x5_retention_report": _X5_SQL,
        "dedup_canonical_best": (
            "SELECT doc_id, md5(text) AS digest, source FROM ("
            + dd.dedup_canonical_best_sql(
                "documents",
                dd.minhash_candidate_pairs_sql("documents"),
                "SELECT doc_id, CAST(floor(-avg_neg_logprob * 1000000) "
                "AS BIGINT) AS score FROM ("
                + lm_mod.unigram_logprob_sql("documents")
                + ")",
            )
            + ")"
        ),
        "a12_histogram": _A12_SQL,
        "t_nearest_join": _t_nearest_sql(),
        "p12_zorder_layout_report": _p12_sql(),
        "mm_scene_cuts": _MM_SCENE_SQL,
        "t_incremental_agg": _T_IVM_SQL,
        "sim_text_topk": lm_mod.text_topk_sql(
            "documents", _TEXT_QUERY_IDS, k=10
        ),
        "sim_bm25_rerank": _bm25_rerank_sql(),
        "a13_winsorize": stats_mod.winsorize_sql("events", "event_type", "value"),
        "t_ewma_pow2": _T_EWMA_SQL,
        "s15_partitioned_roundtrip": _S15_SQL,
        "sim_cluster_quality": _sim_cluster_quality_sql(),
        "dedup_bloom_fpr": _bloom_fpr_sql(),
        "corpus_shard_manifest": _corpus_shard_manifest_sql(),
        "a14_freshness": _A14_SQL,
        "t_dwell_time": _t_dwell_sql(),
        "corpus_novelty": _CORPUS_NOVELTY_SQL,
        "a15_daily_growth": _A15_SQL,
        "corpus_dup_by_source": _CORPUS_DUP_SRC_SQL,
        "t_active_users": _T_ACTIVE_SQL,
        "sim_pq_recall": sim.recall_at_k_sql(
            pq_mod.pq_topk_sql(
                "embeddings", _COSINE_QUERY_IDS, k=10, m=4, ksub=8, iters=2
            ),
            sim.brute_force_topk_sql("embeddings", _COSINE_QUERY_IDS, k=10),
            k=10,
        ),
        "corpus_bpe_pack": cx.pack_sequences_md5_sql(
            "SELECT doc_id, 0 AS chunk_id, n_tokens FROM ("
            + bpe_mod.bpe_token_counts_sql("documents", merges=5)
            + ")",
            seq_len=64,
            shards=16,
        ),
    }
