"""Driver-contract invariants: every queries() entry has an oracle, the
names are unique and stable-sortable, and the SQL oracles at least parse
in DuckDB against empty views (catches a broken f-string interpolation
before the driver does)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_every_query_has_an_oracle():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) == set(q), (set(q) ^ set(o))


def test_oracles_parse_in_duckdb():
    """EXPLAIN every oracle against real sf0.001 views — a syntax error
    or bad column reference fails here, not in the driver's gate."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    bad = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — collecting all failures
            bad.append((name, str(e)[:120]))
    assert not bad, bad


def _driver_green() -> set[str]:
    """Names with at least one PASSED driver CORRECTNESS row (same
    passed-only filter as scripts/plan_window.py — an errored or
    mismatched row does NOT count as verified, per ADVICE r4 item 4)."""
    import glob
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    green: set[str] = set()
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(p) as f:
            for name, row in json.load(f).items():
                if (
                    row.get("err") is None
                    and row.get("rows_match")
                    and row.get("schema_match")
                ):
                    green.add(name)
    return green


def test_gate_window_is_the_declared_r11_rotation():
    """The driver checks the FIRST 50 entries only; r11 is the pure
    staleness rotation (VERDICT r10 item 1): the full remaining r6
    cohort (extinct after this window), then the stalest r7 rows.
    r11-born gates displace the freshest tail entries. Pin the
    families so a refactor reordering the dict doesn't silently drop
    the rotation."""
    names = list(entry_mod.queries())
    assert len(names) >= 90
    first50 = set(names[:50])
    for required in (
        # the 30-row r6 cohort (staleness 5 -> extinct after r11)
        "p6_name_normalize", "a2_agg_version_stats", "p7_json_extract",
        "text_quality", "token_counts", "lang_id", "doc_fingerprint",
        "dedup_minhash_signature", "dedup_simhash",
        "dedup_ngram_jaccard", "dedup_span_stats", "sim_tfidf_rerank",
        "dedup_span_clean", "sim_rrf_hybrid", "sim_lsh_buckets",
        "sim_lsh_neighbors", "mm_image_features", "mm_audio_features",
        "web_url_canonical", "web_host_stats", "web_host_cap",
        "web_url_dedup", "corpus_line_dedup", "corpus_line_dedup_clean",
        "corpus_top_ngrams", "m9_web_ingest_vertical",
        "a21_host_stats_ivm", "a22_grouping_cube", "a23_window_suite",
        "p13_set_ops",
        # stalest r7 rows
        "s1_mssql_changes", "s6_cdm_vertical", "m1_merge_sqlserver",
        "m2_merge_synapse", "m3_merge_upsert", "m7_real_merge_vertical",
        "t1_polling_vertical", "t2_crash_replay",
        "t7_stream_merge_vertical", "t9_replay_idempotent",
        "corpus_pipeline_e2e", "dedup_clusters_star", "mm_frame_sample",
        "s9_avro_json",
        # r11-born gates (displace the freshest r7 tail entries;
        # sim_kmeans_centroids went out for t_iceberg_cdc_poll,
        # sim_ivf_topk — benched every round in h1 — for
        # x15_restore_rollback)
        "t_ivm_delta_feed", "x14_iceberg_idless_eqdelete",
        "s21_delta_widened_mapping", "t_ivm_iceberg_changelog",
        "t_iceberg_cdc_poll", "x15_restore_rollback",
    ):
        assert required in first50, required


def test_window_covers_entire_backlog():
    """Every never-driver-green registry entry must sit inside the
    front-50 gate window. After r5 the backlog is 0, so this now
    guards r6-born gates: a new queries() entry without a driver row
    registered outside the window is the failure this test catches."""
    green = _driver_green()
    names = list(entry_mod.queries())
    never_checked = [n for n in names if n not in green]
    outside = [n for n in never_checked if n not in names[:50]]
    assert not outside, outside
