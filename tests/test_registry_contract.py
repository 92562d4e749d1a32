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
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r0*.json"))):
        with open(p) as f:
            for name, row in json.load(f).items():
                if (
                    row.get("err") is None
                    and row.get("rows_match")
                    and row.get("schema_match")
                ):
                    green.add(name)
    return green


def test_gate_window_is_the_declared_r10_rotation():
    """The driver checks the FIRST 50 entries only; r10 is the pure
    staleness rotation (VERDICT r9 item 3): the full remaining r5
    cohort (extinct after this window), then the stalest r6 rows.
    r10-born gates displace the freshest tail entries. Pin the
    families so a refactor reordering the dict doesn't silently drop
    the rotation."""
    names = list(entry_mod.queries())
    assert len(names) >= 90
    first50 = set(names[:50])
    for required in (
        # the 28-row r5 cohort (staleness 5 -> extinct after r10)
        "a13_winsorize", "t_ewma_pow2", "s15_partitioned_roundtrip",
        "corpus_shard_manifest", "a14_freshness", "t_dwell_time",
        "corpus_novelty", "a15_daily_growth", "corpus_dup_by_source",
        "t_active_users", "dedup_semantic", "corpus_dsir_select",
        "corpus_quality_classifier", "t4_shaper_chain",
        "t12_metrics_wire", "t10_graceful_stop", "dedup_exact",
        "tpch_q1", "tpch_q3", "tpch_q5ish", "k1_staging_writer",
        "m6_shard_resume", "w2_backfill_dedup", "sim_ivfpq_index_topk",
        "corpus_fuzzy_contamination", "dedup_semantic_prefit",
        "a16_category_drift", "sim_ivfpq_index_rerank",
        # stalest r6 rows
        "m8_lakehouse_vertical", "t1_stream_trigger_vertical",
        "a17_hll_distinct", "a18_cms_heavy_hitters", "a19_kmv_overlap",
        "a20_log_hist_quantiles", "m4_overwrite_backfill",
        "a3_table_stats", "m5_shard_combine", "s7_cdm_csv_parse",
        "o4_watermark_rows", "t_stream_hll", "t_hll_state_merge",
        "s2_backfill_scan", "dedup_minhash_lsh_pairs", "dedup_clusters",
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
