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


def test_gate_window_is_the_declared_r9_rotation():
    """The driver checks the FIRST 50 entries only; r9 is the pure
    staleness rotation (VERDICT r8 item 2): the r9-born delete-path
    gate (never-checked), the 11 rows deferred from the r8 window,
    the full remaining r4 cohort, and the stalest of the r5 cohort.
    Pin the families so a refactor reordering the dict doesn't
    silently drop the rotation."""
    names = list(entry_mod.queries())
    assert len(names) >= 90
    first50 = set(names[:50])
    for required in (
        # r9-born gates (never-checked -> forced into the window;
        # each displaced the freshest tail entry of the staleness
        # proposal — t_dwell_time, a14_freshness, corpus_novelty and
        # a15_daily_growth wait for r10)
        "t_ivm_live_deletes",
        "s18_iceberg_scan",
        "x8_iceberg_prune",
        "x9_iceberg_mor",
        "x10_iceberg_transforms",
        "x11_iceberg_expire",
        "s19_delta_dv",
        "t_ivm_iceberg_feed",
        "x12_iceberg_evolution",
        # the 11 rows deferred from r8 to this window
        "sim_knn_eval", "sim_text_topk", "sim_bm25_rerank",
        "sim_cluster_quality", "sim_pair_dist_stats", "tpch_q6",
        "tpch_q18ish", "tpch_q4ish", "tpch_q22ish", "t_funnel",
        "t_retention",
        # the remaining r4 cohort (extinct after this window)
        "t_anomaly", "t_event_pivot", "t_lag_features",
        "a9_partition_advisor", "a10_regression", "mm_scene_cuts",
        "mm_audio_segments", "s11_auth_mapping", "a6_shard_estimate",
        # stalest of the r5 cohort
        "x1_maintenance_vertical", "s8_blob_enrich",
        "corpus_jsonl_roundtrip", "corpus_lm_score", "t_debounce",
        "mm_sniff", "p11_zorder_key", "s12_binary_ingest",
        "a11_profile",
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
