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


def test_gate_window_is_the_declared_r8_rotation():
    """The driver checks the FIRST 50 entries only; r8 is the
    staleness-ranked rotation (VERDICT r7 items 1+2): the FORCED
    s3_tsql_surfaces re-proof (a7_* rows postdate its r5 driver check),
    the 10 r8-born gates (never-checked), the 9 stalest r3-checked
    rows, and the 30 stalest of the r4 cohort. Pin the families so a
    refactor reordering the dict doesn't silently drop the rotation."""
    names = list(entry_mod.queries())
    assert len(names) >= 90
    first50 = set(names[:50])
    for required in (
        # forced: A7's driver row (VERDICT r7 item 1)
        "s3_tsql_surfaces",
        # r8-born gates (never-checked -> forced into the window)
        "t_ivm_profile", "t_ivm_quantile", "t_ivm_live_maintain",
        "x6_manifest_plan", "x7_snapshot_audit", "m11_file_pruned_merge",
        "dedup_index_append", "web_html_extract", "s16_delta_log_scan",
        "s17_xml_ingest",
        # stalest cohort (last green r3)
        "w1_dedup_latest", "m8_cdc_corpus_vertical", "dedup_canonical",
        "sim_ivf_index_topk", "corpus_mixture_sample",
        "corpus_quality_filter", "corpus_shuffle_shards",
        "sim_ivf_recall", "t_stream_dedup",
        # r4-cohort families
        "sim_pq_codes", "sim_ivfpq_topk", "corpus_bpe_merges",
        "dedup_bloom_probe", "t_stream_stream_join", "w4_time_travel",
        "w5_change_feed", "x5_retention_report", "t_incremental_agg",
        "graph_pagerank", "t_gapfill", "t_grouping_sets",
        "a8_value_quantiles", "w3_scd2_history", "dedup_index_pairs",
        "sim_jl_project",
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
