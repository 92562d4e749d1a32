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


def test_gate_window_holds_the_unverified_front():
    """The driver checks the FIRST 50 entries only; r4's window must
    keep the never-driver-verified set in front. Guard the boundary so
    a refactor reordering the dict doesn't silently shrink coverage."""
    names = list(entry_mod.queries())
    assert len(names) >= 90
    first50 = set(names[:50])
    # spot-pins: the heaviest never-driver-checked families (VERDICT r3
    # item 1) plus the two new §2-draining gates (item 7)
    for required in (
        "sim_pq_topk", "sim_ivfpq_topk", "sim_pq_recall",
        "corpus_bpe_merges", "corpus_bpe_pack", "dedup_bloom_probe",
        "t_stream_stream_join", "t_stream_static_join",
        "w4_time_travel", "w5_change_feed", "x5_retention_report",
        "t_incremental_agg", "graph_pagerank", "corpus_cluster_split",
        "t_nearest_join", "t_gapfill", "t_grouping_sets",
        "s11_auth_mapping", "a6_shard_estimate",
    ):
        assert required in first50, required


def test_r4_window_is_entirely_never_driver_checked():
    """Every slot in the r4 gate window must spend its driver budget on
    an entry with NO prior CORRECTNESS row (r1∪r2∪r3) — re-verifying a
    green query while a backlog exists wastes the scarcest resource."""
    import json
    import os

    checked: set[str] = set()
    # r5 NOTE: after the driver writes CORRECTNESS_r04.json, extend this
    # to (1, 2, 3, 4) and rotate the backlog (scripts/plan_window.py
    # prints the exact swap) — the window must stay all-never-checked.
    for r in (1, 2, 3):
        p = os.path.join(
            os.path.dirname(__file__), "..", f"CORRECTNESS_r0{r}.json"
        )
        with open(p) as f:
            checked |= set(json.load(f))
    first50 = list(entry_mod.queries())[:50]
    stale = [n for n in first50 if n in checked]
    assert not stale, stale
