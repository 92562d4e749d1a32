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
    """The driver checks the FIRST 50 entries only; r3's window must
    keep the never-driver-verified set in front. Guard the boundary so
    a refactor reordering the dict doesn't silently shrink coverage."""
    names = list(entry_mod.queries())
    assert len(names) >= 90
    first50 = set(names[:50])
    # spot-pins: the formerly-ungated families and the r3 additions
    for required in (
        "corpus_pack", "t_rollup_cascade", "sim_ivf_trained_topk",
        "t_stream_late_data", "mm_resize", "dedup_clusters_star",
        "corpus_pipeline_e2e", "t_stream_dedup", "m8_cdc_corpus_vertical",
    ):
        assert required in first50, required
