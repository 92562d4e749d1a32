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


def test_gate_window_holds_the_unverified_front():
    """The driver checks the FIRST 50 entries only; the r5 window must
    keep the never-driver-verified set in front. Guard the boundary so
    a refactor reordering the dict doesn't silently shrink coverage."""
    names = list(entry_mod.queries())
    assert len(names) >= 90
    first50 = set(names[:50])
    # spot-pins: the four §2-closing gates and the three r4 LLM
    # operators (VERDICT r4 item 1), plus the r3-overflow families
    for required in (
        "t4_shaper_chain", "s3_tsql_surfaces", "t10_graceful_stop",
        "t12_metrics_wire", "dedup_semantic", "corpus_dsir_select",
        "corpus_quality_classifier", "a11_profile", "a15_daily_growth",
        "t_ewma_pow2", "s15_partitioned_roundtrip", "mm_sniff",
        "corpus_novelty", "p11_zorder_key", "s12_binary_ingest",
    ):
        assert required in first50, required


def test_r5_window_covers_entire_backlog():
    """Every never-driver-green registry entry must sit inside the
    front-50 gate window — r5 is the closing rotation (VERDICT r4
    item 1): after it runs, all 175 entries have a passed driver row.
    Spare slots may re-prove stale green rows; unchecked entries
    outside the window are the failure this test exists to catch."""
    green = _driver_green()
    names = list(entry_mod.queries())
    never_checked = [n for n in names if n not in green]
    outside = [n for n in never_checked if n not in names[:50]]
    assert not outside, outside
