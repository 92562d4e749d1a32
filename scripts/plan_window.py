#!/usr/bin/env python
"""Gate-window planner (r7: staleness-ranked, VERDICT r6 item 2).

The driver's correctness gate runs only the FIRST 50 queries() entries,
so each round the window must spend its slots where proof is weakest:

1. never-driver-green entries (new gates, or rows whose last run failed)
   — these MUST be in the window (tests/test_registry_contract.py);
2. then every other entry ranked by staleness — the round of its most
   recent green driver row, oldest first — with the §2 core verticals
   winning ties so the reference-parity spine is re-proven most often.

Run at the start of each round BEFORE reordering queries(), and again
after to confirm:

    python scripts/plan_window.py            # report + proposal
    python scripts/plan_window.py --emit     # proposed window as a list
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

WINDOW = 50  # driver gate evaluates the first N queries() entries

#: §2 core verticals (the reference-parity spine): at equal staleness
#: these outrank filler diagnostics in the rotation.
CORE = [
    "s1_mssql_changes", "s6_cdm_vertical", "m1_merge_sqlserver",
    "m2_merge_synapse", "m3_merge_upsert", "m7_real_merge_vertical",
    "m8_lakehouse_vertical", "t1_polling_vertical",
    "t1_stream_trigger_vertical", "t2_crash_replay",
    "t7_stream_merge_vertical", "t9_replay_idempotent",
    "x1_maintenance_vertical", "corpus_pipeline_e2e",
    "dedup_clusters_star", "s3_tsql_surfaces", "s8_blob_enrich",
]


def last_green_rounds() -> dict[str, int]:
    """name -> round of the most recent PASSED driver row."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("err") is None and all(
                row.get(k) for k in ("rows_match", "schema_match")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


#: rows the next window must include regardless of staleness rank.
#: r8: A7's a7_* oracle rows were appended to s3_tsql_surfaces AFTER its
#: last driver check (r5), so the row needs a driver re-proof on the
#: current implementation (VERDICT r7 item 1) even though 3 whole
#: cohorts are staler. Clear per round once satisfied.
FORCE: list[str] = []  # r8 forced s3_tsql_surfaces; its driver row landed


def propose(names: list[str], last: dict[str, int]) -> list[str]:
    order = {n: i for i, n in enumerate(names)}
    core_rank = {n: i for i, n in enumerate(CORE)}

    def key(n):
        return (
            last.get(n, -1),                     # never-checked (-1) first
            0 if n in core_rank else 1,          # core verticals win ties
            core_rank.get(n, order[n]),          # stable within each class
        )

    forced = [n for n in FORCE if n in names]
    ranked = [n for n in sorted(names, key=key) if n not in forced]
    return forced + ranked[: WINDOW - len(forced)]


def main() -> int:
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    last = last_green_rounds()
    cur_round = max(last.values(), default=0) + 1

    never = [n for n in names if n not in last]
    front = names[:WINDOW]
    proposal = propose(names, last)
    missing = [n for n in proposal if n not in front]
    extra = [n for n in front if n not in proposal]

    stale_hist = Counter(
        cur_round - last[n] for n in names if n in last
    )
    print(
        f"registry: {len(names)}  ever-green: {len(set(last) & set(names))}"
        f"  never-checked: {len(never)}  (planning round r{cur_round})"
    )
    print(
        "staleness histogram (rounds since last green): "
        + ", ".join(f"{k}:{v}" for k, v in sorted(stale_hist.items()))
    )
    in_prop = len(set(front) & set(proposal))
    print(f"front-{WINDOW}: {in_prop}/{WINDOW} match the staleness proposal")
    if extra:
        print("  rotate OUT (fresher than the backlog):", ", ".join(extra))
    if missing:
        print("  rotate IN  (stalest first):", ", ".join(missing))
    worst_after = max(
        (cur_round - last[n] for n in names if n in last and n not in proposal),
        default=0,
    )
    print(
        f"max staleness after running the proposed window: {worst_after} rounds"
    )

    if "--emit" in sys.argv:
        print("\n# proposed window (paste as the _GATE_WINDOW list):")
        for n in proposal:
            print(f'    "{n}",')
    return 1 if (missing or extra) else 0


if __name__ == "__main__":
    raise SystemExit(main())
