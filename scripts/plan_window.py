#!/usr/bin/env python
"""Gate-window planner: report which registry entries have never had a
driver CORRECTNESS row and whether the current front-50 spends every
slot on one of them. Run at the start of each round BEFORE reordering
queries(), and again after to confirm the rotation.

    python scripts/plan_window.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

WINDOW = 50  # driver gate evaluates the first N queries() entries


def main() -> int:
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    checked: set[str] = set()
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        with open(path) as f:
            rows = json.load(f)
        # a row only counts as proof if every check in it passed
        for name, row in rows.items():
            if row.get("err") is None and all(
                row.get(k) for k in ("rows_match", "schema_match")
            ):
                checked.add(name)

    never = [n for n in names if n not in checked]
    front = names[:WINDOW]
    wasted = [n for n in front if n in checked]
    missing = [n for n in never if n not in front][: max(0, len(wasted))]

    print(f"registry: {len(names)}  ever-green: {len(checked & set(names))}"
          f"  never-checked: {len(never)}")
    print(f"front-{WINDOW}: {len(front) - len(wasted)} never-checked, "
          f"{len(wasted)} wasted on already-green entries")
    if wasted:
        print("  wasted slots:", ", ".join(wasted))
        print("  swap in    :", ", ".join(missing) or "(backlog empty)")
    backlog = [n for n in never if n not in front]
    print(f"backlog after this window: {len(backlog)} "
          f"({'fits' if len(backlog) <= WINDOW else 'OVERFLOWS'} one window)")
    if backlog:
        print("  backlog:", ", ".join(backlog))

    if "--next-round" in sys.argv:
        # the exact queries() key order for NEXT round, ready to apply:
        # current backlog first (the new window), then everything else in
        # current relative order. Run only AFTER the driver has written
        # this round's CORRECTNESS file.
        rest = [n for n in names if n not in backlog]
        print("\n# next-round queries() order (backlog rotated to front):")
        for n in backlog + rest:
            print(f'        "{n}": ...,')
    return 1 if wasted else 0


if __name__ == "__main__":
    raise SystemExit(main())
