#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, sorted column names and canonicalized sorted values. Usage:

    python scripts/check_parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _to_py(v):
    """numpy scalar/array → plain Python, so canonicalization matches."""
    import numpy as np

    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return [_to_py(x) for x in v.tolist()]
    return v


def canonicalize(rows: list[tuple], columns: list[str]) -> tuple[str, list[str]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon_rows = sorted(
        "|".join(_canon_cell(r[i]) for i in order) for r in rows
    )
    digest = hashlib.md5("\n".join(canon_rows).encode()).hexdigest()
    return digest, canon_rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    # Deliberately a BARE session — the driver's harness does not go through
    # get_session, so any conf a query needs must be set by the query itself
    # (see __spark_entry__._read). Only resource knobs here.
    # PARITY_MASTER / PARITY_SHUFFLE override the resource shape for the
    # partition-count-invariance sweeps (docs/SCALE.md) — a hash that
    # survives a different core count + a prime shuffle width proves the
    # fixed-point determinism claim, not just repeatability.
    import os as _os

    spark = (
        SparkSession.builder.master(_os.environ.get("PARITY_MASTER", "local[8]"))
        .appName("parity")
        .config("spark.ui.enabled", "false")
        # local mode hosts executors in the driver JVM; the 1g default
        # dies on the sf0.1 join-heavy queries
        .config("spark.driver.memory", "16g")
        .config(
            "spark.sql.shuffle.partitions",
            _os.environ.get("PARITY_SHUFFLE", "32"),
        )
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    ran = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            # Fetch through pandas/Arrow exactly like the driver does:
            # fetchall() would hand HUGEINT back as exact Python ints and
            # mask the HUGEINT→float64 divergence that fails the real gate.
            odf = con.execute(oracles[name]).df()
            ocols = list(odf.columns)
            orows = [
                tuple(_to_py(v) for v in row)
                for row in odf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        # emulate the DRIVER's canonicalizer, which sorts a pandas frame on
        # every column: unhashable cells (bytearray, list/ndarray from
        # array columns) crash its Categorical factorize even though our
        # hex/str canonicalization below handles them fine. Catch that
        # class of gate error locally (r2's mm_resize, r3's quantize).
        try:
            import pandas as _pd

            _pd.DataFrame(srows, columns=scols).sort_values(by=sorted(scols))
        except TypeError as e:
            print(f"FAIL {name}: driver-canonicalizer hazard: {e}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            failures.append(name)
            continue
        sh, scanon = canonicalize(srows, scols)
        oh, ocanon = canonicalize(orows, ocols)
        if sh != oh:
            diffs = [
                (a, b) for a, b in zip(scanon, ocanon) if a != b
            ][:3]
            print(f"FAIL {name}: value hash mismatch ({len(diffs)}+ diffs)")
            for a, b in diffs:
                print(f"   spark:  {a[:160]}")
                print(f"   oracle: {b[:160]}")
            failures.append(name)
            continue
        print(f"PASS {name}: rows={len(srows)} hash={sh[:12]} ({dt:.1f}s)")

    # Report selected-passed/selected-run; mention the full registry size
    # only on unfiltered runs (a filtered run used to misreport 166/166).
    scope = "" if not only else f" (of {len(queries)} registered)"
    print(f"\n{ran - len(failures)}/{ran} selected queries pass{scope}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
