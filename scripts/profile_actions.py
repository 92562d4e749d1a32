#!/usr/bin/env python
"""Action-level profiler for bench queries (r11 optimization tooling).

Wraps every Spark action entry point (DataFrameWriter.save/parquet,
DataFrame.collect/count/first/toPandas/localCheckpoint, RDD.collect) to
record wall time plus the repo call site, runs the named queries once at
$SPARK_GRAFT_SF_DIR, and prints a per-call-site cost table per query.
This attributes a gate's wall clock to its phases without touching gate
code. Usage:

    python scripts/profile_actions.py <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

RECORDS: list[tuple[str, float, str]] = []
_CUR = ["-"]


def _site() -> str:
    # innermost repo frame that is not this file
    for frame in reversed(traceback.extract_stack()):
        fn = frame.filename
        if "/root/repo" in fn and "profile_actions" not in fn and (
            "site-packages" not in fn
        ):
            return f"{os.path.relpath(fn, '/root/repo')}:{frame.lineno}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.time()
        try:
            return orig(self, *a, **kw)
        finally:
            RECORDS.append(
                (f"{cls.__name__}.{name} @ {_site()}", time.time() - t0,
                 _CUR[0])
            )

    setattr(cls, name, timed)


def main() -> None:
    # Spark 4: the runtime class overrides the abstract base's methods —
    # patch the classic implementation, not pyspark.sql.DataFrame
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    for m in ("collect", "count", "first", "toPandas", "localCheckpoint",
              "head", "take", "checkpoint"):
        _wrap(DataFrame, m)
    for m in ("save", "parquet", "csv", "json", "orc"):
        _wrap(DataFrameWriter, m)

    import __spark_entry__ as entry_mod
    from arcane_framework_scala_spark import get_session

    spark = get_session("arcane-profile", extra_conf={
        "spark.ui.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entry_mod.queries()
    # session warmup
    qs["tpch_q1"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    names = sys.argv[1:]
    for name in names:
        RECORDS.clear()
        _CUR[0] = name
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        total = time.time() - t0
        attributed = sum(d for _, d, _ in RECORDS)
        print(f"\n=== {name}: total {total:.3f}s, "
              f"attributed {attributed:.3f}s ===")
        agg: dict[str, tuple[int, float]] = {}
        for site, d, _ in RECORDS:
            n, s = agg.get(site, (0, 0.0))
            agg[site] = (n + 1, s + d)
        for site, (n, s) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
            print(f"  {s:7.3f}s  x{n:<3d} {site}")
    spark.stop()


if __name__ == "__main__":
    main()
