"""Per-file column-range manifest: Iceberg's planning metadata,
catalog-free.

Iceberg plans scans from manifest entries carrying per-file column
min/max — the reason a point/range read on a sort-ordered table opens
one file instead of ten thousand. The reference gets that for free from
the catalog (its ``sorted_by`` table property exists to feed it,
``models/queries/...`` O5); on the versioned-parquet layout the same
planning data lives in a ``_MANIFEST.json`` sidecar inside the snapshot
directory (underscore-prefixed — Spark's scanner ignores it):

    v=N/_MANIFEST.json = {file: {"rows": n, "ranges": {col: [min, max]}}}

Build it AFTER a sort-strategy compaction (``optimize_snapshot(
sort_cols=…)``) — that is when ranges become non-overlapping and
pruning bites, exactly as on Iceberg. Building costs one driver-side
footer sweep (the ``table_stats`` cost class: metadata, never data);
PLANNING from it costs zero I/O — ``plan_files`` is a dict scan, and
``read_range`` hands Spark only the overlapping files plus a residual
filter for exactness.

Files without usable stats for a column always qualify (safe
over-selection, never a missed row). Min/max are stored for orderable
primitives (ints, floats, strings); other types are skipped — their
columns simply never prune.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from arcane_framework_scala_spark.sinks.merge_sink import SnapshotParquetTarget
from arcane_framework_scala_spark.sources.paths import glob_escape
from arcane_framework_scala_spark.sinks.table_stats import _parquet_files

MANIFEST_FILE = "_MANIFEST.json"

_ORDERABLE = (int, float, str)


def _file_ranges(file_path: str, cols: list[str]) -> dict:
    import pyarrow.parquet as pq

    md = pq.ParquetFile(file_path).metadata
    out: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if name not in cols:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                out[name] = None  # stats gap: the column cannot prune
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode(), hi.decode()
                except UnicodeDecodeError:
                    out[name] = None
                    continue
            if not isinstance(lo, _ORDERABLE):
                out[name] = None
                continue
            cur = out.get(name)
            if cur is None and name in out:
                continue  # an earlier row group already disqualified it
            out[name] = (
                [lo, hi]
                if cur is None
                else [min(cur[0], lo), max(cur[1], hi)]
            )
    return {"rows": md.num_rows, "ranges": {k: v for k, v in out.items() if v}}


def _version_dir(target: SnapshotParquetTarget, version: int | None) -> str:
    v = version if version is not None else target.current_version()
    if v is None:
        raise ValueError(f"no committed snapshot under {target.path}")
    return os.path.join(target.path, f"v={v}")


def build_manifest(
    target: SnapshotParquetTarget,
    cols: list[str],
    version: int | None = None,
) -> dict:
    """One footer sweep over the snapshot → the planning sidecar.
    Returns the manifest dict ({relative file: {rows, ranges}})."""
    vdir = _version_dir(target, version)
    manifest = {
        os.path.relpath(f, vdir): _file_ranges(f, cols)
        for f in _parquet_files(vdir)
    }
    # the version dir's mtime IS the snapshot's commit time (stamped by
    # _finalize at the pointer flip; version_as_of/history/age-based
    # expiry all resolve against it) — writing the sidecar into the dir
    # must not rewrite history, so restore the mtime afterwards
    stat = os.stat(vdir)
    tmp = os.path.join(vdir, MANIFEST_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(vdir, MANIFEST_FILE))
    os.utime(vdir, (stat.st_atime, stat.st_mtime))
    return manifest


def read_manifest(
    target: SnapshotParquetTarget, version: int | None = None
) -> dict | None:
    try:
        with open(os.path.join(_version_dir(target, version), MANIFEST_FILE)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def plan_files(
    target: SnapshotParquetTarget,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
) -> list[str] | None:
    """Zero-I/O scan planning: the snapshot files whose [min, max] for
    ``col`` overlaps [lo, hi] (None bound = unbounded), plus every file
    the manifest cannot vouch for. Returns absolute paths, or None when
    the snapshot has no manifest (caller falls back to the full scan)."""
    manifest = read_manifest(target, version)
    if manifest is None:
        return None
    vdir = _version_dir(target, version)
    out = []
    for rel, entry in manifest.items():
        rng = entry.get("ranges", {}).get(col)
        keep = (
            rng is None  # no stats -> must read (safe over-selection)
            or (
                (lo is None or rng[1] >= lo)
                and (hi is None or rng[0] <= hi)
            )
        )
        if keep:
            out.append(os.path.join(vdir, rel))
    return out


def read_range(
    target: SnapshotParquetTarget,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
) -> DataFrame:
    """Range read through the manifest plan: Spark opens ONLY the
    overlapping files; a residual filter keeps the result exact (file
    ranges over-approximate). Without a manifest this degrades to the
    plain pruned-by-nothing scan with the same filter — correct either
    way, fast on a sort-compacted layout."""
    vdir = _version_dir(target, version)
    files = plan_files(target, col, lo, hi, version)
    if files is None:
        df = target.spark.read.parquet(vdir)
    elif not files:
        df = target.spark.read.parquet(vdir).filter(F.lit(False))
    else:
        df = target.spark.read.parquet(*[glob_escape(f) for f in files])
    if lo is not None:
        df = df.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(col) <= F.lit(hi))
    return df
