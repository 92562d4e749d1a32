"""Iceberg table maintenance, jar-free: snapshot expiry and orphan-file
removal over the public table format — the ``expire_snapshots`` /
``remove_orphan_files`` actions the reference's lakehouse maintenance
performs through its catalog (mirroring this repo's own
``sinks/maintenance.py`` X2/X3 operators for the parquet target).

Crash ordering is the load-bearing detail: the new metadata (without
the expired snapshots) is PUBLISHED FIRST, file deletion second — a
crash between the two leaves harmless orphans, never a live snapshot
with dangling references. All work is driver-side metadata
(O(manifest entries across touched snapshots)); data files are only
ever ``os.remove``'d, never read.
"""

from __future__ import annotations

import os
import time

from arcane_framework_scala_spark.sources import avro_ocf
from arcane_framework_scala_spark.sources import iceberg_reader as ir


def _snapshot_files(meta: dict, snap: dict, table_dir: str) -> set[str]:
    """Every local path the snapshot references: its manifest list, all
    manifests, and every data/delete file named by ANY entry (status-2
    tombstone references included — a manifest that names a path keeps
    it alive until the manifest itself is expired)."""
    location = meta.get("location", table_dir)
    out: set[str] = set()
    if snap.get("manifest-list"):
        out.add(ir._to_local(snap["manifest-list"], location))
    for mf in ir._manifest_rows(snap, location):
        mfp = ir._to_local(mf["manifest_path"], location)
        out.add(mfp)
        for e in avro_ocf.read_ocf_cached(mfp)[1]:
            out.add(ir._to_local(e["data_file"]["file_path"], location))
    return out


def expire_snapshots(
    table_dir: str,
    keep_last: int | None = None,
    older_than_ms: int | None = None,
) -> dict:
    """Expire historical snapshots (the current one is always kept):
    keep the newest ``keep_last`` and/or everything newer than
    ``older_than_ms``; drop the rest from the metadata, then delete
    every manifest list, manifest, and data/delete file referenced
    ONLY by expired snapshots. Returns
    ``{"snapshots_removed", "files_removed"}``."""
    if keep_last is None and older_than_ms is None:
        raise ValueError("pass keep_last and/or older_than_ms")
    meta = ir.table_metadata(table_dir)
    snaps = sorted(
        meta.get("snapshots") or [], key=lambda s: s["timestamp-ms"]
    )
    if not snaps:
        return {"snapshots_removed": 0, "files_removed": 0}
    keep_ids = {meta.get("current-snapshot-id")}
    if keep_last is not None:
        keep_ids |= {s["snapshot-id"] for s in snaps[-keep_last:]}
    if older_than_ms is not None:
        keep_ids |= {
            s["snapshot-id"]
            for s in snaps
            if s["timestamp-ms"] > older_than_ms
        }
    kept = [s for s in snaps if s["snapshot-id"] in keep_ids]
    removed = [s for s in snaps if s["snapshot-id"] not in keep_ids]
    if not removed:
        return {"snapshots_removed": 0, "files_removed": 0}

    keep_paths: set[str] = set()
    for s in kept:
        keep_paths |= _snapshot_files(meta, s, table_dir)
    drop_paths: set[str] = set()
    for s in removed:
        drop_paths |= _snapshot_files(meta, s, table_dir)
    drop = drop_paths - keep_paths

    new_meta = {
        **meta,
        "snapshots": [s for s in meta["snapshots"] if s["snapshot-id"] in keep_ids],
        "snapshot-log": [
            l
            for l in meta.get("snapshot-log") or []
            if l["snapshot-id"] in keep_ids
        ],
    }
    ir.write_metadata(table_dir, new_meta)  # publish BEFORE deleting
    files_removed = 0
    for p in sorted(drop):
        try:
            os.remove(p)
            files_removed += 1
        except FileNotFoundError:
            pass
    return {"snapshots_removed": len(removed), "files_removed": files_removed}


def remove_orphan_files(
    table_dir: str, older_than_s: float = 3 * 86400
) -> list[str]:
    """Delete ``data/``-dir files referenced by NO snapshot and older
    than ``older_than_s`` (the age window keeps in-flight staged writes
    safe, same rule as ``sinks/maintenance.py`` X3 — a concurrent
    writer that has ``os.replace``'d its data file into ``data/`` but
    not yet published metadata must not lose it, so the default is the
    real action's 3-day window, never zero). Metadata files are never
    touched here. Returns the removed paths."""
    meta = ir.table_metadata(table_dir)
    referenced: set[str] = set()
    for s in meta.get("snapshots") or []:
        referenced |= _snapshot_files(meta, s, table_dir)
    cutoff = time.time() - older_than_s
    removed: list[str] = []
    data_dir = os.path.join(table_dir, "data")
    for root, _dirs, files in os.walk(data_dir):
        for name in files:
            p = os.path.join(root, name)
            if p in referenced:
                continue
            try:
                if os.stat(p).st_mtime > cutoff:
                    continue
                os.remove(p)
                removed.append(p)
            except FileNotFoundError:
                pass
    return sorted(removed)


def rollback_to_snapshot(table_dir: str, snapshot_id: int) -> int:
    """``rollback_to_snapshot`` — point ``current-snapshot-id`` back at
    an ANCESTOR of the current snapshot (the spec's rollback rule; for
    arbitrary existing snapshots use :func:`set_current_snapshot`).
    Pure metadata: no snapshot is deleted, so time travel to the
    rolled-over states keeps working until ``expire_snapshots`` drops
    them (they are no longer ancestors of current, exactly the real
    engine's post-rollback expiry behavior). Appends the change to
    ``snapshot-log`` per the spec ("a log of how the table's current
    snapshot changed"). Returns the new metadata version."""
    meta = ir.table_metadata(table_dir)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots") or []}
    if snapshot_id not in snaps:
        raise ValueError(
            f"snapshot {snapshot_id} is not in the table's history"
        )
    cur = meta.get("current-snapshot-id")
    if snapshot_id == cur:
        raise ValueError(f"snapshot {snapshot_id} is already current")
    ancestors = set()
    c = cur
    while c is not None and c in snaps:
        ancestors.add(c)
        c = snaps[c].get("parent-snapshot-id")
    if snapshot_id not in ancestors:
        raise ValueError(
            f"snapshot {snapshot_id} is not an ancestor of the current "
            f"snapshot {cur} — rollback only rewinds history; use "
            "set_current_snapshot for arbitrary states"
        )
    return set_current_snapshot(table_dir, snapshot_id)


def set_current_snapshot(table_dir: str, snapshot_id: int) -> int:
    """Point ``current-snapshot-id`` at ANY existing snapshot (the
    engine's ``set_current_snapshot`` action — no ancestry check).
    Metadata-only; appends a ``snapshot-log`` entry."""
    meta = ir.table_metadata(table_dir)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots") or []}
    if snapshot_id not in snaps:
        raise ValueError(
            f"snapshot {snapshot_id} is not in the table's history"
        )
    now_ms = int(time.time() * 1000)
    new_meta = {
        **meta,
        "current-snapshot-id": snapshot_id,
        "last-updated-ms": now_ms,
        "snapshot-log": (meta.get("snapshot-log") or [])
        + [{"timestamp-ms": now_ms, "snapshot-id": snapshot_id}],
    }
    return ir.write_metadata(table_dir, new_meta)


def expire_metadata_files(table_dir: str) -> list[str]:
    """Delete previous ``vN.metadata.json`` files that the CURRENT
    metadata's ``metadata-log`` no longer references (written before
    metadata-log tracking, or fallen off the
    ``write.metadata.previous-versions-max`` cap without
    delete-after-commit enabled) — the on-demand sweep matching the
    write-time pruning in :func:`iceberg_reader.write_metadata`. The
    current file and every logged previous file are kept, so rollback
    of the metadata pointer within the logged window stays possible.
    Returns the removed paths."""
    import json
    import re

    cur_file = ir.table_metadata_file(table_dir)
    with open(cur_file) as f:
        meta = json.load(f)
    referenced = {os.path.abspath(cur_file)}
    for e in meta.get("metadata-log") or []:
        uri = e.get("metadata-file") or ""
        p = uri[len("file://"):] if uri.startswith("file://") else uri
        if p:
            referenced.add(os.path.abspath(p))
    md = os.path.dirname(cur_file)
    pat = re.compile(r"^v(\d+)\.metadata\.json$|^(\d+)-[0-9a-f-]+\.metadata\.json$")
    removed: list[str] = []
    for name in sorted(os.listdir(md)):
        if not pat.match(name):
            continue
        full = os.path.abspath(os.path.join(md, name))
        if full in referenced:
            continue
        os.remove(full)
        removed.append(full)
    return removed


def rollback_to_timestamp(table_dir: str, ts_ms: int) -> int:
    """Roll back to the LAST ancestor snapshot committed at or before
    ``ts_ms`` (the engine's ``rollback_to_timestamp``): the ancestry
    chain of the current snapshot is walked and the newest member with
    ``timestamp-ms`` <= the cutoff becomes current. Raises when every
    ancestor is newer."""
    meta = ir.table_metadata(table_dir)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots") or []}
    c = meta.get("current-snapshot-id")
    best = None
    while c is not None and c in snaps:
        s = snaps[c]
        if s["timestamp-ms"] <= ts_ms and (
            best is None or s["timestamp-ms"] > best["timestamp-ms"]
        ):
            best = s
        c = s.get("parent-snapshot-id")
    if best is None:
        raise ValueError(
            f"no ancestor snapshot at or before {ts_ms} — the table's "
            "history starts later"
        )
    if best["snapshot-id"] == meta.get("current-snapshot-id"):
        raise ValueError(
            f"snapshot {best['snapshot-id']} is already current"
        )
    return set_current_snapshot(table_dir, best["snapshot-id"])
