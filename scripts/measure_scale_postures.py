#!/usr/bin/env python
"""Measure the two 10^5-file postures SCALE.md promises numbers for
(VERDICT r9 item 7): (a) Iceberg manifest decode wall-time at 1e5
entries — the driver-side planning cost the reader pays per snapshot;
(b) the merge-sink link-carry loop at 1e5 files — the per-publish cost
of carrying unchanged files by hard link. Run on an idle box; prints
one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from arcane_framework_scala_spark.sources import avro_ocf  # noqa: E402
from arcane_framework_scala_spark.sources import (  # noqa: E402
    iceberg_reader as ir,
)

N = int(os.environ.get("POSTURE_N", "100000"))


def measure_manifest_decode() -> dict:
    """Write a synthetic 1e5-entry v2 data manifest through the same
    codec the exporter uses, then time the read+decode path the planner
    takes (avro_ocf.read_ocf — the per-manifest unit inside
    _live_entries)."""
    d = tempfile.mkdtemp(prefix="posture_manifest_")
    entries = [
        {
            "status": 1,
            "snapshot_id": 1,
            "sequence_number": 1,
            "file_sequence_number": 1,
            "data_file": {
                "content": 0,
                "file_path": f"file:///tank/data/part-{i:07d}.parquet",
                "file_format": "PARQUET",
                "partition": {},
                "record_count": 10_000,
                "file_size_in_bytes": 134_217_728,
                "lower_bounds": [
                    {"key": 1, "value": (i * 10_000).to_bytes(8, "little")}
                ],
                "upper_bounds": [
                    {
                        "key": 1,
                        "value": ((i + 1) * 10_000 - 1).to_bytes(8, "little"),
                    }
                ],
            },
        }
        for i in range(N)
    ]
    p = os.path.join(d, "m-posture.avro")
    t0 = time.time()
    avro_ocf.write_ocf(
        p,
        ir._manifest_entry_schema([]),
        entries,
        extra_meta={
            "schema": "{}",
            "partition-spec": "[]",
            "partition-spec-id": "0",
            "format-version": "2",
            "content": "data",
        },
    )
    write_s = time.time() - t0
    size = os.path.getsize(p)
    t0 = time.time()
    _meta, decoded = avro_ocf.read_ocf_cached(p)
    decode_s = time.time() - t0
    assert len(decoded) == N
    t0 = time.time()
    _meta2, decoded2 = avro_ocf.read_ocf_cached(p)
    cached_s = time.time() - t0
    assert decoded2 is decoded
    shutil.rmtree(d, ignore_errors=True)
    return {
        "metric": "iceberg_manifest_decode_1e5_entries",
        "entries": N,
        "manifest_bytes": size,
        "decode_sec": round(decode_s, 3),
        "cached_decode_sec": round(cached_s, 6),
        "write_sec": round(write_s, 3),
        "unit": "sec",
    }


def measure_link_carry() -> dict:
    """Create 1e5 small files, then time the hard-link carry loop (the
    merge sink's per-publish carry of unchanged files) plus the
    os.stat identity probe that precedes each link."""
    d = tempfile.mkdtemp(prefix="posture_links_")
    src = os.path.join(d, "src")
    dst = os.path.join(d, "dst")
    os.makedirs(src)
    os.makedirs(dst)
    t0 = time.time()
    for i in range(N):
        with open(os.path.join(src, f"f-{i:07d}.parquet"), "wb") as f:
            f.write(b"x")
    create_s = time.time() - t0
    names = sorted(os.listdir(src))
    t0 = time.time()
    for n in names:
        sp = os.path.join(src, n)
        st = os.stat(sp)  # the identity probe the carry naming uses
        os.link(sp, os.path.join(dst, f"{st.st_ino:x}-{n}"))
    link_s = time.time() - t0
    shutil.rmtree(d, ignore_errors=True)
    return {
        "metric": "link_carry_1e5_files",
        "files": N,
        "create_sec": round(create_s, 3),
        "stat_link_sec": round(link_s, 3),
        "per_file_us": round(link_s / N * 1e6, 1),
        "unit": "sec",
    }


if __name__ == "__main__":
    print(json.dumps(measure_manifest_decode()))
    print(json.dumps(measure_link_carry()))
