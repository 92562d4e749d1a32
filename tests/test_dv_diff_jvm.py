"""JVM DV-diff decode (r12): the javaext ``DvDiffUdf`` replaces the
``mapInPandas`` round trip in the change-feed's deletion-vector diff
(guide §4 — no Python node on the feed's hot path). These tests pin
(a) bit-identity with the Python codec across every container shape the
roaring format allows (array, bitmap, run, multi-key 64-bit), (b) that
the feed plan actually engages the JVM path when the jar is present,
and (c) that the file-integrity checks (size, CRC) still fail loudly.
"""

import base64
import struct

import numpy as np
import pytest

from arcane_framework_scala_spark.sources import delta_cdf as dcdf
from arcane_framework_scala_spark.sources import delta_dv as dv


def _jvm_positions(spark, data: bytes) -> list[tuple[int, str]]:
    """Decode ``data`` (a RoaringBitmapArray) as the 'new' vector of a
    pair diff via the JVM UDF: every position comes back as 'del'."""
    import pyspark.sql.functions as F

    assert dcdf._dv_diff_udf_ready(spark)
    spec = "I|" + base64.b64encode(data).decode()
    src = spark.createDataFrame(
        [("f", None, spec)], "rel string, old string, new string"
    )
    rows = (
        src.select(F.explode(F.expr("arcane_dv_diff(old, new)")).alias("d"))
        .select("d.pos", "d.kind")
        .collect()
    )
    return [(r.pos, r.kind) for r in rows]


def test_array_bitmap_and_multikey_match_python(spark):
    # array containers (<=4096 per 16-bit key), one bitmap container
    # (70k dense lows), and values above 2^32 (multiple 64-bit keys)
    pos = np.concatenate(
        [
            np.array([3, 5, 100000], dtype=np.int64),
            np.arange(1 << 20, (1 << 20) + 70000, dtype=np.int64),
            np.array([(1 << 33) + 7, (1 << 34)], dtype=np.int64),
        ]
    )
    data = dv.serialize_positions(pos)
    expect = [(int(p), "del") for p in dv.deserialize_positions(data)]
    assert _jvm_positions(spark, data) == expect


def test_run_container_matches_python(spark):
    # our writer never emits run containers (cookie 12347) but real
    # Delta writers may — handcraft one: key 0, runs [5..9], [100..100]
    n = 1
    runs = [(5, 4), (100, 0)]
    rb = struct.pack("<I", (12347 & 0xFFFF) | ((n - 1) << 16))
    rb += bytes([0b1])  # run bitset: container 0 is a run container
    card = sum(ln + 1 for _, ln in runs)
    rb += struct.pack("<HH", 0, card - 1)
    # n < 4 -> no offsets section
    rb += struct.pack("<H", len(runs))
    for start, length in runs:
        rb += struct.pack("<HH", start, length)
    data = struct.pack("<iq", dv.MAGIC, 1) + rb
    expect = [(int(p), "del") for p in dv.deserialize_positions(data)]
    assert [p for p, _ in expect] == [5, 6, 7, 8, 9, 100]
    assert _jvm_positions(spark, data) == expect


def test_pair_diff_matches_python_reference(spark, tmp_path):
    import pyspark.sql.functions as F

    tbl = str(tmp_path)
    old = np.array([1, 2, 3, 50000, (1 << 33)], dtype=np.int64)
    new = np.array([2, 3, 4, (1 << 33), (1 << 34)], dtype=np.int64)
    d_old = dv.write_dv_file(tbl, old)
    d_new = dv.write_dv_file(tbl, new)
    got = sorted(
        (r.rel, r.pos, r.kind)
        for r in dcdf._dv_positions_df(
            spark, tbl, [("f", d_old, d_new), ("g", None, d_old)]
        ).collect()
    )
    exp = sorted(
        [("f", 4, "del"), ("f", 1 << 34, "del"), ("f", 1, "ins"),
         ("f", 50000, "ins")]
        + [("g", int(p), "del") for p in old]
    )
    assert got == exp


def test_feed_plan_has_no_python_node(spark, tmp_path):
    """The point of the rewrite: a DV-commit feed plans with NO
    BatchEvalPython/ArrowEvalPython/MapInPandas node (it would silently
    fall back if registration broke)."""
    import pyspark.sql.functions as F

    tbl = str(tmp_path)
    d = dv.write_dv_file(tbl, np.array([1, 3], dtype=np.int64))
    pos = dcdf._dv_positions_df(spark, tbl, [("f", None, d)])
    plan = pos._sc._jvm.PythonSQLUtils.explainString(
        pos._jdf.queryExecution(), "formatted"
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, plan


def test_corrupt_crc_raises(spark, tmp_path):
    tbl = str(tmp_path)
    d = dv.write_dv_file(tbl, np.array([7, 9], dtype=np.int64))
    p = dv.resolve_dv_path(tbl, d)
    blob = bytearray(open(p, "rb").read())
    blob[-1] ^= 0xFF  # flip a CRC byte
    open(p, "wb").write(bytes(blob))
    with pytest.raises(Exception, match="checksum"):
        dcdf._dv_positions_df(spark, tbl, [("f", None, d)]).collect()


def test_size_mismatch_raises(spark, tmp_path):
    tbl = str(tmp_path)
    d = dv.write_dv_file(tbl, np.array([7, 9], dtype=np.int64))
    bad = {**d, "sizeInBytes": d["sizeInBytes"] + 1}
    with pytest.raises(Exception, match="size mismatch|readFully|EOF"):
        dcdf._dv_positions_df(spark, tbl, [("f", None, bad)]).collect()


def _jvm_build(spark, old_spec, positions) -> tuple[bytes, int]:
    import pyspark.sql.functions as F

    assert dcdf._dv_diff_udf_ready(spark)
    src = spark.createDataFrame(
        [(old_spec, [int(p) for p in positions])],
        "old string, pos array<bigint>",
    )
    r = src.select(
        F.call_udf("arcane_dv_build", F.col("old"), F.col("pos")).alias("b")
    ).collect()[0]["b"]
    return bytes(r["data"]), r["cardinality"]


def test_build_bytes_identical_to_python(spark):
    """DvBuildUdf must serialize BYTE-IDENTICALLY to the Python writer
    (DV file names are content-derived md5 UUIDs) across every layout
    case: empty-ish, array containers, a >4096 bitmap container, gapped
    high-32 keys (empty bitmaps serialized in between), duplicates."""
    cases = [
        np.array([0], dtype=np.int64),
        np.array([3, 5, 5, 9], dtype=np.int64),  # dup tolerated
        np.arange(0, 70000, dtype=np.int64),  # bitmap container
        np.array([1, (3 << 32) + 7], dtype=np.int64),  # gapped keys
        np.concatenate(
            [np.arange(65530, 65600, dtype=np.int64),  # container split
             np.array([(1 << 33) + 2], dtype=np.int64)]
        ),
    ]
    for pos in cases:
        expect = dv.serialize_positions(pos)
        got, card = _jvm_build(spark, None, pos)
        assert got == expect, f"byte mismatch for {pos[:5]}..."
        assert card == len(np.unique(pos))


def test_build_unions_old_vector(spark, tmp_path):
    tbl = str(tmp_path)
    old = np.array([2, 7, 100000], dtype=np.int64)
    d_old = dv.write_dv_file(tbl, old)
    spec = dcdf._dv_spec(tbl, d_old)
    new = np.array([7, 9], dtype=np.int64)
    expect = dv.serialize_positions(np.union1d(old, new))
    got, card = _jvm_build(spark, spec, new)
    assert got == expect
    assert card == 4


def test_delete_where_jvm_matches_python(spark, tmp_path):
    """End-to-end: delete_where with the JVM build commits the same
    descriptor (same content-derived UUID, size, cardinality) as the
    pandas fallback on an identical table."""
    import json
    import os

    import pyspark.sql.functions as F

    from arcane_framework_scala_spark.sources import delta_reader as dr
    from arcane_framework_scala_spark.sinks.merge_sink import (
        SnapshotParquetTarget,
    )

    descs = {}
    for variant in ("jvm", "py"):
        root = str(tmp_path / variant)
        st = SnapshotParquetTarget(spark, root + "/pub")
        st.overwrite(
            spark.range(0, 500).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("v")
            )
        )
        tbl = root + "/delta"
        dr.export_delta(st, tbl)
        if variant == "py":
            orig = dcdf._dv_diff_udf_ready
            dcdf._dv_diff_udf_ready = lambda s: False
            try:
                v = dv.delete_where(spark, tbl, "v = 3")
            finally:
                dcdf._dv_diff_udf_ready = orig
        else:
            v = dv.delete_where(spark, tbl, "v = 3")
        assert v == 1
        acts = [
            json.loads(line)
            for line in open(
                os.path.join(tbl, "_delta_log", f"{v:020d}.json")
            )
        ]
        # data-file NAMES are per-table random UUIDs; the DV descriptor
        # (content-md5 address, size, cardinality) is the determinism
        # contract — compare the sorted descriptor multiset
        descs[variant] = sorted(
            (
                a["add"]["deletionVector"]["pathOrInlineDv"],
                a["add"]["deletionVector"]["sizeInBytes"],
                a["add"]["deletionVector"]["cardinality"],
            )
            for a in acts
            if "add" in a
        )
    assert descs["jvm"] == descs["py"]
