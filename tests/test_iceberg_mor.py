"""Iceberg v2 merge-on-read (sources/iceberg_mor.py): position/equality
delete application under the spec's sequence-number visibility rules,
delete commits with manifest reuse, append commits that carry deletes,
and MoR compaction. All semantics from the public table spec's
"Row-level deletes" / "Sequence numbers" sections — the honest-fence
REMOVAL for what r8 still refused."""

import os

import pyspark.sql.functions as F
import pytest

from arcane_framework_scala_spark.sinks.merge_sink import (
    SnapshotParquetTarget,
)
from arcane_framework_scala_spark.sources import avro_ocf
from arcane_framework_scala_spark.sources import iceberg_mor as im
from arcane_framework_scala_spark.sources import iceberg_reader as ir


def _frame(spark, n=100):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 10).alias("u"),
        F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).alias("k"),
    )


def _export(spark, base_dir, df, partition_cols=None, name="pub"):
    t = SnapshotParquetTarget(
        spark, os.path.join(base_dir, name), partition_cols=partition_cols
    )
    t.overwrite(df)
    out = os.path.join(base_dir, "ice")
    assert ir.export_iceberg(t, out) == 1
    return out


def _ids(spark, out, **kw):
    return {r.id for r in ir.read_iceberg(spark, out, **kw).collect()}


def test_position_delete_roundtrip_and_noop(spark, tmp_path):
    # percent/glob-hostile table path: the house convention, and the
    # exact hazard the _metadata.file_path mapping must survive
    base = str(tmp_path / "mor [p] {q}")
    out = _export(spark, base, _frame(spark).repartition(3))
    assert im.commit_position_deletes(spark, out, "id % 4 = 0") == 2
    assert _ids(spark, out) == {i for i in range(100) if i % 4}
    # deleting the already-deleted matches nothing: no snapshot
    assert im.commit_position_deletes(spark, out, "id % 4 = 0") is None
    assert ir.table_metadata(out)["last-sequence-number"] == 2
    # time travel to the pre-delete snapshot sees every row
    log = ir.snapshot_log(out)
    assert _ids(spark, out, snapshot_id=log[0]["snapshot-id"]) == set(
        range(100)
    )


def test_equality_delete_strict_visibility(spark, tmp_path):
    """The spec's strictest MoR rule: an equality delete removes
    matching rows from STRICTLY OLDER commits only — rows appended at
    a later sequence number survive even when their key matches."""
    out = _export(spark, str(tmp_path), _frame(spark).filter("id < 60"))
    dels = spark.createDataFrame([(3,)], "u long")
    assert im.commit_equality_deletes(spark, out, dels, ["u"]) == 2
    want = {i for i in range(60) if i % 10 != 3}
    assert _ids(spark, out) == want
    # append rows INCLUDING u=3 keys through the direct append path
    assert im.append_rows(spark, out, _frame(spark).filter("id >= 60")) == 3
    assert _ids(spark, out) == want | set(range(60, 100))
    # and the carried files keep their deletes (u=3, id<60 stay gone)


def test_position_delete_visibility_on_append(spark, tmp_path):
    """Position deletes apply to files at the SAME or older sequence
    number; appended files are untouched even though their positions
    collide with deleted ones."""
    out = _export(spark, str(tmp_path), _frame(spark).filter("id < 50"))
    assert im.commit_position_deletes(spark, out, "id < 10") == 2
    assert im.append_rows(spark, out, _frame(spark).filter("id >= 50")) == 3
    assert _ids(spark, out) == set(range(10, 100))


def test_deletes_on_partitioned_table_with_injection(spark, tmp_path):
    """Hive-migrated layout: the identity partition column lives only
    in the manifest, injected per file group — deletes must see the
    injected values (pos-delete predicate on it, eq delete keyed on
    it) and partition-range planning must stay exact post-delete."""
    df = spark.range(80).select(
        F.col("id"), (F.col("id") % 4).alias("p"), (F.col("id") % 10).alias("u")
    )
    out = _export(spark, str(tmp_path), df, partition_cols=["p"])
    assert im.commit_position_deletes(spark, out, "p = 2 AND id < 40") == 2
    want = {i for i in range(80) if not (i % 4 == 2 and i < 40)}
    assert _ids(spark, out) == want
    assert (
        im.commit_equality_deletes(
            spark, out, spark.createDataFrame([(1,)], "p long"), ["p"]
        )
        == 3
    )
    want = {i for i in want if i % 4 != 1}
    assert _ids(spark, out) == want
    got = {
        r.id
        for r in ir.read_iceberg_range(spark, out, "p", 2, 3).collect()
    }
    assert got == {i for i in want if i % 4 in (2, 3)}


def test_delete_commit_reuses_previous_manifests(spark, tmp_path):
    """A delete commit is METADATA-ONLY against the standing data: the
    new manifest list must reference the previous manifest files
    verbatim (no data-manifest rewrite) plus exactly one new delete
    manifest, and the global delete file must ride an UNPARTITIONED
    spec added to partition-specs."""
    df = spark.range(40).select(F.col("id"), (F.col("id") % 2).alias("p"))
    out = _export(spark, str(tmp_path), df, partition_cols=["p"])
    meta1 = ir.table_metadata(out)
    snap1 = ir._resolve_snapshot(meta1, None, None)
    ml1 = avro_ocf.read_ocf(ir._to_local(snap1["manifest-list"], out))[1]
    assert im.commit_position_deletes(spark, out, "id = 7") == 2
    meta2 = ir.table_metadata(out)
    snap2 = ir._resolve_snapshot(meta2, None, None)
    ml2 = avro_ocf.read_ocf(ir._to_local(snap2["manifest-list"], out))[1]
    assert [m["manifest_path"] for m in ml2[:-1]] == [
        m["manifest_path"] for m in ml1
    ]
    assert ml2[-1]["content"] == 1
    # the table's default spec is partitioned; the delete manifest's
    # spec id must point at an unpartitioned spec
    specs = {s["spec-id"]: s for s in meta2["partition-specs"]}
    assert specs[ml2[-1]["partition_spec_id"]]["fields"] == []


def test_rewrite_data_files_compacts_and_keeps_history(spark, tmp_path):
    out = _export(spark, str(tmp_path), _frame(spark).repartition(4))
    assert im.commit_position_deletes(spark, out, "id % 3 = 0") == 2
    assert (
        im.commit_equality_deletes(
            spark, out, spark.createDataFrame([(5,)], "u long"), ["u"]
        )
        == 3
    )
    want = {i for i in range(100) if i % 3 and i % 10 != 5}
    assert _ids(spark, out) == want
    assert im.rewrite_data_files(spark, out) == 4
    # same rows, zero delete manifests at the new snapshot
    assert _ids(spark, out) == want
    meta = ir.table_metadata(out)
    ent = ir._live_entries(
        meta, ir._resolve_snapshot(meta, None, None), out
    )
    assert not ent["pos"] and not ent["eq"]
    # footer bounds written: a range plan prunes to a strict subset
    all_files = ir.active_files(out)
    planned = ir.plan_data_files(out, "id", 0, 5)
    assert len(planned) < len(all_files) or len(all_files) == 1
    # the MoR snapshot stays time-travelable WITH its deletes
    log = ir.snapshot_log(out)
    assert _ids(spark, out, snapshot_id=log[2]["snapshot-id"]) == want
    assert _ids(spark, out, snapshot_id=log[0]["snapshot-id"]) == set(
        range(100)
    )


def test_sequence_number_inheritance_from_manifest_list(spark, tmp_path):
    """An entry with a null sequence_number inherits the manifest-list
    row's — the metadata-writer inheritance the spec mandates."""
    out = _export(spark, str(tmp_path), _frame(spark, 20))
    meta = ir.table_metadata(out)
    snap = ir._resolve_snapshot(meta, None, None)
    ml = avro_ocf.read_ocf(ir._to_local(snap["manifest-list"], out))[1]
    mf_path = ir._to_local(ml[0]["manifest_path"], out)
    schema, entries = avro_ocf.read_ocf(mf_path)
    forged = [{**e, "sequence_number": None} for e in entries]
    avro_ocf.write_ocf(mf_path, schema, forged)
    ent = ir._live_entries(meta, snap, out)
    assert all(e["seq"] == ml[0]["sequence_number"] for e in ent["data"])


def test_unmapped_file_path_raises_loudly(spark, tmp_path):
    """If the physical _metadata.file_path cannot be translated back to
    a manifest URI (encoding drift), the read RAISES — it must never
    silently resurrect (skip a delete) or drop rows."""
    out = _export(spark, str(tmp_path), _frame(spark, 30))
    assert im.commit_position_deletes(spark, out, "id = 1") == 2
    # sabotage: make every guess wrong, simulating an encoding the
    # quoting round-trip cannot reproduce
    orig = im._metadata_path_guesses
    im._metadata_path_guesses = lambda local: {"file:/nonexistent-guess"}
    try:
        with pytest.raises(Exception, match="not in the manifest map"):
            ir.read_iceberg(spark, out).collect()
    finally:
        im._metadata_path_guesses = orig
