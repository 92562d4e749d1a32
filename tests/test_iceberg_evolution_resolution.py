"""Iceberg schema-evolution RESOLUTION hazards (r10): name swaps and
dropped-name reuse make by-name column binding wrong; files carrying
``PARQUET:field_id`` footer metadata (every real Iceberg writer) must
resolve BY ID, and files without ids must RAISE on ambiguous names
instead of silently reading the wrong column.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from arcane_framework_scala_spark.sinks.merge_sink import (
    SnapshotParquetTarget,
)
from arcane_framework_scala_spark.sources import iceberg_reader as ir


def _export(spark, tmp_path, rows, schema):
    t = SnapshotParquetTarget(spark, str(tmp_path / "pub"))
    t.overwrite(spark.createDataFrame(rows, schema))
    out = str(tmp_path / "ice")
    assert ir.export_iceberg(t, out) == 1
    return out


def _evolve(out, new_fields, last_column_id=None):
    mf = ir.table_metadata_file(out)
    meta = json.load(open(mf))
    old = meta["schemas"][0]
    new = {**old, "schema-id": 1, "fields": new_fields}
    meta["schemas"] = [old, new]
    meta["current-schema-id"] = 1
    if last_column_id is not None:
        meta["last-column-id"] = last_column_id
    json.dump(meta, open(mf, "w"))
    return old


def _stamp_field_ids(out, ids_by_name):
    """Rewrite every data file with PARQUET:field_id footer metadata —
    what a real Iceberg writer would have produced. os.remove first:
    the exporter HARD LINKS data files, an in-place write would mutate
    the source publish dir through the shared inode."""
    data = os.path.join(out, "data")
    for name in os.listdir(data):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(data, name)
        t = pq.read_table(p)
        fields = [
            pa.field(
                f.name,
                f.type,
                nullable=f.nullable,
                metadata={
                    b"PARQUET:field_id": str(ids_by_name[f.name]).encode()
                },
            )
            for f in t.schema
        ]
        t = t.cast(pa.schema(fields))
        os.remove(p)
        pq.write_table(t, p)


def _swap_table(spark, tmp_path):
    """a<->b name swap: schema 1 renames field id 1 ('a') to 'b' and
    field id 2 ('b') to 'a'. By-name binding reads each column as the
    other field."""
    out = _export(
        spark,
        tmp_path,
        [(i, i + 100, i) for i in range(10)],
        "a long, b long, v long",
    )
    mf = ir.table_metadata_file(out)
    old_fields = json.load(open(mf))["schemas"][0]["fields"]
    assert [f["name"] for f in old_fields] == ["a", "b", "v"]
    swapped = {"a": "b", "b": "a"}
    _evolve(
        out,
        [{**f, "name": swapped.get(f["name"], f["name"])} for f in old_fields],
    )
    return out, {f["name"]: f["id"] for f in old_fields}


def test_name_swap_without_field_ids_raises(spark, tmp_path):
    out, _ids = _swap_table(spark, tmp_path)
    with pytest.raises(ir.IcebergError, match="more than one field id"):
        ir.read_iceberg(spark, out).collect()


def test_name_swap_with_field_ids_resolves_by_id(spark, tmp_path):
    out, ids = _swap_table(spark, tmp_path)
    _stamp_field_ids(out, ids)  # a->1, b->2, v->3 as originally written
    got = {
        (r["a"], r["b"], r["v"])
        for r in ir.read_iceberg(spark, out).collect()
    }
    # logical 'b' is field id 1 (the old 'a' column), logical 'a' id 2
    assert got == {(i + 100, i, i) for i in range(10)}


def test_dropped_name_reuse_without_ids_raises(spark, tmp_path):
    """A NEW field (id 3) takes a DROPPED field's name: no live field
    was renamed, so the old fast path saw 'no evolution' and bound the
    dead column's data to the new field."""
    out = _export(
        spark, tmp_path, [(i, i * 2) for i in range(8)], "x long, v long"
    )
    mf = ir.table_metadata_file(out)
    old_fields = json.load(open(mf))["schemas"][0]["fields"]
    v = next(f for f in old_fields if f["name"] == "v")
    x_new = {
        "id": max(f["id"] for f in old_fields) + 1,
        "name": "x",
        "required": False,
        "type": "long",
    }
    _evolve(out, [v, x_new], last_column_id=x_new["id"])
    with pytest.raises(ir.IcebergError, match="more than one field id"):
        ir.read_iceberg(spark, out).collect()


def test_dropped_name_reuse_with_ids_null_fills(spark, tmp_path):
    out = _export(
        spark, tmp_path, [(i, i * 2) for i in range(8)], "x long, v long"
    )
    mf = ir.table_metadata_file(out)
    old_fields = json.load(open(mf))["schemas"][0]["fields"]
    ids = {f["name"]: f["id"] for f in old_fields}
    v = next(f for f in old_fields if f["name"] == "v")
    x_new = {
        "id": max(ids.values()) + 1,
        "name": "x",
        "required": False,
        "type": "long",
    }
    _evolve(out, [v, x_new], last_column_id=x_new["id"])
    _stamp_field_ids(out, ids)
    rows = ir.read_iceberg(spark, out).collect()
    # the file has no column with the NEW field's id -> null-fill; the
    # dead same-named column's data must NOT leak into it
    assert {r["v"] for r in rows} == {i * 2 for i in range(8)}
    assert all(r["x"] is None for r in rows)


def test_plain_rename_still_reads_without_ids(spark, tmp_path):
    """The unambiguous case (rename, no collision) keeps working via
    name-history resolution — the collision fence must not over-fire."""
    out = _export(
        spark, tmp_path, [(i, float(i)) for i in range(6)], "old long, f double"
    )
    mf = ir.table_metadata_file(out)
    old_fields = json.load(open(mf))["schemas"][0]["fields"]
    _evolve(
        out,
        [
            {**f, "name": ("renamed" if f["name"] == "old" else f["name"])}
            for f in old_fields
        ],
    )
    got = {
        (r["renamed"], r["f"])
        for r in ir.read_iceberg(spark, out).collect()
    }
    assert got == {(i, float(i)) for i in range(6)}


def _evolved_appended_table(spark, tmp_path):
    """x12's shape: export under OLD names/types (rid stored as
    ``old_id`` int), evolve (rename + int->long promotion), append
    under the NEW schema — then live MoR deletes land on top."""
    from pyspark.sql import functions as F

    out = _export(
        spark,
        tmp_path,
        [(i, i + 100, i % 3) for i in range(20)],
        "old_id int, v long, g long",
    )
    mf = ir.table_metadata_file(out)
    meta = json.load(open(mf))
    old = meta["schemas"][0]
    new = {
        **old,
        "schema-id": 1,
        "fields": [
            {
                **f,
                "name": ("rid" if f["name"] == "old_id" else f["name"]),
                "type": ("long" if f["name"] == "old_id" else f["type"]),
            }
            for f in old["fields"]
        ],
    }
    meta["schemas"] = [old, new]
    meta["current-schema-id"] = 1
    json.dump(meta, open(mf, "w"))

    from arcane_framework_scala_spark.sources import iceberg_mor as im

    assert (
        im.append_rows(
            spark,
            out,
            spark.createDataFrame(
                [(100 + i, i, i % 3) for i in range(5)],
                "rid long, v long, g long",
            ),
        )
        == 2
    )
    return out


def test_position_deletes_compose_with_evolution(spark, tmp_path):
    """r10 (VERDICT r9 item 5): a renamed+promoted table carrying LIVE
    position deletes reads correctly — the evolved per-file scan
    carries physical row coordinates and (path, pos) anti-joins have
    no schema dependency."""
    from arcane_framework_scala_spark.sources import iceberg_mor as im

    out = _evolved_appended_table(spark, tmp_path)
    assert im.commit_position_deletes(spark, out, "rid % 2 = 0") == 3
    rows = {
        (r["rid"], r["v"], r["g"])
        for r in ir.read_iceberg(spark, out).collect()
    }
    want = {(i, i + 100, i % 3) for i in range(20) if i % 2}
    want |= {(100 + i, i, i % 3) for i in range(5) if i % 2}
    assert rows == want
    # a second delete over the MoR state (old files + appended file +
    # first delete) composes too, and speaks the CURRENT names
    assert im.commit_position_deletes(spark, out, "v < 3") == 4
    want = {r for r in want if r[1] >= 3}
    rows = {
        (r["rid"], r["v"], r["g"])
        for r in ir.read_iceberg(spark, out).collect()
    }
    assert rows == want
    # promotion survives the MoR path
    got = ir.read_iceberg(spark, out)
    assert dict(got.dtypes)["rid"] == "bigint"


def test_idless_equality_deletes_bind_by_write_time_schema(
    spark, tmp_path
):
    """r11 (VERDICT r10 item 4, lifts the last eq+evolution fence): an
    equality delete file WITHOUT footer field ids stores its
    WRITE-TIME column names — the file's data sequence number names
    the snapshot that committed it, that snapshot's recorded
    ``schema-id`` names the schema, and THAT schema's name→id mapping
    binds the columns across any later rename."""
    from arcane_framework_scala_spark.sources import iceberg_mor as im

    out = _evolved_appended_table(spark, tmp_path)
    # written under the CURRENT (post-rename) schema: column 'rid'
    assert (
        im.commit_equality_deletes(
            spark,
            out,
            spark.createDataFrame([(101,)], "rid long"),
            ["rid"],
        )
        == 3
    )
    rows = {
        (r["rid"], r["v"], r["g"])
        for r in ir.read_iceberg(spark, out).collect()
    }
    want = {(i, i + 100, i % 3) for i in range(20)}
    want |= {(100 + i, i, i % 3) for i in range(5) if i != 1}
    assert rows == want


def test_idless_equality_delete_written_under_the_old_schema(
    spark, tmp_path
):
    """The genuinely-renamed case: the delete file stores the OLD
    column name (``old_id``) because its snapshot records the OLD
    schema-id — only write-time binding reads it right. And a delete
    whose snapshot records NO schema-id still raises (the write-time
    names are unrecoverable)."""
    from arcane_framework_scala_spark.sources import iceberg_mor as im

    out = _evolved_appended_table(spark, tmp_path)
    assert (
        im.commit_equality_deletes(
            spark,
            out,
            spark.createDataFrame([(3,)], "rid long"),
            ["rid"],
        )
        == 3
    )
    # rewrite the fixture as an old-schema writer: file column renamed
    # to 'old_id' stored as int32, snapshot restamped to schema-id 0
    data = os.path.join(out, "data")
    eq_files = [n for n in os.listdir(data) if n.startswith("delete-eq-")]
    assert len(eq_files) == 1
    pth = os.path.join(data, eq_files[0])
    t = pq.read_table(pth)
    t = t.rename_columns(["old_id"]).cast(
        pa.schema([pa.field("old_id", pa.int32())])
    )
    os.remove(pth)
    pq.write_table(t, pth)
    mf = ir.table_metadata_file(out)
    meta = json.load(open(mf))
    for s in meta["snapshots"]:
        if s.get("sequence-number") == 3:
            s["schema-id"] = 0
    json.dump(meta, open(mf, "w"))

    rows = {
        (r["rid"], r["v"], r["g"])
        for r in ir.read_iceberg(spark, out).collect()
    }
    # rid=3 predates the delete (seq 1 < 3) — removed; the appended
    # file's rows (seq 2) survive except none match
    want = {(i, i + 100, i % 3) for i in range(20) if i != 3}
    want |= {(100 + i, i, i % 3) for i in range(5)}
    assert rows == want

    # no recorded schema-id -> unrecoverable -> honest raise
    meta = json.load(open(mf))
    for s in meta["snapshots"]:
        s.pop("schema-id", None)
    json.dump(meta, open(mf, "w"))
    with pytest.raises(ir.IcebergError, match="no schema-id"):
        ir.read_iceberg(spark, out).collect()


def test_equality_deletes_with_field_ids_compose_with_evolution(
    spark, tmp_path
):
    """r10: a REAL writer's equality delete file carries footer field
    ids — resolution binds its columns by id across the rename (the
    file here stores the OLD column name + the field id, so only
    id-binding reads it right) and the stored int upcasts through the
    promotion."""
    from arcane_framework_scala_spark.sources import iceberg_mor as im

    out = _evolved_appended_table(spark, tmp_path)
    # delete rid in {3, 101}: one pre-evolution row, one appended row
    assert (
        im.commit_equality_deletes(
            spark,
            out,
            spark.createDataFrame([(3,), (101,)], "rid long"),
            ["rid"],
        )
        == 3
    )
    # restamp the delete file as a real old-schema writer would have
    # produced it: OLD column name, stored as int, field id attached
    mf = ir.table_metadata_file(out)
    meta = json.load(open(mf))
    cur = next(
        s
        for s in meta["schemas"]
        if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
    )
    rid_fid = next(f["id"] for f in cur["fields"] if f["name"] == "rid")
    data = os.path.join(out, "data")
    eq_files = [
        n for n in os.listdir(data) if n.startswith("delete-eq-")
    ]
    assert len(eq_files) == 1
    pth = os.path.join(data, eq_files[0])
    t = pq.read_table(pth)
    t = t.rename_columns(["old_id"]).cast(
        pa.schema(
            [
                pa.field(
                    "old_id",
                    pa.int32(),
                    metadata={
                        b"PARQUET:field_id": str(rid_fid).encode()
                    },
                )
            ]
        )
    )
    os.remove(pth)
    pq.write_table(t, pth)
    rows = {
        (r["rid"], r["v"], r["g"])
        for r in ir.read_iceberg(spark, out).collect()
    }
    # strict-visibility rule: the delete (seq 3) removes STRICTLY older
    # rows — both targets predate it (seqs 1 and 2), both go
    want = {(i, i + 100, i % 3) for i in range(20) if i != 3}
    want |= {(100 + i, i, i % 3) for i in range(5) if i != 1}
    assert rows == want
    # promotion survives alongside (rid is long)
    assert dict(ir.read_iceberg(spark, out).dtypes)["rid"] == "bigint"


def test_evolved_identity_partitioned_injects_by_source_id(spark, tmp_path):
    """r10 (lifts the identity-partition evolution fence): spec fields
    keep their creation-time name, so after renaming the partition
    SOURCE column the manifest partition struct is still keyed by the
    OLD name — injection must resolve source-id -> current name. Files
    here OMIT the partition column entirely (hive-migrated layout), so
    a broken injection shows up as an all-null column, not a subtle
    skew."""
    t = SnapshotParquetTarget(
        spark, str(tmp_path / "pub"), partition_cols=["p"]
    )
    t.overwrite(
        spark.createDataFrame(
            [(i, i % 3) for i in range(12)], "v long, p long"
        )
    )
    out = str(tmp_path / "ice")
    assert ir.export_iceberg(t, out) == 1
    mf = ir.table_metadata_file(out)
    old_fields = json.load(open(mf))["schemas"][0]["fields"]
    renames = {"v": "val", "p": "bucket"}
    _evolve(
        out,
        [{**f, "name": renames.get(f["name"], f["name"])} for f in old_fields],
    )
    got = ir.read_iceberg(spark, out)
    assert sorted(got.columns) == ["bucket", "val"]
    rows = {(r["val"], r["bucket"]) for r in got.collect()}
    assert rows == {(i, i % 3) for i in range(12)}
    # and it composes with live position deletes (predicate speaks the
    # renamed partition name)
    from arcane_framework_scala_spark.sources import iceberg_mor as im

    assert im.commit_position_deletes(spark, out, "bucket = 1") == 2
    rows = {
        (r["val"], r["bucket"])
        for r in ir.read_iceberg(spark, out).collect()
    }
    assert rows == {(i, i % 3) for i in range(12) if i % 3 != 1}


def test_promoted_not_renamed_with_ids_takes_exact_stored_type(
    spark, tmp_path
):
    """r11 (ADVICE r10): the id path used to assume stored type ==
    current type whenever the footer NAME matched the current name,
    bypassing the promotion-legality check (reads only worked because
    Spark's parquet reader widens). The stored type must come from the
    footer's physical type even on a name match: a legal
    promoted-but-not-renamed column (int32 stored, long current) reads
    exactly, and an ILLEGAL narrowing (int64 stored, current int)
    raises instead of riding implicit widening."""
    out = _export(
        spark, tmp_path, [(i, i * 3) for i in range(7)], "k int, v long"
    )
    mf = ir.table_metadata_file(out)
    old_fields = json.load(open(mf))["schemas"][0]["fields"]
    ids = {f["name"]: f["id"] for f in old_fields}
    # promote k int -> long WITHOUT renaming it
    _evolve(
        out,
        [
            {**f, "type": ("long" if f["name"] == "k" else f["type"])}
            for f in old_fields
        ],
    )
    _stamp_field_ids(out, ids)
    got = ir.read_iceberg(spark, out)
    assert dict(got.dtypes)["k"] == "bigint"
    assert {(r["k"], r["v"]) for r in got.collect()} == {
        (i, i * 3) for i in range(7)
    }

    # a file whose STORED type disagrees with a clean schema history
    # (v stored as string, every schema says long — a corrupt/foreign
    # file): the history-level retype check can't see it; before the
    # fix the name-matched 'v' skipped stored-type recovery and the
    # mismatch surfaced only as a Spark runtime read error. Now it's
    # a plan-time promotion-legality raise.
    out2 = _export(
        spark,
        tmp_path / "n",
        [(i, str(i)) for i in range(4)],
        "a int, v string",
    )
    mf2 = ir.table_metadata_file(out2)
    meta2 = json.load(open(mf2))
    old2 = meta2["schemas"][0]["fields"]
    ids2 = {f["name"]: f["id"] for f in old2}
    lied = [
        {**f, "type": ("long" if f["name"] == "v" else f["type"])}
        for f in old2
    ]
    meta2["schemas"][0]["fields"] = lied
    json.dump(meta2, open(mf2, "w"))
    # rename 'a' so the evolved-resolution path engages; v stays long
    _evolve(
        out2,
        [
            {**f, "name": ("a2" if f["name"] == "a" else f["name"])}
            for f in lied
        ],
    )
    _stamp_field_ids(out2, ids2)
    with pytest.raises(ir.IcebergError, match="not a legal promotion"):
        ir.read_iceberg(spark, out2).collect()
