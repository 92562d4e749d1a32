"""Iceberg partition TRANSFORMS, jar-free: spec-exact ``bucket[N]`` /
``truncate[W]`` / ``year``/``month``/``day``/``hour`` — the hidden
partitioning that makes Iceberg layouts prunable without exposing
derived columns to queries (public spec, "Partition Transforms" +
Appendix B "32-bit Hash Requirements").

Three layers:

- SCALAR transforms (:func:`transform_value`) — driver-side, used by
  the planner to turn a probe/range on the SOURCE column into a
  predicate on the manifest's derived partition values:
  * bucket: Murmur3-x86-32, seed 0, over Appendix-B byte forms
    (int/long/date/timestamp hash their 8-byte little-endian LONG
    form; strings hash UTF-8) — pinned against the spec's own test
    vectors in tests;
  * truncate: floored for integers (works for negatives), codepoint
    prefix for strings — ORDER-PRESERVING, so ranges prune;
  * temporal: epoch days/hours/months/years — order-preserving.
- COLUMN transforms (:func:`transform_col`) — the same functions over
  a DataFrame column for the WRITER: temporal + truncate stay
  JVM-side (built-in functions, codegen); bucket needs the spec's
  murmur3, which Spark's ``hash()`` is NOT (seed 42, different byte
  widths), so it rides a vectorized Arrow ``pandas_udf`` — numpy
  uint32 lane arithmetic for integral types (the 8-byte form has two
  blocks and no tail, fully vectorizable), per-row UTF-8 for strings.
- WRITER (:func:`write_iceberg_partitioned`) — creates a NEW Iceberg
  table from a DataFrame under a transform spec: derived values are
  computed once at write, files land per partition tuple via Spark's
  ``partitionBy`` on the derived columns (so data files keep the
  SOURCE columns and omit the derived ones, exactly the connector
  layout), and the manifest's ``r102`` struct carries the typed
  derived values the planner prunes on.

Scale: bucket pruning turns a point lookup on a 100 TB table into a
scan of 1/N of its files with zero data reorganization visible to the
query; temporal+truncate pruning does the same for ranges. All
pruning is driver-side manifest metadata, same as the real planner.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid as uuid_mod
import hashlib
import re
import time
from datetime import date, datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from arcane_framework_scala_spark.sources import avro_ocf
from arcane_framework_scala_spark.sources import iceberg_reader as ir

_EPOCH_DATE = date(1970, 1, 1)
_TRANSFORM_RE = re.compile(r"^(bucket|truncate)\[(\d+)\]$")


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Murmur3 x86 32-bit (public-domain algorithm), unsigned result —
    the hash the Iceberg spec mandates for bucket transforms."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n4 = len(data) // 4
    for i in range(n4):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[4 * n4 :]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _bucket_bytes(v, ice_type: str) -> bytes:
    """Appendix-B byte form: every integral/temporal type hashes as its
    8-byte little-endian LONG value (so int 34 and long 34 agree);
    strings hash raw UTF-8."""
    if ice_type in ("int", "long"):
        return int(v).to_bytes(8, "little", signed=True)
    if ice_type == "date":
        d = v if isinstance(v, date) and not isinstance(v, datetime) else v.date()
        return (d - _EPOCH_DATE).days.to_bytes(8, "little", signed=True)
    if ice_type in ("timestamp", "timestamptz"):
        return _epoch_micros(v).to_bytes(8, "little", signed=True)
    if ice_type == "string":
        return str(v).encode("utf-8")
    raise ir.IcebergError(f"bucket transform unsupported for {ice_type!r}")


def _epoch_micros(v) -> int:
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return int(v.timestamp() * 1_000_000)
    return int(v)


def bucket_value(v, n: int, ice_type: str) -> int | None:
    if v is None:
        return None
    return (murmur3_32(_bucket_bytes(v, ice_type)) & 0x7FFFFFFF) % n


def truncate_value(v, w: int, ice_type: str):
    if v is None:
        return None
    if ice_type in ("int", "long"):
        return int(v) - (int(v) % w)  # python % is floored: negatives OK
    if ice_type == "string":
        return str(v)[:w]
    raise ir.IcebergError(f"truncate transform unsupported for {ice_type!r}")


def _as_datetime(v) -> datetime:
    if isinstance(v, datetime):
        return v
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day)
    raise ir.IcebergError(f"temporal transform needs a datetime, got {v!r}")


def temporal_value(v, unit: str) -> int | None:
    """Epoch-relative ordinal per the spec: years/months since 1970,
    days since epoch, hours since epoch."""
    if v is None:
        return None
    dt = _as_datetime(v)
    if unit == "year":
        return dt.year - 1970
    if unit == "month":
        return (dt.year - 1970) * 12 + (dt.month - 1)
    if unit == "day":
        return (dt.date() - _EPOCH_DATE).days
    if unit == "hour":
        days = (dt.date() - _EPOCH_DATE).days
        return days * 24 + dt.hour
    raise ir.IcebergError(f"unknown temporal transform {unit!r}")


def transform_value(transform: str, v, ice_type: str):
    """Apply a spec transform string to a scalar (planner side)."""
    if transform == "identity":
        return v
    m = _TRANSFORM_RE.match(transform)
    if m:
        f, arg = m.group(1), int(m.group(2))
        if f == "bucket":
            return bucket_value(v, arg, ice_type)
        return truncate_value(v, arg, ice_type)
    if transform in ("year", "month", "day", "hour"):
        return temporal_value(v, transform)
    raise ir.IcebergError(f"unknown transform {transform!r}")


def is_order_preserving(transform: str) -> bool:
    """Order-preserving transforms admit RANGE pruning; bucket admits
    point pruning only."""
    return transform == "identity" or transform in (
        "year", "month", "day", "hour"
    ) or transform.startswith("truncate[")


def _bucket_long_col(col, n: int):
    """Vectorized spec-murmur3 bucket over an integral column: the
    8-byte LE form has exactly two 4-byte blocks and no tail, so the
    whole mix runs as numpy uint32 lane arithmetic per Arrow batch."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    def _kernel(s: pd.Series) -> pd.Series:
        mask = s.isna()
        vals = s.fillna(0).astype("int64").to_numpy()
        x = vals.view(np.uint64)
        k1 = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        k2 = (x >> np.uint64(32)).astype(np.uint32)
        h = np.zeros(len(vals), dtype=np.uint32)
        for k in (k1, k2):
            k = k * np.uint32(0xCC9E2D51)
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * np.uint32(0x1B873593)
            h = h ^ k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h = h ^ np.uint32(8)
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
        out = ((h & np.uint32(0x7FFFFFFF)) % np.uint32(n)).astype("int64")
        res = pd.Series(out, index=s.index).astype("Int64")
        res[mask] = pd.NA
        return res

    _kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf("int")(_kernel)(col)


def _bucket_string_col(col, n: int):
    import pandas as pd
    import pyspark.sql.functions as F

    def _kernel(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else (murmur3_32(str(v).encode("utf-8")) & 0x7FFFFFFF) % n
        ).astype("Int64")

    _kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf("int")(_kernel)(col)


def transform_col(transform: str, col, ice_type: str):
    """The column form of :func:`transform_value` — JVM-side built-ins
    wherever the semantics allow (truncate, temporal), Arrow-vectorized
    murmur3 for bucket."""
    import pyspark.sql.functions as F

    if transform == "identity":
        return col
    m = _TRANSFORM_RE.match(transform)
    if m:
        f, arg = m.group(1), int(m.group(2))
        if f == "bucket":
            if ice_type in ("int", "long"):
                return _bucket_long_col(col, arg)
            if ice_type == "date":
                return _bucket_long_col(
                    F.datediff(col, F.lit("1970-01-01")).cast("long"), arg
                )
            if ice_type in ("timestamp", "timestamptz"):
                # epoch micros; NTZ casts through session TZ (pinned UTC
                # by get_session), matching the scalar twin's UTC rule
                return _bucket_long_col(
                    F.unix_micros(col.cast("timestamp")), arg
                )
            if ice_type == "string":
                return _bucket_string_col(col, arg)
            raise ir.IcebergError(f"bucket unsupported for {ice_type!r}")
        # truncate
        if ice_type in ("int", "long"):
            w = F.lit(arg)
            return (col - ((col % w) + w) % w).cast(
                "int" if ice_type == "int" else "long"
            )
        if ice_type == "string":
            return F.substring(col, 1, arg)
        raise ir.IcebergError(f"truncate unsupported for {ice_type!r}")
    if transform in ("year", "month", "day", "hour"):
        if transform == "year":
            return (F.year(col) - F.lit(1970)).cast("int")
        if transform == "month":
            return (
                (F.year(col) - F.lit(1970)) * F.lit(12)
                + F.month(col)
                - F.lit(1)
            ).cast("int")
        days = F.datediff(col.cast("date"), F.lit("1970-01-01"))
        if transform == "day":
            return days.cast("int")
        return (days.cast("long") * F.lit(24) + F.hour(col)).cast("int")
    raise ir.IcebergError(f"unknown transform {transform!r}")


# ------------------------------------------------------------- writer


def write_iceberg_partitioned(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    spec: list[tuple[str, str]],
) -> int:
    """Create a NEW format-version-2 Iceberg table from ``df`` under a
    transform partition ``spec`` (``[(source_col, transform), ...]``).
    Derived partition values are computed ONCE at write; data files
    keep every source column (hidden partitioning — queries never see
    the derived values), and each file's typed derived tuple lands in
    the manifest for planner pruning. Returns sequence number 1."""
    import pyspark.sql.functions as F

    if os.path.exists(os.path.join(out_dir, "metadata")):
        raise ir.IcebergError(
            f"{out_dir}: table exists — this writer creates new tables; "
            "append through iceberg_mor.append_rows"
        )
    schema_fields = []
    for i, f in enumerate(df.schema.fields, start=1):
        schema_fields.append(
            {
                "id": i,
                "name": f.name,
                "required": not f.nullable,
                "type": ir._iceberg_type(f.dataType),
            }
        )
    schema_obj = {"type": "struct", "schema-id": 0, "fields": schema_fields}
    fid_of = {f["name"]: f["id"] for f in schema_fields}
    type_of = {f["name"]: f["type"] for f in schema_fields}

    part_names: list[str] = []
    spec_fields = []
    part_schema_fields = []
    derived = df
    for i, (src, transform) in enumerate(spec):
        if src not in fid_of:
            raise ir.IcebergError(f"partition source {src!r} not in schema")
        suffix = (
            transform.split("[")[0] if "[" in transform else transform
        )
        name = src if transform == "identity" else f"{src}_{suffix}"
        part_names.append(name)
        out_type = _result_type(transform, type_of[src])
        spec_fields.append(
            {
                "name": name,
                "transform": transform,
                "source-id": fid_of[src],
                "field-id": 1000 + i,
            }
        )
        part_schema_fields.append((name, out_type, 1000 + i))
        derived = derived.withColumn(
            f"__part_{name}",
            transform_col(transform, F.col(src), type_of[src]),
        )

    stage = os.path.join(out_dir, ".stage-create")
    shutil.rmtree(stage, ignore_errors=True)
    derived.write.partitionBy(
        *[f"__part_{n}" for n in part_names]
    ).parquet(stage)

    data_dir = os.path.join(out_dir, "data")
    md = os.path.join(out_dir, "metadata")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(md, exist_ok=True)

    seq = 1
    snap_id = int(
        hashlib.md5(f"{out_dir}-{seq}".encode()).hexdigest()[:15], 16
    )
    entries = []
    added_rows = 0
    i = 0
    for root, _dirs, files in sorted(os.walk(stage)):
        for fname in sorted(files):
            if not fname.endswith(".parquet"):
                continue
            src_path = os.path.join(root, fname)
            rows = ir._parquet_row_count(src_path)
            if rows == 0:
                continue
            rel_dir = os.path.relpath(root, stage)
            part_values: dict[str, object] = {}
            for seg in rel_dir.split(os.sep) if rel_dir != "." else []:
                k, _, val = seg.partition("=")
                k = k.removeprefix("__part_")
                tnum = dict(
                    (n, t) for n, t, _ in part_schema_fields
                ).get(k)
                if val == "__HIVE_DEFAULT_PARTITION__":
                    part_values[k] = None
                elif tnum in ("int", "long"):
                    part_values[k] = int(val)
                else:
                    from urllib.parse import unquote

                    part_values[k] = unquote(val)
            rel = f"data/pt-{snap_id:x}-{i:05d}.parquet"
            i += 1
            dst = os.path.join(out_dir, rel)
            os.replace(src_path, dst)
            lower, upper = ir._footer_bounds(dst, schema_obj)
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    "sequence_number": seq,
                    "file_sequence_number": seq,
                    "data_file": {
                        "content": 0,
                        "file_path": "file://" + dst,
                        "file_format": "PARQUET",
                        "partition": part_values,
                        "record_count": rows,
                        "file_size_in_bytes": os.path.getsize(dst),
                        "lower_bounds": lower or None,
                        "upper_bounds": upper or None,
                    },
                }
            )
            added_rows += rows
    shutil.rmtree(stage, ignore_errors=True)

    manifest_rel = f"metadata/m-{snap_id:x}-{seq}.avro"
    manifest_abs = os.path.join(out_dir, manifest_rel)
    avro_ocf.write_ocf(
        manifest_abs,
        ir._manifest_entry_schema(part_schema_fields),
        entries,
        extra_meta={
            "schema": json.dumps(schema_obj),
            "partition-spec": json.dumps(spec_fields),
            "partition-spec-id": "0",
            "format-version": "2",
            "content": "data",
        },
    )
    now_ms = int(time.time() * 1000)
    ml_rel = f"metadata/snap-{snap_id}-{seq}.avro"
    avro_ocf.write_ocf(
        os.path.join(out_dir, ml_rel),
        ir.MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": "file://" + manifest_abs,
                "manifest_length": os.path.getsize(manifest_abs),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snap_id,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": added_rows,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": ir._partition_summaries(
                    entries, part_schema_fields
                ),
            }
        ],
        extra_meta={"format-version": "2"},
    )
    meta = {
        "format-version": 2,
        "table-uuid": str(
            uuid_mod.UUID(hashlib.md5(out_dir.encode()).hexdigest())
        ),
        "location": out_dir,
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": schema_fields[-1]["id"],
        "current-schema-id": 0,
        "schemas": [schema_obj],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": 999 + len(spec),
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": snap_id,
        "snapshots": [
            {
                "snapshot-id": snap_id,
                "sequence-number": seq,
                "timestamp-ms": now_ms,
                "manifest-list": "file://" + os.path.join(out_dir, ml_rel),
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
        "snapshot-log": [{"timestamp-ms": now_ms, "snapshot-id": snap_id}],
        "metadata-log": [],
    }
    ir.write_metadata(out_dir, meta)
    return seq


def _result_type(transform: str, src_type: str) -> str:
    if transform == "identity":
        return src_type
    if transform.startswith("bucket["):
        return "int"
    if transform.startswith("truncate["):
        return src_type
    return "int"  # temporal ordinals
