"""Pure-Python Avro Object Container File codec (stdlib only).

Iceberg's table metadata layer is JSON + Avro: the snapshot's manifest
LIST and every manifest file are Avro OCF. This container ships no
``spark-avro`` datasource jar and no Python avro package, so the
jar-free Iceberg reader (:mod:`iceberg_reader`) decodes them with this
module — driver-side metadata work, exactly where the real connector
does its planning. The implementation follows the public Avro 1.11
specification (container file format + binary encoding); nothing here
is Iceberg-specific, and the writer half exists so conformance tests
can build byte-real fixtures (and the Iceberg export path can emit
manifests).

Scope (everything Iceberg metadata needs, honestly fenced otherwise):

- codecs: ``null`` and ``deflate`` (raw zlib, stdlib); ``snappy``/
  ``zstandard`` RAISE — silently skipping blocks would drop manifest
  entries and resurrect deleted files downstream.
- full binary-encoding type coverage: null/boolean/int/long (zigzag
  varint), float/double (LE), bytes/string, fixed, enum, record,
  array/map (negative-count blocks included), union;
- named-type references and namespaces; logical types (decimals,
  timestamps) pass through as their raw primitive — the metadata
  layer interprets them.

Records decode to plain dicts keyed by field name (unions collapse to
the branch value, ``null`` to ``None``) — the shape the Iceberg reader
consumes. The writer mirrors: dicts in, field order from the schema,
missing nullable-union fields encode as null.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


class AvroError(ValueError):
    pass


def _fullname(schema: dict, enclosing: str | None) -> str:
    name = schema["name"]
    if "." in name:
        return name
    ns = schema.get("namespace", enclosing)
    return f"{ns}.{name}" if ns else name


# ---------------------------------------------------------------- decode


class _Decoder:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError("truncated Avro data")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 70:
                raise AvroError("varint too long")
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def value(self, schema, names: dict, enclosing: str | None = None):
        if isinstance(schema, str):
            if schema in _PRIMITIVES:
                return self._primitive(schema)
            key = schema if "." in schema else (
                f"{enclosing}.{schema}" if enclosing else schema
            )
            named = names.get(key) or names.get(schema)
            if named is None:
                raise AvroError(f"unknown named type {schema!r}")
            return self.value(named, names, enclosing)
        if isinstance(schema, list):  # union
            idx = self.long()
            if not 0 <= idx < len(schema):
                raise AvroError(f"union index {idx} out of range")
            return self.value(schema[idx], names, enclosing)
        t = schema["type"]
        if t in _PRIMITIVES:
            return self._primitive(t)
        if t == "record":
            ns = _fullname(schema, enclosing).rsplit(".", 1)
            inner = ns[0] if len(ns) == 2 else enclosing
            return {
                f["name"]: self.value(f["type"], names, inner)
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    self.long()  # block byte size (skippable reads)
                for _ in range(n):
                    out.append(self.value(schema["items"], names, enclosing))
            return out
        if t == "map":
            out = {}
            while True:
                n = self.long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    self.long()
                for _ in range(n):
                    k = self.read(self.long()).decode("utf-8")
                    out[k] = self.value(schema["values"], names, enclosing)
            return out
        if t == "enum":
            symbols = schema["symbols"]
            i = self.long()
            if not 0 <= i < len(symbols):
                raise AvroError(f"enum index {i} out of range")
            return symbols[i]
        if t == "fixed":
            return self.read(schema["size"])
        # {"type": <nested schema>} wrapper (spec-legal)
        return self.value(t, names, enclosing)

    def _primitive(self, t: str):
        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) != b"\x00"
        if t in ("int", "long"):
            return self.long()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "bytes":
            return self.read(self.long())
        if t == "string":
            return self.read(self.long()).decode("utf-8")
        raise AvroError(f"unknown primitive {t!r}")


def _collect_names(schema, names: dict, enclosing: str | None = None) -> None:
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, names, enclosing)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed"):
        full = _fullname(schema, enclosing)
        names[full] = schema
        names.setdefault(schema["name"], schema)
        inner = full.rsplit(".", 1)[0] if "." in full else enclosing
        if t == "record":
            for f in schema["fields"]:
                _collect_names(f["type"], names, inner)
    elif t == "array":
        _collect_names(schema.get("items"), names, enclosing)
    elif t == "map":
        _collect_names(schema.get("values"), names, enclosing)
    elif isinstance(t, (dict, list)):
        _collect_names(t, names, enclosing)


def read_ocf(path: str) -> tuple[dict, list]:
    """Decode an Avro Object Container File → (writer schema, records).
    Records are plain dicts/values; see the module docstring for the
    supported surface."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC:
        raise AvroError(f"{path!r} is not an Avro container file")
    d = _Decoder(data)
    d.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = d.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            d.long()
        for _ in range(n):
            k = d.read(d.long()).decode("utf-8")
            meta[k] = d.read(d.long())
    sync = d.read(SYNC_SIZE)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroError(
            f"unsupported Avro codec {codec!r} in {path!r} (null/deflate "
            "implemented; skipping blocks would drop records)"
        )
    names: dict = {}
    _collect_names(schema, names)
    records: list = []
    while d.pos < len(data):
        count = d.long()
        size = d.long()
        block = d.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bd = _Decoder(block)
        for _ in range(count):
            records.append(bd.value(schema, names))
        if d.read(SYNC_SIZE) != sync:
            raise AvroError(f"sync marker mismatch in {path!r}")
    return schema, records


#: decode cache for IMMUTABLE container files (Iceberg manifests and
#: manifest lists are content-addressed-in-practice: written once,
#: never rewritten in place) — keyed by (path, size, mtime_ns) so a
#: replaced file misses. Bounded by TOTAL cached record count, not file
#: count: one 1e5-entry manifest costs what it costs, a thousand tiny
#: manifest lists cost almost nothing.
_OCF_CACHE: dict[tuple, tuple[dict, list]] = {}
_OCF_CACHE_RECORDS = 0
_OCF_CACHE_MAX_RECORDS = 1_000_000


def read_ocf_cached(path: str) -> tuple[dict, list]:
    """:func:`read_ocf` behind an immutability-keyed cache — the
    planning hot path (r10): a snapshot's manifests are re-read on
    every plan, but a manifest FILE never changes once written, so
    per-process decode happens once and repeated planning is
    O(changed manifests), not O(all manifests). At 1e5 entries one
    decode is ~2.8 s of pure-python Avro (measured,
    ``scripts/measure_scale_postures.py``); the cache is what makes
    that a one-time cost. CALLERS MUST NOT MUTATE the returned schema
    or records — they are shared across calls (every current caller
    reads them or copies into fresh dicts; keep it that way)."""
    global _OCF_CACHE_RECORDS
    st = os.stat(path)
    key = (path, st.st_size, st.st_mtime_ns)
    hit = _OCF_CACHE.get(key)
    if hit is not None:
        return hit
    out = read_ocf(path)
    n = len(out[1])
    if n <= _OCF_CACHE_MAX_RECORDS:
        while (
            _OCF_CACHE_RECORDS + n > _OCF_CACHE_MAX_RECORDS and _OCF_CACHE
        ):
            oldest = next(iter(_OCF_CACHE))  # FIFO eviction
            _s, evicted = _OCF_CACHE.pop(oldest)
            _OCF_CACHE_RECORDS -= len(evicted)
        _OCF_CACHE[key] = out
        _OCF_CACHE_RECORDS += n
    return out


# ---------------------------------------------------------------- encode


class _Encoder:
    def __init__(self):
        self.out = io.BytesIO()

    def write(self, b: bytes) -> None:
        self.out.write(b)

    def long(self, v: int) -> None:
        v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1 | 1)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.write(bytes([b | 0x80]))
            else:
                self.out.write(bytes([b]))
                return

    def value(self, schema, v, names: dict, enclosing: str | None = None):
        if isinstance(schema, str):
            if schema in _PRIMITIVES:
                return self._primitive(schema, v)
            key = schema if "." in schema else (
                f"{enclosing}.{schema}" if enclosing else schema
            )
            named = names.get(key) or names.get(schema)
            if named is None:
                raise AvroError(f"unknown named type {schema!r}")
            return self.value(named, v, names, enclosing)
        if isinstance(schema, list):  # union: first branch accepting v
            for i, branch in enumerate(schema):
                if _accepts(branch, v, names):
                    self.long(i)
                    return self.value(branch, v, names, enclosing)
            raise AvroError(f"no union branch of {schema} accepts {v!r}")
        t = schema["type"]
        if t in _PRIMITIVES:
            return self._primitive(t, v)
        if t == "record":
            ns = _fullname(schema, enclosing).rsplit(".", 1)
            inner = ns[0] if len(ns) == 2 else enclosing
            for f in schema["fields"]:
                self.value(f["type"], (v or {}).get(f["name"]), names, inner)
            return
        if t == "array":
            if v:
                self.long(len(v))
                for item in v:
                    self.value(schema["items"], item, names, enclosing)
            self.long(0)
            return
        if t == "map":
            if v:
                self.long(len(v))
                for k, item in v.items():
                    self._primitive("string", k)
                    self.value(schema["values"], item, names, enclosing)
            self.long(0)
            return
        if t == "enum":
            self.long(schema["symbols"].index(v))
            return
        if t == "fixed":
            if len(v) != schema["size"]:
                raise AvroError(
                    f"fixed size mismatch: {len(v)} != {schema['size']}"
                )
            self.write(v)
            return
        return self.value(t, v, names, enclosing)

    def _primitive(self, t: str, v):
        if t == "null":
            return
        if t == "boolean":
            self.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            self.long(int(v))
        elif t == "float":
            self.write(struct.pack("<f", v))
        elif t == "double":
            self.write(struct.pack("<d", v))
        elif t == "bytes":
            self.long(len(v))
            self.write(bytes(v))
        elif t == "string":
            b = v.encode("utf-8")
            self.long(len(b))
            self.write(b)
        else:
            raise AvroError(f"unknown primitive {t!r}")


def _accepts(branch, v, names: dict) -> bool:
    """Union-branch dispatch for the writer (dict records in, so the
    check is structural)."""
    t = branch if isinstance(branch, str) else branch.get("type")
    if t == "null":
        return v is None
    if v is None:
        return False
    if t == "boolean":
        return isinstance(v, bool)
    if t in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if t in ("float", "double"):
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "string":
        return isinstance(v, str)
    if t in ("bytes", "fixed"):
        return isinstance(v, (bytes, bytearray))
    if t == "record":
        return isinstance(v, dict)
    if t == "array":
        return isinstance(v, list)
    if t == "map":
        return isinstance(v, dict)
    if t == "enum":
        return isinstance(v, str)
    if isinstance(branch, str):  # named-type reference
        named = names.get(branch)
        return named is not None and _accepts(named, v, names)
    return True


def write_ocf(
    path: str,
    schema: dict,
    records: list,
    codec: str = "deflate",
    extra_meta: dict[str, str] | None = None,
) -> None:
    """Encode ``records`` (dicts/values matching ``schema``) as an Avro
    OCF. One block; the sync marker derives deterministically from the
    schema so repeated writes are byte-identical (determinism rules,
    docs/DETERMINISM.md). ``extra_meta`` adds file-metadata key/values
    beyond avro.schema/avro.codec (Iceberg manifests require
    schema/partition-spec/format-version/content keys). Atomic via
    tmp+rename."""
    import hashlib

    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported write codec {codec!r}")
    names: dict = {}
    _collect_names(schema, names)
    body = _Encoder()
    for r in records:
        body.value(schema, r, names)
    payload = body.out.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()
    head = _Encoder()
    head.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
        **{k: v.encode() for k, v in (extra_meta or {}).items()},
    }
    head.long(len(meta))
    for k, v in meta.items():
        head._primitive("string", k)
        head.long(len(v))
        head.write(v)
    head.long(0)
    sync = hashlib.md5(meta["avro.schema"] + meta["avro.codec"]).digest()
    head.write(sync)
    if records:
        head.long(len(records))
        head.long(len(payload))
        head.write(payload)
        head.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(head.out.getvalue())
    os.replace(tmp, path)
