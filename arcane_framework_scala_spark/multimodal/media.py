"""Multimodal columns: opaque binary media + typed metadata at 100 TB scale.

Design (beyond-reference surface, BASELINE.json north star):

- media travels as an opaque ``binary`` column plus a typed metadata struct
  (``MEDIA_META_SCHEMA``) — Spark never interprets the bytes, so parquet
  stores them as-is and column pruning keeps them out of every query that
  doesn't touch them;
- decode / feature-extract / resize / frame-sample run as **Arrow-batched
  ``mapInPandas``** transforms: bytes stream executor-side in columnar
  batches, nothing ever collects to the driver, and per-batch Python cost
  amortizes over ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows;
- partitioning guidance: media rows are wide (MBs per cell) — size
  ``maxRecordsPerBatch`` down (e.g. 64) and ``files.maxPartitionBytes`` up
  so a task holds a bounded number of cells in flight.

Codec reality: this container has no image/audio libraries, so the pixel
decoders are **stubbed** — ``_decode_image`` raises ``NotImplementedError``
unless a real decoder (PIL) is importable, and every transform accepts
``decoder="fake"`` to run a deterministic byte-derived fake (md5-seeded
dimensions) so the Spark-side plumbing — schema, batch shape, UDF
signature, explode semantics — is fully real and fully tested. Swapping in
a real codec changes one function, not the plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: typed metadata carried alongside every media cell
MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def attach_media(
    df: DataFrame,
    bytes_col,
    mime: str = "application/octet-stream",
    media_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Wrap a binary column into the (media, media_meta) convention.
    Metadata fields unknown at ingest stay null; decoders fill them."""
    b = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    return df.withColumn(media_col, b.cast(BinaryType())).withColumn(
        meta_col,
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast(IntegerType()).alias("width"),
            F.lit(None).cast(IntegerType()).alias("height"),
            F.lit(None).cast(LongType()).alias("duration_ms"),
        ),
    )


# ---------------------------------------------------------------------------
# Decoders: real behind import-guard, deterministic fake for plumbing tests
# ---------------------------------------------------------------------------


def _fake_dims(content: bytes) -> tuple[int, int]:
    """Deterministic pseudo-dimensions from the content digest — the fake
    'decode'. Reproducible in any SQL engine: width = 1 + (first 8 md5 hex
    digits as int) % 1024, height = 1 + (next 8) % 1024."""
    d = hashlib.md5(content).hexdigest()
    return 1 + int(d[:8], 16) % 1024, 1 + int(d[8:16], 16) % 1024


def _decode_image(content: bytes, decoder: str):
    if decoder == "fake":
        w, h = _fake_dims(content)
        return {"width": w, "height": h}
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency
        import io
    except ImportError as e:  # pragma: no cover — PIL absent in container
        raise NotImplementedError(
            "real image decoding needs PIL; pass decoder='fake' for the "
            "deterministic stub"
        ) from e
    img = Image.open(io.BytesIO(content))  # pragma: no cover
    return {"width": img.width, "height": img.height}  # pragma: no cover


def _fake_audio(content: bytes) -> dict:
    """Deterministic pseudo audio properties from the content digest
    (same reproducible-in-SQL convention as :func:`_fake_dims`):
    sample_rate picked from 5 standard rates by digest, duration up to
    10 min, 1-2 channels."""
    d = hashlib.md5(content).hexdigest()
    rates = (8000, 16000, 22050, 44100, 48000)
    return {
        "sample_rate": rates[int(d[:8], 16) % 5],
        "duration_ms": 1 + int(d[8:16], 16) % 600_000,
        "channels": 1 + int(d[16:24], 16) % 2,
    }


def _decode_audio(content: bytes, decoder: str) -> dict:
    """Unlike image decode, the real WAV path needs only stdlib
    ``wave`` — actually runnable in this container on real RIFF/WAVE
    bytes; non-WAV codecs would need soundfile/ffmpeg and raise."""
    if decoder == "fake":
        return _fake_audio(content)
    import io
    import wave

    try:
        with wave.open(io.BytesIO(content)) as w:
            rate = w.getframerate()
            return {
                "sample_rate": rate,
                "duration_ms": (w.getnframes() * 1000) // max(rate, 1),
                "channels": w.getnchannels(),
            }
    except (wave.Error, EOFError) as e:
        # wave.open raises EOFError (not wave.Error) on empty/truncated
        # bytes — both mean "not decodable WAV"
        raise NotImplementedError(
            "real audio decoding covers WAV via stdlib wave; other codecs "
            "need soundfile/ffmpeg (absent here) — pass decoder='fake' "
            "for the deterministic stub"
        ) from e


# ---------------------------------------------------------------------------
# Feature extraction (mapInPandas)
# ---------------------------------------------------------------------------

_FEATURES_SCHEMA_SUFFIX = [
    StructField("n_bytes", LongType()),
    StructField("digest", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
]


def image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    decoder: str = "fake",
) -> DataFrame:
    """(id, n_bytes, digest, width, height) via Arrow-batched mapInPandas.

    The UDF sees pandas batches of raw bytes — exactly the shape a real
    decoder needs; per-cell Python cost is the decode itself, batch
    transfer is Arrow (no per-row pickling)."""
    out_schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType), *_FEATURES_SCHEMA_SUFFIX]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_image(c, decoder) for c in pdf[media_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [len(c) for c in pdf[media_col]],
                    "digest": [hashlib.md5(c).hexdigest() for c in pdf[media_col]],
                    "width": [d["width"] for d in dims],
                    "height": [d["height"] for d in dims],
                }
            )

    return df.select(id_col, media_col).mapInPandas(extract, out_schema)


def audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    decoder: str = "fake",
) -> DataFrame:
    """(id, n_bytes, digest, sample_rate, duration_ms, channels) via
    Arrow-batched ``mapInPandas`` — the audio sibling of
    :func:`image_features`, same batch shape and scale posture."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("n_bytes", LongType()),
            StructField("digest", StringType()),
            StructField("sample_rate", IntegerType()),
            StructField("duration_ms", LongType()),
            StructField("channels", IntegerType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            props = [_decode_audio(c, decoder) for c in pdf[media_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [len(c) for c in pdf[media_col]],
                    "digest": [hashlib.md5(c).hexdigest() for c in pdf[media_col]],
                    "sample_rate": [p["sample_rate"] for p in props],
                    "duration_ms": [p["duration_ms"] for p in props],
                    "channels": [p["channels"] for p in props],
                }
            )

    return df.select(id_col, media_col).mapInPandas(extract, out_schema)


def resize_images(
    df: DataFrame,
    max_side: int = 256,
    id_col: str = "doc_id",
    media_col: str = "media",
    decoder: str = "fake",
) -> DataFrame:
    """(id, media, width, height) with dimensions clamped so the longer
    side ≤ ``max_side`` (aspect preserved, integer floor). The fake decoder
    passes bytes through unchanged; a real decoder would re-encode."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField(media_col, BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for c in pdf[media_col]:
                d = _decode_image(c, decoder)
                w, h = d["width"], d["height"]
                scale = max_side / max(w, h)
                if scale < 1:
                    w, h = int(w * scale), int(h * scale)
                rows.append((w, h))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    media_col: pdf[media_col],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                }
            )

    return df.select(id_col, media_col).mapInPandas(resize, out_schema)


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Video-style frame sampling: one output row per sampled frame.

    (id, frame_index, frame_offset, frame_digest) — the fake 'frame' is the
    16-byte window at each offset; a real implementation would hand offsets
    to a container demuxer. Demonstrates the 1→N mapInPandas explode shape
    (output batches need not align with input rows)."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("frame_index", IntegerType()),
            StructField("frame_offset", LongType()),
            StructField("frame_digest", StringType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, digs = [], [], [], []
            for mid, c in zip(pdf[id_col], pdf[media_col]):
                n = min(max_frames, max(len(c) // every_n_bytes, 1))
                for i in range(n):
                    off = i * every_n_bytes
                    ids.append(mid)
                    idxs.append(i)
                    offs.append(off)
                    digs.append(hashlib.md5(c[off : off + 16]).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                    "frame_digest": digs,
                }
            )

    return df.select(id_col, media_col).mapInPandas(sample, out_schema)


def audio_segments(
    df: DataFrame,
    segment_ms: int = 250,
    id_col: str = "doc_id",
    media_col: str = "media",
    decoder: str = "fake",
) -> DataFrame:
    """Split audio into fixed-duration segments (the ASR/feature-window
    preprocessing step): one output row per segment with EXACT integer
    energy accumulators — (id, seg_idx, start_ms, n_samples, sum_sq).
    RMS = sqrt(sum_sq / n_samples) at the consumer; keeping the
    accumulators integral makes the distributed result bit-reproducible
    (float RMS would inherit sqrt/avg rounding).

    ``decoder="real"`` decodes RIFF/WAVE via stdlib ``wave`` (16-bit PCM;
    multi-channel takes channel 0) — actually runnable here, no external
    codec libs. ``decoder="fake"`` derives deterministic pseudo-segments
    from the content digest for non-WAV bytes.

    Same 1→N Arrow ``mapInPandas`` shape as :func:`frame_sample`; only
    (id, media) columns reach Python (column pruning keeps the rest of
    the row JVM-side), batches stream, no per-doc state."""
    import numpy as np

    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("seg_idx", IntegerType()),
            StructField("start_ms", LongType()),
            StructField("n_samples", LongType()),
            StructField("sum_sq", LongType()),
        ]
    )

    def _segments_real(content: bytes):
        import io
        import wave

        with wave.open(io.BytesIO(content)) as w:
            if w.getsampwidth() != 2:
                raise NotImplementedError(
                    "real audio segmentation covers 16-bit PCM WAV"
                )
            rate = w.getframerate()
            ch = w.getnchannels()
            raw = w.readframes(w.getnframes())
        x = np.frombuffer(raw, dtype="<i2").astype(np.int64)
        if ch > 1:
            x = x[::ch]  # channel 0
        per = max((rate * segment_ms) // 1000, 1)
        for s in range(0, max(len(x), 1), per):
            seg = x[s : s + per]
            yield (
                s // per,
                (s // per) * segment_ms,
                int(len(seg)),
                int((seg * seg).sum()) if len(seg) else 0,
            )

    def _segments_fake(content: bytes):
        d = hashlib.md5(content).hexdigest()
        n_segs = 1 + int(d[:8], 16) % 8
        for s in range(n_segs):
            h = int(hashlib.md5(f"{d}:{s}".encode()).hexdigest()[:12], 16)
            yield (s, s * segment_ms, 1 + h % 2000, h % 10**12)

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gen = _segments_real if decoder == "real" else _segments_fake
        for pdf in batches:
            ids, idxs, starts, ns, sqs = [], [], [], [], []
            for mid, c in zip(pdf[id_col], pdf[media_col]):
                for seg_idx, start, n, sq in gen(bytes(c)):
                    ids.append(mid)
                    idxs.append(seg_idx)
                    starts.append(start)
                    ns.append(n)
                    sqs.append(sq)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "seg_idx": pd.Series(idxs, dtype="int32"),
                    "start_ms": pd.Series(starts, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sum_sq": pd.Series(sqs, dtype="int64"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(split, out_schema)


#: (label, magic-byte hex prefix) — checked in order
_MAGIC: tuple[tuple[str, str], ...] = (
    ("png", "89504E47"),
    ("jpeg", "FFD8FF"),
    ("riff", "52494646"),  # WAV/AVI container
    ("gif", "47494638"),
    ("pdf", "25504446"),
)


def sniff_media_type(media_col: str = "media"):
    """Magic-byte container sniffing as a pure JVM expression (hex of
    the first 4 bytes against known signatures) — the ingest guardrail
    that routes/filters binary columns BEFORE any Python decoder runs.
    Zero UDFs, zero shuffles; composes into the scan projection."""
    import pyspark.sql.functions as F

    head = F.upper(F.hex(F.substring(F.col(media_col), 1, 4)))
    expr = None
    for label, magic in _MAGIC:
        cond = head.startswith(magic)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise("unknown")
