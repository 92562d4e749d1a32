"""Multimodal plumbing tests: schema, Arrow batch shapes, stub gating."""

import hashlib

import pyspark.sql.functions as F
import pytest

from arcane_framework_scala_spark.multimodal import (
    MEDIA_META_SCHEMA,
    attach_media,
    frame_sample,
    image_features,
    resize_images,
)
from arcane_framework_scala_spark.multimodal.media import _decode_image, _fake_dims


@pytest.fixture()
def media_df(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    return attach_media(docs, F.encode(F.col("text"), "UTF-8"), mime="image/fake")


def test_attach_media_schema(media_df):
    assert media_df.schema["media"].dataType.typeName() == "binary"
    meta = media_df.schema["media_meta"].dataType
    assert [f.name for f in meta.fields] == [f.name for f in MEDIA_META_SCHEMA.fields]
    row = media_df.select("media_meta").first()
    assert row["media_meta"]["mime"] == "image/fake"
    assert row["media_meta"]["width"] is None


def test_image_features_matches_python_reference(media_df):
    rows = image_features(media_df, decoder="fake").collect()
    assert len(rows) == 50
    src = {r["doc_id"]: r["text"] for r in media_df.select("doc_id", "text").collect()}
    for r in rows:
        content = src[r["doc_id"]].encode()
        assert r["n_bytes"] == len(content)
        assert r["digest"] == hashlib.md5(content).hexdigest()
        assert (r["width"], r["height"]) == _fake_dims(content)


def test_resize_clamps_long_side(media_df):
    out = resize_images(media_df, max_side=64, decoder="fake").collect()
    for r in out:
        assert max(r["width"], r["height"]) <= 64
        assert r["media"] is not None  # bytes pass through the stub


def test_frame_sample_explodes_per_frame(media_df):
    out = frame_sample(media_df, every_n_bytes=100, max_frames=4)
    rows = out.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    lens = {
        r["doc_id"]: len(r["text"].encode())
        for r in media_df.select("doc_id", "text").collect()
    }
    for doc_id, frames in per_doc.items():
        expected = min(4, max(lens[doc_id] // 100, 1))
        assert len(frames) == expected
        assert sorted(f["frame_index"] for f in frames) == list(range(expected))
        for f in frames:
            assert f["frame_offset"] == f["frame_index"] * 100


def test_real_decoder_is_gated():
    with pytest.raises(NotImplementedError):
        _decode_image(b"not-an-image", decoder="real")


def test_audio_features_fake_matches_python_reference(media_df):
    import hashlib

    from arcane_framework_scala_spark.multimodal import audio_features

    rows = audio_features(media_df, id_col="doc_id", decoder="fake").collect()
    raw = {r.doc_id: r.media for r in media_df.select("doc_id", "media").collect()}
    rates = (8000, 16000, 22050, 44100, 48000)
    for r in rows:
        d = hashlib.md5(raw[r.doc_id]).hexdigest()
        assert r.n_bytes == len(raw[r.doc_id])
        assert r.digest == d
        assert r.sample_rate == rates[int(d[:8], 16) % 5]
        assert r.duration_ms == 1 + int(d[8:16], 16) % 600_000
        assert r.channels == 1 + int(d[16:24], 16) % 2


def test_audio_real_decoder_reads_wav(spark):
    import io
    import struct
    import wave as wave_mod

    from arcane_framework_scala_spark.multimodal import attach_media, audio_features

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack("<8000h", *([0] * 8000)))  # 4000 stereo frames
    df = attach_media(
        spark.createDataFrame([(1, buf.getvalue())], "doc_id long, raw binary"),
        "raw",
        mime="audio/wav",
    )
    row = audio_features(df, id_col="doc_id", decoder="real").first()
    assert row.sample_rate == 16000
    assert row.channels == 2
    assert row.duration_ms == 4000 * 1000 // 16000


def test_audio_real_decoder_rejects_non_wav():
    from arcane_framework_scala_spark.multimodal.media import _decode_audio

    with pytest.raises(NotImplementedError):
        _decode_audio(b"not-a-riff-container", decoder="real")


def test_audio_segments_real_wav_exact_energy(spark):
    """Real stdlib-wave decode: a synthesized 16-bit PCM WAV splits into
    250 ms windows whose integer sum-of-squares match numpy ground truth;
    the trailing partial segment keeps its short length."""
    import io
    import wave

    import numpy as np

    from arcane_framework_scala_spark.multimodal import audio_segments

    rate, n = 8000, 4500  # 2 full 250ms segments (2000 samples) + 500
    x = (np.arange(n, dtype=np.int64) * 31 % 65536) - 32768
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.astype("<i2").tobytes())
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                               "doc_id long, media binary")
    rows = sorted(
        audio_segments(df, segment_ms=250, decoder="real").collect(),
        key=lambda r: r["seg_idx"],
    )
    assert [r["n_samples"] for r in rows] == [2000, 2000, 500]
    assert [r["start_ms"] for r in rows] == [0, 250, 500]
    for r in rows:
        lo, hi = r["seg_idx"] * 2000, r["seg_idx"] * 2000 + r["n_samples"]
        assert r["sum_sq"] == int((x[lo:hi] ** 2).sum())


def test_audio_segments_stereo_takes_channel_zero(spark):
    import io
    import wave

    import numpy as np

    from arcane_framework_scala_spark.multimodal import audio_segments

    left = np.full(1000, 100, dtype=np.int64)
    right = np.full(1000, 7, dtype=np.int64)
    inter = np.empty(2000, dtype=np.int64)
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(inter.astype("<i2").tobytes())
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                               "doc_id long, media binary")
    row = audio_segments(df, segment_ms=250, decoder="real").first()
    assert row["n_samples"] == 1000
    assert row["sum_sq"] == 1000 * 100 * 100  # channel 0 only


def test_audio_segments_fake_is_deterministic(spark):
    from arcane_framework_scala_spark.multimodal import audio_segments

    df = spark.createDataFrame(
        [(1, bytearray(b"not-a-wav"))], "doc_id long, media binary"
    )
    a = [tuple(r) for r in audio_segments(df, decoder="fake").collect()]
    b = [tuple(r) for r in audio_segments(df, decoder="fake").collect()]
    assert a == b and len(a) >= 1


def test_sniff_media_type_known_and_unknown(spark):
    from arcane_framework_scala_spark.multimodal import sniff_media_type

    rows = [
        (1, bytearray(bytes.fromhex("89504E470D0A1A0A") + b"x")),
        (2, bytearray(bytes.fromhex("FFD8FFE0") + b"x")),
        (3, bytearray(b"RIFF1234WAVE")),
        (4, bytearray(b"GIF89a")),
        (5, bytearray(b"%PDF-1.7")),
        (6, bytearray(b"plain text")),
        (7, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", sniff_media_type().alias("t")).collect()
    }
    assert got == {1: "png", 2: "jpeg", 3: "riff", 4: "gif", 5: "pdf",
                   6: "unknown", 7: "unknown"}
