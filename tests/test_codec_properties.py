"""Property-based (hypothesis) pins for the r9 binary codecs — the
layers where a single wrong byte silently corrupts data at any scale:
the roaring deletion-vector codec, the Iceberg Appendix-D bound
codecs, and the put-if-absent commit guards."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from arcane_framework_scala_spark.sources import delta_dv as dv
from arcane_framework_scala_spark.sources import iceberg_reader as ir
from arcane_framework_scala_spark.sources import iceberg_transforms as tf


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40),
        max_size=400,
    )
)
def test_roaring_positions_roundtrip(values):
    arr = np.array(values, dtype=np.int64)
    got = dv.deserialize_positions(dv.serialize_positions(arr))
    assert np.array_equal(got, np.unique(arr))


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**20),
    st.integers(min_value=1, max_value=5000),
)
def test_roaring_dense_block_roundtrip(start, n):
    """Contiguous runs cross the array/bitmap container threshold."""
    arr = np.arange(start, start + n, dtype=np.int64)
    got = dv.deserialize_positions(dv.serialize_positions(arr))
    assert np.array_equal(got, arr)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_bound_codec_long_roundtrip(v):
    enc, dec = ir._BOUND_CODECS["long"]
    assert dec(enc(v)) == v


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_bound_codec_int_roundtrip(v):
    enc, dec = ir._BOUND_CODECS["int"]
    assert dec(enc(v)) == v


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_bound_codec_string_roundtrip(s):
    enc, dec = ir._BOUND_CODECS["string"]
    assert dec(enc(s)) == s


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.integers(min_value=1, max_value=1 << 20),
)
def test_bucket_long_in_range_and_int_long_agree(v, n):
    b = tf.bucket_value(v, n, "long")
    assert 0 <= b < n
    if -(2**31) <= v < 2**31:
        assert tf.bucket_value(v, n, "int") == b  # Appendix B: same form


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.integers(min_value=1, max_value=10**6),
)
def test_truncate_long_floored_and_order_preserving(v, w):
    t = tf.truncate_value(v, w, "long")
    assert t <= v < t + w
    assert t % w == 0
    t2 = tf.truncate_value(v + 1, w, "long")
    assert t2 >= t  # monotone -> range pruning is sound


def test_concurrent_delta_commit_refuses(tmp_path):
    import os

    t = str(tmp_path)
    os.makedirs(os.path.join(t, "_delta_log"))
    from arcane_framework_scala_spark.sources import delta_reader as dr

    dr.commit_actions(t, 0, [{"commitInfo": {}}])
    with pytest.raises(ValueError, match="concurrent Delta commit"):
        dr.commit_actions(t, 0, [{"commitInfo": {}}])
    dr.commit_actions(t, 1, [{"commitInfo": {}}])  # next version fine


def test_concurrent_iceberg_metadata_refuses(tmp_path):
    import json
    import os

    t = str(tmp_path)
    v = ir.write_metadata(t, {"format-version": 2})
    # simulate the loser of a race: the winner's file landed first
    md = os.path.join(t, "metadata")
    nxt = os.path.join(md, f"v{v + 1}.metadata.json")
    json.dump({"format-version": 2}, open(nxt, "w"))
    # next_metadata_version now sees the winner; a fresh write works at
    # v+2 — but a DIRECTED collision refuses:
    import arcane_framework_scala_spark.sources.iceberg_reader as irr

    orig = irr.next_metadata_version
    irr.next_metadata_version = lambda p: v + 1
    try:
        with pytest.raises(ir.IcebergError, match="concurrent Iceberg"):
            ir.write_metadata(t, {"format-version": 2})
    finally:
        irr.next_metadata_version = orig
