"""Avro OCF decode cache (r10): immutability-keyed, shared results,
stat-key invalidation."""

def test_read_ocf_cached_hits_and_invalidates(tmp_path):
    """The planning cache (r10): same immutable file -> the SAME decoded
    objects (no re-decode); a REPLACED file (new size/mtime) misses and
    re-decodes."""
    import os
    import time as _time

    from arcane_framework_scala_spark.sources import avro_ocf

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    p = str(tmp_path / "c.avro")
    avro_ocf.write_ocf(p, schema, [{"x": 1}, {"x": 2}])
    _s1, r1 = avro_ocf.read_ocf_cached(p)
    _s2, r2 = avro_ocf.read_ocf_cached(p)
    assert r2 is r1
    # replace the file: different content AND different stat key
    _time.sleep(0.01)
    avro_ocf.write_ocf(p, schema, [{"x": 7}, {"x": 8}, {"x": 9}])
    os.utime(p)
    _s3, r3 = avro_ocf.read_ocf_cached(p)
    assert r3 is not r1
    assert [r["x"] for r in r3] == [7, 8, 9]
