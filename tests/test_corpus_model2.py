"""Property checks: mixture_sample and zorder_key == pure-Python models
(same style as test_dedup_model — catches bucket-hash drift and
interleave off-by-ones that fixed examples miss)."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _bucket_model(s: str, buckets: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % buckets


def _mixture_model(rows, weights, default, buckets=1000):
    out = []
    for doc_id, source in rows:
        w = weights.get(source, default)
        full, frac = int(w), int(round((w - int(w)) * buckets))
        for epoch in range(full + 1):
            if epoch < full or _bucket_model(f"{doc_id}:{epoch}", buckets) < frac:
                out.append((doc_id, epoch))
    return sorted(out)


@given(
    weights=st.dictionaries(
        st.sampled_from(["s0", "s1", "s2"]),
        st.floats(0.0, 3.5).map(lambda x: round(x, 2)),
        max_size=3,
    ),
    default=st.sampled_from([0.0, 0.5, 1.0]),
)
@settings(**_SETTINGS)
def test_mixture_sample_matches_model(spark, weights, default):
    from arcane_framework_scala_spark.functions.corpus import mixture_sample

    rows = [(i, f"s{i % 4}") for i in range(60)]
    df = spark.createDataFrame(
        [(i, f"t{i}", s) for i, s in rows],
        "doc_id long, text string, source string",
    )
    got = sorted(
        (r["doc_id"], r["epoch"])
        for r in mixture_sample(df, weights, default=default).collect()
    )
    assert got == _mixture_model(rows, weights, default)


def _z_model(vals, bits):
    los = [min(v) for v in zip(*vals)]
    his = [max(v) for v in zip(*vals)]
    out = []
    for row in vals:
        key = 0
        norms = []
        for j, x in enumerate(row):
            span = max(his[j] - los[j], 1)
            norms.append(((x - los[j]) * ((1 << bits) - 1)) // span)
        for i in range(bits):
            for j, n in enumerate(norms):
                key |= ((n >> i) & 1) << (i * len(row) + j)
        out.append((row, key))
    return dict(out)


@given(
    xs=st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(0, 5000)),
        min_size=2,
        max_size=40,
        unique=True,
    ),
    bits=st.sampled_from([2, 4, 8]),
)
@settings(**_SETTINGS)
def test_zorder_key_matches_model(spark, xs, bits):
    from arcane_framework_scala_spark.functions.layout import zorder_key

    df = spark.createDataFrame(xs, "x long, y long")
    got = {
        (r["x"], r["y"]): r["zkey"]
        for r in zorder_key(df, ["x", "y"], bits=bits).collect()
    }
    assert got == _z_model(xs, bits)
