"""Unit tests for as-of and bucketed range joins (hand-built fixtures)."""

import pyspark.sql.functions as F

from arcane_framework_scala_spark.operators.temporal_join import (
    asof_join,
    range_join,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestAsofJoin:
    def test_basic_carry_forward_and_tie(self, spark):
        left = _df(
            spark,
            [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (2, 7, "d")],
            "k long, ts long, tag string",
        )
        right = _df(
            spark,
            [(1, 10, 100), (1, 15, 200), (2, 99, 300)],
            "k long, ts long, v long",
        )
        got = {
            r.tag: r.v_asof for r in asof_join(left, right, "k", "ts").collect()
        }
        assert got["a"] is None  # nothing at or before ts=5
        assert got["b"] == 100  # exact tie ts=10 is inclusive
        assert got["c"] == 200  # latest at-or-before wins
        assert got["d"] is None  # right exists only later
    def test_multiple_left_rows_same_instant(self, spark):
        left = _df(
            spark, [(1, 10, "x"), (1, 10, "y")], "k long, ts long, tag string"
        )
        right = _df(spark, [(1, 10, 7)], "k long, ts long, v long")
        rows = asof_join(left, right, "k", "ts").collect()
        assert sorted((r.tag, r.v_asof) for r in rows) == [("x", 7), ("y", 7)]

    def test_null_right_value_is_carried_not_skipped(self, spark):
        # a later right ROW with a null value must shadow an earlier
        # non-null one (ASOF matches rows, not values) — and multi-column
        # payloads must never mix values from different right rows
        left = _df(spark, [(1, 20)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 5, 7, 70), (1, 10, None, 80)], "k long, ts long, v long, u long"
        )
        row = asof_join(left, right, "k", "ts").first()
        assert row.v_asof is None  # from the ts=10 row, not 7 from ts=5
        assert row.u_asof == 80

    def test_multiple_value_columns(self, spark):
        left = _df(spark, [(1, 10)], "k long, ts long")
        right = _df(spark, [(1, 4, 1, 2.5)], "k long, ts long, a long, b double")
        row = asof_join(left, right, "k", "ts").first()
        assert (row.a_asof, row.b_asof) == (1, 2.5)


class TestRangeJoin:
    def test_inclusive_bounds_and_bin_crossing(self, spark):
        pts = _df(
            spark,
            [(1, 0), (1, 100), (1, 250), (1, 251), (2, 100)],
            "k long, ts long",
        )
        ivals = _df(
            spark,
            [(1, 100, 250, "s1"), (2, 0, 99, "s2")],
            "k long, lo long, hi long, name string",
        )
        got = range_join(
            pts, ivals, "ts", "lo", "hi", bucket_seconds=60, extra_key="k"
        ).collect()
        matched = sorted((r.ts, r.name) for r in got)
        # 100 and 250 inclusive; 0, 251 outside; user 2's 100 after s2
        assert matched == [(100, "s1"), (250, "s1")]

    def test_no_duplicate_matches_across_bins(self, spark):
        # interval spans many bins; each point must match exactly once
        pts = _df(spark, [(1, i) for i in range(0, 500, 50)], "k long, ts long")
        ivals = _df(spark, [(1, 0, 499, "wide")], "k long, lo long, hi long, name string")
        got = range_join(
            pts, ivals, "ts", "lo", "hi", bucket_seconds=10, extra_key="k"
        )
        assert got.count() == 10
        assert got.select("ts").distinct().count() == 10

    def test_without_extra_key_joins_on_time_only(self, spark):
        pts = _df(spark, [(1, 5), (2, 500)], "k long, ts long")
        ivals = _df(spark, [(9, 0, 10, "early")], "k2 long, lo long, hi long, name string")
        got = range_join(pts, ivals, "ts", "lo", "hi", bucket_seconds=100).collect()
        assert [(r.k, r.name) for r in got] == [(1, "early")]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

event = st.tuples(
    st.integers(min_value=1, max_value=3),   # key
    st.integers(min_value=0, max_value=20),  # ts
    st.integers(min_value=0, max_value=99),  # payload
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(event, min_size=1, max_size=10),
    rights=st.lists(event, min_size=0, max_size=10),
)
def test_asof_join_matches_model(spark, lefts, rights):
    """asof_join == the obvious per-row model: latest right at-or-before
    each left timestamp. Right side deduped to unique (k, ts) first, as
    the operator contract requires."""
    dedup = {}
    for k, ts, v in rights:
        dedup[(k, ts)] = max(v, dedup.get((k, ts), -1))
    rrows = [(k, ts, v) for (k, ts), v in dedup.items()]
    left = spark.createDataFrame(
        [(i, k, ts, v) for i, (k, ts, v) in enumerate(lefts)],
        "row_id long, k long, ts long, pv long",
    )
    right = spark.createDataFrame(rrows or [(99, -1, 0)], "k long, ts long, v long")
    got = {
        r.row_id: r.v_asof
        for r in asof_join(left, right, "k", "ts", ["v"]).collect()
    }
    for i, (k, ts, _) in enumerate(lefts):
        prior = [(rts, v) for (rk, rts), v in dedup.items() if rk == k and rts <= ts]
        expect = max(prior)[1] if prior else None
        if not rrows and expect is None:
            expect = None  # sentinel right row uses key 99 / ts -1
            prior_sentinel = (k == 99 and ts >= -1)
            assert not prior_sentinel
        assert got[i] == expect, (i, k, ts, got[i], expect, rrows)


def test_nearest_join_hand_computed(spark):
    """Nearest semantics: closest |gap| wins, ties -> earlier right,
    tolerance drops far matches, no-match rows survive with nulls."""
    from arcane_framework_scala_spark.operators.temporal_join import (
        nearest_join,
    )

    left = spark.createDataFrame(
        [(1, 100), (1, 200), (1, 300), (2, 50)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 110, "b"), (1, 205, "c")],
        "k long, ts long, v string",
    )
    out = {
        (r["k"], r["ts"]): (r["v_near"], r["__near_gap"])
        for r in nearest_join(
            left, right, "k", "ts", ["v"], tolerance=50
        ).collect()
    }
    # ts=100: candidates 90 (gap -10) and 110 (gap +10) -> tie -> earlier (90)
    assert out[(1, 100)] == ("a", -10)
    # ts=200: 205 at +5 beats 110 at -90
    assert out[(1, 200)] == ("c", 5)
    # ts=300: nearest is 205 at -95 -> beyond tolerance 50 -> null
    assert out[(1, 300)] == (None, None)
    # key 2 has no right rows at all
    assert out[(2, 50)] == (None, None)


def test_nearest_join_matches_pandas_merge_asof(spark):
    """Property check vs the reference implementation everyone knows:
    pandas merge_asof(direction='nearest') on random small frames.
    Exact |gap| ties are excluded (pandas resolves them 'backward',
    ours documents 'earlier right ts' — same row when both sides are
    unique, but generated data avoids the ambiguity entirely)."""
    import pandas as pd

    from arcane_framework_scala_spark.operators.temporal_join import (
        nearest_join,
    )

    rng_states = [1, 7, 13]
    for seed in rng_states:
        import random

        rng = random.Random(seed)
        keys = [1, 2]
        lrows, rrows = [], []
        for k in keys:
            lts = sorted(rng.sample(range(0, 2000, 2), 8))  # even ts
            rts = sorted(rng.sample(range(1, 2001, 2), 6))  # odd ts
            lrows += [(k, t) for t in lts]
            rrows += [(k, t, f"v{k}_{t}") for t in rts]
        # odd/even split -> |gap| is always odd -> no exact ties
        left = spark.createDataFrame(lrows, "k long, ts long")
        right = spark.createDataFrame(rrows, "k long, ts long, v string")
        got = {
            (r["k"], r["ts"]): r["v_near"]
            for r in nearest_join(
                left, right, "k", "ts", ["v"], tolerance=100
            ).collect()
        }
        lp = pd.DataFrame(lrows, columns=["k", "ts"]).sort_values("ts")
        rp = pd.DataFrame(rrows, columns=["k", "ts", "v"]).sort_values("ts")
        exp_df = pd.merge_asof(
            lp, rp, on="ts", by="k", direction="nearest", tolerance=100
        )
        exp = {
            (int(r.k), int(r.ts)): (None if pd.isna(r.v) else r.v)
            for r in exp_df.itertuples()
        }
        assert got == exp, seed
