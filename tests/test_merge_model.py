"""Property-based check: merge_apply == a pure-Python CDC state model.

Random change sequences (insert/update/delete at random versions, replays
included) applied batch-by-batch through ``merge_apply`` must produce the
same final key→(version, payload) state as an in-memory reference model
that implements the dialect conditions directly. This is the semantic core
of the engine (M1/M3 + W1 + T9 idempotency) under inputs the example-based
tests don't enumerate."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arcane_framework_scala_spark.operators.merge_apply import merge_apply
from arcane_framework_scala_spark.queries.merge import (
    SQL_SERVER_CHANGE_TRACKING,
    UPSERT_BLOB,
)

KEYS = ["k0", "k1", "k2", "k3"]

change = st.tuples(
    st.sampled_from(KEYS),
    st.integers(min_value=1, max_value=9),  # version
    st.sampled_from(["U", "D"]),
    st.integers(min_value=0, max_value=99),  # payload
)


def _model_ct(batches):
    """Reference model for the SQL Server CT dialect."""
    state: dict[str, tuple[int, int]] = {}
    for batch in batches:
        # W1: rank()==1 by version desc per key, delete-priority tie collapse
        best: dict[str, tuple] = {}
        for k, v, op, p in batch:
            cur = best.get(k)
            # tie collapse order: delete first, then version desc, then
            # remaining columns ascending (merge_apply._collapse_ties)
            cand = (v, op == "D", (op, p))
            if cur is None:
                best[k] = cand
                continue
            cv, cdel, crest = cur
            if v > cv or (v == cv and (cand[1], ) > (cdel, )) or (
                v == cv and cand[1] == cdel and cand[2] < crest
            ):
                best[k] = cand
        for k, (v, is_del, (op, p)) in best.items():
            if k in state:
                if is_del:
                    del state[k]  # WHEN MATCHED AND op='D' → DELETE
                elif v > state[k][0]:
                    state[k] = (v, p)  # version-guarded UPDATE
            else:
                if not is_del:
                    state[k] = (v, p)  # INSERT unless delete marker
    return state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(st.lists(change, min_size=1, max_size=8), min_size=1, max_size=4))
def test_ct_merge_matches_model(spark, batches):
    target = None
    for batch in batches:
        df = spark.createDataFrame(
            [(k, v, op, p) for (k, v, op, p) in batch],
            "ARCANE_MERGE_KEY string, SYS_CHANGE_VERSION long, "
            "SYS_CHANGE_OPERATION string, payload long",
        )
        if target is None:
            # bootstrap = merge into an empty target: the tie-collapse keeps
            # one row per key (delete priority) and the insert condition
            # drops delete markers — the model's single-batch semantics
            target = merge_apply(
                df.limit(0), df, SQL_SERVER_CHANGE_TRACKING
            )
        else:
            target = merge_apply(target, df, SQL_SERVER_CHANGE_TRACKING)
        target = target.cache()
        target.count()

    got = {
        r["ARCANE_MERGE_KEY"]: (r["SYS_CHANGE_VERSION"], r["payload"])
        for r in target.collect()
    }
    expected = _model_ct(batches)
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batch=st.lists(change, min_size=1, max_size=10),
)
def test_merge_replay_is_idempotent(spark, batch):
    """T9: applying the same batch twice == applying it once (any dialect)."""
    df = spark.createDataFrame(
        [(k, v, p) for (k, v, _op, p) in batch],
        "ARCANE_MERGE_KEY string, createdon long, payload long",
    )
    import pyspark.sql.functions as F
    from arcane_framework_scala_spark.operators.dedup_window import (
        latest_version_per_key,
    )

    base = latest_version_per_key(df, "createdon")
    once = merge_apply(merge_apply(base.limit(0), df, UPSERT_BLOB), df, UPSERT_BLOB)
    twice = merge_apply(once, df, UPSERT_BLOB)
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


@settings(max_examples=200, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(KEYS),
            st.sampled_from(["U", "D"]),
            st.integers(min_value=0, max_value=99),
        ),
        min_size=1,
        max_size=24,
    ),
    cuts=st.sets(st.integers(min_value=1, max_value=23), max_size=3),
)
def test_range_partitioned_waves_equal_global_latest(events, cuts):
    """The m8_lakehouse_vertical oracle's algebra claim: when waves
    partition a change stream into DISJOINT INCREASING version ranges
    (versions assigned by stream position, as CDC version columns are),
    sequential per-wave CT merges produce exactly the global
    latest-per-key state with delete-last semantics — including the
    delete-then-reinsert and delete-of-absent corners. Pure model, no
    Spark: _model_ct is itself pinned against merge_apply above."""
    stream = [(k, i + 1, op, p) for i, (k, op, p) in enumerate(events)]
    bounds = sorted(c for c in cuts if c < len(stream)) + [len(stream)]
    waves, lo = [], 0
    for hi in bounds:
        if stream[lo:hi]:
            waves.append(stream[lo:hi])
        lo = hi
    sequential = _model_ct(waves)

    latest = {}
    for k, v, op, p in stream:  # versions strictly increase
        latest[k] = (v, op, p)
    global_form = {
        k: (v, p) for k, (v, op, p) in latest.items() if op != "D"
    }
    assert sequential == global_form
