"""Incremental MAX/MIN maintenance (operators/ivm_minmax.py): the top-2
auxiliary must land every wave exactly on a from-scratch groupBy —
including the adversarial shapes (duplicate maxima, band-interior
deletes, delete-then-reinsert, group moves, all-NULL groups) and a
seeded randomized sweep."""

import random

import pytest

from arcane_framework_scala_spark.operators import ivm_minmax as mm
from arcane_framework_scala_spark.operators.diff import snapshot_diff

SCHEMA = "k long, host string, n long"


def _tbl(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _fresh(spark, rows):
    return {
        r["host"]: (r["docs"], r["max_size"], r["min_size"])
        for r in mm.minmax_bootstrap(_tbl(spark, rows), "host", "n").collect()
    }


def _maintained(spark, before, after):
    state = mm.minmax_bootstrap(_tbl(spark, before), "host", "n")
    cdf = snapshot_diff(_tbl(spark, before), _tbl(spark, after), keys=["k"])
    out = mm.apply_minmax_delta(
        state,
        mm.minmax_delta(cdf, "host", "n"),
        _tbl(spark, after),
        "host",
        "n",
    )
    return {
        r["host"]: (r["docs"], r["max_size"], r["min_size"])
        for r in out.collect()
    }


@pytest.mark.parametrize(
    "before,after",
    [
        # insert-only: no history needed
        (
            [(1, "a", 10)],
            [(1, "a", 10), (2, "a", 30), (3, "b", 5)],
        ),
        # delete strictly below the band: aux untouched
        (
            [(1, "a", 10), (2, "a", 20), (3, "a", 30)],
            [(2, "a", 20), (3, "a", 30)],
        ),
        # delete the max (band hit -> recompute)
        (
            [(1, "a", 10), (2, "a", 20), (3, "a", 30)],
            [(1, "a", 10), (2, "a", 20)],
        ),
        # duplicate maxima: deleting ONE copy keeps the max
        (
            [(1, "a", 30), (2, "a", 30), (3, "a", 10)],
            [(2, "a", 30), (3, "a", 10)],
        ),
        # the aux-corruption trap: delete the SECOND-largest, then trust
        # the max — policy recomputes on any band hit, so m2 stays true
        (
            [(1, "a", 30), (2, "a", 20), (3, "a", 10), (4, "a", 5)],
            [(1, "a", 30), (3, "a", 10), (4, "a", 5)],
        ),
        # min side: delete the min with a duplicate present
        (
            [(1, "a", 5), (2, "a", 5), (3, "a", 9)],
            [(2, "a", 5), (3, "a", 9)],
        ),
        # group-moving update: old group loses the row, new group gains
        (
            [(1, "a", 30), (2, "a", 10), (3, "b", 7)],
            [(1, "c", 30), (2, "a", 10), (3, "b", 7)],
        ),
        # group vanishes entirely
        (
            [(1, "solo", 9), (2, "other", 1)],
            [(2, "other", 1)],
        ),
        # all-NULL group stays NULL; mixed group loses its last non-NULL
        (
            [(1, "a", None), (2, "a", 10), (3, "b", None)],
            [(1, "a", None), (3, "b", None)],
        ),
        # NULL comes back
        (
            [(1, "a", None)],
            [(1, "a", None), (2, "a", 7)],
        ),
    ],
)
def test_minmax_matches_recompute(spark, before, after):
    assert _maintained(spark, before, after) == _fresh(spark, after)


def test_minmax_multi_wave_chaining(spark):
    """State survives being fed back across waves (the production loop):
    each wave's output is the next wave's input state."""
    rng = random.Random(7)
    hosts = ["a", "b", "c", None]
    rows = {
        k: (hosts[rng.randrange(4)], rng.choice([None, rng.randrange(50)]))
        for k in range(30)
    }

    def snap():
        return [(k, h, n) for k, (h, n) in sorted(rows.items())]

    state = mm.minmax_bootstrap(_tbl(spark, snap()), "host", "n")
    for wave in range(4):
        before = snap()
        for _ in range(10):
            op = rng.randrange(3)
            if op == 0:  # insert
                k = max(rows) + 1
                rows[k] = (
                    hosts[rng.randrange(4)],
                    rng.choice([None, rng.randrange(50)]),
                )
            elif op == 1 and rows:  # delete
                rows.pop(rng.choice(list(rows)))
            elif rows:  # update (size and/or group)
                k = rng.choice(list(rows))
                rows[k] = (
                    hosts[rng.randrange(4)],
                    rng.choice([None, rng.randrange(50)]),
                )
        after = snap()
        cdf = snapshot_diff(
            _tbl(spark, before), _tbl(spark, after), keys=["k"]
        )
        state = mm.apply_minmax_delta(
            state,
            mm.minmax_delta(cdf, "host", "n"),
            _tbl(spark, after),
            "host",
            "n",
        ).localCheckpoint()
        got = {
            r["host"]: (r["docs"], r["max_size"], r["min_size"])
            for r in state.collect()
        }
        want = _fresh(spark, after)
        assert got == want, f"wave {wave}: {got} != {want}"


def test_minmax_recompute_is_scoped_to_affected_groups(spark):
    """The base table is consulted ONLY for band-hit groups: the
    recompute leg's scan carries the affected-group semi-join (broadcast
    — never a full aggregation of untouched groups)."""
    before = [(1, "a", 30), (2, "a", 20), (3, "b", 7), (4, "c", 5)]
    after = [(2, "a", 20), (3, "b", 7), (4, "c", 5)]  # delete a's max
    state = mm.minmax_bootstrap(_tbl(spark, before), "host", "n")
    cdf = snapshot_diff(_tbl(spark, before), _tbl(spark, after), keys=["k"])
    out = mm.apply_minmax_delta(
        state, mm.minmax_delta(cdf, "host", "n"), _tbl(spark, after),
        "host", "n",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    got = {
        r["host"]: (r["docs"], r["max_size"], r["min_size"])
        for r in out.collect()
    }
    assert got == _fresh(spark, after)
