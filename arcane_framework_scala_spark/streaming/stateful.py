"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no user-definable stateful operators (its state is the
watermark); a training-data ingest pipeline needs at least **cross-batch
first-seen dedup**: emit a key's row the first time it ever appears on the
stream, suppress every later arrival. That is not expressible with Spark's
built-in ``dropDuplicates`` on an unbounded stream *without watermark
eviction* semantics chosen deliberately — here state is explicit, typed,
and per-key, the ``applyInPandasWithState`` contract.

Scale: state is one boolean per distinct key, partitioned by the groupBy
key (uniform when the key is a content hash). Use ``GroupStateTimeout``
eviction (pass ``timeout_duration``) when keys are unbounded and a
re-emission after N idle days is acceptable — the standard state-size vs
exactness trade."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def stateful_first_seen(
    stream_df: DataFrame,
    key_col: str,
    timeout_duration: str | None = None,
) -> DataFrame:
    """Emit only the first-ever row per ``key_col`` across all micro-batches.

    Within one batch the lowest-sorting row (by the remaining columns' string
    form) wins, making output deterministic under batch-boundary changes."""
    out_schema: StructType = stream_df.schema
    state_schema = StructType.fromDDL("seen boolean")
    all_cols = list(stream_df.columns)  # plain lists only — the closure
    other_cols = [c for c in all_cols if c != key_col]  # ships to executors

    def first_seen(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if timeout_duration is not None and state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if timeout_duration is not None:
            state.setTimeoutDuration(timeout_duration)
        if state.exists:
            return  # seen in an earlier batch: suppress
        state.update((True,))
        first = batch.sort_values(
            by=other_cols, key=lambda s: s.astype(str)
        ).head(1)
        yield first[all_cols]

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_duration is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream_df.groupBy(key_col).applyInPandasWithState(
        first_seen, out_schema, state_schema, "append", timeout
    )


def stream_exact_dedup(
    stream: DataFrame,
    subset: list[str],
    event_time_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact streaming dedup with BOUNDED state — the built-in
    complement to :func:`stateful_first_seen`: instead of explicit
    forever-state, Spark's ``dropDuplicatesWithinWatermark`` keeps one
    state row per key and evicts it once the watermark passes the key's
    event time + ``delay``. The guarantee is the practical one a CDC /
    corpus-ingest stream needs: any duplicates arriving within ``delay``
    of each other collapse to one row; a key re-sent after its state
    was evicted re-emits (at-least-once beyond the horizon).

    Use :func:`stateful_first_seen` when the key set is small enough to
    hold forever and exactly-once-per-key matters more than state size;
    use this when keys are unbounded (content hashes at 100 TB) and the
    dedup horizon is what you can afford to remember. State is hash-
    partitioned by the subset columns — uniform for hash keys, and the
    eviction keeps total state ≈ keys-per-``delay`` window regardless
    of stream lifetime.

    Emit only the ``subset`` columns downstream when duplicates may
    carry differing payloads: the surviving row is the first *processed*,
    which arrival order — not the data — decides."""
    return stream.withWatermark(
        event_time_col, delay
    ).dropDuplicatesWithinWatermark(subset)
