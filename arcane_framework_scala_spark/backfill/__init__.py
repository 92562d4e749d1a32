from arcane_framework_scala_spark.backfill.graph import (
    BackfillOverwriteRunner,
    BackfillState,
    FileBackfillStateStore,
    run_backfill_merge,
)

__all__ = [
    "BackfillOverwriteRunner",
    "BackfillState",
    "FileBackfillStateStore",
    "run_backfill_merge",
]
