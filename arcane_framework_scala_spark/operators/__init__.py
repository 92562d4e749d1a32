from arcane_framework_scala_spark.operators.dedup_window import (
    latest_version_per_key,
    backfill_commit_dedup,
)
from arcane_framework_scala_spark.operators.event_windows import (
    sessionize,
    tumbling_window,
    windowed_event_stats,
    windowed_stream_stats,
)
from arcane_framework_scala_spark.operators.field_filter import (
    FieldSelectionRule,
    apply_field_selection,
)
from arcane_framework_scala_spark.operators.merge_apply import merge_apply
from arcane_framework_scala_spark.operators.watermark_rows import (
    attach_watermark_row,
    split_watermark_rows,
)

__all__ = [
    "latest_version_per_key",
    "backfill_commit_dedup",
    "sessionize",
    "tumbling_window",
    "windowed_event_stats",
    "windowed_stream_stats",
    "FieldSelectionRule",
    "apply_field_selection",
    "merge_apply",
    "attach_watermark_row",
    "split_watermark_rows",
]
