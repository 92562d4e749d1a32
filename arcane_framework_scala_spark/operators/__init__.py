from arcane_framework_scala_spark.operators.dedup_window import (
    latest_version_per_key,
    backfill_commit_dedup,
)
from arcane_framework_scala_spark.operators.field_filter import FieldSelectionRule, apply_field_selection
from arcane_framework_scala_spark.operators.merge_apply import merge_apply

__all__ = [
    "latest_version_per_key",
    "backfill_commit_dedup",
    "FieldSelectionRule",
    "apply_field_selection",
    "merge_apply",
]
