from arcane_framework_scala_spark.schema.types import ArcaneType, to_spark_type, from_spark_type
from arcane_framework_scala_spark.schema.schema import (
    ArcaneField,
    ArcaneSchema,
    MERGE_KEY_COLUMN,
    merge_key_field,
)
from arcane_framework_scala_spark.schema.normalize import normalize_name

__all__ = [
    "ArcaneType",
    "to_spark_type",
    "from_spark_type",
    "ArcaneField",
    "ArcaneSchema",
    "MERGE_KEY_COLUMN",
    "merge_key_field",
    "normalize_name",
]
