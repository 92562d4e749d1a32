from arcane_framework_scala_spark.streaming.watermark import (
    Watermark,
    FileWatermarkStore,
    TablePropertyWatermarkStore,
)
from arcane_framework_scala_spark.streaming.runner import StreamRunner, StreamSettings
from arcane_framework_scala_spark.streaming.stateful import stateful_first_seen
from arcane_framework_scala_spark.streaming.structured import StructuredBlobStream
from arcane_framework_scala_spark.streaming.throughput import (
    StaticShaper,
    MemoryAwareShaper,
)

__all__ = [
    "Watermark",
    "FileWatermarkStore",
    "TablePropertyWatermarkStore",
    "StreamRunner",
    "StreamSettings",
    "stateful_first_seen",
    "StructuredBlobStream",
    "StaticShaper",
    "MemoryAwareShaper",
]
