from arcane_framework_scala_spark.streaming.watermark import (
    Watermark,
    FileWatermarkStore,
    TablePropertyWatermarkStore,
)
from arcane_framework_scala_spark.streaming.stateful import stateful_first_seen
from arcane_framework_scala_spark.streaming.throughput import (
    StaticShaper,
    MemoryAwareShaper,
    MemoryBoundSettings,
    MemoryBoundShaper,
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
    "MemoryBoundSettings",
    "MemoryBoundShaper",
]

# StreamRunner/StructuredBlobStream import the sink layer, which imports the
# operators package, which imports streaming.watermark — eagerly re-exporting
# them here closes an import cycle whenever a sink module is imported first.
# PEP 562 lazy attributes keep `from ...streaming import StreamRunner` working
# without the cycle.
_LAZY = {
    "StreamRunner": "arcane_framework_scala_spark.streaming.runner",
    "StreamSettings": "arcane_framework_scala_spark.streaming.runner",
    "StructuredBlobStream": "arcane_framework_scala_spark.streaming.structured",
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
