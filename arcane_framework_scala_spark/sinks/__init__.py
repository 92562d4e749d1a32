from arcane_framework_scala_spark.sinks.merge_sink import (
    MergeSink,
    SnapshotParquetTarget,
    CatalogTarget,
)

__all__ = ["MergeSink", "SnapshotParquetTarget", "CatalogTarget"]
