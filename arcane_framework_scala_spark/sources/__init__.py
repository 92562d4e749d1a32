from arcane_framework_scala_spark.sources.base import MicroBatch, CdcSource
from arcane_framework_scala_spark.sources.blob import (
    BlobParquetSource,
    BlobJsonSource,
    BlobCsvSource,
)
from arcane_framework_scala_spark.sources.cdm import SynapseCdmSource
from arcane_framework_scala_spark.sources.mssql import MsSqlQueryBuilder, MsSqlSource

__all__ = [
    "MicroBatch",
    "CdcSource",
    "BlobParquetSource",
    "BlobJsonSource",
    "BlobCsvSource",
    "SynapseCdmSource",
    "MsSqlQueryBuilder",
    "MsSqlSource",
]
