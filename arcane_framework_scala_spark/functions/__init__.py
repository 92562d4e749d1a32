from arcane_framework_scala_spark.functions.merge_key import (
    mssql_merge_key,
    blob_merge_key,
    synapse_merge_key,
)

__all__ = ["mssql_merge_key", "blob_merge_key", "synapse_merge_key"]
