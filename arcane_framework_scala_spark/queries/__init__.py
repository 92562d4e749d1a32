from arcane_framework_scala_spark.queries.merge import (
    MergeDialect,
    SQL_SERVER_CHANGE_TRACKING,
    SYNAPSE_LINK,
    UPSERT_BLOB,
    build_merge_query,
    reduce_expr,
)
from arcane_framework_scala_spark.queries.overwrite import (
    build_overwrite_query,
    build_shard_commit_query,
    TableProperties,
)
from arcane_framework_scala_spark.queries.maintenance import (
    optimize_sql,
    expire_snapshots_sql,
    remove_orphan_files_sql,
    analyze_sql,
)

__all__ = [
    "MergeDialect",
    "SQL_SERVER_CHANGE_TRACKING",
    "SYNAPSE_LINK",
    "UPSERT_BLOB",
    "build_merge_query",
    "reduce_expr",
    "build_overwrite_query",
    "build_shard_commit_query",
    "TableProperties",
    "optimize_sql",
    "expire_snapshots_sql",
    "remove_orphan_files_sql",
    "analyze_sql",
]
