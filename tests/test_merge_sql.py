"""Golden-style tests for the MERGE/overwrite SQL generators.

Mirrors the reference's golden-file strategy (SURVEY §5 layer 1:
``src/test/resources/generate_a_valid_merge_query*.sql`` checked against the
builders) — the expected strings here are our Spark-SQL dialect equivalents
of those fixtures.
"""

from arcane_framework_scala_spark.queries.maintenance import (
    MaintenanceSchedule,
    analyze_sql,
    optimize_sql,
)
from arcane_framework_scala_spark.queries.merge import (
    SQL_SERVER_CHANGE_TRACKING,
    SYNAPSE_LINK,
    UPSERT_BLOB,
    build_merge_query,
    reduce_expr,
)
from arcane_framework_scala_spark.queries.overwrite import (
    TableProperties,
    build_backfill_source_query,
    build_overwrite_query,
)

COLS = ["ARCANE_MERGE_KEY", "colA", "colB", "SYS_CHANGE_VERSION"]


def test_sql_server_merge_query():
    q = build_merge_query(
        SQL_SERVER_CHANGE_TRACKING,
        "test.table_a",
        "test.staged_a",
        COLS,
        deduplicate=False,
    )
    assert "MERGE INTO test.table_a t_o" in q
    assert "USING (SELECT * FROM test.staged_a) t_s" in q
    assert "ON t_o.ARCANE_MERGE_KEY = t_s.ARCANE_MERGE_KEY" in q
    assert "WHEN MATCHED AND t_s.SYS_CHANGE_OPERATION = 'D' THEN DELETE" in q
    assert (
        "WHEN MATCHED AND t_s.SYS_CHANGE_OPERATION != 'D' AND "
        "t_s.SYS_CHANGE_VERSION > t_o.SYS_CHANGE_VERSION THEN UPDATE SET" in q
    )
    # merge key never reassigned in UPDATE SET (assignments are indented)
    assert "  ARCANE_MERGE_KEY = t_s.ARCANE_MERGE_KEY" not in q
    assert "colA = t_s.colA" in q
    assert (
        "WHEN NOT MATCHED AND t_s.SYS_CHANGE_OPERATION != 'D' THEN INSERT "
        "(ARCANE_MERGE_KEY,colA,colB,SYS_CHANGE_VERSION) VALUES "
        "(t_s.ARCANE_MERGE_KEY,t_s.colA,t_s.colB,t_s.SYS_CHANGE_VERSION)" in q
    )


def test_dedup_uses_rank_with_ties_semantics():
    # WITH TIES ⇒ rank()==1, not row_number()==1 (SURVEY §7.3)
    r = reduce_expr("test.staged_a", "versionnumber")
    assert "rank() OVER (PARTITION BY ARCANE_MERGE_KEY ORDER BY versionnumber DESC)" in r
    assert "row_number" not in r
    q = build_merge_query(SYNAPSE_LINK, "t", "s", ["ARCANE_MERGE_KEY", "x"])
    assert "rank() OVER" in q


def test_synapse_merge_conditions():
    q = build_merge_query(
        SYNAPSE_LINK, "test.table_a", "test.staged_a",
        ["ARCANE_MERGE_KEY", "colA", "Id", "versionnumber"],
    )
    assert "WHEN MATCHED AND coalesce(t_s.IsDelete, false) = true THEN DELETE" in q
    assert (
        "coalesce(t_s.IsDelete, false) = false AND "
        "t_s.versionnumber > t_o.versionnumber THEN UPDATE SET" in q
    )
    assert "WHEN NOT MATCHED AND coalesce(t_s.IsDelete, false) = false THEN INSERT" in q


def test_upsert_blob_no_delete_unconditional_insert():
    q = build_merge_query(
        UPSERT_BLOB, "test.table_a", "test.staged_a",
        ["ARCANE_MERGE_KEY", "colA", "createdon"],
    )
    assert "THEN DELETE" not in q
    assert "WHEN MATCHED AND t_s.createdon > t_o.createdon THEN UPDATE SET" in q
    assert "WHEN NOT MATCHED THEN INSERT" in q


def test_partition_in_lists_and_extra_match_keys():
    q = build_merge_query(
        SQL_SERVER_CHANGE_TRACKING,
        "t", "s", COLS,
        partition_values={"colA": ["a", "b"]},
        extra_match_keys=["colB", "ARCANE_MERGE_KEY"],  # merge key filtered out
    )
    assert "t_o.colA IN ('a','b')" in q
    assert "(t_o.colB = t_s.colB OR t_s.colB IS NULL)" in q
    # filter_out_arcane_merge_key_from_merge_match golden behavior
    assert "(t_o.ARCANE_MERGE_KEY = t_s.ARCANE_MERGE_KEY OR" not in q


def test_overwrite_query():
    q = build_overwrite_query(
        "test.table_a",
        "SELECT * FROM test.staged_a",
        TableProperties(partition_expressions=("days(ts)",), sorted_by=("colA",)),
    )
    assert q.startswith("CREATE OR REPLACE TABLE test.table_a USING iceberg")
    assert "PARTITIONED BY (days(ts))" in q
    assert "'write.sort-order'='colA'" in q
    assert q.endswith("SELECT * FROM test.staged_a")


def test_synapse_backfill_drops_tombstones():
    q = build_backfill_source_query(SYNAPSE_LINK, "combined")
    assert "coalesce(IsDelete, false) = false" in q
    q2 = build_backfill_source_query(UPSERT_BLOB, "combined")
    assert "IsDelete" not in q2


def test_maintenance_sql_and_schedule():
    assert "rewrite_data_files" in optimize_sql("cat", "db.t")
    assert analyze_sql("db.t", ["a", "b"]).endswith("FOR COLUMNS a, b")
    sched = MaintenanceSchedule(optimize_every=2, analyze_every=3)
    # reference gate: (batchIndex+1) % threshold == 0
    assert sched.due(0) == []
    assert sched.due(1) == ["optimize"]
    assert sched.due(2) == ["analyze"]
    assert sched.due(5) == ["optimize", "analyze"]
