"""CatalogTarget integration: bootstrap → merge → drift on a real catalog
table (the managed spark_catalog — no MERGE INTO support, so the dialect
semantics execute through the merge_apply fallback; on Iceberg/Delta the
identical ``build_merge_query`` SQL runs instead).

Covers the bootstrap/merge schema contract: the bootstrapped table carries
only data columns, and ``build_merge_query`` never assigns the dialect's
marker columns (reference golden
``generate_a_valid_merge_query_synapse_link.sql`` assigns versionnumber but
never IsDelete), so the second batch merges cleanly onto the table the
first batch created.
"""

import pytest

from arcane_framework_scala_spark.queries.merge import (
    SQL_SERVER_CHANGE_TRACKING,
    SYNAPSE_LINK,
    build_merge_query,
)
from arcane_framework_scala_spark.sinks.merge_sink import CatalogTarget, MergeSink


def _ct_batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "ARCANE_MERGE_KEY string, SYS_CHANGE_VERSION long, "
        "SYS_CHANGE_OPERATION string, x string, y long",
    )


@pytest.fixture
def table(spark):
    name = "default.catalog_target_it"
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bootstrap_then_merge_on_catalog_table(spark, table):
    sink = MergeSink(
        target=CatalogTarget(spark, table), dialect=SQL_SERVER_CHANGE_TRACKING
    )
    # bootstrap: latest per key, deletes filtered, marker column dropped
    sink.apply(
        _ct_batch(
            spark,
            [
                ("k1", 1, "I", "a", 10),
                ("k1", 2, "U", "a2", 11),
                ("k2", 1, "I", "b", 20),
                ("k3", 1, "D", "gone", 0),
            ],
        )
    )
    created = spark.table(table)
    assert created.columns == ["ARCANE_MERGE_KEY", "SYS_CHANGE_VERSION", "x", "y"]
    rows = {r["ARCANE_MERGE_KEY"]: r for r in created.collect()}
    assert set(rows) == {"k1", "k2"} and rows["k1"]["x"] == "a2"

    # second batch merges onto the bootstrapped schema: update k1 (higher
    # version), delete k2, insert k4, replay-stale k1 row is a no-op
    sink.apply(
        _ct_batch(
            spark,
            [
                ("k1", 3, "U", "a3", 12),
                ("k1", 1, "U", "stale", 0),
                ("k2", 3, "D", "b", 20),
                ("k4", 3, "I", "d", 40),
            ],
        )
    )
    rows = {r["ARCANE_MERGE_KEY"]: r for r in spark.table(table).collect()}
    assert set(rows) == {"k1", "k4"}
    assert rows["k1"]["x"] == "a3" and rows["k1"]["SYS_CHANGE_VERSION"] == 3
    assert rows["k4"]["y"] == 40


def test_merge_replay_is_idempotent_on_catalog_table(spark, table):
    sink = MergeSink(
        target=CatalogTarget(spark, table), dialect=SQL_SERVER_CHANGE_TRACKING
    )
    sink.apply(_ct_batch(spark, [("k1", 1, "I", "a", 10), ("k2", 1, "I", "b", 20)]))
    batch = _ct_batch(spark, [("k1", 2, "U", "a2", 11), ("k3", 2, "D", "c", 30)])
    sink.apply(batch)
    once = sorted(map(tuple, spark.table(table).collect()))
    sink.apply(batch)  # T9: version guards make the replay a no-op
    assert sorted(map(tuple, spark.table(table).collect())) == once


def test_drifted_batch_alters_catalog_table(spark, table):
    sink = MergeSink(
        target=CatalogTarget(spark, table), dialect=SQL_SERVER_CHANGE_TRACKING
    )
    sink.apply(_ct_batch(spark, [("k1", 1, "I", "a", 10)]))
    drifted = spark.createDataFrame(
        [("k1", 2, "U", "a2", 11, 0.5), ("k5", 2, "I", "e", 50, 0.9)],
        "ARCANE_MERGE_KEY string, SYS_CHANGE_VERSION long, "
        "SYS_CHANGE_OPERATION string, x string, y long, score double",
    )
    sink.apply(drifted)
    got = spark.table(table)
    assert "score" in got.columns and "SYS_CHANGE_OPERATION" not in got.columns
    rows = {r["ARCANE_MERGE_KEY"]: r for r in got.collect()}
    assert rows["k1"]["score"] == 0.5 and rows["k5"]["score"] == 0.9


def test_generated_sql_never_assigns_marker_columns():
    for dialect, cols in [
        (
            SQL_SERVER_CHANGE_TRACKING,
            ["ARCANE_MERGE_KEY", "SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION", "x"],
        ),
        (
            SYNAPSE_LINK,
            ["ARCANE_MERGE_KEY", "Id", "versionnumber", "IsDelete", "x"],
        ),
    ]:
        sql = build_merge_query(dialect, "cat.db.t", "staged", cols)
        update_set = sql.split("UPDATE SET")[1].split("WHEN NOT MATCHED")[0]
        insert_clause = sql.split("WHEN NOT MATCHED")[1]
        for marker in dialect.non_data_columns:
            assert f"{marker} =" not in update_set
            assert f"({marker}" not in insert_clause
            assert f",{marker}" not in insert_clause.split("VALUES")[0]
