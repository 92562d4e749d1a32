"""Jar-free Delta log reader (sources/delta_reader.py): replay the
public _delta_log protocol — adds, removes, checkpoints, time travel,
partition discovery — and refuse tables needing reader features we
don't implement."""

import json
import os
import shutil

import pytest

from arcane_framework_scala_spark.sources import delta_reader as dr

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _one_file(spark, df, table_dir, rel):
    """Write df as exactly one parquet file at table_dir/rel."""
    tmp = os.path.join(table_dir, "__tmp_write")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    dst = os.path.join(table_dir, rel)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    os.replace(os.path.join(tmp, part), dst)
    shutil.rmtree(tmp)


def _commit(table_dir, version, actions):
    log = os.path.join(table_dir, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _meta_actions(schema_json=SCHEMA_JSON, partition_cols=None):
    return [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "t",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": partition_cols or [],
                "configuration": {},
            }
        },
    ]


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_add_remove_replay_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    os.makedirs(t)
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    _one_file(spark, mk([(1, "a"), (2, "b")]), t, "f1.parquet")
    _one_file(spark, mk([(3, "c")]), t, "f2.parquet")
    _one_file(spark, mk([(4, "d")]), t, "f3.parquet")
    _commit(t, 0, _meta_actions() + [
        {"add": {"path": "f1.parquet", "dataChange": True}},
        {"add": {"path": "f2.parquet", "dataChange": True}},
    ])
    _commit(t, 1, [
        {"remove": {"path": "f2.parquet", "dataChange": True}},
        {"add": {"path": "f3.parquet", "dataChange": True}},
    ])
    assert _rows(dr.read_delta(spark, t)) == {(1, "a"), (2, "b"), (4, "d")}
    assert _rows(dr.read_delta(spark, t, version=0)) == {
        (1, "a"), (2, "b"), (3, "c"),
    }
    with pytest.raises(ValueError, match="not in the Delta log"):
        dr.read_delta(spark, t, version=7)
    assert [f.endswith(".parquet") for f in dr.active_files(t)] == [True] * 2
    # schema comes from the metaData action
    assert [f.name for f in dr.table_schema(t).fields] == ["id", "v"]


def test_partition_columns_come_back_via_base_path(spark, tmp_path):
    t = str(tmp_path / "p")
    os.makedirs(t)
    mk = lambda rows: spark.createDataFrame(rows, "id long")
    _one_file(spark, mk([(1,), (2,)]), t, "lang=en/f1.parquet")
    _one_file(spark, mk([(3,)]), t, "lang=fr/f2.parquet")
    _commit(t, 0, _meta_actions(partition_cols=["lang"]) + [
        {"add": {"path": "lang=en/f1.parquet", "dataChange": True,
                 "partitionValues": {"lang": "en"}}},
        {"add": {"path": "lang=fr/f2.parquet", "dataChange": True,
                 "partitionValues": {"lang": "fr"}}},
    ])
    got = dr.read_delta(spark, t)
    assert set(got.columns) == {"id", "lang"}
    assert _rows(got.select("id", "lang")) == {
        (1, "en"), (2, "en"), (3, "fr"),
    }
    # partition pruning applies as on any parquet table
    plan = (
        got.filter("lang = 'en'")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "PartitionFilters" in plan


def test_checkpoint_collapses_history(spark, tmp_path):
    from pyspark.sql import Row

    t = str(tmp_path / "c")
    os.makedirs(t)
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    _one_file(spark, mk([(1, "a")]), t, "f1.parquet")
    _one_file(spark, mk([(2, "b")]), t, "f2.parquet")
    _one_file(spark, mk([(3, "c")]), t, "f3.parquet")
    _commit(t, 0, _meta_actions() + [
        {"add": {"path": "f1.parquet", "dataChange": True}},
        {"add": {"path": "f2.parquet", "dataChange": True}},
    ])
    _commit(t, 1, [{"remove": {"path": "f2.parquet", "dataChange": True}}])
    # checkpoint at v=1 holds the collapsed live set {f1}
    ck = spark.createDataFrame(
        [Row(add=Row(path="f1.parquet"), remove=None)],
        "add struct<path:string>, remove struct<path:string>",
    )
    tmp = os.path.join(t, "__ck")
    ck.coalesce(1).write.parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.replace(
        os.path.join(tmp, part),
        os.path.join(t, "_delta_log", f"{1:020d}.checkpoint.parquet"),
    )
    shutil.rmtree(tmp)
    # remove the pre-checkpoint commits: the reader must not need them
    os.remove(os.path.join(t, "_delta_log", f"{0:020d}.json"))
    _commit(t, 2, [{"add": {"path": "f3.parquet", "dataChange": True}}])
    assert _rows(dr.read_delta(spark, t)) == {(1, "a"), (3, "c")}


def test_unsupported_reader_features_raise(spark, tmp_path):
    t = str(tmp_path / "u")
    os.makedirs(t)
    _commit(t, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
    ] + _meta_actions()[1:])
    with pytest.raises(ValueError, match="deletionVectors"):
        dr.active_files(t)


def test_url_encoded_paths_and_empty_table(spark, tmp_path):
    t = str(tmp_path / "e")
    os.makedirs(t)
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    _one_file(spark, mk([(1, "a")]), t, "part file.parquet")
    _commit(t, 0, _meta_actions() + [
        {"add": {"path": "part%20file.parquet", "dataChange": True}},
    ])
    assert _rows(dr.read_delta(spark, t)) == {(1, "a")}
    _commit(t, 1, [
        {"remove": {"path": "part%20file.parquet", "dataChange": True}},
    ])
    empty = dr.read_delta(spark, t)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id", "v"]
