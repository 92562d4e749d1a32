"""Auto-activating Iceberg/Delta runtime execution (VERDICT r4 item 8).

The sandbox has no lakehouse runtime jars, so these tests SKIP today;
the moment an `iceberg-spark-runtime*.jar` (or `delta-spark`) appears —
in pyspark's bundled jars, `$SPARK_HOME/jars`, or via
`$SPARK_GRAFT_ICEBERG_JAR` / `$SPARK_GRAFT_DELTA_JARS` — they execute
the docs/LAKEHOUSE.md recipe end-to-end with NO code change: real
`MERGE INTO` through `CatalogTarget`, then the generated maintenance
`CALL`s. Each flow runs in a subprocess because SQL extensions must be
configured before SparkSession creation (the suite's shared session
can't be reconfigured in-place).
"""

import glob
import os
import subprocess
import sys
import textwrap

import pytest


def _jar_dirs() -> list[str]:
    import pyspark

    dirs = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    if os.environ.get("SPARK_HOME"):
        dirs.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    return dirs


def iceberg_jar() -> str | None:
    env = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    for d in _jar_dirs():
        hits = glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


def delta_available() -> bool:
    if os.environ.get("SPARK_GRAFT_DELTA_JARS"):
        return True
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


_ICEBERG_SCRIPT = textwrap.dedent(
    """
    import os, sys, tempfile
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    wh = tempfile.mkdtemp(prefix="arcane_iceberg_wh_")
    b = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-runtime")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.lake.type", "hadoop")
        .config("spark.sql.catalog.lake.warehouse", wh)
    )
    jar = {jar!r}
    if jar:
        b = b.config("spark.jars", jar)
    spark = b.getOrCreate()

    from arcane_framework_scala_spark.queries.maintenance import (
        expire_snapshots_sql,
        optimize_sql,
        remove_orphan_files_sql,
    )
    from arcane_framework_scala_spark.queries.merge import (
        SQL_SERVER_CHANGE_TRACKING,
    )
    from arcane_framework_scala_spark.sinks.merge_sink import CatalogTarget

    table = "lake.cdc.t1"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.cdc")
    schema = (
        "ARCANE_MERGE_KEY string, SYS_CHANGE_VERSION long, "
        "SYS_CHANGE_OPERATION string, k long, v string"
    )
    tgt = CatalogTarget(spark, table)
    # bootstrap (writeTo .create) then a REAL generated MERGE INTO
    tgt.merge(
        spark.createDataFrame(
            [("a", 1, "I", 1, "x"), ("b", 1, "I", 2, "y")], schema
        ),
        SQL_SERVER_CHANGE_TRACKING,
    )
    tgt.merge(
        spark.createDataFrame(
            [("a", 2, "U", 1, "x2"), ("b", 2, "D", 2, "y"),
             ("c", 2, "I", 3, "z")],
            schema,
        ),
        SQL_SERVER_CHANGE_TRACKING,
    )
    rows = sorted(
        (r["ARCANE_MERGE_KEY"], r["v"]) for r in spark.table(table).collect()
    )
    assert rows == [("a", "x2"), ("c", "z")], rows

    # generated maintenance CALLs execute against the real catalog
    spark.sql(optimize_sql("lake", "cdc.t1", file_size_threshold_mb=64))
    spark.sql(expire_snapshots_sql("lake", "cdc.t1", retention_hours=168))
    spark.sql(remove_orphan_files_sql("lake", "cdc.t1", retention_hours=168))
    print("ICEBERG_RUNTIME_OK")
    spark.stop()
    """
)


@pytest.mark.skipif(
    iceberg_jar() is None,
    reason="no iceberg-spark-runtime jar on this box "
    "(docs/LAKEHOUSE.md: recipe is golden-pinned; this test executes it "
    "the moment the jar appears)",
)
def test_iceberg_merge_and_maintenance_execute_for_real():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _ICEBERG_SCRIPT.format(repo=repo, jar=iceberg_jar())
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert "ICEBERG_RUNTIME_OK" in out.stdout


@pytest.mark.skipif(
    not delta_available(),
    reason="delta-spark not installed (docs/LAKEHOUSE.md §Delta)",
)
def test_delta_merge_and_vacuum_execute_for_real():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = textwrap.dedent(
        f"""
        import sys, tempfile
        sys.path.insert(0, {repo!r})
        from delta import configure_spark_with_delta_pip
        from pyspark.sql import SparkSession
        from arcane_framework_scala_spark.queries.maintenance import (
            delta_optimize_sql, delta_vacuum_sql,
        )
        from arcane_framework_scala_spark.queries.merge import (
            SQL_SERVER_CHANGE_TRACKING,
        )
        from arcane_framework_scala_spark.sinks.merge_sink import CatalogTarget

        b = (
            SparkSession.builder.master("local[4]")
            .appName("delta-runtime")
            .config("spark.ui.enabled", "false")
            .config(
                "spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension",
            )
            .config(
                "spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog",
            )
            .config(
                "spark.sql.warehouse.dir",
                tempfile.mkdtemp(prefix="arcane_delta_wh_"),
            )
        )
        spark = configure_spark_with_delta_pip(b).getOrCreate()
        schema = (
            "ARCANE_MERGE_KEY string, SYS_CHANGE_VERSION long, "
            "SYS_CHANGE_OPERATION string, k long, v string"
        )
        tgt = CatalogTarget(spark, "default.arcane_delta_t1")
        tgt.merge(
            spark.createDataFrame([("a", 1, "I", 1, "x")], schema),
            SQL_SERVER_CHANGE_TRACKING,
        )
        tgt.merge(
            spark.createDataFrame(
                [("a", 2, "U", 1, "x2"), ("c", 2, "I", 3, "z")], schema
            ),
            SQL_SERVER_CHANGE_TRACKING,
        )
        rows = sorted(
            (r["ARCANE_MERGE_KEY"], r["v"])
            for r in spark.table("default.arcane_delta_t1").collect()
        )
        assert rows == [("a", "x2"), ("c", "z")], rows
        spark.sql(delta_optimize_sql("default.arcane_delta_t1"))
        spark.conf.set(
            "spark.databricks.delta.retentionDurationCheck.enabled", "false"
        )
        spark.sql(delta_vacuum_sql("default.arcane_delta_t1", retention_hours=0))
        print("DELTA_RUNTIME_OK")
        spark.stop()
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert "DELTA_RUNTIME_OK" in out.stdout


@pytest.mark.skipif(
    iceberg_jar() is None,
    reason="no iceberg-spark-runtime jar on this box — the jar-free "
    "export (sources/iceberg_reader.py) is conformance-pinned against "
    "the public spec meanwhile (tests/test_iceberg_reader.py); this "
    "test round-trips it through the REAL connector when one appears",
)
def test_real_connector_reads_our_iceberg_export():
    """The true-interop check for export_iceberg: a table our jar-free
    writer produced is registered and read by the REAL Iceberg runtime
    (HadoopTables path-based read), snapshot history included."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jar = iceberg_jar()
    script = textwrap.dedent(
        f"""
        import sys, tempfile, os
        sys.path.insert(0, {repo!r})
        from pyspark.sql import SparkSession
        from arcane_framework_scala_spark.sinks.merge_sink import (
            SnapshotParquetTarget,
        )
        from arcane_framework_scala_spark.sources import (
            iceberg_reader as ir,
        )

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("iceberg-export-roundtrip")
            .config("spark.ui.enabled", "false")
            .config("spark.jars", {jar!r})
            .config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions."
                "IcebergSparkSessionExtensions",
            )
            .config(
                "spark.sql.catalog.hadoop_tables",
                "org.apache.iceberg.spark.SparkCatalog",
            )
            .config("spark.sql.catalog.hadoop_tables.type", "hadoop")
            .config(
                "spark.sql.catalog.hadoop_tables.warehouse",
                tempfile.mkdtemp(prefix="arcane_ice_rt_"),
            )
            .getOrCreate()
        )
        tmp = tempfile.mkdtemp(prefix="arcane_ice_exp_")
        t = SnapshotParquetTarget(spark, os.path.join(tmp, "src"))
        t.overwrite(spark.range(50).selectExpr("id", "id * 2 AS v"))
        out = os.path.join(tmp, "pub")
        ir.export_iceberg(t, out)
        t.overwrite(spark.range(20).selectExpr("id", "id * 3 AS v"))
        ir.export_iceberg(t, out)
        # the REAL connector reads the jar-free export, history included
        cur = spark.read.format("iceberg").load(out)
        assert cur.count() == 20, cur.count()
        snaps = spark.read.format("iceberg").load(out + "#snapshots")
        assert snaps.count() == 2, snaps.count()
        first = ir.snapshot_log(out)[0]["snapshot-id"]
        old = (
            spark.read.format("iceberg")
            .option("snapshot-id", str(first))
            .load(out)
        )
        assert old.count() == 50, old.count()
        print("ICEBERG_EXPORT_ROUNDTRIP_OK")
        spark.stop()
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert "ICEBERG_EXPORT_ROUNDTRIP_OK" in out.stdout
