"""SQL type-string parsing (SqlUtils parity) and skew-salting operators."""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from arcane_framework_scala_spark.operators.salting import salted_join, two_phase_agg
from arcane_framework_scala_spark.schema.sql_types import (
    jdbc_type_to_spark,
    parse_trino_type,
)


def test_jdbc_codes():
    assert jdbc_type_to_spark(-5) == T.LongType()
    assert jdbc_type_to_spark(2, 30, 6) == T.DecimalType(30, 6)
    assert jdbc_type_to_spark(3, 10, 2) == T.DecimalType(10, 2)
    assert jdbc_type_to_spark(93) == T.TimestampNTZType()
    assert jdbc_type_to_spark(2014) == T.TimestampType()
    assert jdbc_type_to_spark(92) == T.LongType()  # TIME → nanos-of-day
    assert jdbc_type_to_spark(-3) == T.BinaryType()
    with pytest.raises(ValueError):
        jdbc_type_to_spark(99999)


def test_trino_scalars_and_params():
    assert parse_trino_type("bigint") == T.LongType()
    assert parse_trino_type("varchar(128)") == T.StringType()
    assert parse_trino_type("decimal(30, 6)") == T.DecimalType(30, 6)
    assert parse_trino_type("timestamp(6)") == T.TimestampNTZType()
    assert parse_trino_type("timestamp(6) with time zone") == T.TimestampType()


def test_trino_row_recursive():
    t = parse_trino_type(
        "row(id bigint, tags array(varchar), nested row(a integer, b decimal(10,2)))"
    )
    assert isinstance(t, T.StructType)
    assert t["id"].dataType == T.LongType()
    assert t["tags"].dataType == T.ArrayType(T.StringType(), True)
    nested = t["nested"].dataType
    assert isinstance(nested, T.StructType)
    assert nested["b"].dataType == T.DecimalType(10, 2)


def test_trino_map_and_errors():
    assert parse_trino_type("map(varchar, bigint)") == T.MapType(
        T.StringType(), T.LongType(), True
    )
    with pytest.raises(ValueError):
        parse_trino_type("hyperloglog")


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        "k string, v int",
    )
    small = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, m int")
    plain = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    salted = salted_join(big, small, "k", salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", i % 7) for i in range(1000)] + [("cold", 3)],
        "k string, v int",
    )
    plain = {
        tuple(r)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"), F.max("v").alias("mx"))
        .collect()
    }
    two = {
        tuple(r)
        for r in two_phase_agg(
            df,
            "k",
            {
                "s": ("sum", "v"),
                "c": ("count", F.lit(1)),
                "mx": ("max", "v"),
            },
            salt=8,
        ).collect()
    }
    assert plain == two


def test_two_phase_agg_rejects_non_reducible(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2.0)], "k long, v double")
    for kind in ("avg", "count_distinct", "percentile"):
        with _pytest.raises(ValueError, match="cannot re-reduce"):
            two_phase_agg(df, key="k", aggs={"bad": (kind, "v")})


def test_time_roundtrip_no_migration_diff(spark):
    """The TIME decision (SURVEY §7.3): one encoding — int64 nanos-of-day
    — everywhere. A declared-TIME column must survive JDBC-map →
    ArcaneSchema → StructType with no spurious migration diff, and the
    string→nanos boundary conversion must be exact (no float rounding)."""
    from arcane_framework_scala_spark.schema.schema import (
        ArcaneField,
        ArcaneSchema,
        merge_key_field,
    )
    from arcane_framework_scala_spark.schema.sql_types import (
        jdbc_type_to_spark,
        parse_trino_type,
        time_string_to_nanos,
        time_to_nanos_tsql,
    )
    from arcane_framework_scala_spark.schema.types import TIME

    # every TIME ingress path lands on the same Spark type
    assert jdbc_type_to_spark(92) == T.LongType()
    assert parse_trino_type("time") == T.LongType()
    assert parse_trino_type("time(7)") == T.LongType()

    # declared schema (TIME) vs its own JDBC-discovered twin: the
    # discovered StructType can only say LongType — no migration diff
    declared = ArcaneSchema.of(
        merge_key_field(), ArcaneField("opening_hour", TIME)
    )
    discovered = ArcaneSchema.from_spark(declared.to_spark())
    assert declared.missing_fields(discovered) == []
    assert discovered.missing_fields(declared) == []

    # boundary conversions: T-SQL text is pinned; the Spark-side string
    # parser is integer-exact down to the nanosecond
    assert time_to_nanos_tsql("t") == (
        "CAST(DATEDIFF_BIG(NANOSECOND, CAST('00:00:00' AS time), [t]) "
        "AS BIGINT)"
    )
    df = spark.createDataFrame(
        [("00:00:00",), ("23:59:59.999999999",), ("12:34:56.5",), (None,)],
        "t string",
    ).select(time_string_to_nanos("t").alias("ns"))
    got = [r.ns for r in df.collect()]
    assert got == [0, 86_399_999_999_999, 45_296_500_000_000, None]
