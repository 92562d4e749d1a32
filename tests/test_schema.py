import pyspark.sql.types as T
import pytest

from arcane_framework_scala_spark.schema import types as at
from arcane_framework_scala_spark.schema.normalize import normalize_name
from arcane_framework_scala_spark.schema.schema import (
    ArcaneField,
    ArcaneSchema,
    MERGE_KEY_COLUMN,
    merge_key_field,
)


def test_name_normalization():
    # reference: [c/d] -> cd (SqlDataRow.scala:34)
    assert normalize_name("c/d") == "cd"
    assert normalize_name("plain_name") == "plain_name"
    assert normalize_name("a b.c-d") == "abcd"


def test_type_roundtrip():
    cases = [
        (at.LONG, T.LongType()),
        (at.STRING, T.StringType()),
        (at.TIMESTAMP, T.TimestampNTZType()),
        (at.DATETIME_OFFSET, T.TimestampType()),
        (at.decimal(30, 6), T.DecimalType(30, 6)),
        (at.list_of(at.INT), T.ArrayType(T.IntegerType(), True)),
    ]
    for arcane, spark in cases:
        assert at.to_spark_type(arcane) == spark
        assert at.type_equals(at.from_spark_type(spark), arcane)


def test_int_short_equivalence():
    assert at.type_equals(at.INT, at.SHORT)
    assert not at.type_equals(at.INT, at.LONG)


def test_struct_equality_case_insensitive():
    a = at.struct_of(("Name", at.STRING), ("n", at.INT))
    b = at.struct_of(("name", at.STRING), ("N", at.SHORT))
    assert at.type_equals(a, b)


def test_merge_key_required():
    s = ArcaneSchema.of(ArcaneField("x", at.INT))
    assert not s.is_mergeable
    with pytest.raises(ValueError):
        _ = s.merge_key
    s2 = ArcaneSchema.of(ArcaneField("x", at.INT), merge_key_field())
    assert s2.merge_key.name == MERGE_KEY_COLUMN
    assert s2.pure().names == ["x"]


def test_missing_fields_case_insensitive():
    # reference getMissingFields: ArcaneSchema.scala:151-157
    target = ArcaneSchema.of(ArcaneField("ColA", at.STRING), ArcaneField("colB", at.INT))
    source = ArcaneSchema.of(
        ArcaneField("cola", at.STRING),
        ArcaneField("colb", at.SHORT),  # int≡short → not missing
        ArcaneField("colC", at.DOUBLE),
    )
    missing = target.missing_fields(source)
    assert [f.name for f in missing] == ["colC"]
    assert target.merged_with(source).names == ["ColA", "colB", "colC"]


def test_schema_spark_roundtrip():
    s = ArcaneSchema.of(
        merge_key_field(),
        ArcaneField("v", at.decimal(10, 2)),
        ArcaneField("ts", at.TIMESTAMP),
    )
    st = s.to_spark()
    assert all(f.nullable for f in st.fields)
    back = ArcaneSchema.from_spark(st)
    assert back.names == s.names


def test_camel_to_snake_reference_table():
    """The reference's full StringExtensionTests table, verbatim."""
    from arcane_framework_scala_spark.schema.normalize import camel_to_snake

    cases = [
        ("abc", "abc"),
        ("ABC", "abc"),
        ("aBc", "a_bc"),
        ("AbcdeFgh", "abcde_fgh"),
        ("_AbcdeFgh_", "_abcde_fgh_"),
        ("___", "___"),
        ("AaBbCcDd", "aa_bb_cc_dd"),
        ("MicrosoftSqlServerStream", "microsoft_sql_server_stream"),
        ("MicrosoftSynapseStream", "microsoft_synapse_stream"),
        ("Abcde-Fgh", "abcde-fgh"),
        ("A-_-bcde-Fgh", "a-_-bcde-fgh"),
        ("v0.1.2.3", "v0.1.2.3"),
    ]
    for s, want in cases:
        assert camel_to_snake(s) == want, s
