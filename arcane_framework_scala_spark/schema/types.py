"""Engine type system and its mapping onto Spark SQL types.

Re-expresses the reference's ``ArcaneType`` enum
(``models/schemas/ArcaneSchema.scala:13-29`` in the reference repo) as a
Python model whose only job is to round-trip cleanly with Spark's
``StructType``:

- ``TIMESTAMP`` (source-local wall clock) → ``TimestampNTZType``
- ``DATETIME_OFFSET`` (zoned) → ``TimestampType`` (session TZ is pinned UTC)
- ``TIME`` has no Spark type → stored as ``LongType`` nanoseconds-of-day
  (documented decision, SURVEY §1.3 / §7.3)
- ``OBJECT`` (semi-structured) → Variant when the runtime supports it, else a
  JSON string
- type equality treats INT ≡ SHORT and compares lists/structs structurally
  (reference ``typeEquals``, ``ArcaneSchema.scala:31-40``)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.types as T


@dataclass(frozen=True)
class ArcaneType:
    """A named scalar/complex engine type; compare with :func:`type_equals`."""

    name: str
    # BigDecimal precision/scale
    precision: int | None = None
    scale: int | None = None
    # List element type
    element: "ArcaneType | None" = None
    # Struct fields: (name, type) pairs
    fields: tuple[tuple[str, "ArcaneType"], ...] = field(default=())

    def __repr__(self) -> str:  # compact, test-friendly
        if self.name == "decimal":
            return f"decimal({self.precision},{self.scale})"
        if self.name == "list":
            return f"list<{self.element!r}>"
        if self.name == "struct":
            inner = ",".join(f"{n}:{t!r}" for n, t in self.fields)
            return f"struct<{inner}>"
        return self.name


LONG = ArcaneType("long")
BYTE_ARRAY = ArcaneType("binary")
BOOLEAN = ArcaneType("boolean")
STRING = ArcaneType("string")
DATE = ArcaneType("date")
TIMESTAMP = ArcaneType("timestamp")  # no zone — source-local wall clock
DATETIME_OFFSET = ArcaneType("datetime_offset")  # zoned instant
DOUBLE = ArcaneType("double")
INT = ArcaneType("int")
FLOAT = ArcaneType("float")
SHORT = ArcaneType("short")
TIME = ArcaneType("time")  # nanos-of-day, no Spark equivalent
OBJECT = ArcaneType("object")  # semi-structured


def decimal(precision: int, scale: int) -> ArcaneType:
    return ArcaneType("decimal", precision=precision, scale=scale)


def list_of(element: ArcaneType) -> ArcaneType:
    return ArcaneType("list", element=element)


def struct_of(*fields: tuple[str, ArcaneType]) -> ArcaneType:
    return ArcaneType("struct", fields=tuple(fields))


def type_equals(a: ArcaneType, b: ArcaneType) -> bool:
    """Structural equality with INT ≡ SHORT widening (reference semantics)
    and TIME ≡ LONG representational identity: TIME's engine encoding IS
    int64 nanos-of-day (to_spark_type maps both to LongType, and Spark
    can never round-trip a LongType back to TIME), so a declared-TIME
    field must not raise a migration diff against its own JDBC-discovered
    long twin (SURVEY §7.3 decision; one encoding everywhere)."""
    if {a.name, b.name} == {"int", "short"} or (a.name == b.name == "int") or (
        a.name == b.name == "short"
    ):
        return True
    if {a.name, b.name} == {"time", "long"}:
        return True
    if a.name != b.name:
        return False
    if a.name == "decimal":
        return (a.precision, a.scale) == (b.precision, b.scale)
    if a.name == "list":
        assert a.element is not None and b.element is not None
        return type_equals(a.element, b.element)
    if a.name == "struct":
        if len(a.fields) != len(b.fields):
            return False
        return all(
            an.lower() == bn.lower() and type_equals(at, bt)
            for (an, at), (bn, bt) in zip(a.fields, b.fields)
        )
    return True


def _variant_or_string() -> T.DataType:
    # Spark 4 exposes VariantType; fall back to a JSON string column.
    vt = getattr(T, "VariantType", None)
    return vt() if vt is not None else T.StringType()


def to_spark_type(t: ArcaneType) -> T.DataType:
    """ArcaneType → Spark DataType (SURVEY §1.3 mapping)."""
    simple: dict[str, T.DataType] = {
        "long": T.LongType(),
        "binary": T.BinaryType(),
        "boolean": T.BooleanType(),
        "string": T.StringType(),
        "date": T.DateType(),
        "timestamp": T.TimestampNTZType(),
        "datetime_offset": T.TimestampType(),
        "double": T.DoubleType(),
        "int": T.IntegerType(),
        "float": T.FloatType(),
        "short": T.ShortType(),
        "time": T.LongType(),  # nanos-of-day encoding
    }
    if t.name in simple:
        return simple[t.name]
    if t.name == "decimal":
        return T.DecimalType(t.precision or 38, t.scale or 18)
    if t.name == "list":
        assert t.element is not None
        return T.ArrayType(to_spark_type(t.element), containsNull=True)
    if t.name == "struct":
        return T.StructType(
            [T.StructField(n, to_spark_type(ft), nullable=True) for n, ft in t.fields]
        )
    if t.name == "object":
        return _variant_or_string()
    raise ValueError(f"unmapped ArcaneType: {t!r}")


def from_spark_type(dt: T.DataType) -> ArcaneType:
    """Spark DataType → ArcaneType (inference path for parquet/JDBC schemas)."""
    mapping: list[tuple[type, ArcaneType]] = [
        (T.LongType, LONG),
        (T.BinaryType, BYTE_ARRAY),
        (T.BooleanType, BOOLEAN),
        (T.StringType, STRING),
        (T.DateType, DATE),
        (T.TimestampNTZType, TIMESTAMP),
        (T.TimestampType, DATETIME_OFFSET),
        (T.DoubleType, DOUBLE),
        (T.IntegerType, INT),
        (T.FloatType, FLOAT),
        (T.ShortType, SHORT),
        (T.ByteType, SHORT),
    ]
    for cls, at in mapping:
        if isinstance(dt, cls):
            return at
    if isinstance(dt, T.DecimalType):
        return decimal(dt.precision, dt.scale)
    if isinstance(dt, T.ArrayType):
        return list_of(from_spark_type(dt.elementType))
    if isinstance(dt, T.StructType):
        return struct_of(*[(f.name, from_spark_type(f.dataType)) for f in dt.fields])
    if isinstance(dt, T.MapType):
        # engine has no map type; carry as OBJECT (semi-structured)
        return OBJECT
    vt = getattr(T, "VariantType", None)
    if vt is not None and isinstance(dt, vt):
        return OBJECT
    raise ValueError(f"unmapped Spark type: {dt}")
