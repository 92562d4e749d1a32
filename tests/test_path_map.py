"""path_map_lookup: the literal map is ONE parsed expression (r12).

r11 built the literal map from per-entry ``F.lit`` calls — two py4j
round trips per entry (~1 ms each), so a 4096-entry map cost ~8 s of
driver time per lineage scan, more than the BroadcastExchange it
replaces (VERDICT r11 "What's wrong" 1). The rendered SQL must produce
values IDENTICAL to the old construction, including paths holding
quotes, backslashes and unicode (URI guesses are real filesystem
strings).
"""

import pyspark.sql.functions as F
import pytest

from arcane_framework_scala_spark.sources.paths import (
    PATH_MAP_LITERAL_MAX,
    _sql_map_literal,
    path_map_lookup,
)

NASTY = [
    ("file:///tmp/plain/part-0.parquet", "a"),
    ("file:///tmp/o'brien/part-1.parquet", "quote'value"),
    ('file:///tmp/back\\slash/part-2.parquet', "back\\slash"),
    ("file:///tmp/percent%20enc/part-3.parquet", "pct %s"),
    ("file:///tmp/uni-é世/part-4.parquet", "uni-é"),
    ("file:///tmp/tab\there", "line1\nline2"),
]


def test_string_values_match_per_entry_lit(spark):
    df = spark.createDataFrame([(k,) for k, _ in NASTY] + [("miss",)], "k string")
    new = df.select(path_map_lookup(NASTY, F.col("k")).alias("v"))
    args = []
    for k, v in NASTY:
        args.append(F.lit(k))
        args.append(F.lit(v))
    old = df.select(
        F.try_element_at(F.create_map(*args), F.col("k")).alias("v")
    )
    assert new.collect() == old.collect()
    assert new.schema == old.schema


def test_int_values_lookup(spark):
    rows = [("file:///a", 7), ("file:///b", 2**40)]
    df = spark.createDataFrame([("file:///a",), ("file:///b",), ("x",)], "k string")
    got = df.select(path_map_lookup(rows, F.col("k")).alias("v")).collect()
    assert [r["v"] for r in got] == [7, 2**40, None]


def test_duplicate_keys_fall_back_to_join():
    assert path_map_lookup([("k", "a"), ("k", "b")], F.col("x")) is None


def test_over_cap_falls_back_to_join():
    rows = [(f"k{i}", "v") for i in range(PATH_MAP_LITERAL_MAX + 1)]
    assert path_map_lookup(rows, F.col("x")) is None


def test_bad_value_type_raises():
    with pytest.raises(TypeError):
        _sql_map_literal([("k", 1.5)])
    with pytest.raises(TypeError):
        _sql_map_literal([("k", True)])


def test_single_parsed_expression_is_fast(spark):
    """Plan-construction cost at a 1k-entry map: the parsed form must
    build in well under the ~2 s the per-entry F.lit form cost (the
    driver-side regression this rewrite removes). Generous bound so a
    slow box never flakes; the old form measured >1.5 s here."""
    import time

    rows = [(f"file:///tmp/t/part-{i:05d}.parquet", f"part-{i:05d}") for i in range(1000)]
    t0 = time.time()
    expr = path_map_lookup(rows, F.col("k"))
    built = time.time() - t0
    assert expr is not None
    assert built < 1.0
