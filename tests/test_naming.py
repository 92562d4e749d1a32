"""NameGenerator parity with DefaultNameGenerator.scala:14-66 and the
TableNaming 3-part contract."""

import pytest

from arcane_framework_scala_spark.naming import (
    NameGenerator,
    table_name_parts,
)


def _gen(backfill="bf-001"):
    return NameGenerator(
        target_table_full_name="wh.ns.orders",
        stream_id="stream-a",
        backfill_id=backfill,
    )


def test_table_name_parts_contract():
    assert table_name_parts("wh.ns.orders") == ("wh", "ns", "orders")
    # extra segments: head-first match like the reference's list pattern
    assert table_name_parts("wh.ns.orders.extra").name == "orders"
    for bad in ("orders", "ns.orders", "..orders", ""):
        with pytest.raises(ValueError):
            table_name_parts(bad)


def test_identifier_dashes_become_underscores():
    g = _gen()
    assert g.backfill_tables_prefix == "backfill__stream_a"
    assert g.backfill_table_name == "backfill__stream_a__bf_001"
    assert g.staging_table_prefix == "stream__stream_a__stage"


def test_shard_table_name_binds_stream_and_backfill():
    g = _gen()
    assert (
        g.shard_table_name("s7", shard_backfill_id="bf-001")
        == "backfill__stream_a__bf_001__shard__s7"
    )
    # a shard from another backfill run must be rejected
    with pytest.raises(ValueError):
        g.shard_table_name("s7", shard_backfill_id="bf-OTHER")


def test_empty_backfill_id_is_invalid_for_backfill_names():
    g = _gen(backfill="")
    with pytest.raises(ValueError):
        _ = g.backfill_table_name
    with pytest.raises(ValueError):
        g.shard_table_name("s1")
    # streaming names do not need a backfill id
    assert g.staging_table_name("t1") == "stream__stream_a__stage__t1"


def test_staging_table_name_uuid_default_is_unique():
    g = _gen()
    a, b = g.staging_table_name(), g.staging_table_name()
    assert a != b
    assert a.startswith("stream__stream_a__stage__")
    assert "-" not in a.split("stage__")[1]


def test_target_table_name_is_last_part():
    assert _gen().target_table_name == "orders"
