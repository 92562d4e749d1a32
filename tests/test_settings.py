"""Env bootstrap + graph resolution (reference BaseStreamContext /
FieldSelectionRuleSettings / StreamGraphResolver surfaces)."""

import pytest

from arcane_framework_scala_spark.settings import (
    BACKFILL_MERGE,
    BACKFILL_OVERWRITE,
    STREAMING,
    BackfillBehavior,
    MissingStreamSetting,
    StreamContext,
    resolve_field_rule,
    resolve_runner,
)

_BASE_ENV = {
    "STREAMCONTEXT__STREAM_ID": "orders-stream",
    "STREAMCONTEXT__STREAM_KIND": "sqlserver-ct",
}


def test_context_requires_stream_id_and_kind():
    with pytest.raises(MissingStreamSetting, match="STREAM_ID"):
        StreamContext.from_env({})
    with pytest.raises(MissingStreamSetting, match="STREAM_KIND"):
        StreamContext.from_env({"STREAMCONTEXT__STREAM_ID": "x"})


def test_context_defaults_match_reference():
    ctx = StreamContext.from_env(_BASE_ENV)
    assert ctx.stream_id == "orders-stream"
    assert ctx.stream_kind == "sqlserver-ct"
    assert ctx.is_backfilling is False
    assert ctx.backfill_id == ""
    assert ctx.stream_version == "0.0.0"
    assert ctx.metrics_publisher_interval_seconds == 10.0


def test_context_parses_backfill_and_metrics_settings():
    ctx = StreamContext.from_env(
        {
            **_BASE_ENV,
            "STREAMCONTEXT__BACKFILL": "TRUE",
            "STREAMCONTEXT__BACKFILL_ID": "bf-7",
            "STREAMCONTEXT__BACKFILL_BEHAVIOR": "overwrite",
            "APPLICATION_VERSION": "1.2.3",
            "ARCANE_FRAMEWORK__METRICS_PUBLISHER_INTERVAL_MILLIS": "2500",
        }
    )
    assert ctx.is_backfilling is True
    assert ctx.backfill_id == "bf-7"
    assert ctx.backfill_behavior is BackfillBehavior.OVERWRITE
    assert ctx.stream_version == "1.2.3"
    assert ctx.metrics_publisher_interval_seconds == 2.5


# the reference's StreamGraphResolverTests truth table, verbatim:
# (isBackfilling, backfillBehavior) -> graph builder
@pytest.mark.parametrize(
    "backfill,behavior,expected",
    [
        (True, "merge", BACKFILL_MERGE),
        (True, "overwrite", BACKFILL_OVERWRITE),
        (False, "overwrite", STREAMING),
        (False, "merge", STREAMING),
    ],
)
def test_resolver_truth_table_matches_reference(backfill, behavior, expected):
    ctx = StreamContext.from_env(
        {
            **_BASE_ENV,
            "STREAMCONTEXT__BACKFILL": str(backfill).lower(),
            "STREAMCONTEXT__BACKFILL_BEHAVIOR": behavior,
        }
    )
    assert resolve_runner(ctx) == expected


def test_field_rule_spec_precedence():
    # all > include > exclude > default (FieldSelectionRuleSettings.scala:41-53)
    assert resolve_field_rule(None).mode == "all"
    assert resolve_field_rule({}).mode == "all"
    r = resolve_field_rule({"include": {"fields": ["ColA", "colB"]}})
    assert r.mode == "include" and r.fields == frozenset({"cola", "colb"})
    r = resolve_field_rule({"exclude": {"fields": ["secret"]}}, is_server_side=True)
    assert r.mode == "exclude" and r.is_server_side
    both = {"all": {}, "include": {"fields": ["a"]}}
    assert resolve_field_rule(both).mode == "all"


def test_field_rule_protects_essentials_through_spec():
    r = resolve_field_rule({"exclude": {"fields": ["ARCANE_MERGE_KEY", "note"]}})
    # essential merge-key survives an explicit exclude
    assert r.keeps("ARCANE_MERGE_KEY")
    assert not r.keeps("note")


def test_build_runner_constructs_resolved_runtime(tmp_path):
    from arcane_framework_scala_spark.settings import build_runner
    from arcane_framework_scala_spark.sources.base import MicroBatch
    from arcane_framework_scala_spark.streaming.runner import StreamRunner
    from arcane_framework_scala_spark.streaming.watermark import FileWatermarkStore

    class Src:
        def current_version(self):
            return {"version": 3}

        def changes(self, since):
            return iter([MicroBatch(df=None, watermark={"version": 3})])

    class Sink:
        def apply(self, df):
            pass

    store = FileWatermarkStore(path=str(tmp_path / "wm.json"))
    streaming_ctx = StreamContext.from_env(_BASE_ENV)
    r = build_runner(streaming_ctx, Src(), Sink(), store)
    assert isinstance(r, StreamRunner)

    merge_ctx = StreamContext.from_env(
        {**_BASE_ENV, "STREAMCONTEXT__BACKFILL": "true"}
    )
    run = build_runner(merge_ctx, Src(), Sink(), store)
    assert callable(run) and run() == 1  # bounded re-merge executes

    ow_ctx = StreamContext.from_env(
        {
            **_BASE_ENV,
            "STREAMCONTEXT__BACKFILL": "true",
            "STREAMCONTEXT__BACKFILL_BEHAVIOR": "overwrite",
        }
    )
    with pytest.raises(MissingStreamSetting, match="overwrite_runner_factory"):
        build_runner(ow_ctx, Src(), Sink(), store)
    marker = object()
    assert build_runner(
        ow_ctx, Src(), Sink(), store, overwrite_runner_factory=lambda c: marker
    ) is marker
