"""Env-driven stream context + graph resolution (reference settings surface).

The reference bootstraps every stream from environment variables and a JSON
spec: ``models/app/BaseStreamContext.scala:26-55`` (stream id/kind, backfill
flag + resumable backfill id, metrics publisher interval),
``models/settings/FieldSelectionRuleSettings.scala:10-76`` (mutually
exclusive all/include/exclude field rules with non-excludable essential
fields), and ``services/app/StreamGraphResolver.scala:33-44`` (backfill flag
× backfill behavior → which graph builder runs).

This module is the Python counterpart: a frozen ``StreamContext`` parsed
from an env mapping (injectable for tests, ``os.environ`` by default), the
field-rule spec resolver, and ``resolve_runner`` returning the factory kind
the runtime should launch. Pure driver-side configuration — nothing here
touches data paths.
"""

from __future__ import annotations

import enum
import os
from dataclasses import dataclass, field

from arcane_framework_scala_spark.operators.field_filter import FieldSelectionRule

#: reference env names (BaseStreamContext.scala:26-55)
ENV_STREAM_ID = "STREAMCONTEXT__STREAM_ID"
ENV_STREAM_KIND = "STREAMCONTEXT__STREAM_KIND"
ENV_BACKFILL = "STREAMCONTEXT__BACKFILL"
ENV_BACKFILL_ID = "STREAMCONTEXT__BACKFILL_ID"
ENV_BACKFILL_BEHAVIOR = "STREAMCONTEXT__BACKFILL_BEHAVIOR"
ENV_APP_VERSION = "APPLICATION_VERSION"
ENV_METRICS_INTERVAL_MS = "ARCANE_FRAMEWORK__METRICS_PUBLISHER_INTERVAL_MILLIS"


class BackfillBehavior(enum.Enum):
    """``models/settings/backfill/BackfillBehavior`` — how a backfill lands
    in the target: MERGE upserts into the existing table, OVERWRITE stages
    shards and swaps (``CREATE OR REPLACE``)."""

    MERGE = "merge"
    OVERWRITE = "overwrite"


class MissingStreamSetting(RuntimeError):
    """Raised for absent required bootstrap variables — same failure mode as
    the reference's 'Unable to bootstrap the stream' errors."""


@dataclass(frozen=True)
class StreamContext:
    """Parsed bootstrap context for one stream instance."""

    stream_id: str
    stream_kind: str
    is_backfilling: bool = False
    backfill_id: str = ""  # same id across restarts resumes the backfill
    backfill_behavior: BackfillBehavior = BackfillBehavior.MERGE
    stream_version: str = "0.0.0"
    metrics_publisher_interval_seconds: float = 10.0

    @staticmethod
    def from_env(env: dict[str, str] | None = None) -> "StreamContext":
        e = os.environ if env is None else env
        for required in (ENV_STREAM_ID, ENV_STREAM_KIND):
            if not e.get(required):
                raise MissingStreamSetting(
                    "Unable to bootstrap the stream, missing required "
                    f"{required} environment variable"
                )
        interval_ms = e.get(ENV_METRICS_INTERVAL_MS)
        return StreamContext(
            stream_id=e[ENV_STREAM_ID],
            stream_kind=e[ENV_STREAM_KIND],
            is_backfilling=e.get(ENV_BACKFILL, "false").lower() == "true",
            backfill_id=e.get(ENV_BACKFILL_ID, ""),
            backfill_behavior=BackfillBehavior(
                e.get(ENV_BACKFILL_BEHAVIOR, "merge").lower()
            ),
            stream_version=e.get(ENV_APP_VERSION, "0.0.0"),
            metrics_publisher_interval_seconds=(
                int(interval_ms) / 1000.0 if interval_ms else 10.0
            ),
        )


def resolve_field_rule(spec: dict | None, is_server_side: bool = False) -> FieldSelectionRule:
    """``FieldSelectionRuleSetting.resolveSetting``: the spec carries at most
    one of ``all`` / ``include`` / ``exclude``; precedence all > include >
    exclude > default-all (reference FieldSelectionRuleSettings.scala:41-53).

    ``{"include": {"fields": ["a", "b"]}}`` → include-rule on {a, b}.
    """
    spec = spec or {}
    if "all" in spec:
        return FieldSelectionRule(mode="all", is_server_side=is_server_side)
    if "include" in spec:
        return FieldSelectionRule(
            mode="include",
            fields=frozenset(spec["include"].get("fields", [])),
            is_server_side=is_server_side,
        )
    if "exclude" in spec:
        return FieldSelectionRule(
            mode="exclude",
            fields=frozenset(spec["exclude"].get("fields", [])),
            is_server_side=is_server_side,
        )
    return FieldSelectionRule(mode="all", is_server_side=is_server_side)


#: runner kinds resolve_runner can return (graph-builder names in the ref)
STREAMING = "streaming"
BACKFILL_MERGE = "backfill_merge"
BACKFILL_OVERWRITE = "backfill_overwrite"


def resolve_runner(context: StreamContext) -> str:
    """``StreamGraphResolver.resolveGraphBuilder`` (StreamGraphResolver.scala:
    33-44): not backfilling → streaming graph regardless of behavior;
    backfilling → merge or overwrite backfill graph per the behavior.

    The returned kind maps onto this package's runtimes:
    ``streaming`` → ``streaming.runner.StreamRunner`` /
    ``streaming.structured.StructuredBlobStream``;
    ``backfill_merge`` → ``backfill.graph.run_backfill_merge``;
    ``backfill_overwrite`` → ``backfill.graph.BackfillOverwriteRunner``.
    """
    if not context.is_backfilling:
        return STREAMING
    if context.backfill_behavior is BackfillBehavior.MERGE:
        return BACKFILL_MERGE
    return BACKFILL_OVERWRITE


def build_runner(
    context: StreamContext,
    source,
    sink,
    watermark_store,
    field_rule: FieldSelectionRule | None = None,
    stream_settings=None,
    declared_metrics=None,
    overwrite_runner_factory=None,
):
    """The composed-layer counterpart of the resolver: construct the actual
    runtime the resolved kind names (reference ``StreamGraphResolver.
    composedLayer`` wires graph builders the same way).

    - streaming → a ready ``StreamRunner`` (call ``.run()`` / ``.run_once()``)
    - backfill_merge → a zero-arg callable executing the bounded re-merge
      from the stored watermark (resumable via ``backfill_id`` semantics:
      the version-guarded MERGE makes replayed overlap a no-op)
    - backfill_overwrite → delegates to ``overwrite_runner_factory(context)``
      because shard staging needs storage paths the context does not carry;
      raises if the factory is absent.
    """
    kind = resolve_runner(context)
    if kind == STREAMING:
        from arcane_framework_scala_spark.streaming.runner import StreamRunner

        return StreamRunner(
            source=source,
            sink=sink,
            watermark_store=watermark_store,
            settings=stream_settings,
            field_rule=field_rule,
            declared_metrics=declared_metrics,
        )
    if kind == BACKFILL_MERGE:
        from arcane_framework_scala_spark.backfill.graph import run_backfill_merge

        def _run() -> int:
            wm = watermark_store.read()
            return run_backfill_merge(
                source,
                sink,
                watermark_store,
                start_version=wm.version if wm else None,
                field_rule=field_rule,
            )

        return _run
    if overwrite_runner_factory is None:
        raise MissingStreamSetting(
            "backfill_overwrite resolved but no overwrite_runner_factory "
            "was provided (shard staging needs storage paths)"
        )
    return overwrite_runner_factory(context)
