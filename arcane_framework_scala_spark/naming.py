"""Stream-bound table naming — parity with the reference's name scheme.

Every staging / backfill / shard table name in the reference is derived
from the stream and backfill identifiers so that (a) a resumed backfill
finds its own shard tables, (b) maintenance can sweep every table a
stream ever created by prefix, and (c) two streams can never collide in
the staging catalog. Reproduces
``services/naming/DefaultNameGenerator.scala:14-66`` and the 3-part
table-name contract of ``models/settings/TableNaming.scala:9-20``:

- target names are ``{warehouse}.{namespace}.{name}`` (anything else is
  an error);
- ``-`` in identifiers becomes ``_`` (Iceberg/Trino identifier safety);
- backfill staging prefix: ``backfill__{stream_id}``;
- backfill table: ``backfill__{stream_id}__{backfill_id}``;
- shard table: ``backfill__{stream_id}__{backfill_id}__shard__{shard_id}``;
- streaming staging prefix: ``stream__{stream_id}__stage``;
- staging table: ``{prefix}__{uuid}`` (uuid injectable for tests).

A shard carrying a different backfill id than the generator's is an
error (``DefaultNameGenerator.scala:37-39``) — a resumed run must never
adopt another run's shards.
"""

from __future__ import annotations

import uuid as _uuid
from dataclasses import dataclass
from typing import NamedTuple


class TableNameParts(NamedTuple):
    warehouse: str
    namespace: str
    name: str


def table_name_parts(full_name: str) -> TableNameParts:
    """``{warehouse}.{namespace}.{name}`` → parts; extra segments beyond
    the third are tolerated like the reference's list match (head-first),
    fewer are an error."""
    segs = full_name.split(".")
    if len(segs) < 3 or not all(segs[:3]):
        raise ValueError(
            f"Invalid table name format for {full_name!r}. "
            "Must be {warehouse}.{namespace}.{name}"
        )
    return TableNameParts(segs[0], segs[1], segs[2])


def _safe(identifier: str) -> str:
    return identifier.replace("-", "_")


@dataclass(frozen=True)
class NameGenerator:
    """Deterministic name derivation for one (stream, backfill) pair."""

    target_table_full_name: str
    stream_id: str
    backfill_id: str = ""

    @property
    def target_table_name(self) -> str:
        return table_name_parts(self.target_table_full_name).name

    @property
    def backfill_tables_prefix(self) -> str:
        return f"backfill__{_safe(self.stream_id)}"

    @property
    def backfill_table_name(self) -> str:
        if not self.backfill_id:
            raise ValueError(f"Invalid backfillId: {self.backfill_id!r}")
        return f"{self.backfill_tables_prefix}__{_safe(self.backfill_id)}"

    def shard_table_name(
        self, shard_id: str, shard_backfill_id: str | None = None
    ) -> str:
        if shard_backfill_id is not None and shard_backfill_id != self.backfill_id:
            raise ValueError(
                "Shard carries an unknown backfill identifier: "
                f"{shard_backfill_id!r}"
            )
        if not self.backfill_id:
            raise ValueError(f"Invalid backfillId: {self.backfill_id!r}")
        return "__".join(
            [
                self.backfill_tables_prefix,
                _safe(self.backfill_id),
                "shard",
                shard_id,
            ]
        )

    @property
    def staging_table_prefix(self) -> str:
        return f"stream__{_safe(self.stream_id)}__stage"

    def staging_table_name(self, table_id: str | None = None) -> str:
        tid = table_id if table_id is not None else str(_uuid.uuid4())
        return f"{self.staging_table_prefix}__{_safe(tid)}"


def names_for_context(context, target_table_full_name: str) -> NameGenerator:
    """Bind a generator to a parsed ``settings.StreamContext`` — the
    counterpart of ``DefaultNameGenerator.layer`` building from
    ``PluginStreamContext`` (DefaultNameGenerator.scala:60-66)."""
    return NameGenerator(
        target_table_full_name=target_table_full_name,
        stream_id=context.stream_id,
        backfill_id=context.backfill_id,
    )
