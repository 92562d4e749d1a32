"""Filesystem-path hygiene for multi-path DataFrame reads.

``spark.read.parquet(*paths)`` runs every path through Hadoop's glob
expansion (``GlobPattern``: ``* ? [ ] { } \\`` are metacharacters), so a
literal table path containing any of them silently expands to EXTRA
files — in a pruned-merge rewrite that duplicates rows between the
rewrite group and the carried complement — or fails to resolve at all.
Percent-encoded URI strings from ``input_file_name()`` are not
filesystem paths either. Every multi-path read in this package rebuilds
literal local paths itself and passes them through :func:`glob_escape`.
"""

from __future__ import annotations

import os
import re

_GLOB_META = re.compile(r"([*?\[\]{}\\])")


def glob_escape(path: str) -> str:
    """Backslash-escape Hadoop glob metacharacters in a literal path so
    ``spark.read.<fmt>(path)`` opens exactly that file."""
    return _GLOB_META.sub(r"\\\1", path)


#: Above this many (guess, value) entries the physical-path map rides a
#: broadcast join instead of a literal ``create_map`` expression: a
#: codegen'd map lookup removes a BroadcastExchange (and its fixed
#: per-job cost) from every lineage scan, but a 10^5-file table would
#: bloat the expression tree, so big maps keep the join.
PATH_MAP_LITERAL_MAX = int(os.environ.get("ARCANE_PATH_MAP_LITERAL_MAX", "4096"))


def path_map_lookup(map_rows, key_col):
    """``try_element_at(<literal map>, key_col)`` for small maps, or
    ``None`` when ``map_rows`` is too large (caller falls back to the
    broadcast-join path). ``map_rows`` is ``[(key, value), ...]`` with
    string keys; values may be any literal-able python value."""
    if len(map_rows) > PATH_MAP_LITERAL_MAX:
        return None
    keys = [k for k, _ in map_rows]
    if len(set(keys)) != len(keys):
        # colliding guesses (two files spelling the same candidate URI):
        # create_map would reject the duplicate key — keep the join path,
        # whose per-row assert reports the unmapped file loudly
        return None
    from pyspark.sql import functions as F

    args = []
    for k, v in map_rows:
        args.append(F.lit(k))
        args.append(F.lit(v))
    return F.try_element_at(F.create_map(*args), key_col)
