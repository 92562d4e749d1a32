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

import re

_GLOB_META = re.compile(r"([*?\[\]{}\\])")


def glob_escape(path: str) -> str:
    """Backslash-escape Hadoop glob metacharacters in a literal path so
    ``spark.read.<fmt>(path)`` opens exactly that file."""
    return _GLOB_META.sub(r"\\\1", path)
