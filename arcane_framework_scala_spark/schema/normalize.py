"""Column-name normalization.

The reference strips non-word characters from source column names so that a
SQL Server column ``[c/d]`` becomes engine column ``cd``
(``services/mssql/SqlDataRow.scala:34`` / ``SqlSchema.scala:20``).
"""

from __future__ import annotations

import re

_NON_WORD = re.compile(r"[^A-Za-z0-9_]")


def normalize_name(name: str) -> str:
    """Strip every character that is not ``[A-Za-z0-9_]``."""
    return _NON_WORD.sub("", name)


def normalize_columns(df, columns: list[str] | None = None):
    """Rename every (or the given) DataFrame column to its normalized form."""
    out = df
    for c in columns or df.columns:
        n = normalize_name(c)
        if n != c:
            out = out.withColumnRenamed(c, n)
    return out
