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


_CAMEL_BOUNDARY = re.compile(r"([a-z])([A-Z])")


def camel_to_snake(name: str) -> str:
    """camelCase → snake_case, byte-identical with the reference's
    ``StringExtensions.camelCaseToSnakeCase`` (underscore ONLY at a
    lower→upper boundary, then lowercase everything — so ``ABC`` → ``abc``
    and ``AaBbCcDd`` → ``aa_bb_cc_dd``). Used for deriving table/stream
    identifiers from kind names (``MicrosoftSqlServerStream`` →
    ``microsoft_sql_server_stream``)."""
    return _CAMEL_BOUNDARY.sub(r"\1_\2", name).lower()
