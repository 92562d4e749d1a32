"""Merge-key derivation expressions (reference P3/P4/P5).

Byte-parity with the reference encodings matters: existing targets keyed by
the reference must be resumable by this engine (SURVEY §7.3 risk register).

- **MSSQL** (computed on SQL Server in the reference,
  ``get_select_delta_query.sql:4`` / ``QueryProvider.scala:215-218``):
  ``lower(convert(nvarchar(128), HashBytes('SHA2_256', pk1+'#'+pk2…), 2))``
  = lower-case hex of SHA-256 over the ``'#'``-joined PK strings **as
  nvarchar, i.e. UTF-16LE bytes** (the casts at ``QueryProvider.scala:217``
  make the ``+`` operands nvarchar, so HashBytes sees UTF-16LE)
  → Spark ``lower(sha2(encode(concat_ws('#', pks), 'UTF-16LE'), 256))``.
  Hashing UTF-8 here would produce different digests for identical keys and
  silently turn resumed updates/deletes into duplicate inserts when mixed
  with server-computed keys.

- **Blob** (computed in-process,
  ``models/batches/BlobBatchCommons.scala:21-36``):
  ``Base64(SHA-256(lowercase(concat(pk values))))``
  → Spark ``base64(unhex(sha2(lower(concat(pks)), 256)))``.

- **Synapse** (``models/cdm/CdmParser.scala:96-115``): merge key is the raw
  ``Id`` column.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def _as_str(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("string")


def mssql_merge_key(*key_columns: Column | str) -> Column:
    """Lower-hex SHA-256 of the '#'-joined primary-key strings in UTF-16LE
    (byte-parity with SQL Server's ``HashBytes`` over nvarchar)."""
    joined = F.concat_ws("#", *[_as_str(c) for c in key_columns])
    return F.lower(F.sha2(F.encode(joined, "UTF-16LE"), 256))


def blob_merge_key(*key_columns: Column | str) -> Column:
    """Base64 of the SHA-256 digest of the lower-cased concatenated keys."""
    return F.base64(
        F.unhex(F.sha2(F.lower(F.concat(*[_as_str(c) for c in key_columns])), 256))
    )


def synapse_merge_key(id_column: Column | str = "Id") -> Column:
    """Synapse CDM merge key: the raw ``Id`` value."""
    return _as_str(id_column)


# ---------------------------------------------------------------------------
# DuckDB-oracle SQL fragments for the same encodings (used by tests and the
# driver's correctness gate; verified expression-parity in tests/).
# ---------------------------------------------------------------------------

def mssql_merge_key_sql(*key_columns: str) -> str:
    # DuckDB has no UTF-16 encoder; interleaving a NUL after every
    # codepoint reproduces UTF-16LE for ASCII/Latin-1 key material (all
    # driver keys are numeric strings — exactly SQL Server's common case).
    cols = ", ".join(f"CAST({c} AS VARCHAR)" for c in key_columns)
    return (
        "lower(sha256(regexp_replace("
        f"concat_ws('#', {cols}), '(.)', '\\1' || chr(0), 'g')))"
    )


def blob_merge_key_sql(*key_columns: str) -> str:
    cols = ", ".join(f"CAST({c} AS VARCHAR)" for c in key_columns)
    return f"to_base64(from_hex(sha256(lower(concat({cols})))))"
