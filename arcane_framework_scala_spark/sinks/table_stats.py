"""Table statistics (reference K4/A3-A5, ``IcebergTablePropertyManager``).

The reference computes table size (records + bytes) by scanning the Iceberg
file manifest, partition counts from the ``PARTITIONS`` metadata table, and
per-column byte sizes from column stats
(``services/iceberg/IcebergTablePropertyManager.scala:70-108``). Two
equivalents here:

- **Catalog path** (production, Iceberg attached): SQL builders over the
  ``<table>.files`` / ``<table>.partitions`` metadata tables — pure
  manifest reads, no data scan, O(manifest) regardless of table size.
- **Parquet-dir path** (catalog-free, local tests): the same numbers from
  parquet footers. Footers are read on the driver in a thread pool — this
  is a *metadata* operation exactly like the reference's manifest scan; the
  data itself is never read. Fine to ~10⁵ files; beyond that use the
  catalog path (the whole point of a manifest).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# Catalog path: Iceberg metadata-table SQL (A3/A4/A5)
# ---------------------------------------------------------------------------


def table_size_sql(table: str) -> str:
    """A3: records + bytes from the file manifest (no data scan)."""
    return (
        "SELECT sum(record_count) AS records, "
        f"sum(file_size_in_bytes) AS bytes FROM {table}.files"
    )


def partition_count_sql(table: str) -> str:
    """A5: partition count from the partitions metadata table."""
    return f"SELECT count(*) AS partitions FROM {table}.partitions"


def column_sizes_sql(table: str) -> str:
    """A4: per-column byte sums from manifest column stats. ``column_sizes``
    is a map<int,bigint> keyed by field id — explode and sum."""
    return (
        "SELECT key AS field_id, sum(value) AS bytes "
        f"FROM {table}.files LATERAL VIEW explode(column_sizes) AS key, value "
        "GROUP BY key"
    )


# ---------------------------------------------------------------------------
# Parquet-dir path: same stats from footers (catalog-free)
# ---------------------------------------------------------------------------


@dataclass
class TableStats:
    records: int = 0
    bytes: int = 0
    files: int = 0
    #: column name -> total compressed bytes across all row groups
    column_bytes: dict[str, int] = field(default_factory=dict)


def _parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, names in os.walk(path):
        out.extend(
            os.path.join(root, n)
            for n in names
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        )
    return sorted(out)


def _footer_stats(file_path: str) -> TableStats:
    import pyarrow.parquet as pq

    md = pq.ParquetFile(file_path).metadata
    st = TableStats(records=md.num_rows, bytes=os.path.getsize(file_path), files=1)
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            st.column_bytes[name] = (
                st.column_bytes.get(name, 0) + col.total_compressed_size
            )
    return st


def table_stats(path: str, max_workers: int = 16) -> TableStats:
    """Records, bytes, file count, and per-column compressed sizes for a
    parquet file or directory — footer reads only, parallelized on the
    driver like the reference's manifest scan."""
    files = _parquet_files(path)
    total = TableStats()
    if not files:
        return total
    with ThreadPoolExecutor(max_workers=min(max_workers, len(files))) as pool:
        for st in pool.map(_footer_stats, files):
            total.records += st.records
            total.bytes += st.bytes
            total.files += st.files
            for name, b in st.column_bytes.items():
                total.column_bytes[name] = total.column_bytes.get(name, 0) + b
    return total


def partition_count(path: str, partition_cols: list[str] | None = None) -> int:
    """A5 for hive-layout parquet dirs: number of distinct leaf partition
    directories (1 for an unpartitioned dataset)."""
    files = _parquet_files(path)
    return len({os.path.dirname(f) for f in files})


def avg_row_bytes(stats: TableStats) -> float:
    """Row-size estimate feeding chunk sizing (the reference's
    MemoryBoundShaper derives chunk size from exactly this ratio,
    ``MemoryBoundShaper.scala:84-147``)."""
    return stats.bytes / stats.records if stats.records else 0.0
