"""Partition-layout advisor: size a table's write + shuffle knobs from data.

The 100×-scale-up question the brief keeps asking ("would this partition
strategy hold at 1000× the data?") has a computable core: estimated
uncompressed bytes → how many output files at the target file size, how
many shuffle partitions so each fits executor memory, expected rows per
file. The reference does the same kind of arithmetic for its source
shards (``QueryProvider.scala:169-193`` — cost → ``1+log³(cost)`` MiB
shard size, clamped) and blob shards (≤10 GiB, ≤10 000 files,
``BlobListingStreamingSource.scala:84-96``); this operator is that
estimator turned onto the *sink/shuffle* side, kept engine-portable.

Row width model (deterministic, schema-driven): fixed in-memory widths
per primitive (8 for 64-bit types, 4 for 32-bit, 16 for decimals) and
``4 + length`` for strings — the same flavor of per-type cost matrix as
``MemoryBoundShaper``'s row estimate (``MemoryBoundShaper.scala:88-141``,
ported in ``streaming/throughput.py``). All integer arithmetic
(``ceil(a/b) = (a+b-1) div b``), so the advisory hash-matches a DuckDB
twin exactly.

The estimate is ONE aggregation over a narrow projection (string-length
sums + a count) — no driver materialization; at 100 TB you run it on the
same scan that writes the table (or on Iceberg's ``files`` metadata, as
``sinks/table_stats.py`` does for the exact post-write numbers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

__all__ = ["partition_advisor", "partition_advisor_sql"]

MB = 1024 * 1024

#: fixed per-type byte widths (strings add their length at runtime)
_WIDTHS = {
    T.LongType: 8,
    T.DoubleType: 8,
    T.TimestampType: 8,
    T.TimestampNTZType: 8,
    T.IntegerType: 4,
    T.FloatType: 4,
    T.DateType: 4,
    T.ShortType: 2,
    T.BooleanType: 1,
}


def _width_cols(schema: T.StructType):
    """(fixed_width_per_row, [string col names]) from a Spark schema."""
    fixed, strings = 0, []
    for f in schema.fields:
        if isinstance(f.dataType, T.StringType):
            strings.append(f.name)
        elif isinstance(f.dataType, T.DecimalType):
            fixed += 16
        else:
            fixed += _WIDTHS.get(type(f.dataType), 8)
    return fixed, strings


def partition_advisor(
    df: DataFrame,
    target_file_mb: int = 512,
    target_partition_mb: int = 128,
    min_partitions: int = 32,
    max_partitions: int = 2000,
) -> DataFrame:
    """One-row layout advisory for writing/shuffling ``df``.

    Output: ``(total_rows, est_bytes, n_files, rows_per_file,
    shuffle_partitions)`` — files sized to ``target_file_mb`` of
    estimated bytes, shuffle partitions to ``target_partition_mb``
    clamped to ``[min_partitions, max_partitions]``.
    """
    fixed, strings = _width_cols(df.schema)
    row_bytes = F.lit(fixed)
    for s in strings:
        row_bytes = row_bytes + F.coalesce(F.length(s), F.lit(0)) + 4
    agg = df.select(row_bytes.cast("long").alias("rb")).agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum("rb").alias("est_bytes"),
    )
    fsz = target_file_mb * MB
    psz = target_partition_mb * MB
    return agg.select(
        "total_rows",
        "est_bytes",
        F.expr(f"greatest(1, (est_bytes + {fsz - 1}) div {fsz})").alias(
            "n_files"
        ),
        F.expr(
            f"total_rows div greatest(1, (est_bytes + {fsz - 1}) div {fsz})"
        ).alias("rows_per_file"),
        F.expr(
            f"least({max_partitions}, greatest({min_partitions}, "
            f"(est_bytes + {psz - 1}) div {psz}))"
        ).alias("shuffle_partitions"),
    )


def partition_advisor_sql(
    table: str,
    string_cols: tuple[str, ...],
    fixed_width: int,
    target_file_mb: int = 512,
    target_partition_mb: int = 128,
    min_partitions: int = 32,
    max_partitions: int = 2000,
) -> str:
    """DuckDB oracle for :func:`partition_advisor`; the caller supplies
    the schema-derived constants (fixed width + string column list) so
    both engines price exactly the same row model."""
    slen = " + ".join(
        [str(fixed_width)]
        + [f"coalesce(length({s}), 0) + 4" for s in string_cols]
    )
    fsz = target_file_mb * MB
    psz = target_partition_mb * MB
    return f"""
WITH agg AS (
  SELECT count(*) AS total_rows,
         CAST(sum(CAST({slen} AS BIGINT)) AS BIGINT) AS est_bytes
  FROM {table}
)
SELECT total_rows, est_bytes,
       greatest(1, (est_bytes + {fsz - 1}) // {fsz}) AS n_files,
       total_rows // greatest(1, (est_bytes + {fsz - 1}) // {fsz})
         AS rows_per_file,
       least({max_partitions}, greatest({min_partitions},
             (est_bytes + {psz - 1}) // {psz})) AS shuffle_partitions
FROM agg
""".strip()
