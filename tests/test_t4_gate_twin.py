"""Cross-engine twin for the t4_shaper_chain gate arithmetic.

The gate hash-compares the Python MemoryBoundShaper chain against a
DuckDB SQL re-derivation at three scale factors — three data points.
This property test sweeps THOUSANDS of random table-stat inputs
(row count, summed string chars) through both engines without Spark,
hunting the one genuine risk in the chain: a `floor()` landing within
an ulp of an integer after `exp`/`ln` (docs/DETERMINISM.md, r4 note).
No Spark session needed — the Spark side of the gate feeds the SAME
Python chain, so Python-vs-DuckDB equality here is gate equality."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import pyspark.sql.types as T

from arcane_framework_scala_spark.streaming.throughput import (
    MemoryAwareShaper,
    MemoryBoundShaper,
    estimate_string_length,
)

_FREE = 4 << 30

_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# the oracle arithmetic from __spark_entry__._T4_SHAPER_SQL with the
# documents-scan CTE replaced by injected (n, b) literals
_ORACLE = """
WITH par AS (
  SELECT CAST({n} AS BIGINT) AS n, CAST({b} AS BIGINT) AS b,
         CAST({b} AS BIGINT) + 16 * CAST({n} AS BIGINT) AS s,
         CASE WHEN {b} <= 0 THEN CAST(100 AS BIGINT)
              ELSE CAST(floor({b} * 1.5 / {n} / 2) AS BIGINT) END AS slen,
         4294967296.0 AS free
), model AS (
  SELECT *,
         greatest(CAST(216 + 6 * slen AS DOUBLE), n / (s + 1.0)) AS row_size,
         0.8 * (2.0 / (1.0 + exp(-2.0 * (0.5 * ln(n) + 0.5 * ln(s)))) - 1.0)
           AS cutoff
  FROM par
), chunk AS (
  SELECT *, free * cutoff / (row_size + 1) / 2 AS chunk_f FROM model
), appl AS (
  SELECT *,
         CAST(floor(greatest(chunk_f, 1.0)) AS BIGINT) AS chunk_rows,
         CAST(floor(least(chunk_f, 32 / 2.0)) AS BIGINT) AS chunk_capped,
         CAST(floor(row_size) AS BIGINT) AS elem
  FROM chunk
)
SELECT slen AS est_string_len,
       elem AS row_size_bytes,
       chunk_rows,
       chunk_capped AS chunk_rows_partitioned,
       CAST(floor(greatest(free / (elem + 1), 0.1 * chunk_rows, 10.0))
            AS BIGINT) AS burst_rows,
       CAST(floor(chunk_rows * (1 + (1 - exp(-0.1))) / 10.0) AS BIGINT) + 1
         AS rate_rows_per_interval,
       greatest(CAST(floor(chunk_rows / greatest(n / 8, 1.0)) AS BIGINT), 1)
         AS files_per_trigger,
       CAST(floor(10 * (2.0 / (1.0 + exp(-1.0 * (2 * chunk_rows * row_size
                                                 / (free + 1)))) - 1.0))
            AS BIGINT) AS chunk_cost,
       greatest(CAST(floor(free * 0.8 / (2 * (216 + 9 * slen))) AS BIGINT), 1)
         AS aware_max_rows
FROM appl
"""


def _python_chain(n: int, b: int) -> dict:
    s_bytes = b + 16 * n
    shaper = MemoryBoundShaper(
        free_memory_fn=lambda: _FREE,
        gc_count_fn=lambda: 0,
        uptime_fn=lambda: 100.0,
    )
    chunk_rows, elem = shaper.estimate_chunk_size(
        _DOCS_SCHEMA, n, s_bytes, partitions=1, string_col_bytes=b
    )
    burst = shaper.estimate_shape_burst(chunk_rows, elem)
    rate_rows, _ = shaper.estimate_shape_rate(chunk_rows)
    files = shaper.files_per_trigger(
        _DOCS_SCHEMA, n, s_bytes, table_files=8, partitions=1,
        string_col_bytes=b,
    )
    cost = shaper.estimate_chunk_cost(chunk_rows)
    part = MemoryBoundShaper(free_memory_fn=lambda: _FREE)
    chunk_capped, _ = part.estimate_chunk_size(
        _DOCS_SCHEMA, n, s_bytes, partitions=32, string_col_bytes=b
    )
    slen = estimate_string_length(b, n)
    aware = MemoryAwareShaper(executor_memory_bytes=_FREE).max_rows(
        _DOCS_SCHEMA, float(slen)
    )
    return {
        "est_string_len": slen,
        "row_size_bytes": elem,
        "chunk_rows": chunk_rows,
        "chunk_rows_partitioned": chunk_capped,
        "burst_rows": burst,
        "rate_rows_per_interval": rate_rows,
        "files_per_trigger": files,
        "chunk_cost": cost,
        "aware_max_rows": aware,
    }


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=10_000_000_000),
    avg_chars=st.integers(min_value=0, max_value=100_000),
    jitter=st.integers(min_value=0, max_value=999),
)
def test_t4_chain_matches_duckdb_arithmetic(n, avg_chars, jitter, con):
    """Python shaper chain == DuckDB oracle arithmetic, for table stats
    far beyond what any testdata SF exercises (up to 10^10 rows, 100 kB
    docs) — the 100 TB regime the gate itself can't reach."""
    b = n * avg_chars + jitter  # summed 2-byte chars, non-multiple jitter
    expected = _python_chain(n, b)
    row = con.execute(_ORACLE.format(n=n, b=b)).fetchone()
    cols = [d[0] for d in con.description]
    got = dict(zip(cols, (int(v) for v in row)))
    assert got == expected, (n, b)
