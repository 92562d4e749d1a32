"""Data-layout keys for multi-dimensional file pruning.

Z-ordering (bit-interleaved space-filling curve — the technique behind
Delta Lake's ``OPTIMIZE ZORDER BY`` and Iceberg's zorder rewrite):
rows sorted/range-partitioned by the interleaved key cluster *every*
participating column simultaneously, so per-file min/max statistics
prune scans filtered on ANY of the columns — where sorting by a single
column only helps that column's predicates.

Everything is codegen'd integer arithmetic (shift/and/sum), no UDFs:

1. each column is min-max normalized to ``bits``-bit integers via a
   broadcast 1-row bounds aggregate (at 100 TB compute bounds once and
   pass them as literals — they rarely move);
2. the key interleaves bit i of column j into position
   ``i * n_cols + j``;
3. writers then ``repartitionByRange(zkey).sortWithinPartitions(zkey)``
   — each output file covers a tight hyper-rectangle of the column
   space.

The key itself is deterministic, engine-portable bit math — the gate
verifies it value-exactly against a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def _normalized(col: str, bits: int) -> Column:
    lo, hi = F.col(f"__lo_{col}"), F.col(f"__hi_{col}")
    span = F.greatest(hi - lo, F.lit(1))
    scaled = ((F.col(col) - lo) * ((1 << bits) - 1)) / span
    return F.floor(scaled).cast("long")


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
) -> DataFrame:
    """Append ``zkey`` (bit-interleaved long) to ``df``. ``bits`` per
    column; ``bits * len(cols)`` must be ≤ 63."""
    if bits * len(cols) > 63:
        raise ValueError("zkey exceeds int64: reduce bits or columns")
    bounds = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(c).cast("long").alias(f"__lo_{c}"),
                F.max(c).cast("long").alias(f"__hi_{c}"),
            )
        ]
    )
    with_bounds = df.join(F.broadcast(bounds))
    norms = [(c, _normalized(c, bits)) for c in cols]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, (_, n) in enumerate(norms):
            bit = F.shiftright(n, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * len(cols) + j)
    out_cols = [c for c in df.columns]
    return with_bounds.select(*out_cols, key.alias("zkey"))


def zorder_key_sql(
    table: str,
    cols: list[str],
    bits: int = 8,
    select_cols: list[str] | None = None,
) -> str:
    """DuckDB twin: identical normalization and interleave."""
    lo = {c: f"(SELECT min(CAST({c} AS BIGINT)) FROM {table})" for c in cols}
    hi = {c: f"(SELECT max(CAST({c} AS BIGINT)) FROM {table})" for c in cols}
    bounds = ", ".join(
        f"{lo[c]} AS lo_{c}, {hi[c]} AS hi_{c}" for c in cols
    )
    norm = {
        c: (
            f"CAST(floor((({c} - lo_{c}) * {(1 << bits) - 1}) / "
            f"greatest(hi_{c} - lo_{c}, 1)) AS BIGINT)"
        )
        for c in cols
    }
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"(((n_{c} >> {i}) & 1) << {i * len(cols) + j})")
    sel = ", ".join(select_cols or cols)
    norms_sel = ", ".join(f"{norm[c]} AS n_{c}" for c in cols)
    return f"""
SELECT {sel}, CAST({' + '.join(terms)} AS BIGINT) AS zkey
FROM (SELECT t.*, {norms_sel}
      FROM {table} t, (SELECT {bounds}) b)
"""
