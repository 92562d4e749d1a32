"""Johnson-Lindenstrauss random projection (Rademacher signs), exact-parity.

Embedding compression before clustering / ANN indexing: project ``dim``-d
vectors onto ``out_dim`` pseudo-random ±1 hyperplanes (Achlioptas 2003 —
Rademacher entries satisfy the JL lemma like Gaussians, and the repo
already derives deterministic ±1 planes from md5 for sign-LSH:
``similarity.hyperplanes``). The projection halves/quarters the vector
bytes every downstream shuffle carries.

Determinism: each output coordinate is ONE fixed-order dot-product fold
against a literal plane (Catalyst constant-folds the plane; DuckDB gets
the identical literal list), floored to int64 micro units — no
data-order-dependent float accumulation anywhere, so the gate
hash-matches.

Scale: a pure narrow projection — zero shuffles, codegen'd; the plane
matrix is ``out_dim × dim`` literals (KBs). For very large ``out_dim``
swap literals for a broadcast plane table (same plan class as
``pq.pq_topk``'s LUT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.similarity import (
    _dot,
    hyperplanes,
)

__all__ = ["jl_project", "jl_project_sql"]

_FP = 1_000_000


def jl_project(
    df: DataFrame,
    dim: int = 64,
    out_dim: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, pos, proj_micro): the ``out_dim`` projected coordinates
    per vector in fixed-point micro units."""
    planes = hyperplanes(dim, out_dim, seed)
    from arcane_framework_scala_spark.functions.similarity import (
        _lit_num_array,
    )

    projs = [
        F.floor(
            # one parsed expression per plane, not dim py4j F.lit calls
            # (~0.5 s of driver time per jl_project before r11)
            _dot(F.col(vec_col), _lit_num_array(plane))
            * F.lit(float(_FP))
        ).cast("long")
        for plane in planes
    ]
    return df.select(
        id_col, F.posexplode(F.array(*projs)).alias("pos", "proj_micro")
    )


def jl_project_sql(
    table: str = "embeddings",
    dim: int = 64,
    out_dim: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle: the identical literal planes and fold."""
    planes = hyperplanes(dim, out_dim, seed)
    exprs = []
    for plane in planes:
        lits = ", ".join(str(v) for v in plane)
        exprs.append(
            f"CAST(floor(list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> CAST({vec_col}[i] AS DOUBLE) * ([{lits}])[i])) "
            f"* {_FP}.0) AS BIGINT)"
        )
    lst = ",\n    ".join(exprs)
    return f"""
SELECT {id_col}, i - 1 AS pos, p[i] AS proj_micro
FROM (SELECT {id_col}, [
    {lst}
  ] AS p FROM {table})
CROSS JOIN LATERAL (SELECT unnest(range(1, {out_dim} + 1)) AS i) AS u(i)
""".strip()
