"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting handles most runtime skew; salting is the
explicit tool for *known* pathological keys (a null-heavy foreign key, one
tenant owning half the data) where you want the plan fixed up-front:

- ``salted_join``: explode the small side ``salt`` ways, scatter the big
  side uniformly — each hot key's rows spread across ``salt`` tasks at the
  cost of replicating the small side ``salt``×.
- ``two_phase_agg``: pre-aggregate on (key, salt) then re-aggregate on key
  — the map-side-combine idea made explicit for aggregations whose partial
  states are reducible (sum/count/min/max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

_SALT = "__arcane_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side scattered over ``salt`` sub-keys.

    Big side: deterministic salt from a hash of the whole row (uniform,
    reproducible). Small side: exploded ``salt``× so every (key, salt)
    combination exists. Join key becomes (on, salt) — hot keys now occupy
    ``salt`` shuffle partitions instead of one."""
    big_s = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    return big_s.join(small_s, [on, _SALT], how).drop(_SALT)


# partial aggregate builder and its re-reducer, per declared kind —
# explicit because non-reducible aggregates (avg, count-distinct,
# percentiles) CANNOT be re-reduced from partials and Column objects
# don't expose enough structure to detect them reliably (countDistinct
# renders identically to count in PySpark 4)
_REDUCIBLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, Column | str]],
    salt: int = 16,
) -> DataFrame:
    """Aggregate a skewed key in two shuffles: (key, salt) partials, then
    key finals. ``aggs`` maps output name → ``(kind, column)`` with kind
    one of ``sum | count | min | max`` — the reducible set. Anything
    non-reducible (avg, distinct counts, percentiles) must be decomposed
    by the caller into these partials (avg = sum/count after the rollup);
    passing it here raises instead of silently mis-reducing."""
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    for name, (kind, _) in aggs.items():
        if kind not in _REDUCIBLE:
            raise ValueError(
                f"two_phase_agg cannot re-reduce {name!r} (kind={kind!r}): "
                f"supported kinds are {sorted(_REDUCIBLE)}; decompose "
                "non-reducible aggregates into sum/count partials"
            )
    partial = salted.groupBy(key, _SALT).agg(
        *[
            _REDUCIBLE[kind][0](c).alias(f"__p_{name}")
            for name, (kind, c) in aggs.items()
        ]
    )
    return partial.groupBy(key).agg(
        *[
            _REDUCIBLE[kind][1](f"__p_{name}").alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )
