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


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Aggregate a skewed key in two shuffles: (key, salt) partials, then
    key finals. ``aggs`` maps output name → *reducible* aggregate column
    (sum/count→sum, min→min, max→max are handled; anything else is the
    caller's responsibility to keep re-reducible)."""
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial = salted.groupBy(key, _SALT).agg(
        *[c.alias(f"__p_{name}") for name, c in aggs.items()]
    )

    def _refold(name: str, col: Column) -> Column:
        expr = str(col._jc)  # e.g. "sum(x) AS total"
        if expr.startswith("count("):
            return F.sum(f"__p_{name}")
        if expr.startswith("min("):
            return F.min(f"__p_{name}")
        if expr.startswith("max("):
            return F.max(f"__p_{name}")
        return F.sum(f"__p_{name}")  # sum partials re-sum

    return partial.groupBy(key).agg(
        *[_refold(name, c).alias(name) for name, c in aggs.items()]
    )
