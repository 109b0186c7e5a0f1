"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting handles sort-merge joins automatically, but
two shapes still need manual salting at 100 TB:

- **hot-key aggregation**: one key holding 10% of a 100 TB table makes
  one reducer process 10 TB. ``salted_agg`` runs a two-level
  aggregation — partial agg on (key, salt), final agg on key — so the
  hot key spreads over ``n_salts`` reducers. Only works for
  decomposable aggregates (sum/count/min/max; avg = sum+count).
- **skewed equi-join vs a broadcastable-but-not-tiny side**:
  ``salted_join`` explodes the small side ``n_salts``× with a salt
  column and salts the big side's key randomly-but-deterministically
  (hash of a row id), so a hot join key fans across reducers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"

#: decomposable (partial, final) aggregate pairs
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    function: str,
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-level aggregation: (keys, salt) partials → keys final.

    ``salt_on``: a column whose hash spreads rows (default: a
    per-partition-random-free deterministic spread via
    ``monotonically_increasing_id``-free hash of all columns is NOT
    used; pass a high-cardinality column like an id for deterministic
    results).
    """
    if function not in _MERGEABLE:
        raise ValueError(f"{function!r} is not decomposable; supported: {sorted(_MERGEABLE)}")
    partial_fn, final_fn = _MERGEABLE[function]
    salt = (
        F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts))
        if salt_on
        else F.pmod(F.spark_partition_id().cast("long"), F.lit(n_salts))
    )
    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(partial_fn(value_col).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(final_fn("_partial").alias(f"{function}_{value_col}"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 16,
    big_salt_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the small side replicated ``n_salts``× so hot keys
    on the big side spread across reducers."""
    salt = (
        F.pmod(F.xxhash64(F.col(big_salt_on)), F.lit(n_salts))
        if big_salt_on
        else F.pmod(F.spark_partition_id().cast("long"), F.lit(n_salts))
    )
    big_s = big.withColumn(_SALT, salt)
    small_s = small.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")))
    out = big_s.join(small_s, (big_s[big_key] == small_s[small_key]) & (big_s[_SALT] == small_s[_SALT]), how)
    return out.drop(_SALT)
