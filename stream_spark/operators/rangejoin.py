"""Range join: pairs within a numeric/time tolerance, WITHOUT the
theta-join trap.

A naive ``|l.ts - r.ts| <= tol`` condition is a non-equi join — Spark
plans it as a broadcast nested loop or cartesian product, O(n·m). The
scale-safe plan buckets both sides by ``ts DIV tol`` and explodes the
right side to its three candidate buckets (b-1, b, b+1); any pair
within tolerance shares a bucket with one of the three, so an
EQUI-join on (keys, bucket) finds every candidate, and the exact
tolerance predicate filters survivors. One shuffle on (keys, bucket),
candidate volume ≤ 3·m, no quadratic blowup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance_ms: int,
) -> DataFrame:
    """Inner join of rows with equal ``on`` keys and
    ``|left_ts - right_ts| <= tolerance_ms`` (epoch-ms columns or
    castable). Each qualifying pair appears exactly once."""
    if tolerance_ms <= 0:
        raise ValueError("tolerance_ms must be positive")
    lb = (F.col(left_ts).cast("long") / tolerance_ms).cast("long")
    l = left.withColumn("_b", lb)
    rb = (F.col(right_ts).cast("long") / tolerance_ms).cast("long")
    r = right.withColumn("_rb", rb).withColumn(
        "_b", F.explode(F.array(F.col("_rb") - 1, F.col("_rb"), F.col("_rb") + 1))
    )
    joined = l.join(r.drop("_rb"), [*on, "_b"])
    return joined.filter(
        F.abs(F.col(left_ts).cast("long") - F.col(right_ts).cast("long")) <= tolerance_ms
    ).drop("_b")
