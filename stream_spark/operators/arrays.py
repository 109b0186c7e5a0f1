"""Element-wise array aggregation.

The reference aggregates []int/[]float64 samples element-wise
(window/functions/sum.go:44 sumIntArray, average.go:40 avgIntArray:
result[i] = agg over samples of sample[i]). Spark-first realization:
``posexplode`` → groupBy (keys, pos) → aggregate — a narrow shuffle on
(key, pos) that scales with rows × dim, never holding a whole group's
vectors in memory. ``assemble=True`` re-packs the per-position results
into an array (the reference's output shape); the relational
(key, pos, result) form is the default because downstream Spark ops
compose better with it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_spark.functions.aggregates import agg_expr


def elementwise_agg(
    df: DataFrame,
    vec_col: str,
    function: str,
    group_by: Sequence[str] | None = None,
    exact_decimal: bool = True,
    assemble: bool = False,
) -> DataFrame:
    keys = [*group_by] if group_by else []
    exploded = df.select(*keys, F.posexplode(F.col(vec_col)).alias("pos", "x"))
    out = exploded.groupBy(*keys, "pos").agg(
        agg_expr(
            function,
            F.col("x").cast("double"),
            None,
            alias="result",
            exact_decimal=exact_decimal,
            decimal_type="decimal(28,12)",  # embedding-scale values
        )
    )
    if not assemble:
        return out
    packed = F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("result"))))
    return out.groupBy(*keys).agg(F.transform(packed, lambda s: s["result"]).alias("result"))
