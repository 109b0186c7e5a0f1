"""Stream filters.

The reference ships one filter type, ``non-zero`` (filters.go:8:
scalar != 0, or any element non-zero for arrays). We add the obvious
family a real pipeline needs (threshold / range / regex / null-drop);
all are plain Catalyst predicates so they push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


def non_zero(df: DataFrame, col: str) -> Column:
    """Predicate: keep rows whose value is non-zero (filters.go:12)."""
    if isinstance(df.schema[col].dataType, ArrayType):
        return F.exists(F.col(col), lambda x: x != 0)
    return F.col(col) != 0


FILTERS = {
    "non-zero": lambda df, col, **kw: non_zero(df, col),
    "non-null": lambda df, col, **kw: F.col(col).isNotNull(),
    "threshold": lambda df, col, *, value, op=">", **kw: {
        ">": F.col(col) > value,
        ">=": F.col(col) >= value,
        "<": F.col(col) < value,
        "<=": F.col(col) <= value,
        "==": F.col(col) == value,
        "!=": F.col(col) != value,
    }[op],
    "range": lambda df, col, *, low, high, **kw: F.col(col).between(low, high),
    "regex": lambda df, col, *, pattern, **kw: F.col(col).rlike(pattern),
}


def apply_filter(df: DataFrame, filter_type: str, col: str, **kwargs) -> DataFrame:
    try:
        pred = FILTERS[filter_type]
    except KeyError:
        raise ValueError(f"unsupported filter: {filter_type!r} (supported: {sorted(FILTERS)})") from None
    return df.filter(pred(df, col, **kwargs))
