"""Multi-resolution time rollups (hypertable-style continuous
aggregates).

Coarser windows re-aggregate the finer level's partials instead of
rescanning raw data: hour buckets carry (sum, count, min, max), day
buckets merge 24 of them, and so on. At 100 TB this is the difference
between a daily report scanning 100 TB and one scanning the few GB of
hourly partials. All merges are decomposable-aggregate merges (sum of
sums, min of mins); avg is finalized from (sum, count) at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partials(df: DataFrame, ts_col: str, value_col: str, size_ms: int, group_by=None) -> DataFrame:
    """Finest-level partial aggregates per (window, keys)."""
    keys = [*group_by] if group_by else []
    win = F.window(F.col(ts_col), f"{size_ms} milliseconds")
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,4)")).alias("p_sum"),
            F.count(value_col).alias("p_count"),
            F.min(value_col).alias("p_min"),
            F.max(value_col).alias("p_max"),
        )
        .select(F.col("w.start").alias("bucket_start"), *keys, "p_sum", "p_count", "p_min", "p_max")
    )


def merge_up(partial_df: DataFrame, coarse_ms: int, group_by=None) -> DataFrame:
    """Merge fine partials into coarser buckets (partials → partials)."""
    keys = [*group_by] if group_by else []
    win = F.window(F.col("bucket_start"), f"{coarse_ms} milliseconds")
    return (
        partial_df.groupBy(win.alias("w"), *keys)
        .agg(
            F.sum("p_sum").alias("p_sum"),
            F.sum("p_count").alias("p_count"),
            F.min("p_min").alias("p_min"),
            F.max("p_max").alias("p_max"),
        )
        .select(F.col("w.start").alias("bucket_start"), *keys, "p_sum", "p_count", "p_min", "p_max")
    )


def finalize(partial_df: DataFrame) -> DataFrame:
    """Surface user-facing aggregates from the partial columns."""
    return partial_df.select(
        "*",
        F.col("p_sum").cast("double").alias("sum_value"),
        (F.col("p_sum").cast("double") / F.col("p_count")).alias("avg_value"),
    ).drop("p_sum")
