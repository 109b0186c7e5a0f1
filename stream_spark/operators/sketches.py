"""Approximate sketch operators — the bounded-memory summaries a
100 TB pipeline uses where exactness doesn't pay its shuffle bill.

All three wrap Spark's JVM-side mergeable sketches (HLL++ for distinct
counts, the Greenwald-Khanna / percentile_approx sketch for quantiles,
FP-growth-style freqItems): map-side partials merge in the combiner,
so the shuffle carries sketch bytes, not rows — the whole point at
scale. Results are engine-specific (sketches are not oracle-checkable
across engines); correctness is bounded-error vs the exact answer,
enforced in pytest with the documented tolerances.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    key_col: str,
    group_by: Sequence[str] | None = None,
    rsd: float = 0.02,
) -> DataFrame:
    """HyperLogLog++ distinct count (relative std dev ``rsd``), per
    group or global. Shuffle carries one HLL register set per group."""
    agg = F.approx_count_distinct(key_col, rsd).alias("approx_distinct")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10000,
    group_by: Sequence[str] | None = None,
) -> DataFrame:
    """percentile_approx (GK sketch, rank error ≤ 1/accuracy) per
    group or global; returns an array column aligned with
    ``probabilities``."""
    agg = F.percentile_approx(
        value_col, F.array(*[F.lit(p) for p in probabilities]), accuracy
    ).alias("quantiles")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def freq_items(df: DataFrame, cols: Sequence[str], support: float = 0.01) -> DataFrame:
    """Misra-Gries style frequent items per column (single pass,
    bounded state ~1/support per partition, merged)."""
    return df.freqItems(list(cols), support)


def windowed_approx_distinct(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_ms: int,
    group_by: Sequence[str] | None = None,
    rsd: float = 0.02,
) -> DataFrame:
    """HLL++ distinct count per tumbling time window (and optional
    group keys) — the sketch variant of the exact
    ``agg_time_tumbling_distinct_users``.

    At 100 TB this is THE windowed-distinct shape: the shuffle per
    (window, group) carries one HLL register set (~KB at rsd=0.02)
    instead of the full key set an exact count-distinct expands to.
    Works identically on a watermarked stream (the aggregate is
    mergeable, so partials combine across micro-batches) — see
    streaming/jobs.streaming_windowed_approx_distinct.
    """
    w = F.window(F.col(ts_col), f"{window_ms} milliseconds")
    keys = list(group_by or [])
    out = df.groupBy(w.alias("window"), *keys).agg(
        F.approx_count_distinct(key_col, rsd).alias("approx_distinct")
    )
    return out.select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"),
        *keys,
        "approx_distinct",
    )
