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


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    rate: float,
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    group_by: Sequence[str] | None = None,
) -> DataFrame:
    """Approximate quantiles that are still DETERMINISTIC: exact
    PERCENTILE_DISC over a hash-of-id sample.

    GK/t-digest sketches are mergeable but engine-specific — their
    outputs can't be oracle-checked across engines. Sampling by the
    row-id hash gives the other trade: the error is statistical
    (~1/sqrt(rate·n) rank error) but the RESULT is a pure function of
    the data, identical under any partitioning and reproducible in any
    engine with md5 — so approximate quantiles stay under the exact
    oracle gate. At 100 TB the sort/rank runs on rate·n rows; the
    within-group sample must fit a keyed window (use approx_quantiles
    when it can't).

    One output column per probability, named ``p50``-style from the
    probability's two digits.
    """
    from pyspark.sql import Window

    from stream_spark.operators.sampling import deterministic_sample

    keys = list(group_by or [])
    s = deterministic_sample(df, id_col, rate)
    w = Window.partitionBy(*keys).orderBy(value_col, id_col)
    wn = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    r = s.select(
        *keys,
        F.col(value_col).alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(wn).alias("_n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("_rn") == F.ceil(F.lit(p) * F.col("_n")).cast("long"), F.col("_v")
            )
        ).alias(f"p{int(p * 100)}")
        for p in probabilities
    ]
    if keys:
        return r.groupBy(*keys).agg(*aggs)
    return r.agg(*aggs)


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
