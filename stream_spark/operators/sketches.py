"""Approximate sketch operators — the bounded-memory summaries a
100 TB pipeline uses where exactness doesn't pay its shuffle bill.

Three wrap Spark's JVM-side mergeable sketches (HLL++ for distinct
counts, the Greenwald-Khanna / percentile_approx sketch for quantiles,
FP-growth-style freqItems); ``tdigest_quantiles`` is a from-scratch
merging t-digest over Arrow batches; ``sampled_quantiles`` trades
sketch mergability for hash-determinism (the only one that can sit
under the cross-engine oracle gate). For the rest: map-side partials
merge in the combiner, so the shuffle carries sketch bytes, not rows —
the whole point at scale. Sketch results are engine-specific (not
oracle-checkable across engines); correctness is bounded-error vs the
exact answer, enforced in pytest with the documented tolerances.
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


# ----------------------------------------------------------------------
# t-digest: a real mergeable quantile sketch (Dunning & Ertl,
# "Computing Extremely Accurate Quantiles Using t-Digests"), built the
# Spark way: per-shard digests in Arrow batches, one shuffle of
# centroid arrays (KBs per shard), merged per group on the reducer.
# Accuracy is strongest at the tails (the k1 scale function caps
# centroid weight by 4·n·q(1-q)/delta), which is exactly where GK's
# uniform rank error is weakest. Results are implementation-specific
# (like every sketch) → pytest tolerance contract, not the oracle gate;
# the oracle-hashable approximate path is sampled_quantiles above.


def _tdigest_compress(means, weights, delta: int):
    """Merge sorted (mean, weight) points into ≤ O(delta) centroids."""
    import numpy as np

    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    cum = 0.0  # total weight fully to the left of the current centroid
    for m, w in zip(means[1:], weights[1:]):
        q = (cum + cur_w + w / 2.0) / total
        # k1-style size bound: ∫ 1/sqrt(q(1-q)) dq = π, so the digest
        # converges to ~πδ/4 centroids (O(δ), unlike the q(1-q) bound
        # whose tail integral diverges to O(δ·log n))
        if cur_w + w <= 4.0 * total * (q * (1.0 - q)) ** 0.5 / delta:
            cur_m += (m - cur_m) * w / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return out_m, out_w


def _tdigest_quantile(means, weights, p: float) -> float:
    """Interpolated quantile from centroids (midpoint rank model)."""
    total = sum(weights)
    target = p * total
    cum = 0.0
    prev_mid, prev_mean = 0.0, means[0]
    for m, w in zip(means, weights):
        mid = cum + w / 2.0
        if target <= mid:
            if mid == prev_mid:
                return m
            frac = (target - prev_mid) / (mid - prev_mid)
            return prev_mean + frac * (m - prev_mean)
        prev_mid, prev_mean = mid, m
        cum += w
    return means[-1]


def tdigest_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: Sequence[float] = (0.5, 0.95, 0.99),
    delta: int = 100,
    group_by: Sequence[str] | None = None,
    n_shards: int = 32,
) -> DataFrame:
    """Distributed t-digest quantiles per group (or global).

    Stage 1 builds one digest per (group, shard) inside Arrow batches;
    stage 2 merges centroid arrays per group and interpolates the
    requested quantiles. The shuffle carries ≤ O(delta) doubles per
    shard — at 100 TB that's the entire point: rows never leave their
    scan partition, only sketch bytes move. One output column per
    probability, ``p50``-style naming (two digits, matching
    sampled_quantiles).
    """
    import pandas as pd

    keys = list(group_by or [])
    probs = list(probabilities)

    shard = (F.crc32(F.col(value_col).cast("string")) % n_shards).alias("_shard")
    base = df.select(*keys, F.col(value_col).alias("_v"), shard)
    if not keys:  # global: a constant group key, dropped on the way out
        base = base.withColumn("_g", F.lit(1))
        keys = ["_g"]
        key_types = {"_g": "int"}
    else:
        key_types = {k: df.schema[k].dataType.simpleString() for k in keys}

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf["_v"].to_numpy(dtype=np.float64)
        m, w = _tdigest_compress(v, np.ones_like(v), delta)
        head = {k: [pdf[k].iloc[0]] for k in keys}
        return pd.DataFrame({**head, "_means": [m], "_weights": [w]})

    key_fields = ", ".join(f"{k} {key_types[k]}" for k in keys)
    mid_schema = key_fields + ", _means array<double>, _weights array<double>"
    partials = base.groupBy(*keys, "_shard").applyInPandas(build, schema=mid_schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        means = np.concatenate([np.asarray(x) for x in pdf["_means"]])
        weights = np.concatenate([np.asarray(x) for x in pdf["_weights"]])
        m, w = _tdigest_compress(means, weights, delta)
        head = {k: [pdf[k].iloc[0]] for k in keys}
        qs = {f"p{int(p * 100)}": [_tdigest_quantile(m, w, p)] for p in probs}
        return pd.DataFrame({**head, **qs})

    out_schema = key_fields + ", " + ", ".join(f"p{int(p * 100)} double" for p in probs)
    out = partials.groupBy(*keys).applyInPandas(merge, schema=out_schema)
    return out.drop("_g") if keys == ["_g"] else out
