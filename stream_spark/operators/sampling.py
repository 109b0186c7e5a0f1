"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent per partition split — results change
with partitioning, which breaks reproducible dataset builds. These
samplers hash a stable id (md5-derived, engine-portable) so the same
row always makes the same in/out decision, anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_spark.operators.text import md5_long

BUCKETS = 10_000


def hash_bucket(id_col: Column) -> Column:
    """Stable bucket 0..9999 from the row id."""
    return md5_long(id_col.cast("string")) % BUCKETS


def deterministic_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep ~rate of rows, decided by the id hash alone."""
    return df.filter(hash_bucket(F.col(id_col)) < int(rate * BUCKETS))


def stratified_sample(df: DataFrame, id_col: str, stratum_col: str, rates: dict[str, float]) -> DataFrame:
    """Per-stratum deterministic rates; unlisted strata are dropped."""
    bucket = hash_bucket(F.col(id_col))
    keep = F.lit(False)
    for stratum, rate in rates.items():
        keep = keep | ((F.col(stratum_col) == stratum) & (bucket < int(rate * BUCKETS)))
    return df.filter(keep)


def mix_corpus(
    df: DataFrame,
    id_col: str,
    source_col: str,
    target_shares: dict[str, float],
    n_target: int,
) -> DataFrame:
    """Deterministic corpus mixing: resample sources toward target
    proportions. For each listed source, rate = min(1, n_target *
    share / count); rows are kept by the stable id hash, so the mix is
    reproducible under any partitioning. Unlisted sources are dropped.

    The per-source counts are one keyed agg collected to the driver —
    bounded metadata (#sources, dimension-sized by contract). Sources
    too small to meet their share are capped at rate 1 (can't mint
    rows); detect shortfalls by comparing output counts to targets.
    """
    counts = {
        r[source_col]: r["c"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("c")).collect()
    }
    rates = {
        s: min(1.0, n_target * share / counts[s])
        for s, share in target_shares.items()
        if s in counts and counts[s] > 0
    }
    return stratified_sample(df, id_col, source_col, rates)


def split_corpus(df: DataFrame, id_col: str, weights: dict[str, float]) -> DataFrame:
    """Reproducible train/val/test splitting: contiguous hash-bucket
    ranges per split, so membership is a pure function of the row id
    (re-runs, re-partitions, and incremental additions never move a
    row between splits). Weights must sum to ≤ 1; remainder is
    dropped."""
    if sum(weights.values()) > 1.0 + 1e-9:
        raise ValueError("split weights sum to more than 1")
    bucket = hash_bucket(F.col(id_col))
    expr = F.lit(None).cast("string")
    lo = 0
    for name, w in weights.items():  # insertion order = stable ranges
        hi = lo + int(w * BUCKETS)
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(expr)
        lo = hi
    return df.withColumn("split", expr).filter(F.col("split").isNotNull())


def weighted_sample(df: DataFrame, id_col: str, weight: Column) -> DataFrame:
    """Importance sampling: keep each row with probability
    ``min(1, weight)``, decided by the stable id hash — reproducible
    quality-weighted corpus downsampling, map-only and
    partition-independent like the flat sampler."""
    prob = F.least(F.lit(1.0), weight)
    frac = hash_bucket(F.col(id_col)).cast("double") / float(BUCKETS)
    return df.filter(frac < prob)
