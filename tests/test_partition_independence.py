"""Determinism under re-partitioning: the oracle rules promise results
are pure functions of the data, never of the cluster layout. Rerun the
most layout-sensitive queries with a different shuffle-partition count
and parallelism-hostile repartitioning of the inputs — results must be
IDENTICAL (not just equal-ish)."""

from __future__ import annotations

import pytest

SENSITIVE = [
    "agg_tumbling_count_sum",      # global row numbering
    "training_pack_sequences",     # global prefix sum
    "events_sessionize",           # windowed lag/sum chains
    "dedup_minhash_lsh",           # banded bucket join
    "embeddings_kmeans",           # iterative w/ driver state
    "corpus_mix_sources",          # hash-threshold sampling
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_identical_across_partitionings(spark, sf_dir, name):
    from stream_spark.queries import QUERIES

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
