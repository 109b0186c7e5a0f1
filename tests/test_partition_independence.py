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
    "dedup_semantic_clusters",     # in-plan kmeans + components (r4)
    "corpus_bpe_merges",           # global top-1 + greedy fold (r4)
    "corpus_token_drift",          # top-V vocab + integer rates (r4)
    "ann_topk_ivfpq",              # coarse cells + LUT ranks (r4)
    "events_user_sequences",       # order-preserved collect fold (r5)
    "documents_curriculum_order",  # two-pass rownum interleave (r5)
    "documents_shard_assignment",  # global rank snake deal (r5)
    "documents_source_keywords",   # salted two-stage top-k (r5)
    "events_value_quantile_transform",  # global rank ppm (r5)
    "ann_topk_bruteforce",         # per-batch prerank tie cut (r6)
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


def test_pagerank_partition_independent(spark):
    """Integer PageRank must be bit-identical under any input layout
    (floor division has no float accumulation to perturb)."""
    from stream_spark.operators.components import pagerank_integer

    edges = spark.createDataFrame(
        [(a, b) for a in range(12) for b in range(12) if a != b and (a + b) % 3 == 0],
        "src long, dst long",
    )
    r1 = {(r.node, r.r) for r in pagerank_integer(edges.repartition(1), iters=3).collect()}
    r8 = {(r.node, r.r) for r in pagerank_integer(edges.repartition(8), iters=3).collect()}
    assert r1 == r8


def test_merge_upsert_partition_independent(spark):
    from stream_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(i, float(i)) for i in range(50)], "k long, v double")
    updates = spark.createDataFrame(
        [(i, float(i * 10), i % 7 == 0) for i in range(0, 80, 2)], "k long, v double, del boolean"
    )
    a = {
        (r.k, r.v)
        for r in merge_upsert(target.repartition(1), updates.repartition(1), ["k"], "del").collect()
    }
    b = {
        (r.k, r.v)
        for r in merge_upsert(target.repartition(16), updates.repartition(16), ["k"], "del").collect()
    }
    assert a == b
