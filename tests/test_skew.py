from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_spark.operators.skew import salted_agg, salted_join


@pytest.fixture()
def skewed(spark):
    # key 'hot' has 900 rows, others 10 each
    rows = [("hot", float(i), i) for i in range(900)] + [
        (f"k{j}", float(j), 900 + j) for j in range(10)
    ]
    return spark.createDataFrame(rows, "k string, v double, rid long")


def test_salted_agg_matches_plain(skewed):
    plain = {r["k"]: r["s"] for r in skewed.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r["k"]: r["sum_v"] for r in salted_agg(skewed, ["k"], "v", "sum", salt_on="rid").collect()}
    assert salted == plain


def test_salted_agg_count_and_minmax(skewed):
    got = {r["k"]: r["count_v"] for r in salted_agg(skewed, ["k"], "v", "count", salt_on="rid").collect()}
    assert got["hot"] == 900 and got["k3"] == 1
    mx = {r["k"]: r["max_v"] for r in salted_agg(skewed, ["k"], "v", "max", salt_on="rid").collect()}
    assert mx["hot"] == 899.0


def test_salted_agg_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError, match="not decomposable"):
        salted_agg(skewed, ["k"], "v", "avg")


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame([("hot", "H"), ("k1", "A"), ("k2", "B")], "dk string, label string")
    plain = skewed.join(dim, skewed["k"] == dim["dk"]).count()
    salted = salted_join(skewed, dim, "k", "dk", n_salts=8, big_salt_on="rid").count()
    assert salted == plain == 902  # 900 hot + k1 + k2


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join is the first line of defense before manual
    salting: a 2000:1 hot key must be split at runtime (skew=true in
    the adaptive final plan) with results unchanged."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(200_000).select(F.lit(0).alias("k"), F.col("id").alias("v")).union(
            spark.range(100).select((F.col("id") % 10 + 1).cast("long").alias("k"), F.col("id").alias("v"))
        )
        right = spark.range(11).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        j = left.join(right, "k")
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert len(rows) == 200_100
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_blocked_minhash_pairs_bound_hot_buckets(spark):
    """Adversarial swarm: 100 near-identical docs land in ONE (band,
    bucket). The blocked path must (a) emit exactly the unblocked
    candidate pairs and (b) bound every join-key group to ~block_size
    members — the histogram assertion that proves no task builds a
    bucket-squared pair set."""
    from pyspark.sql import functions as F

    from stream_spark.operators.dedup import (
        minhash_band_buckets,
        minhash_lsh_candidates,
    )

    base = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"
    docs = spark.createDataFrame(
        # 100 identical docs (one hot bucket per band) + 20 distinct ones
        [(i, base) for i in range(100)]
        + [(100 + i, f"doc {i} unique words alpha{i} beta{i} gamma{i} delta{i}") for i in range(20)],
        "doc_id long, text string",
    )
    plain = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_candidates(docs).collect()}
    blocked = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(docs, block_size=8).collect()
    }
    assert blocked == plain and len(plain) >= 100 * 99 // 2

    # histogram bound: with block_size=8 no (band, bucket, block) group
    # exceeds ceil(bucket_size / n_blocks) + slack of the hash spread
    bb = minhash_band_buckets(docs)
    sizes = bb.groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
    assert sizes.agg(F.max("bsz")).collect()[0][0] == 100  # the swarm is real
    from stream_spark.operators.text import md5_long

    n_blocks = 100 // 8 + 1  # ceil(100/8) = 13
    blk = bb.join(sizes.filter(F.col("bsz") == 100), ["band", "bucket"]).withColumn(
        "blk", F.pmod(md5_long(F.col("doc").cast("string")), F.lit(n_blocks))
    )
    hist = blk.groupBy("band", "bucket", "blk").count()
    mx = hist.agg(F.max("count")).collect()[0][0]
    assert mx <= 3 * 8, f"hot block of {mx} rows defeats the blocking"
