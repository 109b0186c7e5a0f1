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
