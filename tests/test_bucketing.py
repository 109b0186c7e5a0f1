"""Bucketed co-located joins: the fact-fact join strategy at scale.

Writing both sides bucketed on the join key with equal bucket counts
lets Spark plan a SortMergeJoin with NO Exchange on either side — the
shuffle happened once at write time and is amortized over every
subsequent join."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_spark.sources import load_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(li, "b_lineitem", "l_orderkey", 8, sort_col="l_orderkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test SF Catalyst would (rightly) broadcast; force the
        # fact-fact SortMergeJoin path the demonstration is about
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy("o_orderpriority").agg(
            F.count("*").alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        # below the join: bucketed scans feed it with NO shuffle on
        # either side (the one Exchange above it is the tiny 5-group
        # re-agg, not the fact-fact join)
        below_join = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in below_join, below_join
        # and the result is still right
        expected = (
            orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_dedup_index_probe_no_index_exchange(spark, sf_dir):
    """The dedup_index_update docstring's 100 TB spelling, proven: the
    stored (band, bucket) LSH index written via bucketBy on BOTH join
    keys is probed with NO Exchange above the index scan (Bucketed:
    true — only the small daily batch shuffles; the multi-TB index is
    never reshuffled), and the flags match the flat-parquet probe
    bit-for-bit. Bucketing must cover the composite key: a
    single-column layout under the two-key join is disabled by the
    planner ("Bucketed: false")."""
    import shutil

    from stream_spark.operators.dedup import minhash_band_buckets

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    idx = minhash_band_buckets(corpus).select("band", "bucket").distinct()
    spark.sql("DROP TABLE IF EXISTS b_dedup_index")
    shutil.rmtree("/root/repo/spark-warehouse/b_dedup_index", ignore_errors=True)
    write_bucketed(idx, "b_dedup_index", ["band", "bucket"], 8, sort_col="bucket")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def probe(loaded):
            nb = minhash_band_buckets(batch)
            return (
                nb.join(loaded.withColumn("_hit", F.lit(1)), ["band", "bucket"], "left")
                .groupBy(F.col("doc").alias("doc_id"))
                .agg(F.max(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("is_dup"))
            )

        probed = probe(spark.table("b_dedup_index"))
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        # index-side subtree = everything below the LAST Sort of the
        # SortMergeJoin (the bucketed scan feeds it directly)
        idx_side = plan[plan.rfind("+- Sort [band") :]
        assert "Exchange" not in idx_side, idx_side
        got = sorted(map(tuple, probed.collect()))
        want = sorted(map(tuple, probe(idx).collect()))
        assert got == want and any(r[1] == 1 for r in got)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_dedup_index")
