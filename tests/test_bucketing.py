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
