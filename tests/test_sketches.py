"""Sketch operators: bounded error vs the exact answer (sketches are
engine-specific, so the contract is tolerance, not hash equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_spark.operators.sketches import approx_distinct, approx_quantiles, freq_items
from stream_spark.sources import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    approx = approx_distinct(ev, "user_id", rsd=0.02).collect()[0]["approx_distinct"]
    assert abs(approx - exact) <= max(5, 0.1 * exact)


def test_approx_distinct_grouped(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("d")).collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct(ev, "user_id", group_by=["event_type"]).collect()
    }
    assert set(approx) == set(exact)
    for k, a in approx.items():
        assert abs(a - exact[k]) <= max(5, 0.1 * exact[k])


def test_approx_quantiles_rank_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    vals = sorted(r["value"] for r in ev.select("value").collect())
    n = len(vals)
    qs = approx_quantiles(ev, "value", (0.1, 0.5, 0.9), accuracy=1000).collect()[0]["quantiles"]
    for p, q in zip((0.1, 0.5, 0.9), qs):
        # GK guarantee: returned value's rank within n/accuracy of p*n
        import bisect
        rank = bisect.bisect_left(vals, q)
        assert abs(rank - p * n) <= n / 1000 + 2


def test_freq_items_finds_hot_value(spark):
    rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, ["k"])
    got = freq_items(df, ["k"], support=0.4).collect()[0]["k_freqItems"]
    assert "hot" in got
