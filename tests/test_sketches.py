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


def test_windowed_approx_distinct_vs_exact(spark, sf_dir):
    from stream_spark.operators.sketches import windowed_approx_distinct

    ev = load_table(spark, sf_dir, "events")
    hour = 3_600_000
    exact = {
        r["w"]: r["d"]
        for r in ev.groupBy(
            F.window("ts", f"{hour} milliseconds").alias("win")
        )
        .agg(F.countDistinct("user_id").alias("d"))
        .select(F.unix_millis(F.col("win.start")).alias("w"), "d")
        .collect()
    }
    approx = {
        r["window_start_ms"]: r["approx_distinct"]
        for r in windowed_approx_distinct(ev, "ts", "user_id", hour).collect()
    }
    assert set(approx) == set(exact)
    for w, a in approx.items():
        assert abs(a - exact[w]) <= max(5, 0.1 * exact[w])


def test_windowed_approx_distinct_grouped_keys(spark, sf_dir):
    from stream_spark.operators.sketches import windowed_approx_distinct

    ev = load_table(spark, sf_dir, "events")
    day = 86_400_000
    out = windowed_approx_distinct(ev, "ts", "user_id", day, group_by=["event_type"]).collect()
    assert {r["event_type"] for r in out} == {
        r["event_type"] for r in ev.select("event_type").distinct().collect()
    }
    assert all(r["approx_distinct"] > 0 for r in out)


def test_streaming_windowed_approx_distinct_equals_batch(spark, sf_dir, tmp_path):
    """Same HLL algorithm on stream and batch → identical estimates
    (mergeable partials across micro-batches commute exactly)."""
    from stream_spark.operators.sketches import windowed_approx_distinct
    from stream_spark.streaming import (
        file_replay_stream,
        run_stream_to_memory,
        streaming_windowed_approx_distinct,
    )

    ev = load_table(spark, sf_dir, "events")
    hour = 3_600_000
    batch = {
        r["window_start_ms"]: r["approx_distinct"]
        for r in windowed_approx_distinct(ev, "ts", "user_id", hour).collect()
    }
    stream = file_replay_stream(spark, ev, str(tmp_path / "wad"), n_slices=4)
    got = run_stream_to_memory(
        streaming_windowed_approx_distinct(stream, "ts", "user_id", hour),
        output_mode="complete",
    )
    streamed = {
        r["window_start_ms"]: r["approx_distinct"] for r in got.collect()
    }
    assert streamed == batch


def test_tdigest_rank_error_vs_exact(spark, sf_dir):
    """t-digest p50/p95/p99 must land within 2% RANK error of the
    exact distribution (the sketch's contract is rank accuracy, not
    value accuracy)."""
    import numpy as np

    from stream_spark.operators.sketches import tdigest_quantiles
    from stream_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    got = tdigest_quantiles(ev, "value", (0.5, 0.95, 0.99), delta=100).collect()[0]
    vals = np.sort(np.array([r[0] for r in ev.select("value").collect()]))
    n = len(vals)
    for p, est in ((0.5, got["p50"]), (0.95, got["p95"]), (0.99, got["p99"])):
        rank = np.searchsorted(vals, est) / n
        assert abs(rank - p) < 0.02, f"p{int(p*100)}: est rank {rank:.4f}"


def test_tdigest_grouped_and_merge_invariance(spark, sf_dir):
    """Grouped digests; shard count must not change results materially
    (merge associativity: 4-shard and 32-shard runs agree within the
    sketch's own tolerance)."""
    from stream_spark.operators.sketches import tdigest_quantiles
    from stream_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    a = {
        r["event_type"]: r["p95"]
        for r in tdigest_quantiles(
            ev, "value", (0.95,), group_by=["event_type"], n_shards=4
        ).collect()
    }
    b = {
        r["event_type"]: r["p95"]
        for r in tdigest_quantiles(
            ev, "value", (0.95,), group_by=["event_type"], n_shards=32
        ).collect()
    }
    assert set(a) == set(b)
    for k in a:
        denom = max(abs(a[k]), 1e-9)
        assert abs(a[k] - b[k]) / denom < 0.05, (k, a[k], b[k])


def test_tdigest_centroid_count_bounded(spark):
    """The whole point: centroids, not rows. 50k values must compress
    to O(delta) centroids."""
    import numpy as np

    from stream_spark.operators.sketches import _tdigest_compress

    rng = np.random.default_rng(7)
    v = rng.normal(size=50_000)
    m, w = _tdigest_compress(v, np.ones_like(v), 100)
    assert len(m) <= 200  # ~2x delta slack
    assert abs(sum(w) - 50_000) < 1e-6


def test_tdigest_delta_reaches_stage1(spark):
    """delta must reach the stage-1 compressor (ADVICE r2 finding): with
    delta=2000 over 1000 weight-1 points the k1 bound never lets two
    points merge, so the digest is EXACT — the p99 equals the midpoint-
    rank interpolation of the raw data to float precision. The old
    hard-coded stage-1 delta=100 merged tail points of this cubic-growth
    distribution and missed by thousands."""
    from pyspark.sql import functions as F

    from stream_spark.operators.sketches import tdigest_quantiles

    df = spark.range(1000).select((F.col("id") ** 3).alias("v"))
    got = tdigest_quantiles(df, "v", (0.99,), delta=2000, n_shards=1).collect()[0]
    expected = (989.0**3 + 990.0**3) / 2.0  # target rank 990 between mids 989.5/990.5
    assert abs(got["p99"] - expected) < 1e-6, got["p99"]
