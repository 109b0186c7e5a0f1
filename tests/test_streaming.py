"""Structured Streaming ≡ batch equivalence (SURVEY §5): the same
window operators must produce identical results fed incrementally."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from stream_spark.operators.windows import tumbling_count_window, tumbling_time_window
from stream_spark.sources import load_table
from stream_spark.streaming import (
    TelemetryListener,
    file_replay_stream,
    run_stream_to_memory,
    streaming_tumbling_count,
    streaming_tumbling_time_window,
)

SCRATCH = "/root/repo/.scratch"
HOUR = 3_600_000


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_streaming_time_window_matches_batch(spark, events, tmp_path_factory):
    stage = f"{SCRATCH}/replay_time"
    shutil.rmtree(stage, ignore_errors=True)
    stream = file_replay_stream(spark, events, stage, n_slices=4)
    got = run_stream_to_memory(
        streaming_tumbling_time_window(stream, "ts", "value", "sum", HOUR), output_mode="complete"
    )
    expected = tumbling_time_window(events, "ts", "value", "sum", HOUR)
    g = {(r["window_start"], round(r["result"], 6)) for r in got.collect()}
    e = {(r["window_start"], round(r["result"], 6)) for r in expected.collect()}
    assert g == e


def test_streaming_count_window_matches_batch(spark, events):
    stage = f"{SCRATCH}/replay_count"
    shutil.rmtree(stage, ignore_errors=True)
    # single slice → one micro-batch → arrival order == (ts, event_id) order
    stream = file_replay_stream(spark, events, stage, n_slices=1, max_files_per_trigger=None)
    got = run_stream_to_memory(
        streaming_tumbling_count(stream, "event_type", "value", "sum", 50), output_mode="append"
    )
    expected = tumbling_count_window(events, "value", "sum", 50, group_by=["event_type"])
    g = {(r["event_type"], r["window_id"], round(r["result"], 6)) for r in got.collect()}
    e = {(r["event_type"], r["window_id"], round(r["result"], 6)) for r in expected.collect()}
    assert g == e


def test_streaming_sliding_count_matches_batch(spark, events):
    from stream_spark.operators.windows import sliding_count_window
    from stream_spark.streaming import streaming_sliding_count

    stage = f"{SCRATCH}/replay_sliding"
    shutil.rmtree(stage, ignore_errors=True)
    stream = file_replay_stream(spark, events, stage, n_slices=1, max_files_per_trigger=None)
    got = run_stream_to_memory(
        streaming_sliding_count(stream, "event_type", "value", "sum", 30, 10), output_mode="append"
    )
    expected = sliding_count_window(events, "value", "sum", 30, 10, group_by=["event_type"])
    g = {(r["event_type"], r["window_id"], round(r["result"], 4)) for r in got.collect()}
    e = {(r["event_type"], r["window_id"], round(r["result"], 4)) for r in expected.collect()}
    assert g == e


def test_streaming_sliding_count_state_across_batches(spark, events):
    """Ring state must carry across micro-batches: window ids continue
    and every post-warmup resolution boundary emits exactly once."""
    from stream_spark.streaming import streaming_sliding_count

    stage = f"{SCRATCH}/replay_sliding_multi"
    shutil.rmtree(stage, ignore_errors=True)
    stream = file_replay_stream(spark, events, stage, n_slices=4)
    got = run_stream_to_memory(
        streaming_sliding_count(stream, "event_type", "value", "max", 30, 10), output_mode="append"
    )
    totals = {r["event_type"]: r["n"] for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    per_type = {r["event_type"]: r["n"] for r in got.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for etype, n in totals.items():
        expected_emits = max(0, (n - 30) // 10 + 1)
        assert per_type.get(etype, 0) == expected_emits
    ids = got.groupBy("event_type").agg(F.max("window_id").alias("mx"), F.count("*").alias("n")).collect()
    for r in ids:  # ids are 0..n-1 with no gaps or duplicates
        assert r["mx"] == r["n"] - 1


def test_streaming_count_window_state_across_batches(spark, events):
    stage = f"{SCRATCH}/replay_count_multi"
    shutil.rmtree(stage, ignore_errors=True)
    # 4 slices replayed one file per trigger: windows span micro-batches.
    # Cross-batch arrival order is file order, so totals (not per-window
    # contents) are checked: every complete window emits exactly once.
    stream = file_replay_stream(spark, events, stage, n_slices=4)
    got = run_stream_to_memory(
        streaming_tumbling_count(stream, "event_type", "value", "count", 50), output_mode="append"
    )
    per_type = {r["event_type"]: r["n"] for r in got.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    totals = {r["event_type"]: r["n"] for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for etype, n in totals.items():
        assert per_type.get(etype, 0) == n // 50


def test_telemetry_listener(spark, events):
    stage = f"{SCRATCH}/replay_telemetry"
    shutil.rmtree(stage, ignore_errors=True)
    listener = TelemetryListener()
    spark.streams.addListener(listener)
    try:
        stream = file_replay_stream(spark, events, stage, n_slices=2)
        run_stream_to_memory(
            streaming_tumbling_time_window(stream, "ts", "value", "count", HOUR), output_mode="complete"
        )
    finally:
        spark.streams.removeListener(listener)
    assert listener.summary()["queries_started"] >= 1


def test_streaming_exact_dedup(spark):
    from stream_spark.streaming.dedup import streaming_exact_dedup

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "ALPHA   beta"), (3, "gamma delta"), (4, "alpha beta")],
        "doc_id long, text string",
    )
    stage = f"{SCRATCH}/replay_dedup"
    shutil.rmtree(stage, ignore_errors=True)
    stream = file_replay_stream(spark, docs, stage, n_slices=1, max_files_per_trigger=None)
    got = run_stream_to_memory(streaming_exact_dedup(stream), output_mode="append")
    texts = sorted(r["text"].lower().split()[0] for r in got.collect())
    assert got.count() == 2  # one survivor per distinct normalized text
    assert texts == ["alpha", "gamma"]


def test_streaming_stream_stream_join(spark, events):
    from stream_spark.streaming.jobs import streaming_stream_stream_join
    from stream_spark.queries import QUERIES

    stage_l = f"{SCRATCH}/ssj_left"
    stage_r = f"{SCRATCH}/ssj_right"
    shutil.rmtree(stage_l, ignore_errors=True)
    shutil.rmtree(stage_r, ignore_errors=True)
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    sl = file_replay_stream(spark, purchases, stage_l, n_slices=1, max_files_per_trigger=None)
    sr = file_replay_stream(spark, clicks, stage_r, n_slices=1, max_files_per_trigger=None)
    joined = streaming_stream_stream_join(sl, sr, "user_id", "ts", "cts", max_lag="1 hour")
    got = run_stream_to_memory(
        joined.select("l.event_id", "r.click_id"), output_mode="append"
    )
    # batch reference: the oracle-checked stream_join_time query
    expected = QUERIES["stream_join_time"](spark, "/root/testdata/sf0.001")
    g = {(r["event_id"], r["click_id"]) for r in got.collect()}
    e = {(r["purchase_id"], r["click_id"]) for r in expected.collect()}
    assert g == e


def test_foreach_batch_parquet_sink(spark, events):
    from stream_spark.streaming.jobs import run_stream_foreach_batch_parquet

    stage = f"{SCRATCH}/fb_src"
    out = f"{SCRATCH}/fb_out"
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    stream = file_replay_stream(spark, events.select("event_id", "value"), stage, n_slices=2)
    run_stream_foreach_batch_parquet(stream, out)
    back = spark.read.parquet(out)
    assert back.count() == events.count()


def test_checkpoint_restart_resumes_state(spark, events):
    """Stateful count windows must survive a query restart: feed half
    the files, stop, restart from the same checkpoint with the rest —
    emit totals must equal a single uninterrupted run."""
    import os

    stage = f"{SCRATCH}/ckpt_src"
    ckpt = f"{SCRATCH}/ckpt_state"
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    part1 = events.filter(F.col("event_id") % 2 == 0)
    part2 = events.filter(F.col("event_id") % 2 == 1)
    part1.repartition(1).write.mode("overwrite").parquet(stage)

    from stream_spark.streaming import streaming_tumbling_count

    out_dir = f"{SCRATCH}/ckpt_out"
    shutil.rmtree(out_dir, ignore_errors=True)

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(stage)
        out = streaming_tumbling_count(stream, "event_type", "value", "count", 50)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # append the second half as NEW files, restart from the checkpoint
    part2.repartition(1).write.mode("append").parquet(stage)
    run_once()

    emitted = spark.read.parquet(out_dir)
    totals = {r["event_type"]: r["n"] for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    expected_windows = sum(n // 50 for n in totals.values())
    # no lost or duplicated windows across the restart, and window ids
    # continue from carried state (each (type, window_id) emitted once)
    assert emitted.count() == expected_windows
    assert emitted.select("event_type", "window_id").distinct().count() == expected_windows


def test_paced_replay_matches_batch(spark, tiny_events):
    """emitter.go parity: one row per processingTime tick through the
    stateful sliding window — warmup and emit cadence spread across
    many single-row micro-batches must reproduce the batch result."""
    from stream_spark.operators.windows import sliding_count_window
    from stream_spark.streaming import paced_replay_stream, run_paced_stream_to_memory, streaming_sliding_count

    stage = f"{SCRATCH}/paced_replay"
    shutil.rmtree(stage, ignore_errors=True)
    stream = paced_replay_stream(spark, tiny_events, stage, ["ts", "event_id"], rows_per_tick=1)
    got = run_paced_stream_to_memory(
        streaming_sliding_count(stream, "event_type", "value", "sum", 4, 2),
        total_rows=tiny_events.count(),
        emit_delay_ms=50,
    )
    expected = sliding_count_window(tiny_events, "value", "sum", 4, 2, group_by=["event_type"])
    g = {(r["event_type"], r["window_id"], round(r["result"], 6)) for r in got.collect()}
    e = {(r["event_type"], r["window_id"], round(r["result"], 6)) for r in expected.collect()}
    assert g == e


def test_watermark_drops_late_data(spark):
    """Append-mode time windows finalize once the watermark passes
    their end; a row arriving AFTER the window's state was evicted
    must not reopen it. (Spark's drop guarantee starts at eviction:
    a late row landing in the same batch that closes the window is
    still merged — the watermark bounds state, it is not a strict
    input filter — so the late slice here arrives one batch later.)"""
    import datetime as dt
    import glob as globmod
    import os
    import time as timemod

    from stream_spark.streaming import streaming_tumbling_time_window

    stage = f"{SCRATCH}/late_data"
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)

    def slice_df(rows):
        return spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s), float(v)) for s, v in rows],
            "ts timestamp, value double",
        )

    def stage_slice(df, name):
        tmp = f"{stage}_tmp_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = globmod.glob(f"{tmp}/part-*.parquet")[0]
        os.replace(part, f"{stage}/{name}.parquet")
        shutil.rmtree(tmp, ignore_errors=True)

    # batch 1: one row in window [00:00, 01:00), one at 01:30 that
    # advances the watermark to 01:20 > window end
    stage_slice(slice_df([(5, 1.0), (90, 2.0)]), "a")
    timemod.sleep(1.1)  # file mtime order = replay order
    # batch 2 runs with wm 01:20: window 0 is emitted and evicted here
    stage_slice(slice_df([(120, 3.0)]), "b")
    timemod.sleep(1.1)
    # batch 3: event-time 00:00:07 targets the evicted window → dropped
    stage_slice(slice_df([(7, 100.0)]), "c")

    schema = slice_df([(0, 0.0)]).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    out = run_stream_to_memory(
        streaming_tumbling_time_window(stream, "ts", "value", "sum", 60_000, watermark="10 seconds"),
        output_mode="append",
    )
    rows = {r["window_start"]: r["result"] for r in out.collect()}
    # only the finalized first window appears, WITHOUT the late row
    assert list(rows.values()) == [1.0]


def test_streaming_asof_simultaneous_right_visible(spark):
    """A right-side row with exactly the left row's timestamp must be
    matched (inclusive as-of), regardless of event_id order."""
    from stream_spark.streaming import streaming_asof_enrich

    rows = [
        (1, 1000, 5, 1.0, "R"),   # click @1000
        (1, 2000, 9, 2.0, "L"),   # purchase @2000 → matches id 5
        (1, 3000, 2, 3.0, "L"),   # purchase @3000, SAME ts as the next click
        (1, 3000, 7, 4.0, "R"),   # click @3000 (higher event_id than the purchase)
        (1, 4000, 8, 5.0, "L"),   # purchase @4000 → matches id 7
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, value double, side string")
    stage = f"{SCRATCH}/asof_tie"
    shutil.rmtree(stage, ignore_errors=True)
    stream = file_replay_stream(spark, df, stage, n_slices=1, max_files_per_trigger=None)
    from stream_spark.streaming import run_stream_to_memory

    out = run_stream_to_memory(
        streaming_asof_enrich(stream, "user_id", "ts", "side", "value", "event_id"),
        output_mode="append",
    )
    got = {r["left_id"]: r["right_id"] for r in out.collect()}
    # the @3000 purchase sees the @3000 click (R sorts before L at equal ts)
    assert got == {9: 5, 2: 7, 8: 7}


def test_streaming_asof_state_survives_restart(spark):
    """The as-of carry state (latest right per key) persists through a
    checkpointed restart: a purchase arriving after the restart still
    matches a click seen before it."""
    from stream_spark.streaming import streaming_asof_enrich

    stage = f"{SCRATCH}/asof_ckpt_src"
    ckpt = f"{SCRATCH}/asof_ckpt_state"
    out_dir = f"{SCRATCH}/asof_ckpt_out"
    for d in (stage, ckpt, out_dir):
        shutil.rmtree(d, ignore_errors=True)

    schema = "user_id long, ts long, event_id long, value double, side string"
    batch1 = spark.createDataFrame([(1, 1000, 5, 1.0, "R"), (1, 2000, 6, 2.0, "L")], schema)
    batch2 = spark.createDataFrame([(1, 5000, 7, 3.0, "L")], schema)
    batch1.repartition(1).write.mode("overwrite").parquet(stage)

    def run_once():
        stream = spark.readStream.schema(batch1.schema).parquet(stage)
        out = streaming_asof_enrich(stream, "user_id", "ts", "side", "value", "event_id")

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    batch2.repartition(1).write.mode("append").parquet(stage)
    run_once()

    got = {r["left_id"]: r["right_id"] for r in spark.read.parquet(out_dir).collect()}
    # the post-restart purchase (id 7) still sees the pre-restart click (id 5)
    assert got == {6: 5, 7: 5}


def test_streaming_left_outer_join_emits_nulls(spark, events):
    """Left-outer stream-stream join: unmatched purchases must surface
    null-padded once the watermark passes their horizon. Two
    beyond-horizon sentinel rows staged as later replay files walk the
    watermark past every real event (advancement only takes effect a
    batch later, hence two); a processingTime trigger keeps no-data
    batches coming so the final state flushes on a finite stream."""
    import datetime as dt
    import time
    import uuid

    from stream_spark.streaming.jobs import streaming_stream_stream_join

    stage_l = f"{SCRATCH}/lsj_left"
    stage_r = f"{SCRATCH}/lsj_right"
    for d in (stage_l, stage_r):
        shutil.rmtree(d, ignore_errors=True)

    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    horizon = purchases.agg(F.max("ts")).collect()[0][0]

    purchases.repartition(1).write.parquet(stage_l)
    clicks.repartition(1).write.parquet(stage_r)
    for days in (30, 60):
        st = horizon + dt.timedelta(days=days)
        spark.createDataFrame(
            [(-1, st, -1)], "user_id long, ts timestamp, event_id long"
        ).repartition(1).write.mode("append").parquet(stage_l)
        spark.createDataFrame(
            [(-1, st, -1)], "user_id long, cts timestamp, click_id long"
        ).repartition(1).write.mode("append").parquet(stage_r)

    sl = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_l)
    )
    sr = (
        spark.readStream.schema("user_id long, cts timestamp, click_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_r)
    )
    joined = streaming_stream_stream_join(
        sl, sr, "user_id", "ts", "cts", max_lag="1 hour", how="left_outer"
    )
    # NOTE: do NOT filter the sentinels inside the streaming plan — a
    # left-side predicate is pushed below the join to the left source,
    # which would drop the left sentinel BEFORE its watermark operator
    # and pin the global (min-of-sources) watermark at the real data's
    # horizon. Sentinels are dropped driver-side after collection.
    out = joined.select("l.event_id", "r.click_id", "l.user_id")

    # batch reference: left join under the same time-bound condition
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.cts") <= F.col("l.ts"))
        & (F.col("r.cts") >= F.col("l.ts") - F.expr("INTERVAL 1 hour"))
    )
    expected = {
        (r["event_id"], r["click_id"])
        for r in purchases.alias("l")
        .join(clicks.alias("r"), cond, "left")
        .select("l.event_id", "r.click_id")
        .collect()
    }
    assert any(c is None for _e, c in expected)  # outer rows exist in the fixture

    name = f"lsj{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        got = set()
        while time.time() < deadline:
            got = {
                (r["event_id"], r["click_id"])
                for r in spark.table(name).collect()
                if r["user_id"] != -1
            }
            if got == expected:
                break
            time.sleep(1.0)
    finally:
        q.stop()
    assert got == expected


def test_streaming_join_rejects_unknown_type(spark, events):
    import pytest as _pytest

    from stream_spark.streaming.jobs import streaming_stream_stream_join

    with _pytest.raises(ValueError, match="join type"):
        streaming_stream_stream_join(events, events, "user_id", "ts", "ts", how="full")


def test_streaming_heavy_hitters_mg_bound(spark):
    """Adversarial over-capacity stream: Zipf-ish token counts with
    vocabulary 3× the Misra-Gries capacity. The MG contract must hold
    per shard: true - N_shard/(cap+1) ≤ mg ≤ true, heavy tokens kept."""
    from stream_spark.operators.text import md5_long
    from stream_spark.streaming import streaming_heavy_hitters

    rows = []
    for i in range(30):  # 30 tokens, counts 60, 58, ..., 2 (vocab 3x cap)
        rows += [(f"tok{i}",)] * (60 - 2 * i)
    df = spark.createDataFrame(rows, "token string")
    stage = f"{SCRATCH}/mg_hh"
    shutil.rmtree(stage, ignore_errors=True)
    stream = file_replay_stream(spark, df, stage, n_slices=2)
    cap = 10
    out = run_stream_to_memory(
        streaming_heavy_hitters(stream, "token", capacity=cap, n_shards=2),
        output_mode="append",
    )
    # keep only each shard's LAST emission (end-of-stream summary):
    # append mode emits per batch; the final batch's counters subsume
    # earlier ones, so take max per token (MG counts only grow or get
    # cut — the last emission is the largest for surviving tokens)
    mg = {r["token"]: r["mg_count"] for r in out.groupBy("token").agg(
        F.max("mg_count").alias("mg_count")).collect()}

    true = {f"tok{i}": 60 - 2 * i for i in range(30)}
    shard_of = {t: None for t in true}
    sh = spark.createDataFrame([(t,) for t in true], "token string").select(
        "token", (md5_long(F.col("token")) % 2).alias("s")).collect()
    shard_of = {r["token"]: r["s"] for r in sh}
    shard_n = {s: sum(c for t, c in true.items() if shard_of[t] == s) for s in (0, 1)}
    for t, c in true.items():
        est = mg.get(t, 0)
        assert est <= c, f"{t}: overestimate {est} > {c}"
        assert est >= c - shard_n[shard_of[t]] / (cap + 1) - 1e-9, f"{t}: under bound"


def test_streaming_windowed_tdigest_rank_error(spark):
    """Windowed t-digest on a 4-slice replay: the final (highest
    n_seen) digest per window must hit 2% rank error vs that window's
    exact values, and n_seen must equal the window's row count —
    proving state survives micro-batch boundaries."""
    import numpy as np

    from stream_spark.sources import load_table
    from stream_spark.streaming import file_replay_stream, run_stream_to_memory
    from stream_spark.streaming.jobs import streaming_windowed_tdigest

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    stage = f"{SCRATCH}/wtd"
    shutil.rmtree(stage, ignore_errors=True)
    stream = file_replay_stream(spark, ev, stage, n_slices=4)
    DAY = 86_400_000
    out = run_stream_to_memory(
        streaming_windowed_tdigest(stream, "ts", "value", DAY, (0.5, 0.95)),
        output_mode="append",
    )
    rows = out.collect()
    final = {}
    for r in rows:
        if r.window_start_ms not in final or r.n_seen > final[r.window_start_ms].n_seen:
            final[r.window_start_ms] = r
    exact = (
        ev.select(
            ((F.unix_millis(F.col("ts").cast("timestamp")) / DAY).cast("long") * DAY).alias("w"),
            "value",
        )
        .groupBy("w")
        .agg(F.collect_list("value").alias("vs"))
        .collect()
    )
    assert len(final) == len(exact) > 0
    for r in exact:
        got = final[r.w]
        vals = np.sort(np.array(r.vs))
        assert got.n_seen == len(vals)  # no rows lost across batches
        for p, est in ((0.5, got.p50), (0.95, got.p95)):
            rank = np.searchsorted(vals, est) / len(vals)
            assert abs(rank - p) < 0.02 + 2.0 / len(vals), (r.w, p, rank)


def test_observe_counts_rides_the_action(spark):
    """df.observe metrics: quality-gate accounting in the same pass."""
    from stream_spark.operators.text import gopher_rules
    from stream_spark.sources import load_table
    from stream_spark.streaming.telemetry import observe_counts

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    gated = gopher_rules(docs)
    observed, obs = observe_counts(
        gated, "gate", flag_cols={"kept": "gopher_keep", "alpha_ok": "rule_alpha"}
    )
    n_out = observed.count()  # the action that materializes the metrics
    got = obs.get
    assert got["n_rows"] == n_out == docs.count()
    exact_kept = gated.filter(F.col("gopher_keep") == 1).count()
    assert got["kept"] == exact_kept
    assert 0 <= got["kept"] <= got["alpha_ok"] <= got["n_rows"]


def test_rocksdb_state_store_matches_batch(spark):
    """The RocksDB state store (the long-running-stream config) must
    produce byte-identical windowed aggregates to the default store."""
    from stream_spark.sources import load_table
    from stream_spark.streaming import file_replay_stream, run_stream_to_memory
    from stream_spark.streaming.jobs import (
        streaming_tumbling_time_window,
        use_rocksdb_state,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    stage = f"{SCRATCH}/rocksdb_state"
    shutil.rmtree(stage, ignore_errors=True)
    use_rocksdb_state(spark)
    try:
        stream = file_replay_stream(spark, ev, stage, n_slices=4)
        out = run_stream_to_memory(
            streaming_tumbling_time_window(stream, "ts", "value", "sum", 3_600_000),
            output_mode="complete",
        ).collect()
    finally:
        use_rocksdb_state(spark, enabled=False)
    from stream_spark.operators.windows import tumbling_time_window

    batch = tumbling_time_window(ev, "ts", "value", "sum", 3_600_000).collect()
    g = {(r["window_start"], round(r["result"], 6)) for r in out}
    b = {(r["window_start"], round(r["result"], 6)) for r in batch}
    assert g == b


def test_transform_with_state_count_window_parity(spark):
    """The transformWithStateInPandas count window must reproduce the
    applyInPandasWithState implementation row for row (same single-
    slice replay → same arrival order). Skips when the protobuf
    package (required by the processor protocol) isn't installed."""
    import pytest as _pytest

    _pytest.importorskip("google.protobuf")
    from stream_spark.sources import load_table
    from stream_spark.streaming import file_replay_stream, run_stream_to_memory
    from stream_spark.streaming.jobs import (
        streaming_tumbling_count,
        streaming_tumbling_count_tws,
        use_rocksdb_state,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")

    def run(op, stage_name, rocksdb):
        stage = f"{SCRATCH}/{stage_name}"
        shutil.rmtree(stage, ignore_errors=True)
        if rocksdb:
            use_rocksdb_state(spark)
        try:
            stream = file_replay_stream(spark, ev, stage, n_slices=1, max_files_per_trigger=None)
            return run_stream_to_memory(
                op(stream, "event_type", "value", "sum", 20), output_mode="append"
            ).collect()
        finally:
            if rocksdb:
                use_rocksdb_state(spark, enabled=False)

    old = run(streaming_tumbling_count, "tws_old", rocksdb=False)
    new = run(streaming_tumbling_count_tws, "tws_new", rocksdb=True)
    ko = sorted((r.event_type, r.window_id, round(r.result, 6)) for r in old)
    kn = sorted((r.event_type, r.window_id, round(r.result, 6)) for r in new)
    assert ko == kn and len(ko) > 0


def test_tws_raises_clean_importerror_without_protobuf(spark, tiny_events):
    """Without protobuf the modern API must fail fast with ImportError
    at plan-build time, not crash the streaming driver worker."""
    import pytest as _pytest

    try:
        import google.protobuf  # noqa: F401

        _pytest.skip("protobuf present; gate inactive")
    except ImportError:
        pass
    from stream_spark.streaming.jobs import streaming_tumbling_count_tws

    with _pytest.raises(ImportError, match="protobuf"):
        streaming_tumbling_count_tws(tiny_events, "event_type", "value", "sum", 3)


def test_streaming_minhash_dedup_flags_only_later_neardups(spark, tmp_path):
    """Online near-dup: a doc is flagged iff it shares a band bucket
    with an EARLIER-id doc — across micro-batch boundaries (the dup
    arrives two batches after its original), never the other way."""
    from pyspark.sql import functions as F

    from stream_spark.streaming import ordered_replay_stream, run_stream_to_memory
    from stream_spark.streaming.dedup import streaming_minhash_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),                              # original
        (2, "completely different words here about other topics entirely now"),
        (3, "yet another unrelated document with its own vocabulary set"),
        (4, base),                              # exact dup of 1, later batch
        (5, base + " trailing"),                # near dup of 1
        (6, "final distinct text block nothing shared with previous ones"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stage = str(tmp_path / "stream_mh")
    stream = ordered_replay_stream(spark, docs, stage, ["doc_id"], n_slices=3)
    out = run_stream_to_memory(streaming_minhash_dedup(stream), output_mode="append")
    flags = {
        r["_doc"]: r["dup"]
        for r in out.groupBy(F.col("doc").alias("_doc")).agg(F.max("hit").alias("dup")).collect()
    }
    assert flags[1] == 0  # first occurrence never flagged
    assert flags[4] == 1  # exact dup, two batches later
    assert flags[5] == 1  # near dup (shares most shingles -> some band)
    assert flags.get(2, 0) == 0 and flags.get(3, 0) == 0 and flags.get(6, 0) == 0


def test_streaming_embedding_dedup_flags_only_later_dups(spark, tmp_path):
    """Online embedding near-dup: a vector is flagged iff it shares an
    LSH (table, bucket) with an EARLIER-id vector — across micro-batch
    boundaries; an identical vector always collides in every table, a
    far-apart one in none (probabilistically, checked via the batch
    banded index the stream must agree with)."""
    from pyspark.sql import functions as F

    from stream_spark.operators.similarity import banded_buckets
    from stream_spark.streaming import ordered_replay_stream, run_stream_to_memory
    from stream_spark.streaming.dedup import streaming_embedding_dedup

    va = [float((i * 7) % 13 - 6) for i in range(64)]
    vb = [float((i * 11) % 17 - 8) for i in range(64)]
    rows = [(1, va), (2, vb), (3, va), (4, [-x for x in va]), (5, va)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # ground truth from the BATCH banded index: later id sharing any bucket
    bk = emb.select(
        "vec_id", F.explode(banded_buckets(F.col("embedding"))).alias("tb")
    ).select("vec_id", "tb.t", "tb.bucket")
    expected = {
        r["vec_id"]
        for r in bk.alias("a")
        .join(
            bk.alias("b"),
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .collect()
    }
    assert {3, 5} <= expected and 1 not in expected

    stage = str(tmp_path / "stream_emb")
    stream = ordered_replay_stream(spark, emb, stage, ["vec_id"], n_slices=3)
    out = run_stream_to_memory(streaming_embedding_dedup(stream), output_mode="append")
    flags = {
        r["_doc"]: r["dup"]
        for r in out.groupBy(F.col("doc").alias("_doc")).agg(F.max("hit").alias("dup")).collect()
    }
    assert {d for d, h in flags.items() if h == 1} == expected


def test_stream_upsert_sink_idempotent_and_order_free(spark, tmp_path):
    """The CDC-apply sink must converge to the per-key max order tuple
    regardless of batch slicing, and re-processing the same data into
    an existing target must change nothing (associative + idempotent
    resolution)."""
    from pyspark.sql import functions as F

    from stream_spark.streaming import file_replay_stream
    from stream_spark.streaming.jobs import run_stream_upsert_sink

    rows = [(1, 10, "a"), (1, 30, "c"), (1, 20, "b"), (2, 5, "x"), (3, 7, "y"), (3, 6, "z")]
    df = spark.createDataFrame(rows, "k long, ver long, payload string")
    target = str(tmp_path / "t")

    def run(n_slices):
        stage = str(tmp_path / f"src{n_slices}")
        stream = file_replay_stream(spark, df, stage, n_slices=n_slices)
        run_stream_upsert_sink(stream, target, key_cols=("k",), order_cols=("ver",))
        return {r["k"]: (r["ver"], r["payload"]) for r in spark.read.parquet(target).collect()}

    want = {1: (30, "c"), 2: (5, "x"), 3: (7, "y")}
    assert run(3) == want
    assert run(1) == want  # replayed again into the existing target: unchanged
    # a later-arriving OLDER row must lose to the stored newer row
    late = spark.createDataFrame([(1, 25, "old")], "k long, ver long, payload string")
    stage2 = str(tmp_path / "late")
    run_stream_upsert_sink(
        file_replay_stream(spark, late, stage2, n_slices=1), target,
        key_cols=("k",), order_cols=("ver",),
    )
    got = {r["k"]: (r["ver"], r["payload"]) for r in spark.read.parquet(target).collect()}
    assert got == want


def test_first_seen_fold_event_time_ttl(spark, tmp_path):
    """TTL-bounded first-seen: a bucket claim older than ttl_ms
    relative to the arriving batch's max event time is forgotten, so a
    late re-occurrence is NOT flagged (it becomes the new claim) while
    within-horizon dups still are. Event-time arithmetic keeps it
    deterministic under replay."""
    from pyspark.sql import functions as F

    from stream_spark.streaming import ordered_replay_stream, run_stream_to_memory
    from stream_spark.streaming.dedup import first_seen_fold

    rows = [
        # (doc, band, bucket, ts_ms) — one bucket "X", one bucket "Y"
        (1, 0, "X", 1_000),
        (2, 0, "Y", 2_000),
        (3, 0, "X", 3_000),      # X claimed at 1s, within 5s TTL -> dup
        (4, 0, "X", 20_000),     # X claim last refreshed at 3s; 20s - 5s horizon -> expired -> NOT dup
        (5, 0, "X", 21_000),     # X re-claimed by 4 at 20s -> dup again
        (6, 0, "Y", 30_000),     # Y claim from 2s long expired -> NOT dup
    ]
    df = spark.createDataFrame(rows, "doc long, band int, bucket string, ts long")
    stage = str(tmp_path / "ttl_fold")
    stream = ordered_replay_stream(spark, df, stage, ["doc"], n_slices=3)
    out = run_stream_to_memory(
        first_seen_fold(stream, ttl_ms=5_000), output_mode="append"
    )
    flags = {r["doc"]: r["hit"] for r in out.collect()}
    assert flags == {1: 0, 2: 0, 3: 1, 4: 0, 5: 1, 6: 0}

    # without TTL the late re-occurrences ARE dups of the original ids
    stream2 = ordered_replay_stream(spark, df, str(tmp_path / "nottl"), ["doc"], n_slices=3)
    out2 = run_stream_to_memory(first_seen_fold(stream2.drop("ts")), output_mode="append")
    flags2 = {r["doc"]: r["hit"] for r in out2.collect()}
    assert flags2 == {1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 1}


def test_first_seen_fold_sharded_parity(spark, tmp_path):
    """The r5 sharded no-TTL fold must be row-for-row identical to the
    per-bucket loop fold (still reachable via a never-expiring TTL) on
    an adversarial frame: multi-band docs, colliding buckets across
    bands, a long-typed bucket caller shape, cross-batch claims, and
    shards ∈ {1, 3, 64} (keys >> shards and keys << shards)."""
    from stream_spark.streaming import ordered_replay_stream, run_stream_to_memory
    from stream_spark.streaming.dedup import first_seen_fold

    rows = [
        (10, 0, "7", 1), (10, 1, "9", 1),
        (11, 0, "7", 2),              # dup of 10 in band 0
        (12, 1, "9", 3), (12, 0, "8", 3),  # dup of 10 in band 1 only
        (13, 2, "7", 4),              # bucket "7" but band 2 -> fresh
        (14, 0, "8", 5),              # dup of 12 in band 0
    ]
    df = spark.createDataFrame(rows, "doc long, band int, bucket string, ts long")
    expected = {
        (10, 0): 0, (10, 1): 0, (11, 0): 1, (12, 1): 1, (12, 0): 0,
        (13, 2): 0, (14, 0): 1,
    }
    loop_stream = ordered_replay_stream(spark, df, str(tmp_path / "loop"), ["doc"], n_slices=3)
    loop = run_stream_to_memory(
        first_seen_fold(loop_stream, ttl_ms=10**15), output_mode="append"
    )
    assert {(r["doc"], r["band"]): r["hit"] for r in loop.collect()} == expected
    for shards in (1, 3, 64):
        stream = ordered_replay_stream(
            spark, df.drop("ts"), str(tmp_path / f"sh{shards}"), ["doc"], n_slices=3
        )
        out = run_stream_to_memory(
            first_seen_fold(stream, shards=shards), output_mode="append"
        )
        assert {(r["doc"], r["band"]): r["hit"] for r in out.collect()} == expected, shards


def test_streaming_index_maintain_folds_new_bands_per_batch(spark, tmp_path):
    """r11 C100: each micro-batch probes the stored index, then appends
    its distinct bands — a later doc is flagged when it collides with
    the persisted corpus, with an earlier BATCH's appended doc, or with
    an earlier-id doc in the SAME batch; never the other way, and never
    from being the first claimant."""
    from pyspark.sql import functions as F

    from stream_spark.operators.dedup import minhash_band_buckets, minhash_band_rows_arrow
    from stream_spark.streaming import ordered_replay_stream
    from stream_spark.streaming.dedup import streaming_index_maintain

    corp_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    live_dup = "one two three four five six seven eight nine ten eleven"
    corpus = spark.createDataFrame([(100, corp_text)], "doc_id long, text string")
    rows = [
        (1, corp_text),  # hits the persisted corpus index
        (2, live_dup),   # first claimant of its buckets — never flagged
        (3, live_dup + " tail"),  # near dup of 2, SAME/adjacent batch
        (4, "totally different unrelated vocabulary in this document body"),
        (5, live_dup),   # exact dup of 2, later batch (sees appended bands)
        (6, "yet another fully distinct text with private token set"),
    ]
    live = spark.createDataFrame(rows, "doc_id long, text string")

    idx_dir = str(tmp_path / "idx")
    out_dir = str(tmp_path / "flags")
    minhash_band_buckets(corpus).select("band", "bucket").distinct().write.parquet(idx_dir)
    stream = ordered_replay_stream(spark, live, str(tmp_path / "stage"), ["doc_id"], n_slices=3)
    streaming_index_maintain(minhash_band_rows_arrow(stream), idx_dir, out_dir)

    flags = {
        r["doc"]: r["is_dup"] for r in spark.read.parquet(out_dir).collect()
    }
    assert flags[1] == 1  # stored-corpus hit
    assert flags[2] == 0  # first claimant
    assert flags[3] == 1  # earlier-id collision (batch-boundary-free)
    assert flags[4] == 0
    assert flags[5] == 1  # appended-delta hit, later batch
    assert flags[6] == 0
    # the index grew: corpus bands ∪ every live doc's distinct bands
    grown = spark.read.parquet(idx_dir).distinct().count()
    want = (
        minhash_band_buckets(corpus.unionByName(live))
        .select("band", "bucket")
        .distinct()
        .count()
    )
    assert grown == want


def test_streaming_index_maintain_bucketed_parity_and_layout(spark, tmp_path):
    """r11: the bucketed maintain twin must produce bit-identical flags
    to the flat spelling on the same replay, the probe plan must read
    the index Bucketed with NO exchange on the index side, and the
    grown table must stay bucketed (delta appends land as bucket
    files, never a rewrite)."""
    from pyspark.sql import functions as F

    from stream_spark.operators.dedup import minhash_band_buckets, minhash_band_rows_arrow
    from stream_spark.sources import write_bucketed
    from stream_spark.streaming import ordered_replay_stream
    from stream_spark.streaming.dedup import (
        streaming_index_maintain,
        streaming_index_maintain_bucketed,
    )

    corp_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    live_dup = "one two three four five six seven eight nine ten eleven"
    corpus = spark.createDataFrame([(100, corp_text)], "doc_id long, text string")
    rows = [
        (1, corp_text),
        (2, live_dup),
        (3, live_dup + " tail"),
        (4, "totally different unrelated vocabulary in this document body"),
        (5, live_dup),
        (6, "yet another fully distinct text with private token set"),
    ]
    live = spark.createDataFrame(rows, "doc_id long, text string")
    bands0 = minhash_band_buckets(corpus).select("band", "bucket").distinct()

    flat_idx, flat_out = str(tmp_path / "fidx"), str(tmp_path / "fflags")
    bands0.write.parquet(flat_idx)
    s1 = ordered_replay_stream(spark, live, str(tmp_path / "s1"), ["doc_id"], n_slices=3)
    streaming_index_maintain(minhash_band_rows_arrow(s1), flat_idx, flat_out)

    from stream_spark.sources import pid_scoped_table

    tbl = pid_scoped_table(spark, "b_idx_mnt_test")
    write_bucketed(bands0, tbl, ["band", "bucket"], 4, sort_col="bucket")
    b_out = str(tmp_path / "bflags")
    s2 = ordered_replay_stream(spark, live, str(tmp_path / "s2"), ["doc_id"], n_slices=3)
    streaming_index_maintain_bucketed(minhash_band_rows_arrow(s2), tbl, b_out, n_buckets=4)

    flat = {(r["doc"], r["is_dup"]) for r in spark.read.parquet(flat_out).collect()}
    buck = {(r["doc"], r["is_dup"]) for r in spark.read.parquet(b_out).collect()}
    assert flat == buck and len(buck) == 6

    # grown table: the appended deltas kept the bucketed layout (the
    # catalog metadata is what the planner trusts) and a
    # non-broadcast probe still reads it Bucketed: true — formatted
    # explain puts the marker on its own line, immune to the FileScan
    # toString char budget the pid-suffixed table name overflows
    import contextlib
    import io

    desc = {str(r[0]): str(r[1]) for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()}
    assert desc.get("Num Buckets") == "4"
    assert desc.get("Bucket Columns") == "[`band`, `bucket`]"
    probe = spark.createDataFrame([(0, "one two")], "doc_id long, text string")
    pb = minhash_band_buckets(probe).select("band", "bucket")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            pb.join(spark.table(tbl), ["band", "bucket"], "left").explain("formatted")
        assert "Bucketed: true" in buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the index grew to corpus ∪ live bands, exactly once each
    grown = spark.table(tbl).count()
    want_d = spark.table(tbl).distinct().count()
    want = (
        minhash_band_buckets(corpus.unionByName(live))
        .select("band", "bucket")
        .distinct()
        .count()
    )
    # appends are dup-tolerant (a later batch may re-claim a bucket);
    # compaction is the offline companion pass — distinct must be exact
    assert want_d == want and grown >= want
