"""Window semantics tests — mirrors the reference's windows_test.go
cases: emit cadence, warmup gating, grouped windows, accumulate order."""

from __future__ import annotations

from stream_spark.operators.windows import (
    sliding_count_window,
    sliding_time_window,
    tumbling_count_window,
    tumbling_time_window,
)


def rows_by(df, *keys):
    return {tuple(r[k] for k in keys[:-1]) if len(keys) > 2 else r[keys[0]]: r[keys[-1]] for r in df.collect()}


def test_tumbling_count_sum_drops_partial_tail(tiny_events):
    out = tumbling_count_window(tiny_events, "value", "sum", 5, order_cols=("ts", "event_id"))
    got = {r["window_id"]: r["result"] for r in out.collect()}
    # values 1..12; windows of 5 → [1..5]=15, [6..10]=40; tail [11,12] dropped
    assert got == {0: 15.0, 1: 40.0}


def test_tumbling_count_avg(tiny_events):
    out = tumbling_count_window(tiny_events, "value", "avg", 6)
    got = {r["window_id"]: r["result"] for r in out.collect()}
    assert got == {0: 3.5, 1: 9.5}


def test_tumbling_count_accumulate_ordered(tiny_events):
    out = tumbling_count_window(tiny_events, "value", "accumulate", 4)
    got = {r["window_id"]: r["result"] for r in out.collect()}
    assert got[0] == [1.0, 2.0, 3.0, 4.0]
    assert got[2] == [9.0, 10.0, 11.0, 12.0]


def test_sliding_count_warmup_and_cadence(tiny_events):
    # size 4, resolution 2: emits at rn=4,6,8,10,12 over last 4 rows
    out = sliding_count_window(tiny_events, "value", "sum", 4, 2)
    got = {r["emit_rn"]: r["result"] for r in out.collect()}
    assert got == {4: 10.0, 6: 18.0, 8: 26.0, 10: 34.0, 12: 42.0}


def test_sliding_count_resolution_one_emits_every_row_after_warmup(tiny_events):
    out = sliding_count_window(tiny_events, "value", "max", 3, 1)
    got = {r["emit_rn"]: r["result"] for r in out.collect()}
    assert len(got) == 10  # rn 3..12
    assert got[3] == 3.0 and got[12] == 12.0


def test_tumbling_time_window_buckets(tiny_events):
    # 60s buckets over 10s-spaced events: 6 per bucket
    out = tumbling_time_window(tiny_events, "ts", "value", "sum", 60_000)
    got = sorted(r["result"] for r in out.collect())
    assert got == [21.0, 57.0]  # 1..6, 7..12


def test_tumbling_time_grouped(tiny_events):
    out = tumbling_time_window(tiny_events, "ts", "value", "count", 60_000, group_by=["event_type"])
    got = {(r["event_type"], r["result"]) for r in out.collect()}
    assert got == {("view", 3), ("click", 3)}


def test_sliding_time_hop(tiny_events):
    # size 60s, hop 30s: event at t covers starts in (t-60, t]
    out = sliding_time_window(tiny_events, "ts", "value", "count", 60_000, 30_000)
    got = {r["window_start"].second + 60 * r["window_start"].minute: r["result"] for r in out.collect()}
    # starts: -30(covers 0..20s events? start=-30 covers [-30,30): events 0,10,20 → 3)
    assert got[0] == 6  # [0,60): events at 0..50
    assert got[30] == 6  # [30,90): events at 30..80
    assert got[90] == 3  # [90,150): events at 90,100,110


def test_grouped_tumbling_count(tiny_events):
    out = tumbling_count_window(tiny_events, "value", "sum", 3, group_by=["user_id"])
    got = {(r["user_id"], r["window_id"]): r["result"] for r in out.collect()}
    # user 100: values 1,3,5,7,9,11 → [1,3,5]=9, [7,9,11]=27
    assert got[(100, 0)] == 9.0 and got[(100, 1)] == 27.0
    # user 101: values 2,4,6,8,10,12 → 12, 30
    assert got[(101, 0)] == 12.0 and got[(101, 1)] == 30.0


def test_sliding_count_resolution_gt_size(tiny_events):
    """windows.go ring semantics for r > N: first emit at max(N, r),
    then every r — gap rows are covered by no emit."""
    from stream_spark.operators.windows import sliding_count_window

    out = sliding_count_window(tiny_events, "value", "sum", 3, 5)
    got = {r["emit_rn"]: r["result"] for r in out.collect()}
    # emits at rows 5 and 10, each over the last 3 values
    assert got == {5: 3.0 + 4.0 + 5.0, 10: 8.0 + 9.0 + 10.0}


def test_grouped_global_tumbling_count(tiny_events):
    """Reference grouped cadence: one global counter, whole key map
    emitted every `size` samples."""
    from stream_spark.operators.windows import grouped_global_tumbling_count

    out = grouped_global_tumbling_count(tiny_events, "user_id", "value", "sum", 4)
    got = {(r["window_id"], r["user_id"]): r["result"] for r in out.collect()}
    # global windows of 4 rows: [1,2,3,4], [5,6,7,8], [9,10,11,12]
    # user 100 holds odd values, 101 even
    assert got == {
        (0, 100): 1.0 + 3.0, (0, 101): 2.0 + 4.0,
        (1, 100): 5.0 + 7.0, (1, 101): 6.0 + 8.0,
        (2, 100): 9.0 + 11.0, (2, 101): 10.0 + 12.0,
    }


def test_tumbling_time_avg_total_count_modifier(spark):
    """Reference windows.go:192-201: default (TotalCountModifier unset
    = 0) avg divides by the RUNNING MAX of per-window counts; >0
    ("local") divides by each window's own count."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    # minute buckets with counts 3, 1, 2
    offsets = [0, 10, 20, 60, 120, 130]
    vals = [1.0, 2.0, 3.0, 10.0, 4.0, 6.0]
    df = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=o), v) for i, (o, v) in enumerate(zip(offsets, vals))],
        "event_id long, ts timestamp, value double",
    )
    local = tumbling_time_window(df, "ts", "value", "avg", 60_000)
    got = sorted(r["result"] for r in local.collect())
    assert got == [2.0, 5.0, 10.0]  # 6/3, 10/6?  -> see below

    glob = tumbling_time_window(df, "ts", "value", "avg", 60_000, total_count_modifier=0)
    got_g = {r["window_start"].minute: r["result"] for r in glob.collect()}
    # running max of counts over start order: 3, 3, 3
    assert got_g == {0: 2.0, 1: 10.0 / 3, 2: 10.0 / 3}


def test_pipeline_accepts_total_count_modifier(spark, sf_dir):
    from stream_spark.pipeline import Pipeline

    cfg = {
        "source": {"table": "events"},
        "stages": [
            {
                "type": "aggregate",
                "settings": {
                    "function": "avg",
                    "windowType": "timeTumbling",
                    "windowSize": 3_600_000,
                    "value": "value",
                    "additionalSettings": {"totalCountModifier": "0"},
                },
            }
        ],
    }
    out = Pipeline.from_dict(cfg).run(spark, sf_dir)
    assert out.count() > 0 and "result" in out.columns


def test_sliding_count_blocked_matches_row_explode(spark):
    """The two-level block-combined sliding plan (r11: resolution | size)
    must emit EXACTLY the row-explode spelling's rows for every
    decomposable function — including NULL values (count/avg skip them,
    min/max propagate absence), tie-broken duplicate timestamps, and the
    dropped partial tail."""
    import datetime as dt

    from pyspark.sql import functions as F

    from stream_spark.operators.windows import (
        _fractional,
        _ordered,
        _sliding_count_blocked,
    )
    from stream_spark.functions.aggregates import agg_expr

    base = dt.datetime(2024, 1, 1)
    # 23 rows (partial tail past the last full window), NULL values at
    # every 5th row, duplicate ts pairs tie-broken by event_id
    rows = [
        (i, base + dt.timedelta(seconds=10 * (i // 2)), None if i % 5 == 0 else float(i) + 0.25)
        for i in range(23)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    size, res = 8, 2

    def explode_ref(fn):
        d = _ordered(df, ("ts", "event_id"), None)
        offset = max(size, res)
        k_min = F.greatest(
            F.lit(0).cast("long"), F.ceil((F.col("rn") - offset) / F.lit(res)).cast("long")
        )
        k_max = F.floor((F.col("rn") + size - 1 - offset) / F.lit(res)).cast("long")
        ks = F.when(k_max >= k_min, F.sequence(k_min, k_max)).otherwise(
            F.array().cast("array<long>")
        )
        d = d.withColumn("window_id", F.explode(ks))
        return (
            d.groupBy("window_id")
            .agg(
                agg_expr(fn, F.col("value"), F.col("rn"), alias="result",
                         exact_decimal=_fractional(df, "value")),
                F.count("*").alias("n_samples"),
            )
            .filter(F.col("n_samples") == size)
            .withColumn("emit_rn", (F.col("window_id") * res + offset).cast("long"))
            .drop("n_samples")
        )

    for fn in ["sum", "avg", "min", "max", "count"]:
        d = _ordered(df, ("ts", "event_id"), None)
        got = _sliding_count_blocked(d, "value", fn, size, res, None, _fractional(df, "value"))
        want = explode_ref(fn)
        g = {r["window_id"]: (r["result"], r["emit_rn"]) for r in got.collect()}
        w = {r["window_id"]: (r["result"], r["emit_rn"]) for r in want.collect()}
        assert g == w, f"{fn}: {g} != {w}"


def test_sliding_count_blocked_guard(tiny_events):
    """accumulate and indivisible resolutions keep the row-explode plan
    (Generate directly above the Window; no block aggregate)."""
    out = sliding_count_window(tiny_events, "value", "accumulate", 4, 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # explode path: no aggregate between the Generate and the Window
    assert "HashAggregate" not in plan[plan.index("Generate") : plan.index("Window")]
    blocked = sliding_count_window(tiny_events, "value", "sum", 4, 2)
    bplan = blocked._jdf.queryExecution().executedPlan().toString()
    # blocked path: the block-partial aggregate sits between them
    assert "HashAggregate" in bplan[bplan.index("Generate") : bplan.index("Window")]
