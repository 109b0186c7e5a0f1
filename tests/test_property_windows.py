"""Property-based window semantics: for arbitrary (integer-valued)
streams and window geometries, the Spark count-window operators must
match a direct Python model of the reference semantics (windows.go):
tumbling = chunk-by-N drop-partial-tail, sliding = last-N at every
R-th sample after warmup. Integer values keep float sums exact, so
results compare with ==.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_spark.operators.windows import sliding_count_window, tumbling_count_window

VALS = st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=48)


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, i, float(v)) for i, v in enumerate(vals)], ["ts", "event_id", "value"]
    )


def _agg(fn, window):
    if fn == "sum":
        return float(sum(window))
    if fn == "min":
        return float(min(window))
    if fn == "max":
        return float(max(window))
    if fn == "avg":
        return sum(window) / len(window)
    raise AssertionError(fn)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=VALS, size=st.integers(1, 7), fn=st.sampled_from(["sum", "min", "max", "avg"]))
def test_tumbling_count_matches_model(spark, vals, size, fn):
    out = tumbling_count_window(_df(spark, vals), "value", fn, size, order_cols=("ts", "event_id"))
    got = {r["window_id"]: r["result"] for r in out.collect()}
    want = {
        w: _agg(fn, vals[w * size : (w + 1) * size]) for w in range(len(vals) // size)
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=VALS, size=st.integers(1, 7), res=st.integers(1, 4), fn=st.sampled_from(["sum", "max"]))
def test_sliding_count_matches_model(spark, vals, size, res, fn):
    out = sliding_count_window(_df(spark, vals), "value", fn, size, res, order_cols=("ts", "event_id"))
    got = {r["emit_rn"]: r["result"] for r in out.collect()}
    # reference cadence: first emit once the ring is full AND res
    # samples have arrived (offset = max(size, res)), then every res
    offset = max(size, res)
    want = {
        rn: _agg(fn, vals[rn - size : rn]) for rn in range(offset, len(vals) + 1, res)
    }
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(-20, 20)),
        min_size=1,
        max_size=40,
    ),
    size=st.integers(1, 5),
)
def test_grouped_per_key_tumbling_matches_model(spark, vals, size):
    """Per-key windows: each key's stream chunks independently."""
    df = spark.createDataFrame(
        [(i, i, k, float(v)) for i, (k, v) in enumerate(vals)],
        ["ts", "event_id", "k", "value"],
    )
    out = tumbling_count_window(df, "value", "sum", size, group_by=["k"])
    got = {(r["k"], r["window_id"]): r["result"] for r in out.collect()}
    want = {}
    for key in "abc":
        stream = [v for k, v in vals if k == key]
        for w in range(len(stream) // size):
            want[(key, w)] = float(sum(stream[w * size : (w + 1) * size]))
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(-20, 20)),
        min_size=1,
        max_size=40,
    ),
    size=st.integers(1, 5),
)
def test_grouped_global_tumbling_matches_model(spark, vals, size):
    """Reference grouped semantics: ONE global counter; every `size`
    samples the whole key map is emitted (windows.go:77-84)."""
    from stream_spark.operators.windows import grouped_global_tumbling_count

    df = spark.createDataFrame(
        [(i, i, k, float(v)) for i, (k, v) in enumerate(vals)],
        ["ts", "event_id", "k", "value"],
    )
    out = grouped_global_tumbling_count(df, "k", "value", "sum", size)
    got = {(r["window_id"], r["k"]): r["result"] for r in out.collect()}
    want = {}
    for w in range(len(vals) // size):
        chunk = vals[w * size : (w + 1) * size]
        for key in set(k for k, _ in chunk):
            want[(w, key)] = float(sum(v for k, v in chunk if k == key))
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(-20, 20)), min_size=1, max_size=40
    ),
    size_ms=st.sampled_from([100, 250, 1000, 3600]),
)
def test_tumbling_time_matches_model(spark, rows, size_ms):
    """Epoch bucketing: every event lands in exactly floor(ms/size)."""
    import datetime as dt

    from stream_spark.operators.windows import tumbling_time_window

    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1) + dt.timedelta(milliseconds=ms), i, float(v))
            for i, (ms, v) in enumerate(rows)
        ],
        "ts timestamp, event_id long, value double",
    )
    out = tumbling_time_window(df, "ts", "value", "sum", size_ms)
    base = dt.datetime(2024, 1, 1)
    got = {
        int((r["window_start"] - base).total_seconds() * 1000): r["result"]
        for r in out.collect()
    }
    want: dict[int, float] = {}
    for ms, v in rows:
        w = (ms // size_ms) * size_ms
        want[w] = want.get(w, 0.0) + float(v)
    assert got == want
