"""Streaming window jobs.

Time windows reuse the exact batch operators — ``F.window`` groupBy
plans are streaming-native, so `tumbling_time_window` /
`sliding_time_window` run unchanged on a streaming DataFrame; only the
watermark (late-data bound, windows.go has no equivalent — flogo drops
nothing and never emits late corrections) and the sink differ.

Count-based windows are genuinely stateful-custom (arrival-order
semantics), so they use ``applyInPandasWithState`` — the Structured
Streaming escape hatch for reference-style per-key window state
(windows.go TumblingWindow.AddSample): state carries the open
window's (count, accumulator); each completed group of N emits.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from stream_spark.operators.windows import sliding_time_window, tumbling_time_window


def streaming_tumbling_time_window(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    function: str,
    size_ms: int,
    watermark: str = "1 hour",
    group_by=None,
) -> DataFrame:
    return tumbling_time_window(
        stream.withWatermark(ts_col, watermark), ts_col, value_col, function, size_ms, group_by=group_by
    )


def streaming_sliding_time_window(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    function: str,
    size_ms: int,
    resolution_ms: int,
    watermark: str = "1 hour",
    group_by=None,
) -> DataFrame:
    return sliding_time_window(
        stream.withWatermark(ts_col, watermark), ts_col, value_col, function, size_ms, resolution_ms, group_by=group_by
    )


def streaming_windowed_approx_distinct(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window_ms: int,
    watermark: str = "1 hour",
    group_by=None,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-window HLL++ distinct count on a live stream.

    approx_count_distinct is a mergeable typed-imperative aggregate, so
    micro-batch partials combine into the windowed state exactly like
    sum/count — state per (window, group) is one register set, bounded
    by the watermark horizon.
    """
    from stream_spark.operators.sketches import windowed_approx_distinct

    return windowed_approx_distinct(
        stream.withWatermark(ts_col, watermark),
        ts_col,
        key_col,
        window_ms,
        group_by=group_by,
        rsd=rsd,
    )


def streaming_tumbling_count(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    function: str,
    size: int,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Per-key count-tumbling window over a stream.

    Mirrors windows.go TumblingWindow.AddSample:70 — accumulate until
    ``size`` samples, emit, reset. State = (samples_seen, running
    accumulator[, count for avg]). Rows are folded in ``order_cols``
    order within each micro-batch; cross-batch order is arrival order,
    as in the reference.
    """
    if function not in ("sum", "count", "min", "max", "avg"):
        raise ValueError(f"unsupported streaming count-window function: {function}")

    def fold(acc: float | None, n: int, v: float) -> tuple[float, int]:
        if acc is None:
            return v if function != "count" else 1.0, 1
        if function == "sum":
            return acc + v, n + 1
        if function == "count":
            return acc + 1.0, n + 1
        if function == "min":
            return min(acc, v), n + 1
        if function == "max":
            return max(acc, v), n + 1
        return acc + v, n + 1  # avg accumulates sum; divide at emit

    def process(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_seen, acc, window_id = state.get
        else:
            n_seen, acc, window_id = 0, None, 0
        out_rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(list(order_cols), kind="mergesort")
        for v in batch[value_col]:
            acc, n_seen = fold(acc if n_seen else None, n_seen, float(v))
            if n_seen == size:
                result = acc / size if function == "avg" else acc
                out_rows.append((key[0], window_id, float(result)))
                n_seen, acc, window_id = 0, None, window_id + 1
        state.update((n_seen, float(acc) if acc is not None else 0.0, window_id))
        yield pd.DataFrame(out_rows, columns=[key_col, "window_id", "result"])

    out_schema = f"{key_col} string, window_id long, result double"
    return stream.groupBy(key_col).applyInPandasWithState(
        process, out_schema, "n long, acc double, window_id long", "append", GroupStateTimeout.NoTimeout
    )


def streaming_sliding_count(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    function: str,
    size: int,
    resolution: int,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Per-key sliding count window over a stream.

    Mirrors windows.go SlidingWindow:226/260 — a ring of the last
    ``size`` samples; first emit at sample max(size, r) (ring full AND
    r samples since the last reset), then every ``resolution`` samples,
    aggregating the ring. Emit k happens at arrival position
    max(size, r) + k*r — identical numbering to the batch
    ``sliding_count_window`` operator, so batch and streaming results
    are row-for-row comparable.

    State = (ring values, total samples seen); the ring is bounded at
    ``size`` floats per key, so state size is O(keys * size) no matter
    the stream length. The ring aggregate is recomputed per emit
    (O(size), bounded); values are re-quantized downstream for oracle
    exactness just like the tumbling-count path.
    """
    if function not in ("sum", "avg", "min", "max"):
        raise ValueError(f"unsupported streaming sliding-window function: {function}")
    if size <= 0 or resolution <= 0:
        raise ValueError("size and resolution must be positive")

    def emit_value(vals: list[float]) -> float:
        if function == "sum":
            return sum(vals)
        if function == "avg":
            return sum(vals) / len(vals)
        if function == "min":
            return min(vals)
        return max(vals)

    def process(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals, n_total = state.get
            vals = list(vals)
        else:
            vals, n_total = [], 0
        out_rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(list(order_cols), kind="mergesort")
        offset = max(size, resolution)
        for v in batch[value_col]:
            vals.append(float(v))
            if len(vals) > size:
                vals.pop(0)
            n_total += 1
            if n_total >= offset and (n_total - offset) % resolution == 0:
                window_id = (n_total - offset) // resolution
                out_rows.append((key[0], window_id, float(emit_value(vals))))
        state.update((vals, n_total))
        yield pd.DataFrame(out_rows, columns=[key_col, "window_id", "result"])

    out_schema = f"{key_col} string, window_id long, result double"
    return stream.groupBy(key_col).applyInPandasWithState(
        process, out_schema, "vals array<double>, n_total long", "append", GroupStateTimeout.NoTimeout
    )


def streaming_tumbling_count_accumulate(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    size: int,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Per-key count-tumbling ``accumulate`` over a LIVE stream —
    reference functions/accumulate.go:3 evaluated by windows.go
    TumblingWindow: every completed window of ``size`` samples emits
    ALL its samples in arrival order, then resets.

    State = the open window's sample list — bounded at ``size`` doubles
    per key BY CONSTRUCTION (the list empties on every emit), so state
    size is O(keys · size) forever. Output is the exploded relational
    form (key, window_id, pos, value), matching the batch
    ``tumbling_count_window(..., 'accumulate')`` + posexplode shape so
    the two paths are row-for-row comparable.
    """

    def process(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals, window_id = state.get
            vals = list(vals)
        else:
            vals, window_id = [], 0
        out_rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(list(order_cols), kind="mergesort")
        for v in batch[value_col]:
            vals.append(float(v))
            if len(vals) == size:
                out_rows.extend(
                    (key[0], window_id, pos, x) for pos, x in enumerate(vals)
                )
                vals, window_id = [], window_id + 1
        state.update((vals, window_id))
        yield pd.DataFrame(out_rows, columns=[key_col, "window_id", "pos", "value"])

    out_schema = f"{key_col} string, window_id long, pos long, value double"
    return stream.groupBy(key_col).applyInPandasWithState(
        process,
        out_schema,
        "vals array<double>, window_id long",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def streaming_tumbling_count_array(
    stream: DataFrame,
    key_col: str,
    vec_col: str,
    function: str,
    size: int,
    order_cols: tuple[str, ...] = ("vec_id",),
    scale: int = 12,
) -> DataFrame:
    """Per-key count-tumbling ELEMENT-WISE aggregation of array samples
    on a live stream — reference functions/sum.go:44 (SumIntArray) /
    average.go:40 over windows.go count windows.

    Exactness contract: each element is quantized to ``scale`` decimal
    places (HALF_EVEN — IEEE ties-to-even, what DuckDB's double→decimal
    cast does; ties are real, e.g. 0.1983642578125 in the test
    embeddings) and the
    window accumulates SCALED INTEGERS — bit-identical to the batch
    operator's DECIMAL(28,12) fold and to the DuckDB oracle, with no
    float-order sensitivity across micro-batch boundaries. State is one
    int vector + counter per key (array length bounded by the data's
    fixed dim), emitted rows are the exploded (key, window_id, pos,
    result) form matching operators/arrays.elementwise_agg.
    """
    if function not in ("sum", "avg"):
        raise ValueError(f"unsupported streaming array function: {function}")
    from decimal import ROUND_HALF_EVEN, Decimal

    quantum = Decimal(1).scaleb(-scale)

    def process(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_seen, acc, window_id = state.get
            acc = list(acc)
        else:
            n_seen, acc, window_id = 0, [], 0
        out_rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(list(order_cols), kind="mergesort")
        for vec in batch[vec_col]:
            q = [
                int(
                    Decimal(float(x)).quantize(quantum, rounding=ROUND_HALF_EVEN).scaleb(scale)
                )
                for x in vec
            ]
            if not acc:
                acc = q
            else:
                acc = [a + b for a, b in zip(acc, q)]
            n_seen += 1
            if n_seen == size:
                for pos, s in enumerate(acc):
                    exact = Decimal(s).scaleb(-scale)  # the window's exact decimal sum
                    result = float(exact) if function == "sum" else float(exact) / size
                    out_rows.append((key[0], window_id, pos, result))
                n_seen, acc, window_id = 0, [], window_id + 1
        state.update((n_seen, acc, window_id))
        yield pd.DataFrame(out_rows, columns=[key_col, "window_id", "pos", "result"])

    out_schema = f"{key_col} long, window_id long, pos long, result double"
    return stream.groupBy(key_col).applyInPandasWithState(
        process,
        out_schema,
        "n long, acc array<long>, window_id long",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    result: DataFrame,
    output_mode: str = "complete",
    timeout_s: int = 300,
    state_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run a streaming plan to completion (availableNow) into a memory
    sink and return the final table as a batch DataFrame.

    ``state_partitions``: the state-store instance count of every
    stateful operator is pinned to ``spark.sql.shuffle.partitions`` AT
    QUERY START (it can never change for the checkpoint's lifetime), so
    a low-cardinality stateful agg — e.g. 24 hourly windows — run at
    the batch-sized default pays dozens of empty state-store tasks per
    micro-batch. Sizing it to key cardinality measured 2x end-to-end
    throughput on the replay bench (64 -> 8 partitions: 37k -> 73k
    rows/s at sf0.1). The conf is set only for ``start()`` and restored
    immediately — micro-batches keep the value captured at start.

    ``awaitTermination(timeout)`` returning False means the job is
    STILL RUNNING — reading the sink then would silently return a
    partial result (each replay slice covers the whole key/time range,
    so a half-processed complete-mode window agg has every window with
    subset-only values: wrong numbers, plausible shape). That exact
    flake hit one gate query in a 176-query run; fail loudly instead,
    and stop the query so a stuck run can't leak scheduler slots into
    later queries.
    """
    name = f"mem_{uuid.uuid4().hex[:8]}"
    spark = result.sparkSession
    writer = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        # explicit offset/commit-log + state location. Production points
        # this at durable fast storage; the bench points it at a RAM-fs
        # scratch dir — the offset-log fsyncs are ~100 ms of the ~650 ms
        # per-trigger floor on small triggers, pure housekeeping I/O.
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if state_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        try:
            q = writer.start()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    else:
        q = writer.start()
    finished = q.awaitTermination(timeout_s)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"streaming job {name} still running after {timeout_s}s — "
            "refusing to read a partial memory sink"
        )
    return spark.table(name)


def run_paced_stream_to_memory(
    result: DataFrame,
    total_rows: int,
    emit_delay_ms: int = 100,
    output_mode: str = "append",
    timeout_s: int = 120,
) -> DataFrame:
    """Run a paced streaming plan (see ``paced_replay_stream``) with a
    processingTime trigger — one staged tick file per interval, the
    Spark realization of emitter.go's EmitDelay loop — until
    ``total_rows`` input rows have been consumed, then stop and return
    the memory-sink table."""
    import time as _time

    name = f"paced_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(processingTime=f"{emit_delay_ms} milliseconds")
        .start()
    )
    deadline = _time.time() + timeout_s
    try:
        while _time.time() < deadline:
            seen = sum(int(p["numInputRows"]) for p in q.recentProgress)
            if seen >= total_rows:
                break
            _time.sleep(emit_delay_ms / 1000.0)
        else:
            raise TimeoutError(f"paced stream consumed <{total_rows} rows in {timeout_s}s")
    finally:
        q.stop()
    return result.sparkSession.table(name)


def streaming_stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: right rows within
    [left.ts - max_lag, left.ts]. Both sides carry watermarks so the
    join state is bounded — the Structured Streaming requirement the
    reference sidesteps by keeping everything in process memory.

    ``how="left_outer"`` additionally emits a null-padded row for
    every left event with no in-window partner — but only once the
    watermark passes the event's join horizon (matches could still
    arrive before that), so outer results trail the inner ones by the
    watermark delay. A replayed/finite stream needs one further
    micro-batch after its last data for the final horizon to flush
    (tests stage a beyond-horizon sentinel to force it).

    Caveat for callers composing on top: a filter on left-side columns
    placed AFTER this join is pushed below it by the optimizer — if it
    would drop rows carrying the side's max event time, it pins that
    side's watermark (the global watermark is the min across sources)
    and outer results stop flushing. Filter before the watermark is
    assigned, or post-process outside the stream.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {max_lag}"))
    )
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported stream-stream join type: {how!r}")
    return l.join(r, cond, how)


def run_stream_foreach_batch_parquet(result: DataFrame, out_dir: str, timeout_s: int = 300) -> None:
    """Sink a streaming plan to parquet via foreachBatch (append)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = result.writeStream.foreachBatch(sink).outputMode("append").trigger(availableNow=True).start()
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"foreachBatch parquet sink still running after {timeout_s}s")


def run_stream_upsert_sink(
    stream_df: DataFrame,
    target_dir: str,
    key_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    timeout_s: int = 300,
) -> None:
    """Streaming MERGE sink — the CDC-apply shape: every micro-batch
    upserts into a parquet target keyed on ``key_cols``, the greatest
    ``order_cols`` tuple winning per key.

    The stored row COMPETES on its order columns (max-of-struct over
    target ∪ batch), so the outcome is independent of how rows are
    sliced into micro-batches or in what order batches arrive — the
    resolution is associative and idempotent, which is what makes this
    safe to restart and safe on out-of-order replays (unlike
    updates-always-win MERGE, which silently requires ordered input).
    Each batch rewrites the compacted target (one row per key — state-
    table-sized, not stream-sized) to a staging dir and swaps it in.
    """
    import os
    import shutil

    keys = list(key_cols)
    order = list(order_cols)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        payload = [c for c in batch_df.columns if c not in keys]
        rest = [c for c in payload if c not in order]
        both = batch_df
        if os.path.isdir(target_dir):
            both = spark.read.parquet(target_dir).unionByName(batch_df)
        ranked = F.struct(*[F.col(c) for c in order], *[F.col(c) for c in rest])
        flat = (
            both.groupBy(*keys)
            .agg(F.max(ranked).alias("_m"))
            .select(*keys, *[F.col(f"_m.{c}").alias(c) for c in order + rest])
        )
        stage = target_dir + ".stage"
        flat.write.mode("overwrite").parquet(stage)  # materialize BEFORE replacing
        # rename-aside swap: target -> .old, stage -> target, drop .old.
        # A crash between the renames leaves a recoverable .old copy
        # (the r3 rmtree-then-replace could crash with NO target at
        # all). Same-filesystem renames only — this sink stages next to
        # the target by construction; production tables use the MERGE
        # operators (operators/merge.py) instead of directory swaps.
        old = target_dir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(target_dir):
            os.replace(target_dir, old)
        os.replace(stage, target_dir)
        shutil.rmtree(old, ignore_errors=True)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"streaming upsert sink still running after {timeout_s}s")


def streaming_asof_enrich(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    side_col: str,
    value_col: str,
    id_col: str,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Streaming as-of enrichment: rows tagged ``side_col`` == 'R' set
    per-key state (latest right id/ts); rows tagged 'L' emit joined to
    the most recent 'R' at-or-before them. The streaming counterpart
    of ``operators.asof.asof_join`` — same union-and-carry idea, with
    the carry held in per-key state across micro-batches instead of a
    window function.

    State per key = one (ts, id) pair — bounded regardless of stream
    length. Rows are folded in ``order_cols`` order within each
    micro-batch, with 'R' rows before 'L' rows at equal order keys so
    an exactly-simultaneous right row is visible to the left row —
    the inclusive (c.ts <= p.ts) as-of convention; cross-batch order
    is arrival order, as with the count windows.
    """

    def process(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts, last_id, has_right = state.get if state.exists else (0, 0, False)
        out = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.assign(_sr=(batch[side_col] != "R").astype(int))
        batch = batch.sort_values([order_cols[0], "_sr", *order_cols[1:]], kind="mergesort")
        for _, row in batch.iterrows():
            if row[side_col] == "R":
                last_ts, last_id, has_right = int(row[ts_col]), int(row[id_col]), True
            else:
                out.append(
                    (
                        key[0],
                        int(row[id_col]),
                        int(row[ts_col]),
                        float(row[value_col]),
                        int(last_id) if has_right else None,
                        int(last_ts) if has_right else None,
                    )
                )
        state.update((int(last_ts), int(last_id), bool(has_right)))
        yield pd.DataFrame(
            out,
            columns=[key_col, "left_id", "left_ts", "left_value", "right_id", "right_ts"],
        )

    out_schema = (
        f"{key_col} long, left_id long, left_ts long, left_value double, "
        "right_id long, right_ts long"
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        process, out_schema, "ts long, rid long, has boolean", "append", GroupStateTimeout.NoTimeout
    )


def streaming_heavy_hitters(
    stream: DataFrame,
    token_col: str,
    capacity: int,
    n_shards: int = 8,
) -> DataFrame:
    """Misra-Gries heavy hitters over a token stream with BOUNDED state:
    each shard (md5-sharded so any engine reproduces the assignment)
    keeps at most ``capacity`` counters, merged per micro-batch with
    the mergeable-summaries rule (pointwise sum, subtract the
    (capacity+1)-th largest, drop ≤0). Guarantees
    true_count - N_shard/(capacity+1) ≤ mg_count ≤ true_count; with
    capacity ≥ shard vocabulary the counts are exact.

    At 100 TB this is the frequency analogue of the windowed HLL:
    state per shard is O(capacity), never O(vocabulary) — the only
    way a top-k over an unbounded token stream holds memory. Each
    batch emits the shard's current counters (append mode), so the
    final emission per shard is its end-of-stream summary.
    """
    from stream_spark.operators.text import md5_long

    sharded = stream.withColumn("_shard", md5_long(F.col(token_col)) % n_shards)

    def process(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = (
            dict(zip(*state.get)) if state.exists else {}
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        for tok, cnt in batch[token_col].value_counts().items():
            counters[tok] = counters.get(tok, 0) + int(cnt)
        if len(counters) > capacity:
            cut = sorted(counters.values(), reverse=True)[capacity]
            counters = {t: c - cut for t, c in counters.items() if c - cut > 0}
        state.update((list(counters.keys()), [int(c) for c in counters.values()]))
        yield pd.DataFrame(
            sorted(counters.items()), columns=["token", "mg_count"]
        )

    out_schema = "token string, mg_count long"
    return sharded.groupBy("_shard").applyInPandasWithState(
        process,
        out_schema,
        "toks array<string>, cnts array<long>",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def streaming_windowed_tdigest(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    window_ms: int,
    probabilities: tuple = (0.5, 0.95, 0.99),
    delta: int = 100,
) -> DataFrame:
    """t-digest quantiles per tumbling time window on a live stream:
    state per window is the centroid arrays (O(delta) doubles, never
    the rows), folded batch-by-batch with the same compressor the
    batch operator uses (operators/sketches). Each batch emits the
    window's current quantiles plus ``n_seen`` — the row with the
    highest n_seen per window is the end-of-stream digest, and
    intermediate emissions are live progressive estimates.

    This is the streaming quantile shape at 100 TB: a windowed exact
    percentile needs every row in state; this needs ~delta centroids
    per open window regardless of rate.
    """
    import numpy as np

    from stream_spark.operators.sketches import _tdigest_compress, _tdigest_quantile

    bucket = (
        (F.unix_millis(F.col(ts_col).cast("timestamp")) / window_ms).cast("long")
        * window_ms
    ).alias("window_start_ms")
    keyed = stream.select(bucket, F.col(value_col).alias("_v"))

    def process(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            means, weights = (list(x) for x in state.get)
        else:
            means, weights = [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        v = batch["_v"].to_numpy(dtype=np.float64)
        m = np.concatenate([np.asarray(means), v])
        w = np.concatenate([np.asarray(weights), np.ones_like(v)])
        means, weights = _tdigest_compress(m, w, delta)
        state.update((means, weights))
        row = {"window_start_ms": [key[0]], "n_seen": [int(round(sum(weights)))]}
        for p in probabilities:
            row[f"p{int(p * 100)}"] = [_tdigest_quantile(means, weights, p)]
        yield pd.DataFrame(row)

    qcols = ", ".join(f"p{int(p * 100)} double" for p in probabilities)
    return keyed.groupBy("window_start_ms").applyInPandasWithState(
        process,
        f"window_start_ms long, n_seen long, {qcols}",
        "means array<double>, weights array<double>",
        "append",
        GroupStateTimeout.NoTimeout,
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark, enabled: bool = True) -> None:
    """Switch stateful streaming to the RocksDB state store (bundled
    with Spark 4). The default HDFS-backed store keeps every key in
    executor HEAP — fine for bounded windows, fatal for long-running
    streams whose state (dedup keys, session windows, join buffers)
    grows past memory. RocksDB spills state to local disk with an
    off-heap block cache, turning state size into a disk problem;
    changelog checkpointing keeps recovery incremental. Affects
    queries STARTED after the call."""
    if enabled:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )


def streaming_tumbling_count_tws(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    function: str,
    size: int,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """The count-tumbling window on the MODERN stateful API
    (transformWithStateInPandas, Spark 4): a StatefulProcessor with a
    typed ValueState replaces the raw (tuple-state, GroupState) fold.
    Same semantics as streaming_tumbling_count — parity-tested against
    it — but the new API brings schema'd state, independent per-state
    TTL, and RocksDB-only operation (call jobs.use_rocksdb_state
    first; the processor API requires the RocksDB provider).

    Environment gate (same policy as the kafka wrappers): the
    processor protocol speaks protobuf between the JVM and the Python
    state server; if the ``protobuf`` package is absent this raises
    ImportError up front instead of crashing the driver worker
    mid-query. The parity test skips accordingly.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pyspark.sql.streaming.proto); not available in this environment"
        ) from e
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    if function not in ("sum", "count", "min", "max", "avg"):
        raise ValueError(f"unsupported streaming count-window function: {function}")

    class CountWindowProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "win", "n long, acc double, window_id long"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n_seen, acc, window_id = self._state.get()
            else:
                n_seen, acc, window_id = 0, 0.0, 0
            out = []
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(list(order_cols), kind="mergesort")
            for v in batch[value_col]:
                v = float(v)
                if n_seen == 0:
                    acc = v if function != "count" else 1.0
                    n_seen = 1
                else:
                    if function == "sum" or function == "avg":
                        acc += v
                    elif function == "count":
                        acc += 1.0
                    elif function == "min":
                        acc = min(acc, v)
                    else:
                        acc = max(acc, v)
                    n_seen += 1
                if n_seen == size:
                    result = acc / size if function == "avg" else acc
                    out.append((key[0], window_id, float(result)))
                    n_seen, acc, window_id = 0, 0.0, window_id + 1
            self._state.update((n_seen, float(acc), window_id))
            yield pd.DataFrame(out, columns=[key_col, "window_id", "result"])

        def close(self) -> None:
            pass

    out_schema = f"{key_col} string, window_id long, result double"
    return stream.groupBy(key_col).transformWithStateInPandas(
        CountWindowProcessor(), out_schema, "append", "None"
    )
