"""Windowed aggregation operators.

Re-expresses the reference's four window kinds (activity/aggregate:
windows.go — TumblingWindow:56, SlidingWindow:226, TumblingTimeWindow:126,
SlidingTimeWindow:299) as Spark groupBy plans. Every window becomes a
*window-id assignment + shuffle-on-window-id aggregation*: no global
window frames, no single-partition stages, so the same plan holds on a
1000-executor cluster.

Semantics parity:

- tumbling (count, size N): emit one aggregate per N consecutive rows
  in arrival order; incomplete tail windows do not emit
  (windows.go:97 emits only when numSamples == Size).
- sliding (count, size N, resolution r): first emit at sample
  max(N, r) (ring full AND r samples since the last reset,
  windows.go:252-270), then every r samples; each emit aggregates the
  last N rows. For r > N this leaves gap rows covered by no emit,
  exactly like the reference's ring overwrite.
- timeTumbling (size ms): epoch-aligned buckets; every non-empty
  bucket emits (windows.go:184 nextBlock).
- timeSliding (size ms, resolution r ms): hopping windows with start
  at multiples of r covering [start, start+size) (windows.go:364).
- grouped variants (additionalSettings nameKey/valueKey →
  windows.go:429 MapData): the reference keeps ONE global sample
  counter and emits the whole key map every Size samples across ALL
  keys — that is `grouped_global_tumbling_count` (one (key, agg) row
  per key per global window). The ``group_by`` parameter on the other
  operators is a deliberate EXTENSION (per-key counters, each key's
  window closes after Size samples of that key) — more useful on a
  keyed distributed shuffle, but not reference emit cadence.

The count-window total order is ``order_cols`` (e.g. ts, event_id) —
the batch realization of arrival order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType

from stream_spark.functions.aggregates import EXACT_DECIMAL, agg_expr
from stream_spark.operators.rownum import with_global_row_number


def _fractional(df: DataFrame, col: str) -> bool:
    """Float inputs get exact-decimal sum/avg so results are
    independent of accumulation order (shuffle-order reproducibility)."""
    return isinstance(df.schema[col].dataType, (DoubleType, FloatType))


def _ordered(df: DataFrame, order_cols: Sequence[str], group_by: Sequence[str] | None) -> DataFrame:
    """Attach the arrival-order row number ``rn`` (1-based).

    Grouped windows number per key (scales by key partitioning);
    global windows use the two-pass partition-offset scheme.
    """
    if group_by:
        w = Window.partitionBy(*group_by).orderBy(*order_cols)
        return df.withColumn("rn", F.row_number().over(w).cast("long"))
    return with_global_row_number(df, list(order_cols), out="rn")


def tumbling_count_window(
    df: DataFrame,
    value_col: str,
    function: str,
    size: int,
    order_cols: Sequence[str] = ("ts", "event_id"),
    group_by: Sequence[str] | None = None,
) -> DataFrame:
    if size <= 0:
        raise ValueError("size must be positive")
    d = _ordered(df, order_cols, group_by)
    d = d.withColumn("window_id", ((F.col("rn") - 1) / F.lit(size)).cast("long"))
    keys = ([*group_by] if group_by else []) + ["window_id"]
    out = (
        d.groupBy(*keys)
        .agg(
            agg_expr(function, F.col(value_col), F.col("rn"), alias="result", exact_decimal=_fractional(df, value_col)),
            F.count("*").alias("n_samples"),
        )
        .filter(F.col("n_samples") == size)
        .drop("n_samples")
    )
    return out


def grouped_global_tumbling_count(
    df: DataFrame,
    key_col: str,
    value_col: str,
    function: str,
    size: int,
    order_cols: Sequence[str] = ("ts", "event_id"),
) -> DataFrame:
    """Reference grouped tumbling semantics (windows.go:77-84 +
    MapData): ONE global sample counter across all keys; every ``size``
    samples the whole key map is emitted — each key aggregated over its
    samples inside that global window, then reset. Relationally: bucket
    on the GLOBAL row number, aggregate per (window, key), and emit
    only windows that closed (global sample count == size).

    The window-completeness check is an analytic partitioned by
    window_id (keyed, never a global frame), so the plan stays
    shuffle-bounded at scale.
    """
    if size <= 0:
        raise ValueError("size must be positive")
    d = with_global_row_number(df, list(order_cols), out="rn")
    d = d.withColumn("window_id", ((F.col("rn") - 1) / F.lit(size)).cast("long"))
    per_key = d.groupBy("window_id", key_col).agg(
        agg_expr(function, F.col(value_col), F.col("rn"), alias="result", exact_decimal=_fractional(df, value_col)),
        F.count("*").alias("n_samples"),
    )
    total = F.sum("n_samples").over(Window.partitionBy("window_id"))
    return (
        per_key.withColumn("window_total", total)
        .filter(F.col("window_total") == size)
        .drop("n_samples", "window_total")
    )


def _sliding_count_blocked(
    d: DataFrame,
    value_col: str,
    function: str,
    size: int,
    resolution: int,
    group_by: Sequence[str] | None,
    exact_decimal: bool,
) -> DataFrame:
    """Two-level (block-combined) spelling of the sliding count window
    for decomposable aggregates when ``resolution`` divides ``size``.

    Window k = rows rn in [k·r+1, k·r+N]; with r | N it is exactly the
    m = N/r consecutive r-aligned blocks k..k+m-1 (block b = rows
    (b·r, b·r+r]), and every row of a block belongs to the same m
    windows. So aggregate rows into per-block PARTIALS first — the
    groupBy map-side-combines, so the exchange carries ~n/r partial
    rows instead of the explode path's N/r-per-row fan-out (guide §2.3:
    aggregate before you shuffle; ~50× fewer shuffled rows at
    N=50/r=10) — then fan each block partial to its m covering windows
    and combine per window.

    Result-identical to the row-explode spelling for every emitted row:
    decimal partial sums re-sum exactly (decimal addition is exact and
    associative); min/max/count are associative; the integral
    (non-exact-decimal) sum/avg path sums exact longs. Windows missing
    rows still drop via the n_samples == size gate (candidate window
    ids are the same clamped [max(0, b-m+1), b] ranges the row explode
    produces)."""
    m = size // resolution
    val = F.col(value_col)
    keys = [*group_by] if group_by else []
    blk = ((F.col("rn") - 1) / F.lit(resolution)).cast("long")
    part: list[Column] = [F.count("*").alias("_c")]
    if function in ("sum", "avg"):
        part.append(
            F.sum(val.cast(EXACT_DECIMAL) if exact_decimal else val).alias("_s")
        )
        if function == "avg":
            part.append(F.count(val).alias("_cv"))
    elif function == "min":
        part.append(F.min(val).alias("_s"))
    elif function == "max":
        part.append(F.max(val).alias("_s"))
    else:  # count
        part.append(F.count(val).alias("_s"))
    blocks = d.withColumn("_blk", blk).groupBy(*keys, "_blk").agg(*part)
    ks = F.sequence(
        F.greatest(F.lit(0).cast("long"), (F.col("_blk") - (m - 1)).cast("long")),
        F.col("_blk").cast("long"),
    )
    fanned = blocks.withColumn("window_id", F.explode(ks))
    if function == "sum":
        result = F.sum("_s").cast("double") if exact_decimal else F.sum("_s")
    elif function == "avg":
        num = F.sum("_s").cast("double") if exact_decimal else F.sum("_s")
        result = num / F.sum("_cv")
    elif function == "min":
        result = F.min("_s")
    elif function == "max":
        result = F.max("_s")
    else:  # count
        result = F.sum("_s")
    return (
        fanned.groupBy(*keys, "window_id")
        .agg(result.alias("result"), F.sum("_c").alias("n_samples"))
        .filter(F.col("n_samples") == size)
        .withColumn("emit_rn", (F.col("window_id") * resolution + size).cast("long"))
        .drop("n_samples")
    )


def sliding_count_window(
    df: DataFrame,
    value_col: str,
    function: str,
    size: int,
    resolution: int = 1,
    order_cols: Sequence[str] = ("ts", "event_id"),
    group_by: Sequence[str] | None = None,
) -> DataFrame:
    """Each emit k (k=0,1,...) aggregates rows rn in [k*r+1, k*r+N].

    A row fans out to the (bounded, N/r) emits that cover it via an
    exploded ``sequence`` — shuffle-on-emit-id, not a global frame, so
    the plan is scale-safe. Emits with fewer than N rows (stream tail)
    are dropped, matching the reference's canEmit warmup gate.

    When ``resolution`` divides ``size`` (and r > 1) the decomposable
    aggregates take the two-level block-combined plan
    (``_sliding_count_blocked``) — same emitted rows, ~50× fewer
    shuffled rows at the default N=50/r=10. ``accumulate`` (an ordered
    list, not a decomposable scalar) keeps the row explode.
    """
    if size <= 0 or resolution <= 0:
        raise ValueError("size and resolution must be positive")
    d = _ordered(df, order_cols, group_by)
    if (
        function != "accumulate"
        and resolution > 1
        and size >= resolution
        and size % resolution == 0
    ):
        return _sliding_count_blocked(
            d, value_col, function, size, resolution, group_by, _fractional(df, value_col)
        )
    # emit k happens at row offset + k*r and covers the last `size`
    # rows; offset = max(size, r) reproduces the reference's first-emit
    # position (ring full AND r samples since last reset)
    offset = max(size, resolution)
    k_min = F.greatest(
        F.lit(0).cast("long"), F.ceil((F.col("rn") - offset) / F.lit(resolution)).cast("long")
    )
    k_max = F.floor((F.col("rn") + size - 1 - offset) / F.lit(resolution)).cast("long")
    ks = F.when(k_max >= k_min, F.sequence(k_min, k_max)).otherwise(F.array().cast("array<long>"))
    d = d.withColumn("window_id", F.explode(ks))
    keys = ([*group_by] if group_by else []) + ["window_id"]
    return (
        d.groupBy(*keys)
        .agg(
            agg_expr(function, F.col(value_col), F.col("rn"), alias="result", exact_decimal=_fractional(df, value_col)),
            F.count("*").alias("n_samples"),
        )
        .filter(F.col("n_samples") == size)
        .withColumn("emit_rn", (F.col("window_id") * resolution + offset).cast("long"))
        .drop("n_samples")
    )


def _time_order(
    function: str, order_cols: Sequence[str] | None
) -> Column | None:
    """Within-window order for time-window accumulate.

    ``accumulate`` keeps every sample in arrival order
    (functions/accumulate.go); collect_list alone is shuffle-order
    nondeterministic, so accumulate REQUIRES order columns (ts +
    tie-break), realized as a sortable struct.
    """
    if function != "accumulate":
        return None
    if not order_cols:
        raise ValueError(
            "accumulate on time windows requires order_cols (e.g. ('ts', 'event_id')): "
            "collect_list order is shuffle-dependent otherwise"
        )
    return F.struct(*[F.col(c) for c in order_cols])


def tumbling_time_window(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    function: str,
    size_ms: int,
    group_by: Sequence[str] | None = None,
    order_cols: Sequence[str] = ("ts", "event_id"),
    total_count_modifier: int = 1,
) -> DataFrame:
    """``total_count_modifier`` mirrors the reference's last window
    setting (windows.go:18, consumed at :198): its time-tumbling AVG
    divides by ``maxSamples`` — the RUNNING MAX of per-window sample
    counts (windows.go:160-161, :192) — unless ``TotalCountModifier >
    0``, which resets the max at every emit ("local mode"), making each
    window divide by its own count. Only ``avg`` consumes the divisor
    (functions/average.go:73); the other functions ignore it.

    This operator's DEFAULT is the local mode (= the r1-r3 gated
    behavior and the sane keyed-aggregation semantics): per-window
    counts. Pass ``total_count_modifier=0`` to reproduce the
    reference's global-counter default, where every emitted average
    depends on the largest window seen so far. The running max runs
    over the per-window grid; ungrouped it uses the two-pass
    partition-offset prefix max (``rownum.with_global_cummax``) — no
    single-partition WindowExec at any scale (grouped it is an
    ordinary keyed ordered frame).
    """
    if size_ms <= 0:
        raise ValueError("size_ms must be positive")
    win = F.window(F.col(ts_col), f"{size_ms} milliseconds")
    keys = ([*group_by] if group_by else [])
    if function == "avg" and total_count_modifier == 0:
        from stream_spark.operators.rownum import with_global_cummax

        frac = _fractional(df, value_col)
        total = (
            F.sum(F.col(value_col).cast(EXACT_DECIMAL)) if frac else F.sum(F.col(value_col))
        )
        per_win = df.groupBy(win.alias("w"), *keys).agg(
            total.alias("_s"), F.count("*").alias("_n")
        )
        if keys:
            run_max = F.max("_n").over(
                Window.partitionBy(*keys)
                .orderBy(F.col("w.start"))
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            return per_win.select(
                *keys,
                F.col("w.start").alias("window_start"),
                (F.col("_s").cast("double") / run_max).alias("result"),
            )
        grid = per_win.select(F.col("w.start").alias("window_start"), "_s", "_n")
        grid = with_global_cummax(grid, "_n", ["window_start"], out="_runmax")
        return grid.select(
            "window_start",
            (F.col("_s").cast("double") / F.col("_runmax")).alias("result"),
        )
    order = _time_order(function, order_cols)
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(agg_expr(function, F.col(value_col), order, alias="result", exact_decimal=_fractional(df, value_col)))
        .select(*keys, F.col("w.start").alias("window_start"), "result")
    )


def sliding_time_window(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    function: str,
    size_ms: int,
    resolution_ms: int,
    group_by: Sequence[str] | None = None,
    order_cols: Sequence[str] = ("ts", "event_id"),
) -> DataFrame:
    """Hopping window: starts at multiples of resolution, span [s, s+size)."""
    if size_ms <= 0 or resolution_ms <= 0:
        raise ValueError("size_ms and resolution_ms must be positive")
    win = F.window(F.col(ts_col), f"{size_ms} milliseconds", f"{resolution_ms} milliseconds")
    keys = ([*group_by] if group_by else [])
    order = _time_order(function, order_cols)
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(agg_expr(function, F.col(value_col), order, alias="result", exact_decimal=_fractional(df, value_col)))
        .select(*keys, F.col("w.start").alias("window_start"), "result")
    )
