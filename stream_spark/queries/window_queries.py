"""Reference-parity window/filter queries (SURVEY §2 A-block).

Each query runs a stream_spark window operator over the ``events``
table in batch mode; the oracle replays identical semantics in DuckDB
SQL. Arrival order for count windows is (ts, event_id).

Conventions: window identity columns are BIGINT (window_id / emit_rn /
window_start_ms), aggregate results are exact-decimal DOUBLEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.operators.filters import apply_filter
from stream_spark.operators.windows import (
    sliding_count_window,
    sliding_time_window,
    tumbling_count_window,
    tumbling_time_window,
)
from stream_spark.queries.registry import register
from stream_spark.sources import load_table

_DSUM = "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)"
_DAVG = f"{_DSUM} / COUNT(value)"

_ORDERED = "SELECT *, row_number() OVER (ORDER BY ts, event_id) AS rn FROM events"


def _start_ms(df: DataFrame) -> DataFrame:
    """window_start (NTZ, UTC-aligned) → epoch ms bigint."""
    return df.withColumn(
        "window_start_ms", F.unix_millis(F.col("window_start").cast("timestamp"))
    ).drop("window_start")


# --------------------------------------------------------------------------
# A1: tumbling count windows

def _tumbling_count(function: str, size: int):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return tumbling_count_window(ev, "value", function, size)

    return q


def _tumbling_count_oracle(agg: str, size: int) -> str:
    return f"""
    WITH o AS ({_ORDERED})
    SELECT CAST(floor((rn - 1) / {size}) AS BIGINT) AS window_id, {agg} AS result
    FROM o GROUP BY window_id HAVING COUNT(*) = {size}
    """


for _fn, _agg in [
    ("sum", _DSUM),
    ("avg", _DAVG),
    ("min", "MIN(value)"),
    ("max", "MAX(value)"),
    ("count", "COUNT(value)"),
]:
    register(f"agg_tumbling_count_{_fn}", oracle=_tumbling_count_oracle(_agg, 100))(
        _tumbling_count(_fn, 100)
    )

# accumulate emits the window CONTENTS (functions/accumulate.go). The
# operator returns an ordered array; the oracle-checked query explodes
# it to (window_id, pos, value) rows so every column is a hashable
# scalar (driver's canonicalizer can't sort array cells) and the value
# doubles ride through both engines unmodified — no float formatting.


def _explode_result(df: DataFrame, *keys: str) -> DataFrame:
    return df.select(
        *keys, F.posexplode("result").alias("pos", "value")
    ).withColumn("pos", F.col("pos").cast("long"))


@register(
    "agg_tumbling_count_accumulate",
    oracle=f"""
    WITH o AS ({_ORDERED}),
    w AS (
        SELECT CAST(floor((rn - 1) / 10) AS BIGINT) AS window_id,
               CAST((rn - 1) % 10 AS BIGINT) AS pos, value,
               COUNT(*) OVER (PARTITION BY floor((rn - 1) / 10)) AS cnt
        FROM o
    )
    SELECT window_id, pos, value FROM w WHERE cnt = 10
    """,
)
def agg_tumbling_count_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return _explode_result(tumbling_count_window(ev, "value", "accumulate", 10), "window_id")


# --------------------------------------------------------------------------
# A2: sliding count windows (size N, resolution r)

def _sliding_count(function: str, size: int, res: int):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return sliding_count_window(ev, "value", function, size, res)

    return q


def _sliding_count_oracle(agg: str, size: int, res: int) -> str:
    return f"""
    WITH o AS ({_ORDERED}),
    fanout AS (
        SELECT value, unnest(generate_series(
            GREATEST(0, CAST(ceil((rn - {size}) / {res}.0) AS BIGINT)),
            CAST(floor((rn - 1) / {res}.0) AS BIGINT))) AS window_id
        FROM o
    )
    SELECT window_id, {agg} AS result,
           CAST(window_id * {res} + {size} AS BIGINT) AS emit_rn
    FROM fanout GROUP BY window_id HAVING COUNT(*) = {size}
    """


for _fn, _agg in [
    ("sum", _DSUM),
    ("avg", _DAVG),
    ("max", "MAX(value)"),
    ("min", "MIN(value)"),
    # count closes the last cell of the reference's function×window
    # dispatch (aggregators.go:50-67 NewSlidingWindow supports count)
    ("count", "CAST(COUNT(*) AS BIGINT)"),
]:
    register(f"agg_sliding_count_{_fn}", oracle=_sliding_count_oracle(_agg, 50, 10))(
        _sliding_count(_fn, 50, 10)
    )


# --------------------------------------------------------------------------
# A3: tumbling time windows

_HOUR = 3_600_000


def _tumbling_time(function: str, size_ms: int, group_by=None):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return _start_ms(tumbling_time_window(ev, "ts", "value", function, size_ms, group_by=group_by))

    return q


def _tumbling_time_oracle(agg: str, size_ms: int, keys: str = "") -> str:
    key_sel = f"{keys}, " if keys else ""
    return f"""
    SELECT {key_sel}{agg} AS result,
           CAST((epoch_ms(ts) // {size_ms}) * {size_ms} AS BIGINT) AS window_start_ms
    FROM events GROUP BY {key_sel}window_start_ms
    """


for _fn, _agg in [
    ("sum", _DSUM),
    ("avg", _DAVG),
    ("min", "MIN(value)"),
    ("max", "MAX(value)"),
    ("count", "COUNT(value)"),
]:
    register(f"agg_time_tumbling_{_fn}", oracle=_tumbling_time_oracle(_agg, _HOUR))(
        _tumbling_time(_fn, _HOUR)
    )


@register(
    "agg_time_tumbling_avg_global_counter",
    oracle=f"""
    WITH w AS (
        SELECT CAST((epoch_ms(ts) // {_HOUR}) * {_HOUR} AS BIGINT) AS window_start_ms,
               {_DSUM} AS s, COUNT(*) AS n
        FROM events GROUP BY window_start_ms
    )
    SELECT window_start_ms,
           s / MAX(n) OVER (ORDER BY window_start_ms
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS result
    FROM w
    """,
)
def agg_time_tumbling_avg_global_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's DEFAULT time-tumbling avg (TotalCountModifier
    unset, windows.go:18/:160/:192-201): each emitted average divides
    by the running MAX of per-window sample counts, not the window's
    own count. Closes the last un-ported window setting; the repo's
    default operator mode (= ``agg_time_tumbling_avg``) is the
    reference's TotalCountModifier>0 "local" reset behavior."""
    ev = load_table(spark, sf_dir, "events")
    return _start_ms(
        tumbling_time_window(ev, "ts", "value", "avg", _HOUR, total_count_modifier=0)
    )


# --------------------------------------------------------------------------
# A4: sliding (hopping) time windows — size 1h, hop 15min

_HOP = 900_000


def _sliding_time(function: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return _start_ms(sliding_time_window(ev, "ts", "value", function, _HOUR, _HOP))

    return q


def _sliding_time_oracle(agg: str) -> str:
    return f"""
    WITH fanout AS (
        SELECT value, unnest(generate_series(
            CAST(floor((epoch_ms(ts) - {_HOUR}) / {_HOP}.0) AS BIGINT) + 1,
            CAST(floor(epoch_ms(ts) / {_HOP}.0) AS BIGINT))) AS k
        FROM events
    )
    SELECT CAST(k * {_HOP} AS BIGINT) AS window_start_ms, {agg} AS result
    FROM fanout GROUP BY k
    """


for _fn, _agg in [
    ("avg", _DAVG),
    ("sum", _DSUM),
    ("min", "MIN(value)"),
    ("max", "MAX(value)"),
    ("count", "COUNT(value)"),
]:
    # min/max/count close the function × sliding-time row of the
    # reference dispatch matrix (aggregators.go:31-90 registers every
    # function for every window kind; behavior: windows_test.go:155).
    register(f"agg_time_sliding_{_fn}", oracle=_sliding_time_oracle(_agg))(
        _sliding_time(_fn)
    )


# --------------------------------------------------------------------------
# A5: grouped windows (reference nameKey/valueKey → per-key windows)


@register(
    "agg_grouped_tumbling_sum",
    oracle=f"""
    WITH o AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
        FROM events)
    SELECT event_type, CAST(floor((rn - 1) / 50) AS BIGINT) AS window_id, {_DSUM} AS result
    FROM o GROUP BY event_type, window_id HAVING COUNT(*) = 50
    """,
)
def agg_grouped_tumbling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key counter grouped windows (deliberate extension — see
    operators/windows.py docstring; reference cadence is the
    global-counter variant below)."""
    ev = load_table(spark, sf_dir, "events")
    return tumbling_count_window(ev, "value", "sum", 50, group_by=["event_type"])


@register(
    "agg_grouped_global_tumbling_sum",
    oracle=f"""
    WITH o AS ({_ORDERED}),
    w AS (
        SELECT event_type, value, CAST(floor((rn - 1) / 100) AS BIGINT) AS window_id,
               COUNT(*) OVER (PARTITION BY floor((rn - 1) / 100)) AS cnt
        FROM o)
    SELECT window_id, event_type, {_DSUM} AS result
    FROM w WHERE cnt = 100 GROUP BY window_id, event_type
    """,
)
def agg_grouped_global_tumbling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference grouped-tumbling emit cadence (windows.go:77-84): one
    GLOBAL sample counter; the whole key map emits every 100 samples."""
    from stream_spark.operators.windows import grouped_global_tumbling_count

    ev = load_table(spark, sf_dir, "events")
    return grouped_global_tumbling_count(ev, "event_type", "value", "sum", 100)


register(
    "agg_grouped_time_sum",
    oracle=_tumbling_time_oracle(_DSUM, 6 * _HOUR, keys="event_type"),
)(_tumbling_time("sum", 6 * _HOUR, group_by=["event_type"]))


# --------------------------------------------------------------------------
# A6: filters


@register(
    "filter_nonzero",
    oracle="""
    SELECT event_id, value FROM (
        SELECT event_id, value, floor(value) AS value_floor FROM events
    ) WHERE value_floor <> 0
    """,
)
def filter_nonzero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference filters.go non-zero semantics, applied to the integer
    part of the reading so zero actually occurs in the data."""
    ev = load_table(spark, sf_dir, "events").withColumn("value_floor", F.floor("value"))
    return apply_filter(ev, "non-zero", "value_floor").select("event_id", "value")


@register(
    "filter_threshold",
    oracle="SELECT event_id, user_id, value FROM events WHERE value >= 250.0",
)
def filter_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return apply_filter(ev, "threshold", "value", value=250.0, op=">=").select(
        "event_id", "user_id", "value"
    )


@register(
    "filter_regex",
    oracle="SELECT event_id, event_type FROM events WHERE regexp_matches(event_type, '^(click|view)$')",
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return apply_filter(ev, "regex", "event_type", pattern="^(click|view)$").select(
        "event_id", "event_type"
    )


# --------------------------------------------------------------------------
# A-extra: element-wise array aggregation (reference functions/sum.go:44
# sumIntArray / average.go:40 — agg over []float64 samples per index)


@register(
    "agg_array_elementwise_avg",
    oracle="""
    SELECT label, CAST(i - 1 AS INT) AS pos,
           CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS result
    FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
    GROUP BY label, pos
    """,
)
def agg_array_elementwise_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_spark.operators.arrays import elementwise_agg

    emb = load_table(spark, sf_dir, "embeddings")
    return elementwise_agg(emb, "embedding", "avg", group_by=["label"])


# --------------------------------------------------------------------------
# A-extra: JSON field extraction (flogo input mappings pluck fields from
# event payloads; props is a JSON string column)


@register(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# A2-extra: sliding accumulate + grouped sliding count windows

@register(
    "agg_sliding_count_accumulate",
    oracle=f"""
    WITH o AS ({_ORDERED}),
    fanout AS (
        SELECT value, rn, unnest(generate_series(
            GREATEST(0, CAST(ceil((rn - 20) / 5.0) AS BIGINT)),
            CAST(floor((rn - 1) / 5.0) AS BIGINT))) AS window_id
        FROM o
    ),
    w AS (
        SELECT window_id, CAST(rn - window_id * 5 - 1 AS BIGINT) AS pos, value,
               COUNT(*) OVER (PARTITION BY window_id) AS cnt
        FROM fanout
    )
    SELECT window_id, pos, value, CAST(window_id * 5 + 20 AS BIGINT) AS emit_rn
    FROM w WHERE cnt = 20
    """,
)
def agg_sliding_count_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return _explode_result(
        sliding_count_window(ev, "value", "accumulate", 20, 5), "window_id", "emit_rn"
    )


@register(
    "agg_grouped_sliding_sum",
    oracle=f"""
    WITH o AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
        FROM events),
    fanout AS (
        SELECT event_type, value, unnest(generate_series(
            GREATEST(0, CAST(ceil((rn - 40) / 10.0) AS BIGINT)),
            CAST(floor((rn - 1) / 10.0) AS BIGINT))) AS window_id
        FROM o
    )
    SELECT event_type, window_id, {_DSUM} AS result,
           CAST(window_id * 10 + 40 AS BIGINT) AS emit_rn
    FROM fanout GROUP BY event_type, window_id HAVING COUNT(*) = 40
    """,
)
def agg_grouped_sliding_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sliding_count_window(ev, "value", "sum", 40, 10, group_by=["event_type"])


# --------------------------------------------------------------------------
# A-extra: hypertable-style rollup cascade — daily aggregates computed
# by MERGING hourly partials (never rescanning raw events)

_DAY = 24 * _HOUR


@register(
    "agg_rollup_cascade_daily",
    oracle=f"""
    SELECT CAST((epoch_ms(ts) // {_DAY}) * {_DAY} AS BIGINT) AS bucket_start_ms,
           {_DSUM} AS sum_value,
           {_DAVG} AS avg_value,
           MIN(value) AS p_min, MAX(value) AS p_max, COUNT(value) AS p_count
    FROM events GROUP BY bucket_start_ms
    """,
)
def agg_rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour partials → day merge → finalize; result provably equals a
    direct daily aggregation (the oracle computes it directly)."""
    from stream_spark.operators.rollup_cascade import finalize, merge_up, partials

    ev = load_table(spark, sf_dir, "events")
    hourly = partials(ev, "ts", "value", _HOUR)
    daily = merge_up(hourly, _DAY)
    return finalize(daily).select(
        F.unix_millis(F.col("bucket_start").cast("timestamp")).alias("bucket_start_ms"),
        "sum_value",
        "avg_value",
        "p_min",
        "p_max",
        "p_count",
    )


# --------------------------------------------------------------------------
# A-extra: DENSE tumbling time windows — the reference's timer emits a
# (zero) result for every tick even with no samples
# (windows.go:177 NextBlock runs unconditionally); groupBy semantics
# only emit non-empty buckets, so this variant gap-fills the bucket
# range and zero-fills sum/count.


@register(
    "agg_time_tumbling_dense_sum",
    oracle=f"""
    WITH bounds AS (
        SELECT (epoch_ms(MIN(ts)) // {_HOUR}) AS kmin, (epoch_ms(MAX(ts)) // {_HOUR}) AS kmax
        FROM events
    ),
    buckets AS (
        SELECT CAST(unnest(generate_series(kmin, kmax)) * {_HOUR} AS BIGINT) AS window_start_ms
        FROM bounds
    ),
    agg AS (
        SELECT CAST((epoch_ms(ts) // {_HOUR}) * {_HOUR} AS BIGINT) AS w, {_DSUM} AS s, COUNT(*) AS c
        FROM events GROUP BY w
    )
    SELECT b.window_start_ms,
           COALESCE(a.s, 0.0) AS result,
           COALESCE(a.c, 0) AS n_samples
    FROM buckets b LEFT JOIN agg a ON b.window_start_ms = a.w
    """,
)
def agg_time_tumbling_dense_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(F.window("ts", f"{_HOUR} milliseconds").alias("w"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("s"),
            F.count("*").alias("c"),
        )
        .select(F.unix_millis(F.col("w.start").cast("timestamp")).alias("w"), "s", "c")
    )
    bounds = ev.agg(
        (F.unix_millis(F.min("ts").cast("timestamp")) / _HOUR).cast("long").alias("kmin"),
        (F.unix_millis(F.max("ts").cast("timestamp")) / _HOUR).cast("long").alias("kmax"),
    )
    buckets = bounds.select(
        F.explode(F.sequence(F.col("kmin"), F.col("kmax"))).alias("k")
    ).select((F.col("k") * _HOUR).cast("bigint").alias("window_start_ms"))
    return (
        buckets.join(agg, buckets.window_start_ms == agg.w, "left")
        .select(
            "window_start_ms",
            F.coalesce(F.col("s"), F.lit(0.0)).alias("result"),
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("n_samples"),
        )
    )


# --------------------------------------------------------------------------
# A-extra: DENSE sliding (hopping) time windows — the reference's
# ExternalTimer (windows.go:342) ticks every resolution interval and
# NextBlock emits unconditionally, so hopping windows with no samples
# still produce a (zero) result. Mirrors agg_time_tumbling_dense_sum:
# tick grid = every hop index from the first window containing the
# earliest event through the last window containing the latest event.


@register(
    "agg_time_sliding_dense_sum",
    oracle=f"""
    WITH bounds AS (
        SELECT CAST(floor((epoch_ms(MIN(ts)) - {_HOUR}) / {_HOP}.0) AS BIGINT) + 1 AS kmin,
               epoch_ms(MAX(ts)) // {_HOP} AS kmax
        FROM events
    ),
    ticks AS (
        SELECT CAST(unnest(generate_series(kmin, kmax)) * {_HOP} AS BIGINT) AS window_start_ms
        FROM bounds
    ),
    fanout AS (
        SELECT value, unnest(generate_series(
            CAST(floor((epoch_ms(ts) - {_HOUR}) / {_HOP}.0) AS BIGINT) + 1,
            epoch_ms(ts) // {_HOP})) AS k
        FROM events
    ),
    agg AS (
        SELECT CAST(k * {_HOP} AS BIGINT) AS w, {_DSUM} AS s, COUNT(*) AS c
        FROM fanout GROUP BY k
    )
    SELECT t.window_start_ms,
           COALESCE(a.s, 0.0) AS result,
           COALESCE(a.c, 0) AS n_samples
    FROM ticks t LEFT JOIN agg a ON t.window_start_ms = a.w
    """,
)
def agg_time_sliding_dense_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping 1h/15min windows on the timer-tick grid; empty hops emit
    (0.0, 0 samples). The tick grid is bounded metadata (two epoch-ms
    scalars → sequence); the heavy side stays the keyed F.window agg."""
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(
            F.window("ts", f"{_HOUR} milliseconds", f"{_HOP} milliseconds").alias("w")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("s"),
            F.count("*").alias("c"),
        )
        .select(F.unix_millis(F.col("w.start").cast("timestamp")).alias("w"), "s", "c")
    )
    bounds = ev.agg(
        (F.floor((F.unix_millis(F.min("ts").cast("timestamp")) - _HOUR) / _HOP) + 1)
        .cast("long")
        .alias("kmin"),
        F.floor(F.unix_millis(F.max("ts").cast("timestamp")) / _HOP).cast("long").alias("kmax"),
    )
    ticks = bounds.select(F.explode(F.sequence("kmin", "kmax")).alias("k")).select(
        (F.col("k") * _HOP).cast("bigint").alias("window_start_ms")
    )
    return (
        ticks.join(agg, ticks.window_start_ms == agg.w, "left")
        .select(
            "window_start_ms",
            F.coalesce(F.col("s"), F.lit(0.0)).alias("result"),
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("n_samples"),
        )
    )


# --------------------------------------------------------------------------
# A4-extra: grouped hopping window + ordered accumulate on time windows
# (reference time windows support every function incl. accumulate;
# order within a window = (ts, event_id))


@register(
    "agg_grouped_time_sliding_sum",
    oracle=f"""
    WITH fanout AS (
        SELECT event_type, value, unnest(generate_series(
            CAST(floor((epoch_ms(ts) - {_HOUR}) / {_HOP}.0) AS BIGINT) + 1,
            CAST(floor(epoch_ms(ts) / {_HOP}.0) AS BIGINT))) AS k
        FROM events
    )
    SELECT event_type, CAST(k * {_HOP} AS BIGINT) AS window_start_ms, {_DSUM} AS result
    FROM fanout GROUP BY event_type, k
    """,
)
def agg_grouped_time_sliding_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return _start_ms(
        sliding_time_window(ev, "ts", "value", "sum", _HOUR, _HOP, group_by=["event_type"])
    )


@register(
    "agg_time_tumbling_accumulate",
    oracle="""
    WITH o AS (
        SELECT CAST((epoch_ms(ts) // 21600000) * 21600000 AS BIGINT) AS window_start_ms,
               value, ts, event_id
        FROM events
    )
    SELECT window_start_ms,
           CAST(row_number() OVER (PARTITION BY window_start_ms ORDER BY ts, event_id) - 1 AS BIGINT) AS pos,
           value
    FROM o
    """,
)
def agg_time_tumbling_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window accumulate via the operator's ordered path
    (order_cols=(ts,event_id) → sorted struct collect), exploded to
    (window_start_ms, pos, value) rows for the oracle gate."""
    ev = load_table(spark, sf_dir, "events")
    out = _start_ms(tumbling_time_window(ev, "ts", "value", "accumulate", 21600000))
    return _explode_result(out, "window_start_ms")
