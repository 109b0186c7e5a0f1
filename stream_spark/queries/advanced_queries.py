"""Advanced relational shapes: distinct aggregation, exact quantiles,
pivot, rollup, and correlation via exact decimal moments."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_spark.queries.registry import register
from stream_spark.sources import load_table


@register(
    "events_distinct_users",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct (expand+two-phase agg in Spark). The approximate
    HLL path (approx_count_distinct) is the 100 TB default — same plan
    shape, sketch mergeable, no expand — exposed via the operator's
    ``approximate`` flag but oracled with the exact variant."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events")
    )


@register(
    "orders_price_median",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def orders_price_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``). At 100 TB use approx_percentile
    (t-digest, mergeable) — same call site, documented trade-off."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
    )


@register(
    "user_event_type_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'view') AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
)
def user_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an EXPLICIT value list — never let Spark run the
    distinct-value discovery job at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )
    return out


@register(
    "orders_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total"),
    )


_CORR_SUMS = """
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(26,4))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(26,4))) AS DOUBLE) AS syy,
        CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(26,4))) AS DOUBLE) AS sxy
"""


@register(
    "lineitem_qty_price_corr",
    oracle=f"""
    WITH s AS (SELECT {_CORR_SUMS} FROM lineitem)
    SELECT n, (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
    FROM s
    """,
)
def lineitem_qty_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation assembled from exact decimal moments —
    order-insensitive and engine-exact, unlike streaming corr
    accumulators whose float ops depend on partition order."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.agg(*[F.expr(e.strip()) for e in _CORR_SUMS.strip().split(",\n")])
    return s.select(
        "n",
        F.expr(
            "(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"
        ).alias("corr_qty_price"),
    )


@register(
    "events_asof_join_purchase_click",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_ms(p.ts) AS purchase_ts_ms,
           c.event_id AS click_id_right,
           epoch_ms(c.ts) AS click_ts_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's latest preceding click
    (stream_spark.operators.asof — union-and-carry, one key shuffle)."""
    from stream_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    # the matched click's ts rides through right_cols — no second join
    # (clicks is a fact table; re-joining it, let alone broadcasting it,
    # would be O(corpus) at scale)
    joined = asof_join(purchases, clicks, "user_id", "ts", "ts", ["ts", "event_id"], suffix="_right")
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("purchase_ts_ms"),
        F.col("event_id_right").alias("click_id_right"),
        F.unix_millis(F.col("ts_right").cast("timestamp")).alias("click_ts_ms"),
    )


@register(
    "documents_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM (SELECT doc_id, lang,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS bucket
          FROM documents)
    WHERE (lang = 'en' AND bucket < 5000)
       OR (lang = 'de' AND bucket < 9000)
       OR (lang = 'zh' AND bucket < 9000)
    """,
)
def documents_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-language sampling for dataset mixing — the
    decision depends only on the doc_id hash, never on partitioning."""
    from stream_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "doc_id", "lang", {"en": 0.5, "de": 0.9, "zh": 0.9}).select(
        "doc_id", "lang"
    )


_DAY = 86_400_000


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH w AS (
        SELECT event_id, event_type, value,
               CAST((epoch_ms(ts) // {_DAY}) * {_DAY} AS BIGINT) AS window_start_ms
        FROM events
    ), stats AS (
        SELECT event_type, window_start_ms,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
               CAST(SUM(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE) AS sq
        FROM w GROUP BY event_type, window_start_ms
    )
    SELECT w.event_id, w.event_type, w.window_start_ms, w.value,
           (w.value - s / n) / sqrt(sq / n - (s / n) * (s / n)) AS z
    FROM w JOIN stats USING (event_type, window_start_ms)
    WHERE n >= 20 AND sq / n - (s / n) * (s / n) > 0
      AND abs((w.value - s / n) / sqrt(sq / n - (s / n) * (s / n))) > 2.5
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed z-score anomaly detection: per (event_type, day)
    moments from exact decimal sums (order-free), anomaly = |z| > 2.5.
    The stats join shuffles both sides on the same (key, window) —
    co-partitioned, no broadcast of anything row-scaled."""
    ev = load_table(spark, sf_dir, "events")
    w = ev.select(
        "event_id",
        "event_type",
        "value",
        ((F.unix_millis(F.col("ts").cast("timestamp")) / _DAY).cast("long") * _DAY).alias(
            "window_start_ms"
        ),
    )
    stats = w.groupBy("event_type", "window_start_ms").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,8)")).cast("double").alias("sq"),
    )
    mean = F.col("s") / F.col("n")
    var = F.col("sq") / F.col("n") - mean * mean
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        w.join(stats, ["event_type", "window_start_ms"])
        .filter((F.col("n") >= 20) & (var > 0) & (F.abs(z) > 2.5))
        .select("event_id", "event_type", "window_start_ms", "value", z.alias("z"))
    )


@register(
    "orders_retention_cohort",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort
        FROM orders GROUP BY o_custkey
    )
    SELECT CAST(epoch_ms(f.cohort) AS BIGINT) AS cohort_month_ms,
           CAST(datediff('month', f.cohort, date_trunc('month', o.o_orderdate)) AS BIGINT)
               AS months_since,
           COUNT(DISTINCT o.o_custkey) AS n_customers
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY cohort_month_ms, months_since
    """,
)
def orders_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers bucketed by first-order month,
    counted per months-since-cohort. Two keyed shuffles on o_custkey
    (first-order agg + join back) — the join is co-partitioned, the
    final agg is on the small (cohort, month) grid."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate").cast("timestamp"))
    firsts = orders.groupBy("o_custkey").agg(F.min(month).alias("cohort"))
    return (
        orders.join(firsts, "o_custkey")
        .select(
            "o_custkey",
            F.unix_millis(F.col("cohort")).alias("cohort_month_ms"),
            F.months_between(month, F.col("cohort")).cast("long").alias("months_since"),
        )
        .groupBy("cohort_month_ms", "months_since")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


@register(
    "events_ohlc_hourly",
    oracle="""
    WITH o AS (
        SELECT event_type, value,
               CAST((epoch_ms(ts) // 3600000) * 3600000 AS BIGINT) AS window_start_ms,
               row_number() OVER (PARTITION BY event_type, epoch_ms(ts) // 3600000
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type, epoch_ms(ts) // 3600000
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT event_type, window_start_ms,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close
    FROM o GROUP BY event_type, window_start_ms
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling per (event_type, hour): open/close via
    min_by/max_by on the (ts, event_id) arrival order — one keyed agg,
    no window function, no second pass."""
    ev = load_table(spark, sf_dir, "events")
    order = F.struct(F.unix_millis(F.col("ts").cast("timestamp")), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type",
            ((F.unix_millis(F.col("ts").cast("timestamp")) / 3600000).cast("long") * 3600000).alias(
                "window_start_ms"
            ),
        )
        .agg(
            F.min_by("value", order).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order).alias("close"),
        )
    )


@register(
    "events_range_join_click_purchase",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           epoch_ms(p.ts) - epoch_ms(c.ts) AS delta_ms
    FROM events c JOIN events p ON c.user_id = p.user_id
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      AND abs(epoch_ms(c.ts) - epoch_ms(p.ts)) <= 300000
    """,
)
def events_range_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (|Δt| ≤ 5 min, same user) as a bucketized equi-join
    — one shuffle on (user, time-bucket), no BroadcastNestedLoopJoin,
    ≤3× candidate fan-out (operators/rangejoin.py)."""
    from stream_spark.operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), ms.alias("c_ms")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), ms.alias("p_ms")
    )
    out = range_join(clicks, purchases, ["user_id"], "c_ms", "p_ms", 300_000)
    return out.select(
        "user_id", "click_id", "purchase_id", (F.col("p_ms") - F.col("c_ms")).alias("delta_ms")
    )


@register(
    "orders_daily_moving_avg",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) AS BIGINT) AS day_ms,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        FROM orders GROUP BY day_ms
    )
    SELECT day_ms,
           CAST(total AS DOUBLE) AS day_total,
           CAST(CAST(SUM(total) OVER w AS DOUBLE) / COUNT(*) OVER w AS DOUBLE) AS trailing_avg_7d
    FROM daily
    WINDOW w AS (ORDER BY day_ms ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def orders_daily_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing revenue average. The row-scale work is ONE keyed
    daily aggregation; the trailing ROWS frame then runs over the
    bounded daily grid WITHOUT a global WindowExec (r5): the two-pass
    partition-offset primitive assigns each day its global row number,
    every day fans out to the 7 row numbers whose frame contains it,
    and one keyed aggregate per target row rebuilds SUM/COUNT OVER
    (ROWS 6 PRECEDING) exactly — zero single-partition exchanges, so
    the audit's former ≤1 allowance is now unused. The trailing sum
    accumulates in DECIMAL so evaluation order can't perturb the
    double result."""
    from stream_spark.operators.rownum import with_global_row_number

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.unix_millis(F.date_trunc("day", F.col("o_orderdate").cast("timestamp"))).alias("day_ms")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"))
    d = with_global_row_number(daily, ["day_ms"], out="rn")
    contrib = d.select(
        F.col("total").alias("c_total"),
        F.explode(F.sequence(F.col("rn"), F.col("rn") + 6)).alias("t_rn"),
    )
    win = contrib.groupBy("t_rn").agg(
        F.sum("c_total").alias("w_total"), F.count("*").alias("w_n")
    )
    return d.join(win, d.rn == win.t_rn).select(
        "day_ms",
        F.col("total").cast("double").alias("day_total"),
        (F.col("w_total").cast("double") / F.col("w_n")).cast("double").alias(
            "trailing_avg_7d"
        ),
    )


@register(
    "events_value_histogram",
    oracle="""
    WITH b AS (
        SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin, COUNT(*) AS n
        FROM events GROUP BY bin
    )
    SELECT bin, bin * 25.0 AS bin_lo, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / (SELECT SUM(n) FROM b) AS frac
    FROM b
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: one keyed agg on the bin id; the grand
    total for the fraction is a 1-row aggregate over the BINS (bounded
    metadata scale), broadcast-cross-joined back — one plan, not a
    second pass over the rows and no driver round-trip."""
    ev = load_table(spark, sf_dir, "events")
    bins = ev.groupBy(F.floor(F.col("value") / 25.0).cast("long").alias("bin")).agg(
        F.count("*").alias("n")
    )
    total = bins.agg(F.sum("n").alias("t"))
    return (
        # broadcast-ok: 1-row scalar aggregate (scalar-subquery realization)
        bins.crossJoin(F.broadcast(total))
        .select(
            "bin",
            (F.col("bin") * 25.0).alias("bin_lo"),
            F.col("n").cast("long").alias("n"),
            (F.col("n").cast("double") / F.col("t").cast("double")).alias("frac"),
        )
    )


@register(
    "lineitem_part_copurchase",
    oracle="""
    WITH pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, COUNT(*) AS n_orders
    FROM pairs GROUP BY part_a, part_b HAVING COUNT(*) >= 3
    """,
)
def lineitem_part_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: parts bought together ≥3 times.
    The self-join is an EQUI-join on l_orderkey — pair volume is
    Σ C(order_size, 2), bounded by the per-order line cap (7 in
    TPC-H), never corpus²."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )


@register(
    "events_dau_mau_stickiness",
    oracle="""
    WITH d AS (
        SELECT CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS day_ms,
               CAST(epoch_ms(date_trunc('month', ts)) AS BIGINT) AS month_ms,
               user_id
        FROM events
    ),
    dau AS (SELECT month_ms, day_ms, COUNT(DISTINCT user_id) AS dau
            FROM d GROUP BY month_ms, day_ms),
    mau AS (SELECT month_ms, COUNT(DISTINCT user_id) AS mau FROM d GROUP BY month_ms)
    SELECT dau.month_ms, dau.day_ms, dau.dau, mau.mau,
           CAST(dau.dau AS DOUBLE) / mau.mau AS stickiness
    FROM dau JOIN mau USING (month_ms)
    """,
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU engagement: two exact-distinct aggs on (month, day) and
    (month) keys joined on the bounded month grid — the per-month side
    is metadata-sized, so the join never shuffles the event rows
    twice."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    d = ev.select(
        F.unix_millis(F.date_trunc("day", ts)).alias("day_ms"),
        F.unix_millis(F.date_trunc("month", ts)).alias("month_ms"),
        "user_id",
    )
    dau = d.groupBy("month_ms", "day_ms").agg(F.countDistinct("user_id").alias("dau"))
    mau = d.groupBy("month_ms").agg(F.countDistinct("user_id").alias("mau"))
    # broadcast-ok: one row per month (bounded calendar grid)
    return dau.join(F.broadcast(mau), "month_ms").select(
        "month_ms", "day_ms", "dau", "mau",
        (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
    )


_HOUR = 3_600_000


@register(
    "events_scd2_user_state",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(epoch_ms(ts) AS BIGINT) AS valid_from_ms,
           CAST(epoch_ms(lead(ts) OVER w) AS BIGINT) AS valid_to_ms,
           CAST(row_number() OVER w AS BIGINT) AS version,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def events_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) intervals: each event becomes
    a validity window [ts, next event ts) per user, with version
    numbers and a current flag — the temporal-table shape warehouses
    build from change streams. One keyed window (partition by user,
    ordered by ts with the event_id tie-break), no global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("valid_from_ms"),
        F.unix_millis(F.lead("ts").over(w).cast("timestamp")).alias("valid_to_ms"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "events_gapfill_interpolate",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, CAST((epoch_ms(ts) // {_HOUR}) * {_HOUR} AS BIGINT) AS h,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
        FROM events GROUP BY event_type, h
    ), bounds AS (
        SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY event_type
    ), grid AS (
        SELECT event_type, unnest(generate_series(h0, h1, {_HOUR})) AS h FROM bounds
    ), j AS (
        SELECT g.event_type, g.h, hr.v
        FROM grid g LEFT JOIN hourly hr ON g.event_type = hr.event_type AND g.h = hr.h
    ), f AS (
        SELECT event_type, h, v,
               last_value(v IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER wp AS ph,
               first_value(v IGNORE NULLS) OVER wn AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER wn AS nh
        FROM j
        WINDOW wp AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h AS hour_ms,
           CASE WHEN v IS NOT NULL THEN v
                ELSE pv + (nv - pv) * (CAST(h - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
           END AS value_filled,
           (v IS NULL) AS interpolated
    FROM f
    """,
)
def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with linear interpolation: dense hourly
    grid per event type (bounded by the key's own time range), missing
    hours get prev + (next-prev)·(elapsed fraction). The row-scale
    work is one keyed hourly aggregation; the grid join and the two
    IGNORE-NULLS carry windows run per key over the bounded grid.
    Exact-decimal hourly sums surface as identical doubles in both
    engines, and the interpolation is plain IEEE arithmetic on them."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.expr(f"(unix_millis(CAST(ts AS TIMESTAMP)) DIV {_HOUR}) * {_HOUR}").alias("h"),
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("h0", "h1", F.lit(_HOUR))).alias("h")
    )
    j = grid.join(hourly, ["event_type", "h"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_h = F.when(F.col("v").isNotNull(), F.col("h"))
    f = (
        j.withColumn("pv", F.last("v", ignorenulls=True).over(wp))
        .withColumn("ph", F.last(known_h, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wn))
        .withColumn("nh", F.first(known_h, ignorenulls=True).over(wn))
    )
    filled = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * ((F.col("h") - F.col("ph")).cast("double") / (F.col("nh") - F.col("ph")).cast("double"))
    )
    return f.select(
        "event_type",
        F.col("h").alias("hour_ms"),
        filled.alias("value_filled"),
        F.col("v").isNull().alias("interpolated"),
    )


@register(
    "documents_weighted_sample",
    oracle="""
    SELECT doc_id, n_chars,
           LEAST(1.0, n_chars / 400.0) AS keep_prob
    FROM documents
    WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000) / 10000.0
          < LEAST(1.0, n_chars / 400.0)
    """,
)
def documents_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted reproducible sampling: keep probability scales
    with document length (min(1, n_chars/400)), decided by the stable
    doc_id hash — importance sampling that survives any partitioning,
    map-only."""
    from stream_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    weight = F.col("n_chars") / F.lit(400.0)
    return weighted_sample(docs, "doc_id", weight).select(
        "doc_id",
        "n_chars",
        F.least(F.lit(1.0), weight).alias("keep_prob"),
    )


_B = "CAST(('0x'||substr(md5(CAST({k} AS VARCHAR)),{off},4)) AS INT)"


@register(
    "orders_bloom_semi_join",
    oracle=f"""
    WITH bkeys AS (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ), bits AS (
        SELECT DISTINCT pos FROM (
            SELECT unnest([{_B.format(k='c_custkey', off=1)},
                           {_B.format(k='c_custkey', off=5)},
                           {_B.format(k='c_custkey', off=9)}]) AS pos
            FROM bkeys
        )
    )
    SELECT o.o_orderkey, o.o_custkey,
           (o.o_custkey IN (SELECT c_custkey FROM bkeys)) AS true_member
    FROM orders o
    WHERE {_B.format(k='o.o_custkey', off=1)} IN (SELECT pos FROM bits)
      AND {_B.format(k='o.o_custkey', off=5)} IN (SELECT pos FROM bits)
      AND {_B.format(k='o.o_custkey', off=9)} IN (SELECT pos FROM bits)
    """,
)
def orders_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning: BUILDING-segment customer keys fold
    to a ≤65536-row bit-position set (bounded by the bit-space, not the
    corpus) that broadcasts and prunes orders map-only — the scale
    pattern for cutting a fact table before its real join. False
    positives (true_member = false rows) are part of the contract and
    the oracle reproduces them bit-for-bit from the same md5 slices."""
    from stream_spark.operators.bloom import bloom_build, bloom_prune

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bkeys = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    pruned = bloom_prune(orders, "o_custkey", bloom_build(bkeys, "c_custkey"))
    return pruned.join(
        # broadcast-ok: customer is a dimension table
        F.broadcast(bkeys.withColumnRenamed("c_custkey", "o_custkey").withColumn("_m", F.lit(True))),
        "o_custkey",
        "left",
    ).select(
        "o_orderkey",
        "o_custkey",
        F.coalesce(F.col("_m"), F.lit(False)).alias("true_member"),
    )


@register(
    "documents_source_cap",
    oracle="""
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT), doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn <= 50
    """,
)
def documents_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (domain caps in crawl pipelines): keep at
    most 50 docs per source, chosen by the stable md5 order so the kept
    set is reproducible under any partitioning. One keyed window — no
    global sort; at scale the heavy tail per domain is exactly what the
    cap removes."""
    from stream_spark.operators.text import md5_long

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(md5_long(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.select("doc_id", "source", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 50)
    )


@register(
    "events_value_quantiles",
    oracle="""
    WITH r AS (
        SELECT event_type, value, event_id,
               row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN value END) AS p50,
           MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN value END) AS p95,
           MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS p99
    FROM r GROUP BY event_type
    """,
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group discrete quantiles (p50/p95/p99 of value per
    event type) via keyed row_number — rank ceil(p·n), the
    PERCENTILE_DISC convention, spelled out identically on both sides
    so no engine's quantile definition is trusted. Keyed windows only;
    the 100 TB approximate path is sketches.approx_quantiles (GK,
    mergeable)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"), F.col("value"))
    )
    return r.groupBy("event_type").agg(
        pick(0.50).alias("p50"), pick(0.95).alias("p95"), pick(0.99).alias("p99")
    )


@register(
    "events_asof_tolerance",
    oracle="""
    WITH j AS (
        SELECT p.event_id AS purchase_id, p.user_id,
               epoch_ms(p.ts) AS purchase_ts_ms,
               c.event_id AS click_id_right,
               epoch_ms(c.ts) AS click_ts_ms
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT purchase_id, user_id, purchase_ts_ms,
           CASE WHEN purchase_ts_ms - click_ts_ms <= 600000 THEN click_id_right END AS click_id_right,
           CASE WHEN purchase_ts_ms - click_ts_ms <= 600000 THEN click_ts_ms END AS click_ts_ms
    FROM j
    """,
)
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a 10-minute tolerance (pandas merge_asof parity): a
    preceding click older than the bound is no match. Same single-key-
    shuffle carry plan as the unbounded as-of — the bound is a map-side
    mask, not a range join."""
    from stream_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    joined = asof_join(
        purchases, clicks, "user_id", "ts", "ts", ["ts", "event_id"],
        suffix="_right", tolerance_ms=600_000,
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("purchase_ts_ms"),
        F.col("event_id_right").alias("click_id_right"),
        F.unix_millis(F.col("ts_right").cast("timestamp")).alias("click_ts_ms"),
    )


@register(
    "events_changelog_compact",
    oracle="""
    SELECT user_id,
           event_id AS last_event_id,
           CAST(epoch_ms(ts) AS BIGINT) AS last_ts_ms,
           value AS last_value
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def events_changelog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction: collapse a change stream to the latest
    record per key, dropping keys whose final change is a delete
    (event_type='error' stands in for the delete marker). Realized as
    max-of-struct ordered by (ts, event_id) — an ALGEBRAIC aggregate,
    so partials combine map-side and the shuffle carries one row per
    key, unlike the row_number window which shuffles every change.
    This is the ingestion half of MERGE INTO at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    last = ev.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("m")
    )
    return last.filter(F.col("m.event_type") != "error").select(
        "user_id",
        F.col("m.event_id").alias("last_event_id"),
        F.unix_millis(F.col("m.ts").cast("timestamp")).alias("last_ts_ms"),
        F.col("m.value").alias("last_value"),
    )


@register(
    "parts_copurchase_pagerank",
    oracle="""
    WITH co AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b HAVING COUNT(*) >= 2
    ),
    edges AS (
        SELECT part_a AS src, part_b AS dst FROM co
        UNION ALL
        SELECT part_b AS src, part_a AS dst FROM co
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
    c1 AS (SELECT e.dst AS node, SUM(r.r // d.outdeg) AS s
           FROM edges e JOIN r0 r ON r.node = e.src JOIN deg d ON d.src = e.src
           GROUP BY e.dst),
    r1 AS (SELECT n.node, CAST(150000000 + (17 * COALESCE(c1.s, 0)) // 20 AS BIGINT) AS r
           FROM nodes n LEFT JOIN c1 ON c1.node = n.node),
    c2 AS (SELECT e.dst AS node, SUM(r.r // d.outdeg) AS s
           FROM edges e JOIN r1 r ON r.node = e.src JOIN deg d ON d.src = e.src
           GROUP BY e.dst),
    r2 AS (SELECT n.node, CAST(150000000 + (17 * COALESCE(c2.s, 0)) // 20 AS BIGINT) AS r
           FROM nodes n LEFT JOIN c2 ON c2.node = n.node)
    SELECT node AS part_id, r AS rank_micro FROM r2
    """,
)
def parts_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (2 iterations,
    integer micro-rank arithmetic — operators/components.pagerank_integer):
    which parts sit centrally in basket structure. The oracle unrolls
    both iterations; floor division on positive BIGINTs makes every
    intermediate bit-identical across engines."""
    from stream_spark.operators.components import pagerank_integer

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    co = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )
    # symmetrize by EXPLODING each undirected pair into its two
    # directions instead of unioning two projections of `co` — the
    # union spelling re-derived the lineitem fact-fact self-join +
    # groupBy once PER SIDE inside pagerank's edge-checkpoint job
    # (r11 §13, guide §2.4; same row multiset, order-free consumer)
    edges = co.select(
        F.explode(
            F.array(
                F.struct(F.col("part_a").alias("src"), F.col("part_b").alias("dst")),
                F.struct(F.col("part_b").alias("src"), F.col("part_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    out = pagerank_integer(edges, iters=2)
    return out.select(F.col("node").alias("part_id"), F.col("r").alias("rank_micro"))


@register(
    "events_funnel_three_step",
    oracle="""
    WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
    views AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
    purchases AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
    v1 AS (
        SELECT v.user_id, v.ts, v.event_id, c.ts AS click_ts
        FROM views v ASOF LEFT JOIN clicks c
          ON v.user_id = c.user_id AND c.ts <= v.ts
    ),
    p1 AS (
        SELECT p.user_id, p.event_id AS purchase_id, epoch_ms(p.ts) AS purchase_ts_ms,
               epoch_ms(v.ts) AS view_ts_ms, epoch_ms(v.click_ts) AS click_ts_ms
        FROM purchases p ASOF LEFT JOIN (SELECT * FROM v1 WHERE click_ts IS NOT NULL) v
          ON p.user_id = v.user_id AND v.ts <= p.ts
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN click_ts_ms IS NOT NULL
                          AND purchase_ts_ms - click_ts_ms <= 86400000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_completed
    FROM p1 GROUP BY user_id
    """,
)
def events_funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (click → view → purchase within 24 h):
    MATCH_RECOGNIZE-style sequence matching Spark lacks natively,
    composed from two chained as-of joins — each view carries its last
    preceding click, each purchase its last click-carrying view, so
    the chain is strictly ordered; one keyed aggregate scores
    completion per user. Two key-shuffles total (the as-of carry),
    never a range fan-out."""
    from stream_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    v1 = asof_join(views, clicks, "user_id", "ts", "ts", ["ts"], suffix="_click")
    v1 = v1.filter(F.col("ts_click").isNotNull()).select(
        "user_id", "ts", F.col("ts_click").alias("click_ts")
    )
    p1 = asof_join(purchases, v1, "user_id", "ts", "ts", ["ts", "click_ts"], suffix="_v")
    done = (
        F.col("click_ts_v").isNotNull()
        & (
            F.unix_millis(F.col("ts").cast("timestamp"))
            - F.unix_millis(F.col("click_ts_v").cast("timestamp"))
            <= 86_400_000
        )
    )
    return p1.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum(F.when(done, 1).otherwise(0)).cast("long").alias("n_completed"),
    )


@register(
    "parts_copurchase_triangles",
    oracle="""
    WITH co AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY u, v HAVING COUNT(*) >= 2
    ),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM co e1
        JOIN co e2 ON e2.u = e1.v
        JOIN co e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    roles AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT node AS part_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM roles GROUP BY node
    """,
)
def parts_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the co-purchase graph
    (operators/components.triangle_counts): tight basket communities.
    Spark runs the degree-ordered-orientation algorithm (every node's
    oriented out-degree is O(√m), so wedge volume is bounded on skewed
    graphs); the oracle enumerates u<v<w triangles directly — same
    triangle set, different exploration order."""
    from stream_spark.operators.components import triangle_counts

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    co = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )
    out = triangle_counts(co, a_col="part_a", b_col="part_b")
    return out.select(F.col("node").alias("part_id"), "n_triangles")


_NAMES_BLOCKED = r"""
    names AS (
        SELECT DISTINCT p_name AS name,
               (string_split_regex(p_name, '\s+'))[-1] AS blk
        FROM part
    ),
    fpairs AS (
        SELECT a.name AS name_a, b.name AS name_b,
               CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
        WHERE levenshtein(a.name, b.name) <= 4
    )
"""


@register(
    "parts_fuzzy_name_pairs",
    oracle=f"""
    WITH {_NAMES_BLOCKED}
    SELECT name_a, name_b, dist FROM fpairs
    """,
)
def parts_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string join (operators/fuzzy.fuzzy_name_pairs): distinct
    part names within Levenshtein 4, blocked on the head noun (last
    token) — pair volume Σ block², distinct-value space not row space.
    The entity-resolution candidate generator."""
    from stream_spark.operators.fuzzy import fuzzy_name_pairs

    parts = load_table(spark, sf_dir, "part")
    return fuzzy_name_pairs(parts, "p_name", max_dist=4)


@register(
    "parts_name_entity_clusters",
    oracle=f"""
    WITH RECURSIVE {_NAMES_BLOCKED},
    und AS MATERIALIZED (SELECT name_a AS src, name_b AS dst FROM fpairs
            UNION ALL SELECT name_b, name_a FROM fpairs),
    reach(node, label) AS (
        SELECT src, src FROM und
        UNION
        SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    full_names AS (
        SELECT n.name, COALESCE(c.component, n.name) AS component
        FROM names n LEFT JOIN comp c ON c.node = n.name
    )
    SELECT f.component AS canonical_name,
           CAST(COUNT(DISTINCT f.name) AS BIGINT) AS n_names,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM part p JOIN full_names f ON p.p_name = f.name
    GROUP BY canonical_name
    """,
)
def parts_name_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end to end: fuzzy name pairs → large-star/
    small-star components over the NAME graph (string min works — the
    scheme only needs a total order) → every part mapped to its
    cluster's canonical (lexicographic-min) name. Singleton names keep
    themselves. The cluster step runs on distinct VALUES, so graph size
    is vocabulary-bounded regardless of table size."""
    from stream_spark.operators.components import connected_components_star
    from stream_spark.operators.fuzzy import fuzzy_name_pairs

    parts = load_table(spark, sf_dir, "part")
    pairs = fuzzy_name_pairs(parts, "p_name", max_dist=4)
    comp = connected_components_star(pairs.select("name_a", "name_b"), a_col="name_a", b_col="name_b")
    names = parts.select(F.col("p_name").alias("node")).distinct()
    full = names.join(comp, "node", "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col("node"))
    )
    return (
        parts.join(full, parts.p_name == full.node)
        .groupBy(F.col("component").alias("canonical_name"))
        .agg(
            F.countDistinct("node").alias("n_names"),
            F.count("*").alias("n_parts"),
        )
    )


@register(
    "events_out_of_order_rate",
    oracle="""
    WITH seq AS (
        SELECT event_type, ts,
               MAX(ts) OVER (PARTITION BY event_type, user_id ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN ts < prior_max THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(SUM(CASE WHEN ts < prior_max THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS late_rate
    FROM seq GROUP BY event_type
    """,
)
def events_out_of_order_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder accounting — the number every watermark
    delay is tuned from: the fraction of events arriving behind their
    KEY's running event-time max in arrival (event_id) order, rolled up
    per type. Keyed by (event_type, user_id) — the same high-cardinality
    key streaming state partitions on, so no 5-key window skew — then
    one agg."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    seq = ev.withColumn("prior_max", F.max("ts").over(w))
    late = F.when(F.col("ts") < F.col("prior_max"), 1).otherwise(0)
    return seq.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(late).cast("long").alias("n_late"),
        (F.sum(late).cast("double") / F.count("*")).alias("late_rate"),
    )


@register(
    "events_burst_windows",
    oracle="""
    WITH hourly AS (
        SELECT event_type, CAST((epoch_ms(ts) // 3600000) * 3600000 AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, h
    ),
    stats AS (
        SELECT event_type, h, c,
               CAST(SUM(CAST(c AS DECIMAL(18,0))) OVER w AS DOUBLE) AS s1,
               CAST(SUM(CAST(c * c AS DECIMAL(28,0))) OVER w AS DOUBLE) AS s2,
               COUNT(*) OVER w AS n
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h AS window_start_ms, c AS n_events,
           (c - s1 / n) / sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 1e-9)) AS burst_z
    FROM stats
    WHERE n >= 6 AND (c - s1 / n) / sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 1e-9)) >= 3.0
    """,
)
def events_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: hourly counts per type scored against the
    trailing 24 closed hours (z ≥ 3 with ≥6 hours of history). Counts
    are integers, so the trailing sums accumulate in DECIMAL exactly —
    mean/variance/sqrt are then single double operations, identical in
    both engines. Keyed ROWS frame, no global order."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        ((F.unix_millis(F.col("ts").cast("timestamp")) / 3600000).cast("long") * 3600000).alias("h"),
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    stats = (
        hourly.withColumn("s1", F.sum(F.col("c").cast("decimal(18,0)")).over(w).cast("double"))
        .withColumn("s2", F.sum((F.col("c") * F.col("c")).cast("decimal(28,0)")).over(w).cast("double"))
        .withColumn("n", F.count("*").over(w))
    )
    mean = F.col("s1") / F.col("n")
    var = F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(1e-9))
    z = (F.col("c") - mean) / F.sqrt(var)
    return (
        stats.filter((F.col("n") >= 6) & (z >= 3.0))
        .select(
            "event_type",
            F.col("h").alias("window_start_ms"),
            F.col("c").alias("n_events"),
            z.alias("burst_z"),
        )
    )


@register(
    "orders_daily_ewma",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) AS BIGINT) AS day_ms,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        FROM orders GROUP BY day_ms
    ),
    r AS (SELECT day_ms, total, row_number() OVER (ORDER BY day_ms) AS rn FROM daily),
    contrib AS (
        SELECT total, rn + d AS t_rn, CAST(1 << (7 - d) AS INT) AS wt
        FROM r, unnest(generate_series(0, 7)) u(d)
    ),
    w AS (SELECT t_rn, SUM(total * wt) AS num, CAST(SUM(wt) AS BIGINT) AS den
          FROM contrib GROUP BY t_rn)
    SELECT r.day_ms, CAST(r.total AS DOUBLE) AS day_total,
           CAST(CAST(w.num AS DOUBLE) / w.den AS DOUBLE) AS ewma_8
    FROM r JOIN w ON r.rn = w.t_rn
    """,
)
def orders_daily_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily revenue —
    alpha=1/2, truncated at 8 terms (the weight tail below 2^-8 is
    discarded and the divisor renormalized, pandas' adjust=True form).
    Alpha=1/2 makes every weight an exact power of two, so numerator
    and denominator are EXACT decimal/BIGINT sums (scaled by 2^7) and
    the only float op is one final IEEE division — engine-portable per
    oracle rule 1, no pow()/libm anywhere.

    Same scale shape as orders_daily_moving_avg: one keyed daily
    aggregation does the row-scale work; the 8-term frame runs over the
    bounded daily grid via the two-pass rownum + distance fan-out
    (each day explodes to the 8 target rows whose frame contains it,
    weight 2^(7-distance)) and one keyed aggregate — no global
    WindowExec, zero single-partition exchanges. Series-head rows
    renormalize by their partial weight sum exactly like the oracle's
    truncated frame."""
    from stream_spark.operators.rownum import with_global_row_number

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.unix_millis(F.date_trunc("day", F.col("o_orderdate").cast("timestamp"))).alias("day_ms")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"))
    d = with_global_row_number(daily, ["day_ms"], out="rn")
    contrib = d.select(
        F.col("total").alias("c_total"),
        F.posexplode(F.sequence(F.col("rn"), F.col("rn") + 7)).alias("dist", "t_rn"),
    ).withColumn("wt", F.expr("CAST(1 << (7 - dist) AS INT)"))
    win = contrib.groupBy("t_rn").agg(
        F.sum(F.col("c_total") * F.col("wt")).alias("num"),
        F.sum("wt").cast("long").alias("den"),
    )
    return d.join(win, d.rn == win.t_rn).select(
        "day_ms",
        F.col("total").cast("double").alias("day_total"),
        (F.col("num").cast("double") / F.col("den")).cast("double").alias("ewma_8"),
    )


@register(
    "events_asof_nearest_click",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS pts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS cts
          FROM events WHERE event_type = 'click'),
    b AS (SELECT p.event_id, p.user_id, p.pts, c.cts AS bts
          FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.cts <= p.pts),
    f AS (SELECT p.event_id, c.cts AS fts
          FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.cts >= p.pts)
    SELECT b.event_id AS purchase_id, b.user_id, b.pts AS purchase_ts_ms,
           CAST(CASE WHEN fts IS NULL OR (bts IS NOT NULL AND b.pts - bts <= fts - b.pts)
                     THEN bts ELSE fts END AS BIGINT) AS nearest_click_ts_ms,
           CAST(CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
                     WHEN fts IS NULL OR (bts IS NOT NULL AND b.pts - bts <= fts - b.pts)
                     THEN b.pts - bts ELSE fts - b.pts END AS BIGINT) AS delta_ms,
           CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
                WHEN fts IS NULL OR (bts IS NOT NULL AND b.pts - bts <= fts - b.pts)
                THEN 'backward' ELSE 'forward' END AS direction
    FROM b JOIN f USING (event_id)
    """,
)
def events_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest', ties
    → backward): each purchase matched to the user's closest click in
    EITHER direction — the attribution variant when a click just after
    the purchase event (clock skew, late arrival) should still count.
    operators/asof.asof_nearest: one union + one keyed sort, backward
    and forward candidates as two frames of the same window — one
    shuffle total, no range fan-out."""
    from stream_spark.operators.asof import asof_nearest

    ev = load_table(spark, sf_dir, "events")
    pm = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("purchase_ts_ms"),
        )
    )
    cm = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("click_ts_ms")
    )
    res = asof_nearest(pm, cm, "user_id", "purchase_ts_ms", "click_ts_ms")
    return res.select(
        "purchase_id",
        "user_id",
        "purchase_ts_ms",
        F.col("near_ts").cast("long").alias("nearest_click_ts_ms"),
        F.col("delta").cast("long").alias("delta_ms"),
        "direction",
    )


@register(
    "events_decay_sample",
    oracle="""
    WITH ev AS (SELECT event_id, epoch_ms(ts) AS ts_ms FROM events),
    mx AS (SELECT MAX(ts_ms) AS anchor FROM ev),
    aged AS (
        SELECT event_id, ts_ms, (mx.anchor - ts_ms) // 86400000 AS age_days
        FROM ev CROSS JOIN mx
    ),
    kd AS (SELECT event_id, ts_ms, age_days,
                  LEAST(age_days // 7, 20) AS kk FROM aged)
    SELECT event_id, ts_ms, CAST(age_days AS BIGINT) AS age_days,
           CAST(kk AS BIGINT) AS decay_bucket
    FROM kd
    WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % (CAST(1 AS BIGINT) << kk) = 0
    """,
)
def events_decay_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-weighted (exponential-decay) deterministic sampling —
    the recency mixture a continuously-trained model's data pipeline
    applies to its event firehose: keep probability halves every
    half-life (7 days), so the sample over-represents fresh data with
    an EXACT power-of-two rate per age bucket. No RNG state anywhere:
    keep iff md5(event_id) ≡ 0 (mod 2^bucket) — reproducible across
    runs, engines, and partitionings, and downstream estimates can
    reweight by exactly 2^bucket. Bucket capped at 20 (keep ≥ 2^-20,
    bounds the shift arithmetic).

    Scale: one 1-row anchor aggregate (the only sanctioned
    single-partition exchange, used once), then a pure map-side filter
    — no shuffle at all on the corpus path; at 100 TB this is a scan
    that keeps ~Σ 2^-k of each age band."""
    from stream_spark.operators.text import md5_long

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms")
    )
    mx = ev.agg(F.max("ts_ms").alias("anchor"))
    aged = (
        ev.crossJoin(F.broadcast(mx))  # broadcast-ok: 1-row global anchor
        .select(
            "event_id", "ts_ms", F.expr("(anchor - ts_ms) DIV 86400000").alias("age_days")
        )
    )
    kd = aged.withColumn(
        "decay_bucket", F.least(F.expr("age_days DIV 7"), F.lit(20)).cast("long")
    )
    # exact 2^k via a 21-entry literal array (F.shiftleft is
    # literal-shift-only; the array keeps every power exact BIGINT)
    pow2 = F.element_at(
        F.array(*[F.lit(1 << i) for i in range(21)]), (F.col("decay_bucket") + 1).cast("int")
    )
    return (
        kd.filter(F.pmod(md5_long(F.col("event_id").cast("string")), pow2) == 0)
        .select(
            "event_id",
            "ts_ms",
            F.col("age_days").cast("long").alias("age_days"),
            "decay_bucket",
        )
    )
