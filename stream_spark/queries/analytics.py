"""Analytics backbone queries (SURVEY §2 B-block).

Determinism: aggregate arithmetic runs in DECIMAL (exact and
order-insensitive) then casts to DOUBLE, so Spark's shuffle-order
summation hashes identically to DuckDB's. The decimal fragments are
valid in both SQL dialects and are shared verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.queries.registry import register
from stream_spark.sources import load_table


def dsum(col: str, alias: str) -> str:
    """Exact decimal sum surfaced as DOUBLE (order-insensitive)."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def davg(col: str, alias: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col}) AS {alias}"


#: l_extendedprice * (1 - l_discount), exact decimal
DISC_PRICE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))"
)
#: disc_price * (1 + l_tax), exact decimal
CHARGE = (
    f"CAST({DISC_PRICE} * "
    "CAST(1.00 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,6))"
)


# --------------------------------------------------------------------------
# B1: pricing summary (TPC-H Q1 shape)

_Q1_CUTOFF = "1998-09-02 00:00:00"


@register(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity', 'sum_qty')},
           {dsum('l_extendedprice', 'sum_base_price')},
           CAST(SUM({DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({CHARGE}) AS DOUBLE) AS sum_charge,
           {davg('l_quantity', 'avg_qty')},
           {davg('l_extendedprice', 'avg_price')},
           {davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.expr(f"TIMESTAMP '{_Q1_CUTOFF}'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(dsum("l_quantity", "sum_qty")),
            F.expr(dsum("l_extendedprice", "sum_base_price")),
            F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE) AS sum_disc_price"),
            F.expr(f"CAST(SUM({CHARGE}) AS DOUBLE) AS sum_charge"),
            F.expr(davg("l_quantity", "avg_qty")),
            F.expr(davg("l_extendedprice", "avg_price")),
            F.expr(davg("l_discount", "avg_disc")),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# B2: shipping priority (TPC-H Q3 shape) — 3-way join, top-N

_Q3_DATE = "1997-01-01 00:00:00"


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l_shipdate > TIMESTAMP '{_Q3_DATE}'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr(f"TIMESTAMP '{_Q3_DATE}'")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr(f"TIMESTAMP '{_Q3_DATE}'")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is SF-scaled (no hint): the planner broadcasts it at
        # small SF from measured size and shuffle-joins at 100 TB
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# B3: local supplier volume (TPC-H Q5 shape) — 6-way join; flagship

_Q5_LO = "1996-01-01 00:00:00"
_Q5_HI = "1997-01-01 00:00:00"


@register(
    "tpch_q5_local_supplier",
    oracle=f"""
    SELECT n_name, CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '{_Q5_LO}'
      AND o_orderdate < TIMESTAMP '{_Q5_HI}'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: fact-fact join shuffles on orderkey. nation/region are
    fixed-size (25/5 rows at every SF) and carry broadcast hints;
    supplier/customer are SF-scaled, so they get NO hint — the planner
    broadcasts them at small SF from measured size and falls back to
    shuffle joins at 100 TB where they are billions of rows."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr(f"TIMESTAMP '{_Q5_LO}'"))
        & (F.col("o_orderdate") < F.expr(f"TIMESTAMP '{_Q5_HI}'"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        # broadcast-ok: nation is 25 rows at every SF
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        # broadcast-ok: region is 5 rows at every SF
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue"))
    )


# --------------------------------------------------------------------------
# B4: top-k events per user (rank within key)


@register(
    "top_events_per_user",
    oracle="""
    SELECT user_id, event_id, value, rank_in_user FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rank_in_user
        FROM events
    ) WHERE rank_in_user <= 3
    """,
)
def top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rank_in_user", F.row_number().over(w))
        .filter(F.col("rank_in_user") <= 3)
        .select("user_id", "event_id", "value", "rank_in_user")
    )


# --------------------------------------------------------------------------
# B5: sessionization (30-min inactivity gap per user)

_GAP_MS = 30 * 60 * 1000


@register(
    "events_sessionize",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {_GAP_MS}
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM marked
    )
    SELECT user_id, session_id, epoch_ms(MIN(ts)) AS session_start_ms,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via per-user lag + running count — all
    partitioned by user_id, so it scales with key cardinality."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_millis(F.col("ts").cast("timestamp")) - F.unix_millis(F.lag("ts").over(w).cast("timestamp")) > _GAP_MS),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn("session_id", F.sum("is_new").over(wrun))
    return sess.groupBy("user_id", "session_id").agg(
        F.unix_millis(F.min("ts").cast("timestamp")).alias("session_start_ms"),
        F.count("*").alias("n_events"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value"),
    )


# --------------------------------------------------------------------------
# B6: running total per customer (cumulative frame)


@register(
    "orders_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS orderdate_ms,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def orders_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_total"),
    )


# --------------------------------------------------------------------------
# B7: forecast revenue change (TPC-H Q6 shape) — pure filter + agg,
# the predicate-pushdown showcase

@register(
    "tpch_q6_revenue_delta",
    oracle=f"""
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
                CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * "
                "CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# B8: order priority check (TPC-H Q4 shape) — EXISTS semi-join

@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1996-04-01 00:00:00'"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li, (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate), "left_semi"
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --------------------------------------------------------------------------
# B9: customers with no recent orders — anti-join shape

@register(
    "customers_without_recent_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    """,
)
def customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.expr("TIMESTAMP '2000-01-01 00:00:00'")
    )
    return cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# B10: native session windows (F.session_window) — same 30-min-gap
# semantics as events_sessionize, via Spark's built-in session operator
# (streaming-capable with watermarks)

@register(
    "events_session_window_native",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= {_GAP_MS}
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id, epoch_ms(MIN(ts)) AS session_start_ms, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("session_start_ms"),
            "n_events",
        )
    )


@register(
    "events_user_sequences",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {_GAP_MS}
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM marked
    )
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_actions,
           CAST(epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS BIGINT) AS duration_ms,
           md5(string_agg(event_type, ' ' ORDER BY ts, event_id)) AS seq_md5
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_user_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-sequence construction — the event-firehose analog of
    document packing: each user session (same 30-min gap rule as B5
    sessionize) becomes ONE ordered action-token sequence, the training
    row a sequence model over user behavior consumes. The sequence is
    order-preserved via array_sort over (ts, event_id) structs (no
    collect-order assumption — shuffle-safe), surfaced as an md5 so the
    gate pins exact token order, plus length/duration accounting.

    Scale: everything is keyed by user_id (window, running count,
    grouped fold) — scales with user cardinality; the in-group sort is
    bounded by per-session event counts."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(w) > _GAP_MS),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn("session_id", F.sum("is_new").over(wrun).cast("long"))
    seq = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_actions"),
        (F.max("ts_ms") - F.min("ts_ms")).cast("long").alias("duration_ms"),
        F.md5(F.concat_ws(" ", F.transform(seq, lambda s: s["event_type"]))).alias("seq_md5"),
    )
