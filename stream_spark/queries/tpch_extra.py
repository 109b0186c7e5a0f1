"""Extended TPC-H-shaped suite adapted to the test star schema —
joins, correlated subqueries, IN/EXISTS, disjunctive predicates,
having-filters. Decimal discipline as in analytics.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.queries.analytics import DISC_PRICE
from stream_spark.queries.registry import register
from stream_spark.sources import load_table


# --------------------------------------------------------------------------
# Q7 shape: volume between nation pairs


@register(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, {DISC_PRICE} AS vol
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN orders   ON l_orderkey = o_orderkey
                      JOIN customer ON o_custkey = c_custkey
                      JOIN nation n1 ON s_nationkey = n1.n_nationkey
                      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_9', 'NATION_10') AND n2.n_name IN ('NATION_9', 'NATION_10')
          AND n1.n_name <> n2.n_name
    ) GROUP BY supp_nation, cust_nation
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        # broadcast-ok: nation is 25 rows at every SF
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        # broadcast-ok: nation is 25 rows at every SF
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(
            F.col("supp_nation").isin("NATION_9", "NATION_10")
            & F.col("cust_nation").isin("NATION_9", "NATION_10")
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy("supp_nation", "cust_nation")
        .agg(F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue"))
    )


# --------------------------------------------------------------------------
# Q10 shape: returned-item customers ranked by lost revenue


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1997-07-01 00:00:00'"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        # broadcast-ok: nation is 25 rows at every SF
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14 shape: promo revenue share (conditional aggregation)


@register(
    "tpch_q14_promo_share",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE} ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM({DISC_PRICE}) AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1997-02-01 00:00:00'"))
    )
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE} ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)"
                f" / CAST(SUM({DISC_PRICE}) AS DOUBLE) AS promo_share"
            )
        )
    )


# --------------------------------------------------------------------------
# Q17 shape: small-quantity orders vs per-part average (correlated agg)


@register(
    "tpch_q17_small_quantity",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey AS pk,
               0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity)) AS half_avg
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part_avg ON l_partkey = pk
    WHERE l_quantity < half_avg
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part average via a self-aggregation join (the scalable form
    of the correlated subquery — one shuffle on partkey each side)."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.expr(
            "0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity)) AS half_avg"
        )
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q18 shape: large-volume orders (IN over grouped HAVING)


@register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, epoch_ms(o_orderdate) AS orderdate_ms,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(big, li.l_orderkey == big.big_ok, "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            "total_qty",
        )
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive predicates over joined dims


@register(
    "tpch_q19_disjunctive",
    oracle=f"""
    SELECT CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10)
       OR (p_type = 'ECONOMY' AND l_discount <= 0.05)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 10))
        | ((F.col("p_type") == "ECONOMY") & (F.col("l_discount") <= 0.05))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue"))
    )


# --------------------------------------------------------------------------
# Q22 shape: above-average account balances with no orders (anti-join +
# scalar subquery)


@register(
    "tpch_q22_idle_balances",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    GROUP BY c_mktsegment
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar subquery (corpus-average balance) is realized as a
    1-row aggregate broadcast-cross-joined onto the filter — ONE plan,
    one job, no driver round-trip (r3 collected the scalar and
    re-literaled it, splitting the query into two jobs)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS ab")
    )
    return (
        # broadcast-ok: 1-row scalar aggregate (scalar-subquery realization)
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            orders.filter(F.col("o_orderdate") >= F.expr("TIMESTAMP '2000-01-01 00:00:00'")),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal"),
        )
    )


# --------------------------------------------------------------------------
# Q8 shape: national market share inside a region, by year


@register(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_5' THEN vol ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, {DISC_PRICE} AS vol, n2.n_name AS nation
        FROM lineitem JOIN part     ON p_partkey = l_partkey
                      JOIN supplier ON s_suppkey = l_suppkey
                      JOIN orders   ON l_orderkey = o_orderkey
                      JOIN customer ON o_custkey = c_custkey
                      JOIN nation n1 ON c_nationkey = n1.n_nationkey
                      JOIN region   ON n1.n_regionkey = r_regionkey
                      JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    ) GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.select(F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1"))
    n2 = nation.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("nation"))
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # broadcast-ok: part/supplier/customer are bounded dimensions here
        .join(F.broadcast(part.filter(F.col("p_type") == "PROMO")), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)  # broadcast-ok: supplier is a bounded dimension
        .join(cust, orders.o_custkey == cust.c_custkey)
        # broadcast-ok: nation/region are tiny at every SF
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")), F.col("rk1") == F.col("r_regionkey"))  # broadcast-ok: region is a fixed 5-row dimension
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))  # broadcast-ok: nation is a fixed 25-row dimension
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.expr(DISC_PRICE).alias("vol"),
            "nation",
        )
    )
    return base.groupBy("o_year").agg(
        F.expr(
            "CAST(SUM(CASE WHEN nation = 'NATION_5' THEN vol ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)"
            " / CAST(SUM(vol) AS DOUBLE) AS mkt_share"
        )
    )


# --------------------------------------------------------------------------
# Q9 shape: profit by supplier nation and year (adapted: the test
# schema has no partsupp/ps_supplycost, so profit = discounted price)


@register(
    "tpch_q9_nation_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year, {DISC_PRICE} AS amount
        FROM lineitem JOIN part     ON p_partkey = l_partkey
                      JOIN supplier ON s_suppkey = l_suppkey
                      JOIN orders   ON l_orderkey = o_orderkey
                      JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) GROUP BY nation, o_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # broadcast-ok: part/supplier/nation are bounded dimensions
        .join(F.broadcast(part.filter(F.col("p_name").like("%red%"))), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)  # broadcast-ok: supplier is a bounded dimension
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))  # broadcast-ok: nation is a fixed 25-row dimension
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.expr(DISC_PRICE).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.expr("CAST(SUM(amount) AS DOUBLE) AS sum_profit"))
    )


# --------------------------------------------------------------------------
# Q12 shape: shipping-delay buckets vs order priority (adapted: no
# l_shipmode/commit/receipt dates in the test schema — the delay
# between order and ship date plays the mode role)


@register(
    "tpch_q12_ship_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY ship_bucket
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60, "SLOW").otherwise("FAST"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (left join + two-level agg)


@register(
    "tpch_q13_cust_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "5-LOW"),
            cust.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q15 shape: top supplier by revenue in a window (scalar-max subquery)


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, CAST(SUM({DISC_PRICE}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1997-07-01 00:00:00'"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE) AS total_revenue"))
    )
    # the MAX(total_revenue) scalar subquery as a 1-row broadcast
    # cross join — one plan (the revenue agg appears twice in it, same
    # work as the r3 two-job collect, minus the job boundary)
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        # broadcast-ok: 1-row scalar aggregate (scalar-subquery realization)
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))  # broadcast-ok: supplier is a bounded dimension
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q2 shape: min-cost supplier per part (correlated MIN subquery). No
# partsupp table in the test schema — lineitem stands in as the
# part×supplier price relation (cost = min l_extendedprice offered).


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS min_price
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, s_name, n_name, s_acctbal, c.min_price
    FROM part JOIN cost c ON p_partkey = c.l_partkey
              JOIN supplier ON c.l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size = 15 AND p_type = 'SMALL'
      AND c.min_price = (SELECT MIN(c2.min_price) FROM cost c2
                         WHERE c2.l_partkey = p_partkey)
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    # broadcast-ok: nation/region are fixed 25/5-row dimensions
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)  # broadcast-ok: nation is a fixed 25-row dimension
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")),  # broadcast-ok: region is a fixed 5-row dimension
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # per (part, supplier) min offered price among EU suppliers; the
    # correlated subquery becomes a second keyed agg joined back on
    # equality — both shuffles on l_partkey, no window, no collect
    cost = (
        li.join(eu_supp.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    best = cost.groupBy("l_partkey").agg(F.min("min_price").alias("best_price"))
    return (
        cost.join(best, "l_partkey")
        .filter(F.col("min_price") == F.col("best_price"))
        .join(part.filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL")),
              F.col("l_partkey") == F.col("p_partkey"))
        # broadcast-ok: supplier dim (bounded per SF contract, like q15)
        .join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "s_name", "n_name", "s_acctbal", "min_price")
    )


# --------------------------------------------------------------------------
# Q11 shape: important inventory value per part within one nation,
# HAVING value above a fraction of the grand total (scalar subquery).


@register(
    "tpch_q11_important_stock",
    oracle="""
    WITH val AS (
        SELECT l_partkey AS ps_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                   CAST(l_quantity AS DECIMAL(12,2))) AS value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey
    )
    SELECT ps_partkey, CAST(value AS DOUBLE) AS part_value
    FROM val
    WHERE value * 1000 > (SELECT SUM(value) FROM val)
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # broadcast-ok: nation is a fixed 25-row dimension
    nat_supp = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_5")),  # broadcast-ok: nation is a fixed 25-row dimension
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey")
    val = (
        li.join(nat_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_quantity").cast("decimal(12,2)")
            ).alias("value")
        )
    )
    # the SUM(value) scalar subquery as a 1-row broadcast cross join —
    # one plan, and the comparison stays in exact decimals end-to-end
    # (the *1000 avoids a fractional threshold on either engine)
    total = val.agg(F.sum("value").alias("t"))
    return (
        # broadcast-ok: 1-row scalar aggregate (scalar-subquery realization)
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value") * 1000 > F.col("t"))
        .select("ps_partkey", F.col("value").cast("double").alias("part_value"))
    )


# --------------------------------------------------------------------------
# Q16 shape: distinct-supplier counts per (brand, type, size) with a
# NOT IN exclusion subquery (negative-balance suppliers stand in for
# the reference's complaint filter).


@register(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 28, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    pf = part.filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 35)
    )
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(pf, li.l_partkey == pf.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q20 shape: suppliers of one nation who shipped a large quantity of a
# part type (nested IN with per-(supplier,part) HAVING).


@register(
    "tpch_q20_potential_promotion",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'ECONOMY'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50)
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    heavy = (
        li.filter(F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
        .join(part.filter(F.col("p_type") == "ECONOMY").select("p_partkey"),
              li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        supp
        # broadcast-ok: nation is a fixed 25-row dimension
        .join(F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
              supp.s_nationkey == nation.n_nationkey)
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


# --------------------------------------------------------------------------
# Q21 shape: suppliers who alone returned goods on multi-supplier
# finished orders (EXISTS + NOT EXISTS). No receipt/commit dates in
# the test schema — l_returnflag = 'R' stands in for "late". The Spark
# plan uses the standard aggregate rewrite (per-order supplier counts)
# instead of the double self-join: one shuffle on l_orderkey replaces
# two lineitem×lineitem joins, which is the scale-correct plan shape.


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_1'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # per-order supplier stats: EXISTS(other supplier) == n_supp > 1,
    # NOT EXISTS(other supplier with R) == n_supp_r = 1 (l1 is R itself).
    # Spelled as a two-level aggregate instead of two countDistinct:
    # the multi-distinct Expand rewrite assigns gid branches in a
    # nondeterministic order across sessions (flaky frozen-plan
    # snapshot), and the Expand doubles pre-shuffle row volume anyway.
    stats = (
        li.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r"))
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum("has_r").alias("n_supp_r"),
        )
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(stats.filter((F.col("n_supp") > 1) & (F.col("n_supp_r") == 1)), "l_orderkey")
        .join(orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        # broadcast-ok: supplier dim (bounded per SF contract) + 25-row nation
        .join(F.broadcast(
            supp.join(F.broadcast(nation.filter(F.col("n_name") == "NATION_1")),  # broadcast-ok: nation is a fixed 25-row dimension
                      supp.s_nationkey == nation.n_nationkey)
            .select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )
