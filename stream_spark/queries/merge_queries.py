"""Table-maintenance queries: MERGE INTO / upsert under the oracle
gate.

The reference engine is stream-only; a training-data lakehouse also
maintains its tables. ``merge_upsert`` covers all three MERGE
branches in one plan (update, insert, delete); the partition-scoped
parquet rewrite is pytest-covered (tests/test_merge.py) since a sink
isn't a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.operators.merge import merge_upsert
from stream_spark.queries.registry import register
from stream_spark.sources import load_table


@register(
    "orders_merge_upsert",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 7 <> 0
    ), u AS (
        SELECT o_orderkey, 'U' AS o_orderstatus,
               o_totalprice + 10.0 AS o_totalprice,
               o_orderpriority, (o_orderkey % 15 = 0) AS del
        FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT COALESCE(u.o_orderkey, t.o_orderkey) AS o_orderkey,
           COALESCE(u.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice,
           COALESCE(u.o_orderpriority, t.o_orderpriority) AS o_orderpriority
    FROM t FULL OUTER JOIN u ON t.o_orderkey = u.o_orderkey
    WHERE NOT COALESCE(u.del, FALSE)
    """,
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style MERGE INTO, all three branches at once: a change set
    (keys %3) that UPDATES rows present in the target (keys %7≠0),
    INSERTS the ones that aren't, and DELETES keys %15. The oracle is
    the textbook full-outer-join spelling; the Spark plan is the
    algebraic max-of-struct aggregate (one shuffle carrying one row
    per key) from operators/merge.py."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    target = orders.filter(F.col("o_orderkey") % 7 != 0).select(*cols)
    updates = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
        "o_orderpriority",
        (F.col("o_orderkey") % 15 == 0).alias("_deleted"),
    )
    return merge_upsert(target, updates, ["o_orderkey"], delete_col="_deleted")


@register(
    "events_value_percentile_sampled",
    oracle="""
    WITH s AS (
        SELECT event_type, value, event_id
        FROM events
        WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 10000 < 2000
    ), r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM s
    )
    SELECT event_type,
           MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS p50,
           MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN value END) AS p90,
           MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS p99
    FROM r GROUP BY event_type
    """,
)
def events_value_percentile_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-but-deterministic quantiles: exact PERCENTILE_DISC
    over a 20% hash-of-id sample (operators/sketches.sampled_quantiles).
    Rank error is statistical; the VALUE is a pure function of the
    data, so unlike GK/t-digest it hash-matches across engines."""
    from stream_spark.operators.sketches import sampled_quantiles

    ev = load_table(spark, sf_dir, "events")
    return sampled_quantiles(
        ev, "value", "event_id", 0.2, (0.5, 0.9, 0.99), group_by=["event_type"]
    )
