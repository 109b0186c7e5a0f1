"""Text-format source parity (SURVEY §2 D): the CSV/JSON ingestion
path under the oracle gate.

The reference's streamtester plays CSV datasets into the pipeline
(trigger/streamtester/dataset.go); here a table is staged to CSV/JSON
and read back through ``load_table(fmt=...)`` with the original
schema, then aggregated — the DuckDB oracle runs on the parquet views,
so a green row proves the text round-trip (types, µs timestamps,
double formatting) is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.queries.registry import register
from stream_spark.sources import stage_table_as

_SCRATCH = "/root/repo/.scratch/sources"
_DSUM = "CAST(SUM(CAST({col} AS DECIMAL(18,4))) AS DOUBLE)"


@register(
    "source_csv_events_agg",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {_DSUM.format(col='value')} AS total_value,
           MAX(epoch_ms(ts)) AS max_ts_ms
    FROM events GROUP BY event_type
    """,
)
def source_csv_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stage_table_as(spark, sf_dir, "events", "csv", f"{_SCRATCH}/csv")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        F.max(F.unix_millis(F.col("ts").cast("timestamp"))).alias("max_ts_ms"),
    )


@register(
    "source_json_orders_agg",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {_DSUM.format(col='o_totalprice')} AS total_price,
           MAX(epoch_ms(o_orderdate)) AS max_date_ms
    FROM orders GROUP BY o_orderpriority
    """,
)
def source_json_orders_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = stage_table_as(spark, sf_dir, "orders", "json", f"{_SCRATCH}/json")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total_price"),
        F.max(F.unix_millis(F.col("o_orderdate").cast("timestamp"))).alias("max_date_ms"),
    )


@register(
    "source_orc_lineitem_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {_DSUM.format(col='l_quantity')} AS sum_qty,
           {_DSUM.format(col='l_extendedprice')} AS sum_price,
           MAX(epoch_ms(l_shipdate)) AS max_ship_ms
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def source_orc_lineitem_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingestion parity: lineitem staged to ORC (Spark-native
    columnar alternative), read back, aggregated — the oracle runs on
    the parquet views, so green = lossless columnar round trip
    including µs timestamps."""
    li = stage_table_as(spark, sf_dir, "lineitem", "orc", f"{_SCRATCH}/orc")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("sum_price"),
        F.max(F.unix_millis(F.col("l_shipdate").cast("timestamp"))).alias("max_ship_ms"),
    )
