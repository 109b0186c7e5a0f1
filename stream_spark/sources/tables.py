"""Batch sources: the driver-generated parquet star schema.

Parquet is the primary source (columnar, predicate-pushdown friendly).
CSV/JSON loaders share the same entry point so pipelines are
format-agnostic — the reference's trigger/streamtester (dataset.go)
plays a CSV dataset into the pipeline; here any format lands in the
same DataFrame shape.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pyarrow.types as patypes
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to always broadcast in joins.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def _read_parquet_ns_safe(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet whose timestamps may be TIMESTAMP(NANOS).

    Spark has no nanosecond timestamp type and rejects such files
    unless nanos are surfaced as longs; we convert those columns back
    to real timestamps via integer division (ns epoch values exceed
    double precision, so `DIV`, never `/`). DuckDB truncates ns→µs the
    same way, keeping oracle parity exact.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    schema = pq.read_schema(path)
    for field in schema:
        if patypes.is_timestamp(field.type) and field.type.unit == "ns":
            df = df.withColumn(
                field.name,
                F.expr(f"timestamp_micros(CAST(`{field.name}` DIV 1000 AS BIGINT))"),
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str, fmt: str = "parquet") -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.{ 'parquet' if fmt == 'parquet' else fmt}")
    if fmt == "parquet":
        return _read_parquet_ns_safe(spark, path)
    if fmt == "csv":
        return spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    if fmt == "json":
        return spark.read.json(path)
    raise ValueError(f"unsupported format: {fmt}")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
