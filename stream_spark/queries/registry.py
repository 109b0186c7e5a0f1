from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a query under ``name``; ``oracle`` is equivalent DuckDB
    SQL (omit for non-SQL-expressible ops → weaker rows-only check).

    Every query runs with the session timezone pinned to UTC and
    parquet timestamp-NTZ inference on, so timestamp semantics match
    the (naive-timestamp) DuckDB oracle regardless of how the caller
    configured its SparkSession.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
