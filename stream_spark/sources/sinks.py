"""Batch sinks.

Parquet (optionally hive-partitioned — the layout that enables
partition pruning downstream), CSV, and JSON. At 100 TB, choose the
partition columns to match downstream filters (e.g. a date column) and
keep per-file sizes near the scan split size via a pre-write
repartition on the partition columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    coalesce_to_partitions: bool = True,
) -> None:
    if partition_by and coalesce_to_partitions:
        # co-locate each output partition's rows → one file per value
        # instead of (input partitions × values) shards
        df = df.repartition(*[F.col(c) for c in partition_by])
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported sink format: {fmt}")
