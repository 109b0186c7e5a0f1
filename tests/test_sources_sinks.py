from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from stream_spark.sources import load_table
from stream_spark.sources.sinks import write_table

SCRATCH = "/root/repo/.scratch/sinks"


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_partitioned_parquet_roundtrip_and_pruning(spark, events):
    path = f"{SCRATCH}/events_by_type"
    shutil.rmtree(path, ignore_errors=True)
    write_table(events, path, partition_by=["event_type"])
    back = spark.read.parquet(path)
    assert back.count() == events.count()
    # partition pruning: filtering on the partition column must hit
    # only that directory (PartitionFilters in the scan)
    plan = back.filter(F.col("event_type") == "click")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan


def test_csv_roundtrip(spark, events):
    path = f"{SCRATCH}/events_csv"
    shutil.rmtree(path, ignore_errors=True)
    write_table(events.select("event_id", "user_id", "event_type", "value"), path, fmt="csv")
    back = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    assert back.count() == events.count()
    s = {r["event_id"]: r["value"] for r in back.collect()}
    e = {r["event_id"]: r["value"] for r in events.collect()}
    assert s == e


def test_json_roundtrip(spark, events):
    path = f"{SCRATCH}/events_json"
    shutil.rmtree(path, ignore_errors=True)
    write_table(events.select("event_id", "event_type"), path, fmt="json")
    back = spark.read.json(path)
    assert back.count() == events.count()


def test_rate_stream_paces_rows(spark, events):
    from stream_spark.streaming.sources import rate_stream

    stream = rate_stream(spark, events.limit(50), ["ts", "event_id"], rows_per_second=500)
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_test")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("rate_test").count() >= 50:
                break
            time.sleep(1)
        assert spark.table("rate_test").count() == 50  # full dataset replayed
    finally:
        q.stop()
