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


def test_kafka_options_and_framing(spark):
    from pyspark.sql import functions as F
    from stream_spark.streaming.kafka import (
        frame_for_kafka,
        kafka_options,
        parse_kafka_value,
    )

    opts = kafka_options("b:9092", subscribe="t1", starting_offsets="latest")
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "t1",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
    }
    assert kafka_options("b:9092", topic="out")["topic"] == "out"

    df = spark.createDataFrame([(1, "click", 2.5)], "id long, et string, v double")
    framed = frame_for_kafka(df, "et", ["id", "v"])
    row = framed.collect()[0]
    assert row["key"] == "click"
    assert row["value"] == '{"id":1,"v":2.5}'

    # wire-shape round trip: value JSON → typed columns
    back = parse_kafka_value(framed, "id long, v double").collect()[0]
    assert back["id"] == 1 and back["v"] == 2.5 and back["key"] == "click"


def test_kafka_source_unavailable_is_clear(spark, tmp_path):
    import pytest
    from stream_spark.streaming.kafka import kafka_sink, kafka_source

    with pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        kafka_source(spark, "b:9092", "t1")

    df = spark.createDataFrame([(1,)], "id long")
    # a memory-stream stand-in isn't needed: the writer fails at start()
    from stream_spark.streaming import file_replay_stream

    stream = file_replay_stream(spark, df, str(tmp_path / "kf"), n_slices=1)
    with pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        kafka_sink(stream, "b:9092", "out", str(tmp_path / "ckpt"))


def test_orc_round_trip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC staging must round-trip values and keep predicate pushdown:
    a filter on the ORC scan shows up as PushedFilters in the plan."""
    from pyspark.sql import functions as F
    from stream_spark.sources import load_table, stage_table_as

    li = load_table(spark, sf_dir, "lineitem")
    back = stage_table_as(spark, sf_dir, "lineitem", "orc", str(tmp_path / "orc"))
    assert back.count() == li.count()
    a = li.agg(F.sum(F.col("l_quantity").cast("decimal(18,4)"))).collect()[0][0]
    b = back.agg(F.sum(F.col("l_quantity").cast("decimal(18,4)"))).collect()[0][0]
    assert a == b

    plan = (
        back.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "l_returnflag" in plan
