"""Kafka source/sink wrappers (structured-streaming's canonical bus).

The reference ingests events via Flogo triggers; the Spark-native
equivalent of a production event bus is the Kafka connector
(``spark-sql-kafka-0-10``). This container ships neither the
connector jar nor a broker, so the wrappers here are split honestly:

- pure plan/payload construction (``kafka_options``,
  ``frame_for_kafka``, ``parse_kafka_value``) — fully unit-tested on
  batch frames;
- stream start (``kafka_source`` / ``kafka_sink``) — attempts the
  real ``format("kafka")`` load and converts the missing-data-source
  failure into a clear NotImplementedError naming the package to add.

At scale the framing choices matter more than the wiring: the value
payload is JSON of only the requested columns (schema travels in the
pipeline, not the bus), the key column controls partition affinity
(same key → same Kafka partition → per-key ordering guarantees), and
a checkpoint location is mandatory for exactly-once sink semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13"


def kafka_options(
    bootstrap_servers: str,
    subscribe: str | None = None,
    topic: str | None = None,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """The option map for readStream/writeStream.format("kafka")."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    if subscribe is not None:
        opts["subscribe"] = subscribe
        opts["startingOffsets"] = starting_offsets
        opts["failOnDataLoss"] = "true" if fail_on_data_loss else "false"
    if topic is not None:
        opts["topic"] = topic
    opts.update(extra or {})
    return opts


def frame_for_kafka(
    df: DataFrame, key_col: str | None, value_cols: Sequence[str]
) -> DataFrame:
    """Project a frame into Kafka's (key, value) wire shape: value =
    JSON object of ``value_cols``, key = ``key_col`` cast to string
    (partition-affinity handle) or NULL for round-robin."""
    value = F.to_json(F.struct(*[F.col(c) for c in value_cols])).alias("value")
    key = (
        F.col(key_col).cast("string").alias("key")
        if key_col
        else F.lit(None).cast("string").alias("key")
    )
    return df.select(key, value)


def parse_kafka_value(raw: DataFrame, schema: str) -> DataFrame:
    """Decode the Kafka wire shape back to typed columns: value bytes →
    JSON → ``schema`` fields, keeping event metadata (key, topic,
    partition, offset, timestamp) when present."""
    meta = [c for c in ("key", "topic", "partition", "offset", "timestamp") if c in raw.columns]
    parsed = raw.withColumn("_v", F.from_json(F.col("value").cast("string"), schema))
    return parsed.select(*meta, "_v.*")


def _missing_kafka(exc: Exception) -> NotImplementedError:
    return NotImplementedError(
        "the Kafka connector is not on the classpath in this environment; "
        f"launch Spark with --packages {KAFKA_PACKAGE} (and a reachable "
        "broker) to use kafka_source/kafka_sink"
    )


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe: str,
    schema: str | None = None,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """readStream from a topic; with ``schema`` the JSON value payload
    is decoded to typed columns."""
    reader = spark.readStream.format("kafka").options(
        **kafka_options(bootstrap_servers, subscribe=subscribe, starting_offsets=starting_offsets)
    )
    try:
        raw = reader.load()
    except Exception as exc:  # missing data source surfaces at load()
        raise _missing_kafka(exc) from exc
    return parse_kafka_value(raw, schema) if schema else raw


def kafka_sink(
    result: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str | None = None,
    value_cols: Sequence[str] | None = None,
    output_mode: str = "append",
):
    """writeStream to a topic; returns the started StreamingQuery.

    ``checkpoint_dir`` is required — it is what makes the sink
    exactly-once (offsets + sink epochs recorded per micro-batch).
    """
    framed = frame_for_kafka(result, key_col, value_cols or result.columns)
    writer = (
        framed.writeStream.format("kafka")
        .options(**kafka_options(bootstrap_servers, topic=topic))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
    )
    try:
        return writer.start()
    except Exception as exc:
        raise _missing_kafka(exc) from exc
