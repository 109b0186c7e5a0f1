"""Streaming sources.

The reference's trigger/streamtester (dataset.go + emitter.go) replays
a recorded dataset into the pipeline at a controlled pace for testing.
Spark equivalents:

- ``file_replay_stream``: stage a batch table as parquet and readStream
  it — with ``maxFilesPerTrigger`` each micro-batch consumes one file
  slice, which is the batch-replay semantics.
- ``paced_replay_stream``: stage one file per emit tick in a pinned
  order; paired with a ``processingTime`` trigger this is emitter.go's
  paced Run loop (one data point per EmitDelay tick).
- ``rate_stream``: the built-in rate source joined to an indexed batch
  table — paced emission (rows_per_second), the emitter.go analog.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_replay_stream(
    spark: SparkSession,
    df: DataFrame,
    stage_dir: str,
    n_slices: int = 4,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Stage ``df`` into ``stage_dir`` as ``n_slices`` parquet files and
    return a streaming DataFrame replaying them slice-by-slice."""
    df.repartition(n_slices).write.mode("overwrite").parquet(stage_dir)
    reader = spark.readStream.schema(df.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(stage_dir)


def ordered_replay_stream(
    spark: SparkSession,
    df: DataFrame,
    stage_dir: str,
    order_cols: list[str],
    n_slices: int = 4,
    writer_options: dict | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Stage ``df`` as ``n_slices`` parquet files, each a CONTIGUOUS
    range of ``order_cols``, replayed one file per micro-batch in key
    order — the replay shape arrival-order (count-window) operators
    need for multi-batch runs: slice k's rows all precede slice k+1's
    in the global order, so the cross-batch fold sees the same sequence
    the batch operator sorts out.

    ``repartitionByRange`` makes partition i the i-th key range (a
    distributed write — nothing is collected); file mtimes are then set
    strictly increasing by partition index because the file source
    processes oldest-first under ``maxFilesPerTrigger=1``.

    ``writer_options``: extra parquet writer options for the staged
    files — e.g. a small ``parquet.block.size`` makes each slice
    row-group-splittable, so a CPU-heavy per-row projection downstream
    (minhash signatures) parallelizes inside the SCAN stage of each
    micro-batch instead of needing its own repartition exchange.

    ``max_files_per_trigger``: slices per micro-batch. Order semantics
    survive any value — the file source still takes files OLDEST
    FIRST, so each batch is a set of CONSECUTIVE slices and every
    cross-batch boundary stays a key-order boundary; arrival-order
    folds resolve WITHIN-batch order by id already. Fewer, larger
    triggers amortize the per-trigger fixed cost (planning, offset/
    commit log, state-store commit) — the dominant term when a small
    corpus replays through many micro-batches.
    """
    import glob
    import time

    writer = (
        df.repartitionByRange(n_slices, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
    )
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(stage_dir)
    files = sorted(glob.glob(f"{stage_dir}/part-*.parquet"))
    base = time.time() - len(files) - 60
    for i, f in enumerate(files):
        os.utime(f, (base + i, base + i))
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage_dir)
    )


def paced_replay_stream(
    spark: SparkSession,
    df: DataFrame,
    stage_dir: str,
    order_cols: list[str],
    rows_per_tick: int = 1,
) -> DataFrame:
    """Paced replay with a pinned emission order, mirroring
    trigger/streamtester/emitter.go: the emitter releases one data
    point per EmitDelay tick, in dataset order. Here each tick is one
    staged parquet file of ``rows_per_tick`` rows; ``maxFilesPerTrigger
    = 1`` plus a ``processingTime`` trigger on the write side gives one
    file per interval. File mtimes are set strictly increasing so the
    file-stream source replays them in dataset order.

    Like the reference's DataSet (dataset.go loads the whole test file
    into memory), the dataset is collected to the driver for staging —
    this is a TEST-harness source for cadence-sensitive replay, not a
    production-scale reader (use ``file_replay_stream`` for that).
    """
    import pyarrow.parquet as pq

    tbl = df.orderBy(*order_cols).toArrow()
    os.makedirs(stage_dir, exist_ok=True)
    n_files = max(1, math.ceil(tbl.num_rows / rows_per_tick))
    base = 1_000_000_000  # epoch seconds; any fixed past instant works
    for i in range(n_files):
        path = f"{stage_dir}/tick-{i:06d}.parquet"
        pq.write_table(tbl.slice(i * rows_per_tick, rows_per_tick), path)
        os.utime(path, (base + i, base + i))
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(stage_dir)
    )


def rate_stream(spark: SparkSession, df: DataFrame, order_cols: list[str], rows_per_second: int = 100) -> DataFrame:
    """Paced replay: rate-source ticks joined to row-numbered batch data.

    The rate source emits (timestamp, value=0,1,2,...); joining on the
    batch row number releases one recorded row per tick — emitter.go's
    pacing, expressed as a stream-static join (no custom receiver)."""
    from stream_spark.operators.rownum import with_global_row_number

    indexed = with_global_row_number(df, order_cols, out="_idx")
    ticks = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return ticks.join(indexed, ticks["value"] == indexed["_idx"] - 1).drop("timestamp", "value", "_idx")
