"""Scale-safe global row numbering.

The reference's count-based windows (windows.go:56 TumblingWindow,
windows.go:226 SlidingWindow) are defined over *arrival order*. In
batch we realize arrival order as a total order over sort columns
(e.g. ``(ts, event_id)``) and need a global row number.

``row_number() OVER (ORDER BY ...)`` collapses to ONE partition — fine
at 60k rows, fatal at 100 TB. Instead, two-pass partition-offset
numbering:

1. ``repartitionByRange`` on the order columns → partitions hold
   contiguous, sorted ranges. The partition COUNT is sized from the
   input data (``sized_partitions``: optimized-plan bytes / ~128 MB,
   floored at defaultParallelism) — a data-independent constant would
   leave each range partition at data/N bytes, unbounded at 100 TB.
2. Count rows per partition (cheap scan), compute cumulative offsets
   on the driver (one tiny array — #partitions entries).
3. Local ``row_number`` within each range partition + broadcast-joined
   offset ⇒ global rn with no single-partition stage. The widest
   window group is one range partition, bounded, so this survives
   1000× data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: ~128 MB per range partition — the same budget maxPartitionBytes
#: gives scan splits, applied to the explicit exchange.
TARGET_PARTITION_BYTES = 128 << 20
#: ceiling on the explicit range-partition count (at 100 TB / 128 MB
#: the uncapped count is ~800k tasks; past ~128k the scheduler, not
#: the data, is the bottleneck — beyond that let partitions grow).
MAX_RANGE_PARTITIONS = 131_072


def sized_partitions(df: DataFrame, target_bytes: int = TARGET_PARTITION_BYTES) -> int:
    """Range-partition count sized by the INPUT DATA, not a constant.

    ``defaultParallelism`` alone is wrong at scale: an N-way range
    exchange slices data/N per partition REGARDLESS of volume (the
    maxPartitionBytes budget bounds scan splits, not explicit
    exchanges), so the pass-2 local sort+window would grow unboundedly
    with the corpus. Size from Catalyst's optimized-plan sizeInBytes
    (file-based for scans, propagated for derived frames), targeting
    ~``target_bytes`` per partition, floored at defaultParallelism
    (never UNDER-parallelize small inputs) and capped at
    ``MAX_RANGE_PARTITIONS`` (Catalyst returns a Long.MaxValue-ish
    sentinel when it knows nothing — the cap keeps the exchange sane).
    """
    spark = df.sparkSession
    floor = spark.sparkContext.defaultParallelism
    # Size from the SUM OF LEAF relations, never the whole-plan
    # estimate: Catalyst's derived-plan sizeInBytes multiplies join
    # cardinalities into garbage-large numbers (a joined+aggregated
    # frame at sf1 estimated thousands of range partitions and turned
    # documents_dsir_selection 38x super-linear — 382 s of empty-task
    # scheduling), and returns a Long.MaxValue sentinel for plans it
    # cannot estimate at all (LogicalRDD from localCheckpoint — which
    # once turned a 2k-row frame into a 131072-partition exchange).
    # Leaf stats are file-based and reliable; the leaf sum is monotone
    # in corpus volume, which is the property the partition count
    # needs. Sentinel/unknown leaves are skipped; all-unknown → floor.
    # The usable size is min(whole-plan estimate, leaf sum): aggregates
    # legitimately SHRINK the whole-plan estimate below the leaf sum (a
    # daily rollup of a 30 TB fact is a few thousand rows — it must not
    # inherit the fact table's partition count), while join inflation
    # only ever pushes the whole-plan estimate ABOVE the leaf sum,
    # where the leaf sum wins.
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        leaves = plan.collectLeaves()
        leaf_sum = 0
        for i in range(leaves.size()):
            s = int(leaves.apply(i).stats().sizeInBytes())
            if 0 < s < (1 << 60):
                leaf_sum += s
        whole = int(plan.stats().sizeInBytes())
        candidates = [v for v in (leaf_sum, whole) if 0 < v < (1 << 60)]
    except Exception:  # pragma: no cover — py4j/connect variance
        return floor
    if not candidates:
        return floor
    size = min(candidates)
    want = -(-size // max(1, target_bytes))  # ceil
    return int(min(MAX_RANGE_PARTITIONS, max(floor, want)))


#: CPU-heavy explode/UDF stages spread best at ~32 MB/partition: the
#: downstream per-byte cost (tokenize + n-gram explode + hash, or a
#:  matmul batch) is several times a plain scan's, so partitions sized
#: for scanning run minutes-long tasks.
CPU_TARGET_PARTITION_BYTES = 32 << 20


def cpu_partitions(df: DataFrame) -> int:
    """Partition count for the explicit hash exchange ahead of a
    CPU-heavy explode or Arrow UDF (the CLAUDE.md scale rule: AQE
    coalesces small shuffles by BYTES, blind to downstream CPU).
    Data-sized like ``sized_partitions`` but targeting ~32 MB — at test
    SF this returns defaultParallelism exactly as the old constant did
    (plans unchanged), at 100 TB it scales with the corpus instead of
    collapsing the scan's parallelism to the core count."""
    return sized_partitions(df, CPU_TARGET_PARTITION_BYTES)


def with_global_row_number(df: DataFrame, order_cols: list[str], out: str = "rn") -> DataFrame:
    spark = df.sparkSession
    # Both the counts job and the row-number job must see the SAME
    # partition layout or the offsets are garbage. Two pins:
    # an explicit numPartitions (user-specified counts are exempt from
    # AQE coalescing), and an EAGER localCheckpoint so the second job
    # reuses the materialized partitions instead of re-running the
    # (sampled) range exchange. localCheckpoint, not persist():
    # persist() pins the dataset in the CacheManager until someone
    # calls unpersist — which no caller of a returned DataFrame ever
    # can at the right time — while checkpoint blocks are reference-
    # counted by the ContextCleaner and freed as soon as the result
    # DataFrame is garbage-collected (tests/test_operators_misc.py
    # asserts the release).
    n_parts = sized_partitions(df)
    ranged = df.repartitionByRange(n_parts, *order_cols).sortWithinPartitions(*order_cols)
    ranged = ranged.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)

    counts = ranged.groupBy("_pid").count().collect()
    cum = 0
    offsets = []
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], cum))
        cum += row["count"]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")

    local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.withColumn("_lrn", F.row_number().over(local))
        # broadcast-ok: off_df is one row per partition (bounded metadata)
        .join(F.broadcast(off_df), "_pid")
        .withColumn(out, (F.col("_lrn") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def with_global_cumsum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    out: str = "cumsum",
    value_cast: str = "long",
) -> DataFrame:
    """Global prefix sum over a total order — same two-pass
    partition-offset design as ``with_global_row_number`` (per-range
    partial sums → driver-side cumulative offsets → local window sum +
    broadcast offset), so no single-partition stage at any scale.

    ``value_cast`` must make addition exact (integral ``long`` or a
    DECIMAL type); Python accumulates the per-partition partials in
    int/Decimal, which is exact either way. ``out`` is the INCLUSIVE
    prefix sum; subtract the row's value for the exclusive form.
    """
    spark = df.sparkSession
    n_parts = sized_partitions(df)
    ranged = df.repartitionByRange(n_parts, *order_cols).sortWithinPartitions(*order_cols)
    # eager localCheckpoint for the same two reasons as
    # with_global_row_number: layout consistency across the two jobs,
    # and ContextCleaner-managed release instead of a CacheManager pin
    ranged = ranged.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_v", F.col(value_col).cast(value_cast)
    ).localCheckpoint(eager=True)

    partials = ranged.groupBy("_pid").agg(F.sum("_v").alias("s")).collect()
    cum = 0
    offsets = []
    for row in sorted(partials, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], cum))
        cum += row["s"] or 0
    off_df = spark.createDataFrame(
        [(int(p), o) for p, o in offsets] or [(0, 0)], f"_pid int, _off {value_cast}"
    )

    local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_lcs", F.sum("_v").over(local))
        # broadcast-ok: off_df is one row per partition (bounded metadata)
        .join(F.broadcast(off_df), "_pid")
        .withColumn(out, (F.col("_lcs") + F.col("_off")).cast(value_cast))
        .drop("_pid", "_lrn", "_lcs", "_off", "_v")
    )


def with_global_cummax(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    out: str = "cummax",
    value_cast: str = "long",
) -> DataFrame:
    """Global running MAX over a total order — the prefix-max sibling
    of ``with_global_cumsum`` (per-range partial maxima → driver-side
    exclusive prefix maxima → local window max combined with
    ``greatest``), so no single-partition stage at any scale. The
    partition-0 offset is NULL; ``greatest`` skips nulls, so the first
    range's running max is purely local. ``out`` is the INCLUSIVE
    running max.
    """
    spark = df.sparkSession
    n_parts = sized_partitions(df)
    ranged = df.repartitionByRange(n_parts, *order_cols).sortWithinPartitions(*order_cols)
    # eager localCheckpoint for the same two reasons as
    # with_global_row_number: layout consistency across the two jobs,
    # and ContextCleaner-managed release instead of a CacheManager pin
    ranged = ranged.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_v", F.col(value_col).cast(value_cast)
    ).localCheckpoint(eager=True)

    partials = ranged.groupBy("_pid").agg(F.max("_v").alias("m")).collect()
    best = None
    offsets = []
    for row in sorted(partials, key=lambda r: r["_pid"]):
        offsets.append((int(row["_pid"]), best))  # EXCLUSIVE prefix max
        if row["m"] is not None:
            best = row["m"] if best is None else max(best, row["m"])
    off_df = spark.createDataFrame(offsets or [(0, None)], f"_pid int, _off {value_cast}")

    local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_lcm", F.max("_v").over(local))
        # broadcast-ok: off_df is one row per partition (bounded metadata)
        .join(F.broadcast(off_df), "_pid")
        .withColumn(out, F.greatest(F.col("_lcm"), F.col("_off")).cast(value_cast))
        .drop("_pid", "_lcm", "_off", "_v")
    )
