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


def _ranged_pid(df: DataFrame, order_cols: list[str], n_parts: int) -> DataFrame:
    """Range-partition + partition-sort ``df`` on the total order,
    stamp each row's physical partition id, and pin the layout with a
    LAZY localCheckpoint.

    Layout-consistency contract: the offsets subtree and the main
    subtree both consume this frame and MUST see the same range
    boundaries — range SAMPLING is seeded per RDD id, so two
    independent executions of the exchange can pick different
    boundaries. Exchange reuse canonicalization is NOT a safe pin:
    column pruning gives the two consumers different exchange children
    (the offsets side drops the payload columns), reuse silently
    fails, and every window straddling a boundary miscounts — observed
    r10 before this spelling, caught by the oracle gate. A lazy
    localCheckpoint pins it structurally: both subtrees reference ONE
    RDD, materialized once and read from cache by every consumer.
    eager=False (r10; was eager=True) defers the cache write (under
    AQE the checkpoint's toRdd still materializes the exchange stages
    at construction — the part that no longer runs eagerly is the
    blockwise caching job and, vs the old design, the O(n_parts)
    driver collect). localCheckpoint, not persist(): checkpoint blocks are
    reference-counted by the ContextCleaner and freed when the result
    DataFrame is garbage-collected (pytest-asserted), while persist()
    pins the CacheManager until an unpersist no caller can place."""
    # _pid and the 1-based local row number both come from ONE
    # monotonically_increasing_id projection evaluated on the sorted
    # partition iterator (upper bits = partition id, lower 33 bits =
    # consecutive record number — a partition would need 2^33 rows to
    # overflow, 3 orders of magnitude past the 128 MB target): no
    # WindowExec, no extra hashpartitioning(_pid) exchange, no
    # per-consumer re-sort — the plan above the checkpoint is pure
    # projection.
    return (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        # one _mid column, derived twice: the expression is
        # nondeterministic (per-partition row counter), so it must be
        # evaluated exactly once per row, never duplicated per use
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned(F.col("_mid"), 33).cast("int"))
        .withColumn("_lrn", F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1)
        .drop("_mid")
        .localCheckpoint(eager=False)
    )


def _exclusive_prefix_offsets(per_pid: DataFrame, n_parts: int, agg: str) -> DataFrame:
    """(._pid, ._val) → (_pid, _off): the EXCLUSIVE prefix (sum | max)
    over partition ids, entirely IN-PLAN — no driver collect, no
    materialization barrier (r10; this replaced the two-job
    collect+checkpoint design, which forced the whole range
    exchange+sort to run at DataFrame-construction time).

    Scale shape: a flat "fan every pid to all later pids" explode is
    O(n_parts²) rows — 8.6e9 at the 131 072-partition cap — so the
    prefix decomposes over √n blocks (Blelloch two-level scan): each
    pid contributes to the later pids INSIDE its block, each block
    total contributes to every pid of LATER blocks; both fan-outs are
    ≤ n_parts^1.5/2 rows (~24M at the cap, trivial next to the data),
    one union + one keyed aggregate, no window, no single-partition
    stage. Missing pids (no contributions) are left-join gaps the
    callers coalesce/greatest away."""
    import math

    agg_fn = F.sum if agg == "sum" else F.max
    B = max(1, math.isqrt(max(1, n_parts)))
    last = n_parts - 1
    pid = F.col("_pid")
    blk_end = F.expr(f"least({last}, (_pid DIV {B}) * {B} + {B - 1})")
    intra_to = F.when(
        pid + 1 <= blk_end, F.sequence((pid + 1).cast("int"), blk_end.cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    intra = per_pid.select(F.explode(intra_to).alias("_pid"), F.col("_val").alias("_c"))
    btot = (
        per_pid.groupBy(F.expr(f"_pid DIV {B}").alias("_blk"))
        .agg(agg_fn(F.col("_val")).alias("_c"))
    )
    nxt = (F.col("_blk") + 1) * B
    bto = F.when(
        nxt <= F.lit(last), F.sequence(nxt.cast("int"), F.lit(last).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    bfan = btot.select(F.explode(bto).alias("_pid"), "_c")
    return intra.unionByName(bfan).groupBy("_pid").agg(agg_fn(F.col("_c")).alias("_off"))


def with_global_row_number(df: DataFrame, order_cols: list[str], out: str = "rn") -> DataFrame:
    """Global row number over a total order with NO global sort, NO
    driver barrier, and (r10) NO eager work at construction: one lazy
    plan — the range layout pinned by a lazy checkpoint (materialized
    once at the first action, read by every consumer), per-partition
    local row numbers, plus the in-plan exclusive prefix of
    per-partition counts broadcast back onto the id (the old design
    collect()ed the counts to the driver, which both forced the whole
    exchange+sort to run at construction time and put an O(n_parts)
    driver round trip on the path). See ``_ranged_pid`` for the
    layout-consistency contract and ``_exclusive_prefix_offsets`` for
    the scan shape."""
    n_parts = sized_partitions(df)
    ranged = _ranged_pid(df, order_cols, n_parts)
    per_pid = ranged.groupBy("_pid").agg(F.count("*").cast("long").alias("_val"))
    offs = _exclusive_prefix_offsets(per_pid, n_parts, "sum")
    return (
        # broadcast-ok: offs is at most one row per partition (bounded metadata)
        ranged.join(F.broadcast(offs), "_pid", "left")
        .withColumn(out, (F.col("_lrn") + F.coalesce(F.col("_off"), F.lit(0))).cast("long"))
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
    DECIMAL type — the in-plan prefix aggregates in that type, so the
    sum is exact either way). ``out`` is the INCLUSIVE prefix sum;
    subtract the row's value for the exclusive form.
    """
    n_parts = sized_partitions(df)
    ranged = _ranged_pid(df, order_cols, n_parts).withColumn(
        "_v", F.col(value_col).cast(value_cast)
    )
    per_pid = ranged.groupBy("_pid").agg(F.sum("_v").cast(value_cast).alias("_val"))
    offs = _exclusive_prefix_offsets(per_pid, n_parts, "sum")

    local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_lcs", F.sum("_v").over(local))
        # broadcast-ok: offs is at most one row per partition (bounded metadata)
        .join(F.broadcast(offs), "_pid", "left")
        .withColumn(
            out,
            (F.col("_lcs") + F.coalesce(F.col("_off"), F.lit(0).cast(value_cast))).cast(value_cast),
        )
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
    of ``with_global_cumsum`` (per-range partial maxima → in-plan
    exclusive prefix maxima → local window max combined with
    ``greatest``), so no single-partition stage at any scale. A
    partition with no earlier contributions gets a NULL offset via the
    left join; ``greatest`` skips nulls, so the first range's running
    max is purely local. ``out`` is the INCLUSIVE running max.
    """
    n_parts = sized_partitions(df)
    ranged = _ranged_pid(df, order_cols, n_parts).withColumn(
        "_v", F.col(value_col).cast(value_cast)
    )
    per_pid = ranged.groupBy("_pid").agg(F.max("_v").alias("_val"))
    offs = _exclusive_prefix_offsets(per_pid, n_parts, "max")

    local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_lcm", F.max("_v").over(local))
        # broadcast-ok: offs is at most one row per partition (bounded metadata)
        .join(F.broadcast(offs), "_pid", "left")
        .withColumn(out, F.greatest(F.col("_lcm"), F.col("_off")).cast(value_cast))
        .drop("_pid", "_lrn", "_lcm", "_off", "_v")
    )
