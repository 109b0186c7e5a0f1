"""Scale-safe global row numbering.

The reference's count-based windows (windows.go:56 TumblingWindow,
windows.go:226 SlidingWindow) are defined over *arrival order*. In
batch we realize arrival order as a total order over sort columns
(e.g. ``(ts, event_id)``) and need a global row number.

``row_number() OVER (ORDER BY ...)`` collapses to ONE partition — fine
at 60k rows, fatal at 100 TB. Instead, two-pass partition-offset
numbering: assign each row a range-bucket id ``_pid`` that is monotone
in the sort key, number rows locally within each bucket, and add the
exclusive prefix of per-bucket totals — no single-partition stage at
any scale.

Two layouts produce ``_pid`` (r11):

- **boundary layout** (scan-rooted input + orderable-numeric first
  key — the common case): ``_pid`` is a DETERMINISTIC EXPRESSION of
  the row's own key, bucketed against approx-quantile boundaries
  collected once at construction (one tiny pruned-scan job; the
  boundaries become plan literals). Because the id depends only on
  DATA, the per-bucket totals can also be collected at construction
  (a second pruned-scan job — bounded metadata, ≤ n_parts values) and
  the exclusive prefix offsets embedded as ONE array literal: the
  final plan is a single linear ``scan → bucket-id project → hash
  exchange → keyed window → project`` — no checkpoint/cache write of
  the full frame, no offsets subtree, no broadcast join, and scan
  pruning/pushdown stay intact. At 100 TB this replaces a full-width
  cache write with two extra single-column scans.
- **sampled-range layout** (fallback: derived/expensive upstream
  plans, or non-numeric first keys): ``repartitionByRange`` +
  ``sortWithinPartitions``, pinned by a lazy ``localCheckpoint``, with
  the per-bucket totals aggregated in-plan and prefix-combined by a
  √n-block scan feeding a broadcast join. Range-exchange boundary
  SAMPLING is seeded per RDD id, so the two consuming subtrees must
  structurally share one materialized RDD — and for expensive
  upstreams the checkpoint doubles as the reuse point (re-running the
  upstream for construction-time metadata jobs would cost more than
  the pin).

The partition COUNT is sized from the input data (``sized_partitions``:
optimized-plan bytes / ~128 MB, floored at defaultParallelism) — a
data-independent constant would leave each bucket at data/N bytes,
unbounded at 100 TB.
"""

from __future__ import annotations

import math
import re

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
            leaf = leaves.apply(i)
            # LogicalRDD (localCheckpoint) is NOT a reliable leaf: since
            # Spark 3.4 it carries a SNAPSHOT of the original derived
            # plan's estimate — join-inflated garbage laundered into a
            # leaf (r11: a checkpointed media-hash join chain reported
            # ~2^52 bytes for a 3k-row frame → a 131072-partition
            # shingle exchange that wedged the gate). Skip it — an
            # all-LogicalRDD frame sizes at the floor.
            if "LogicalRDD" in leaf.getClass().getSimpleName():
                continue
            s = int(leaf.stats().sizeInBytes())
            if 0 < s < (1 << 60):
                leaf_sum += s
        whole = int(plan.stats().sizeInBytes())
    except Exception:  # pragma: no cover — py4j/connect variance
        return floor
    # No reliable leaf ⇒ FLOOR, never the whole-plan estimate alone:
    # a derived estimate rooted in a sentinel leaf can be scaled BELOW
    # the sentinel filter by join/filter selectivities while still
    # being garbage-large (r11: an unmaterialized lazy-checkpoint leaf
    # under an anti-join estimated ~2^59 bytes → a 131072-partition
    # range exchange on a 3k-row frame).
    if leaf_sum <= 0:
        return floor
    size = leaf_sum if not (0 < whole < (1 << 60)) else min(leaf_sum, whole)
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


# ---------------------------------------------------------------------------
# Boundary layout (fast path): _pid as a deterministic expression

#: Logical-plan nodes whose recomputation is expensive enough that the
#: boundary layout's construction-time metadata jobs (boundaries +
#: per-bucket totals — each a full upstream evaluation) would cost more
#: than the checkpoint pin they avoid. Scan-rooted plans
#: (Relation/Range/Project/Filter/Union/Sample/Repartition) recompute
#: as cheap — usually PRUNED — rescans.
_EXPENSIVE_NODE = re.compile(
    r"\b(Join|Aggregate|Window|Generate|Expand|Sort|Distinct|CoGroup|"
    r"FlatMap\w*|MapInPandas|MapPartitions|\w*EvalPython\w*|Intersect|Except|"
    r"GlobalLimit|Deduplicate|Pivot|Unpivot)\b"
)


def _plan_is_cheap(df: DataFrame) -> bool:
    """True when recomputing ``df`` is about as cheap as rescanning its
    leaves (no joins/aggregates/Python stages in the optimized plan) —
    the precondition for the boundary layout, which evaluates the input
    twice more (pruned) instead of pinning it once."""
    try:
        tree = df._jdf.queryExecution().optimizedPlan().treeString()
    except Exception:  # pragma: no cover — py4j/connect variance
        return False
    return not _EXPENSIVE_NODE.search(tree)


def _surrogate_sql(df: DataFrame, col: str) -> str | None:
    """SQL expression mapping the first order column to a DOUBLE that
    is monotone NON-DECREASING in the column's sort order (ties may
    merge — bucketing needs monotonicity, not injectivity), or None
    when the type has no such cheap surrogate (strings/binary → the
    sampled-range fallback). Session tz is pinned UTC (registry
    wrapper), so the NTZ→LTZ cast is monotone."""
    t = df.schema[col].dataType.typeName()
    q = f"`{col}`"
    if t in {"byte", "short", "integer", "long", "float", "double"} or t.startswith("decimal"):
        return f"CAST({q} AS DOUBLE)"
    if t == "timestamp":
        return f"CAST(unix_micros({q}) AS DOUBLE)"
    if t == "timestamp_ntz":
        return f"CAST(unix_micros(CAST({q} AS TIMESTAMP)) AS DOUBLE)"
    if t == "date":
        return f"CAST(unix_date({q}) AS DOUBLE)"
    return None


def _key_boundaries(df: DataFrame, skey_sql: str, n_parts: int) -> list[float] | None:
    """n_parts-1 approx-quantile boundaries of the surrogate key — ONE
    tiny job at construction over the PRUNED key column (the analogue
    of the sampling pass repartitionByRange runs internally), collected
    to the driver (bounded metadata: ≤ n_parts doubles) and embedded as
    plan literals. Accuracy scales with the bucket count (4× margin:
    rank error ≤ ~1/4 bucket width, bounding any bucket at ~2× the
    128 MB target) and is floored at 1000 — the r11 optimization round
    measured the sketch build itself as the bulk of this job at the old
    10000 floor (~2× the whole-job cost of acc=1000 on the sf0.1 key
    scan), pure construction overhead for a 32-bucket layout whose
    boundaries only need bucket-width accuracy. Returns None on
    non-finite boundaries (±inf data) → caller falls back."""
    if n_parts <= 1:
        return []
    acc = max(1_000, min(100_000, 4 * n_parts))
    pcts = [i / n_parts for i in range(1, n_parts)]
    row = (
        df.selectExpr(f"{skey_sql} AS _k")
        .agg(F.percentile_approx("_k", pcts, acc).alias("_b"))
        .head()
    )
    bounds = [b for b in (row[0] or []) if b is not None]
    if any(not math.isfinite(b) for b in bounds):
        return None
    return sorted(bounds)


def _pid_sql(bounds: list[float], skey_sql: str) -> str:
    """Deterministic bucket id: ``|{b in bounds : b < key}|`` — strict
    ``<`` so equal keys never split across buckets, NULL keys (which
    sort first) go to bucket 0 explicitly.

    Up to 128 boundaries the id is a balanced binary-search ``CASE``
    tree (r11 optimization round): higher-order functions
    (``filter``/``transform``) are CodegenFallback — every row paid ~m
    INTERPRETED comparisons, which dominated both the construction-time
    counts job and the main pass (measured 0.7–1.0 s → 0.3–0.4 s on the
    sf0.1 counts job). The CASE tree whole-stage-codegens to ~log2(m)
    branch instructions per row. Tie semantics match the filter
    spelling exactly: descend left on ``key <= bounds[mid]`` ⇔ the
    bucket is ``|{b : b < key}|``. The plan auditor masks numeric
    literals on the ``AS _pid#`` projection line (quantile-sketch
    boundaries are merge-order-dependent run to run; they change the
    bucketing, never the result — test_partition_independence).

    Past 128 boundaries a two-level √m block search (filter over block
    maxima, then over one block) keeps the per-row comparison count at
    ~3√m — ~1.1k at the 131 072-partition cap — without inlining 131k
    literals into one CASE expression (plan/codegen size). The lambda
    variables there are named ``_rnb*`` for the same auditor mask."""
    if not bounds:
        return "CAST(0 AS INT)"

    def lits(xs) -> str:
        return ", ".join(f"CAST({x!r} AS DOUBLE)" for x in xs)

    m = len(bounds)
    if m <= 128:
        def go(lo: int, hi: int) -> str:
            if lo == hi:
                return str(lo)
            mid = (lo + hi) // 2
            return (
                f"(CASE WHEN ({skey_sql}) <= CAST({bounds[mid]!r} AS DOUBLE) "
                f"THEN {go(lo, mid)} ELSE {go(mid + 1, hi)} END)"
            )

        return f"CAST(CASE WHEN ({skey_sql}) IS NULL THEN 0 ELSE {go(0, m)} END AS INT)"
    B = max(1, math.isqrt(m))
    chunks = [bounds[i : i + B] for i in range(0, m, B)]
    nch = len(chunks)
    lasts = lits(c[-1] for c in chunks)
    chunk_arr = ", ".join(f"array({lits(c)})" for c in chunks)
    blk = f"size(filter(array({lasts}), _rnb -> _rnb < ({skey_sql})))"
    inner = (
        f"size(filter(element_at(array({chunk_arr}), {blk} + 1), "
        f"_rnbi -> _rnbi < ({skey_sql})))"
    )
    return f"CAST(CASE WHEN {blk} >= {nch} THEN {m} ELSE {blk} * {B} + {inner} END AS INT)"


def _fast_meta(
    df: DataFrame,
    order_cols: list[str],
    n_parts: int,
    kind: str,
    value_col: str | None = None,
    value_cast: str | None = None,
) -> tuple[str, list[tuple[int, object]]] | None:
    """Boundary-layout construction metadata: ``(pid_sql, per_bucket)``
    where ``per_bucket`` is the collected (bucket, total) list for the
    primitive's aggregate — ``kind`` in {count, sum, max}, folding
    ``value_col`` cast to ``value_cast`` (count ignores both). Returns
    None when the input needs
    the sampled-range fallback (expensive upstream, non-numeric first
    key, streaming frame, or non-finite boundaries).

    The bucket-id expression is wrapped in
    ``element_at(shuffle(array(x)), 1)`` — the identity on a 1-element
    array but MARKED NONDETERMINISTIC — as a required constraint
    barrier: two frames stamping semantically-identical _pid
    expressions (shared lambda exprIds survive relation dedup) trip
    InferFiltersFromConstraints into pushing a filter that references
    one side's scan attributes onto the OTHER side of a downstream
    join — an unbindable ``!Filter`` that fails every execution
    (observed r11 on the offsets join of an earlier spelling).
    Nondeterministic aliases are excluded from constraint inference;
    the VALUE stays a pure function of the row's key."""
    skey = _surrogate_sql(df, order_cols[0])
    if skey is None or df.isStreaming or not _plan_is_cheap(df):
        return None

    def compute():
        bounds = _key_boundaries(df, skey, n_parts)
        if bounds is None:
            return None
        raw = _pid_sql(bounds, skey)
        if kind == "count":
            rows = df.selectExpr(f"{raw} AS _pid").groupBy("_pid").count().collect()
            per = [(r["_pid"], r["count"]) for r in rows]
        else:
            # kind names the fold; re-cast keeps sum's widened DECIMAL
            # in the caller's exact accumulator type
            rows = (
                df.selectExpr(f"{raw} AS _pid", f"CAST(`{value_col}` AS {value_cast}) AS _v")
                .groupBy("_pid")
                .agg(F.expr(f"CAST({kind}(_v) AS {value_cast})").alias("_val"))
                .collect()
            )
            per = [(r["_pid"], r["_val"]) for r in rows]
        return (f"element_at(shuffle(array({raw})), 1)", per)

    # The two metadata jobs (boundaries + totals) run at EVERY
    # construction — no cross-construction memo. An earlier spelling
    # cached them per (plan, file-state); under the bench's
    # construct+count window that moved both jobs out of the timed
    # reps, which misrepresents per-run cost (the bench contract is
    # that every invocation computes from the parquet inputs).
    return compute()


def _exclusive_prefix_literal(
    per_pid: list[tuple[int, object]], n_parts: int, agg: str, cast: str
) -> str:
    """Exclusive prefix (sum | max) of the construction-time per-bucket
    totals, rendered as ONE array literal: ``element_at(array(...),
    _pid + 1)``. Buckets with no rows contribute identity; for ``max``
    the identity is SQL NULL (callers combine with ``greatest``, which
    skips nulls — bucket 0 and empty-prefix buckets stay purely local).
    Values ride through a string cast so exact DECIMAL accumulators
    survive verbatim. Aliased ``_rnb_off`` by callers: the literals
    derive from the sketch boundaries, so the auditor masks them with
    the rest of the ``_rnb`` family."""
    totals = dict(per_pid)
    offs: list[str] = []
    acc: object = None
    for p in range(n_parts):
        if agg == "sum":
            offs.append(f"CAST('{acc}' AS {cast})" if acc is not None else f"CAST('0' AS {cast})")
        else:
            offs.append(f"CAST('{acc}' AS {cast})" if acc is not None else f"CAST(NULL AS {cast})")
        v = totals.get(p)
        if v is not None:
            if agg == "sum":
                acc = v if acc is None else acc + v
            else:
                acc = v if acc is None else max(acc, v)
    return f"element_at(array({', '.join(offs)}), _pid + 1)"


def _fast_local(df: DataFrame, pid_sql: str, order_cols: list[str], n_parts: int) -> DataFrame:
    """Stamp ``_pid``, hash-exchange on it, and sort locally — the
    boundary layout's single linear pipeline. The window a caller puts
    on top (``partitionBy(_pid).orderBy(order_cols)``) is KEYED —
    hash-clustered on n_parts buckets, never a global frame."""
    return df.withColumn("_pid", F.expr(pid_sql)).repartition(n_parts, F.col("_pid"))


# ---------------------------------------------------------------------------
# Sampled-range layout (fallback)


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
    # _pid comes from the public spark_partition_id() contract; only
    # the 1-based local row number uses monotonically_increasing_id's
    # low 33 bits (documented as the per-partition consecutive record
    # number — a partition would need 2^33 rows to overflow, 3 orders
    # of magnitude past the 128 MB target). Both are stamped in the
    # same projection over the sorted partition iterator (same task,
    # identical consistency): no WindowExec, no extra
    # hashpartitioning(_pid) exchange, no per-consumer re-sort — the
    # plan above the checkpoint is pure projection.
    return (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        # _mid is nondeterministic (per-partition row counter), so it
        # must be evaluated exactly once per row, never re-derived
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id())
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


# ---------------------------------------------------------------------------
# Public primitives


def with_global_row_number(df: DataFrame, order_cols: list[str], out: str = "rn") -> DataFrame:
    """Global row number over a total order with NO global sort and NO
    single-partition stage. Boundary layout (see module docstring):
    two construction-time metadata jobs (quantile boundaries +
    per-bucket counts — bounded collects) buy a single linear plan:
    scan → deterministic bucket id → hash exchange → keyed row_number →
    literal-offset add. Fallback: the r10 lazy-checkpoint sampled-range
    layout with in-plan offsets and a broadcast join."""
    n_parts = sized_partitions(df)
    meta = _fast_meta(df, order_cols, n_parts, "count")
    if meta is not None:
        pid_sql, per_bucket = meta
        off_sql = _exclusive_prefix_literal(per_bucket, n_parts, "sum", "BIGINT")
        w = Window.partitionBy("_pid").orderBy(*order_cols)
        return (
            _fast_local(df, pid_sql, order_cols, n_parts)
            .withColumn("_lrn", F.row_number().over(w).cast("long"))
            .withColumn("_rnb_off", F.expr(off_sql))
            .withColumn(out, (F.col("_lrn") + F.col("_rnb_off")).cast("long"))
            .drop("_pid", "_lrn", "_rnb_off")
        )
    ranged = _ranged_pid(df, order_cols, n_parts)
    per_pid = ranged.groupBy("_pid").agg(F.count("*").cast("long").alias("_val"))
    offs = _exclusive_prefix_offsets(per_pid, n_parts, "sum")
    return (
        # broadcast-ok: offs is at most one row per partition (bounded metadata)
        ranged.join(F.broadcast(offs), "_pid", "left")
        .withColumn(out, (F.col("_lrn") + F.coalesce(F.col("_off"), F.lit(0))).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def with_topk_rank(df: DataFrame, order_cols: list[str], k: int, out: str = "rank") -> DataFrame:
    """Exact global top-``k`` with ranks 1..k — result-identical to
    ``with_global_row_number(df, order_cols).filter(out <= k)`` when
    ``order_cols`` is a TOTAL order (tie-broken), but planned as
    Spark's native ``TakeOrderedAndProject``: per-partition bounded
    heaps merged once (k rows per upstream partition cross the wire),
    no range exchange, no layout checkpoint, no offsets subtree, no
    WindowExec — the canonical top-k shape at any scale (guide §2.4:
    an ``orderBy`` used only to rank a bounded head is not worth a
    global layout). Ranks are stamped on the single sorted output
    partition via the per-partition record counter (same local-stamp
    contract as ``_ranged_pid``; no window, no exchange). ``k`` must be
    a bounded constant (the same boundedness contract as every top-N)."""
    taken = df.orderBy(*order_cols).limit(k)
    return (
        taken.withColumn("_mid", F.monotonically_increasing_id())
        .withColumn(out, (F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1).cast("long"))
        .drop("_mid")
    )


def with_global_cumsum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    out: str = "cumsum",
    value_cast: str = "long",
) -> DataFrame:
    """Global prefix sum over a total order — same two-pass
    partition-offset design as ``with_global_row_number`` (per-bucket
    partial sums → exclusive offsets → local window sum + offset), so
    no single-partition stage at any scale.

    ``value_cast`` must make addition exact (integral ``long`` or a
    DECIMAL type — both prefix spellings accumulate in that type, and
    the boundary layout's construction-time fold runs in exact Python
    int/Decimal arithmetic). ``out`` is the INCLUSIVE prefix sum;
    subtract the row's value for the exclusive form.
    """
    n_parts = sized_partitions(df)
    meta = _fast_meta(df, order_cols, n_parts, "sum", value_col, value_cast)
    local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if meta is not None:
        pid_sql, per_bucket = meta
        off_sql = _exclusive_prefix_literal(per_bucket, n_parts, "sum", value_cast)
        return (
            _fast_local(df, pid_sql, order_cols, n_parts)
            .withColumn("_v", F.col(value_col).cast(value_cast))
            .withColumn("_lcs", F.sum("_v").over(local))
            .withColumn("_rnb_off", F.expr(off_sql))
            .withColumn(out, (F.col("_lcs") + F.col("_rnb_off")).cast(value_cast))
            .drop("_pid", "_lcs", "_rnb_off", "_v")
        )
    ranged = _ranged_pid(df, order_cols, n_parts).withColumn(
        "_v", F.col(value_col).cast(value_cast)
    )
    per_pid = ranged.groupBy("_pid").agg(F.sum("_v").cast(value_cast).alias("_val"))
    offs = _exclusive_prefix_offsets(per_pid, n_parts, "sum")
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
    of ``with_global_cumsum`` (per-bucket partial maxima → exclusive
    prefix maxima → local window max combined with ``greatest``), so
    no single-partition stage at any scale. A bucket with no earlier
    contributions gets a NULL offset (literal or left-join gap);
    ``greatest`` skips nulls, so the first range's running max is
    purely local. ``out`` is the INCLUSIVE running max.
    """
    n_parts = sized_partitions(df)
    meta = _fast_meta(df, order_cols, n_parts, "max", value_col, value_cast)
    local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if meta is not None:
        pid_sql, per_bucket = meta
        off_sql = _exclusive_prefix_literal(per_bucket, n_parts, "max", value_cast)
        return (
            _fast_local(df, pid_sql, order_cols, n_parts)
            .withColumn("_v", F.col(value_col).cast(value_cast))
            .withColumn("_lcm", F.max("_v").over(local))
            .withColumn("_rnb_off", F.expr(off_sql))
            .withColumn(out, F.greatest(F.col("_lcm"), F.col("_rnb_off")).cast(value_cast))
            .drop("_pid", "_lcm", "_rnb_off", "_v")
        )
    ranged = _ranged_pid(df, order_cols, n_parts).withColumn(
        "_v", F.col(value_col).cast(value_cast)
    )
    per_pid = ranged.groupBy("_pid").agg(F.max("_v").alias("_val"))
    offs = _exclusive_prefix_offsets(per_pid, n_parts, "max")
    return (
        ranged.withColumn("_lcm", F.max("_v").over(local))
        # broadcast-ok: offs is at most one row per partition (bounded metadata)
        .join(F.broadcast(offs), "_pid", "left")
        .withColumn(out, F.greatest(F.col("_lcm"), F.col("_off")).cast(value_cast))
        .drop("_pid", "_lrn", "_lcm", "_off", "_v")
    )
