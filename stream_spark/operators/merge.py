"""MERGE INTO / upsert — the Delta-style table-maintenance primitive.

Batch semantics (``merge_upsert``): updates matched on the key replace
the target row, unmatched updates are inserted, and updates flagged
with the delete marker remove the row — i.e. MERGE INTO with
whenMatchedUpdateAll / whenNotMatchedInsertAll / whenMatchedDelete.
Realized as union → max-of-struct keyed aggregate (priority: update
beats target, later ``order_cols`` beat earlier within the updates),
which is ALGEBRAIC: partials combine map-side, the shuffle carries one
row per key — not a full-outer join whose both sides shuffle all rows
and whose nulls then need COALESCE-ing per column.

Storage side (``upsert_partitioned_parquet``): classic
partition-scoped rewrite on plain parquet — read ONLY the hive
partitions the updates touch (bounded-metadata collect of the distinct
partition values), merge, write back under dynamic partition
overwrite so untouched partitions are never rewritten. This is the
copy-on-write half of a Delta/Iceberg MERGE without the transaction
log; at 100 TB the work scales with the touched partitions, not the
table. Not ACID — concurrent writers need a real table format.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    delete_col: str | None = None,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge ``updates`` into ``target`` on ``key_cols``.

    ``updates`` must carry every ``target`` column; rows where
    ``delete_col`` (boolean, updates-side only) is true delete the
    key. If several updates share a key, the greatest ``order_cols``
    tuple wins (ties would be nondeterministic — pass an order).
    """
    keys = list(key_cols)
    payload = [c for c in target.columns if c not in keys]
    del_expr = (
        F.coalesce(F.col(delete_col), F.lit(False)) if delete_col else F.lit(False)
    )
    # order_cols are updates-side; null-pad the target branch (its
    # _prio=0 loses to any update regardless of the order tuple)
    order = list(order_cols)
    t = target.select(
        *keys,
        F.lit(0).alias("_prio"),
        *[F.lit(None).cast(updates.schema[c].dataType).alias(c) for c in order],
        F.lit(False).alias("_del"),
        *payload,
    )
    u = updates.select(
        *keys, F.lit(1).alias("_prio"), *order, del_expr.alias("_del"), *payload
    )
    ranked = F.struct(
        F.col("_prio"), *[F.col(c) for c in order], F.col("_del"), *payload
    )
    merged = t.unionByName(u).groupBy(*keys).agg(F.max(ranked).alias("_m"))
    return merged.filter(~F.col("_m._del")).select(
        *keys, *[F.col(f"_m.{c}").alias(c) for c in payload]
    )


def upsert_partitioned_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
    delete_col: str | None = None,
    order_cols: Sequence[str] = (),
) -> None:
    """Apply ``merge_upsert`` to a hive-partitioned parquet table in
    place, rewriting only the partitions the updates touch.

    Keys are assumed not to move between partitions (standard
    partitioned-upsert contract — a moved key would need a full-table
    delete pass).
    """
    touched = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]  # bounded metadata: one value per touched partition
    target = spark.read.parquet(path).filter(F.col(partition_col).isin(touched))
    # localCheckpoint: the surviving-partition collect below and the
    # write would otherwise each recompute the whole merge plan
    merged = merge_upsert(target, updates, key_cols, delete_col, order_cols).localCheckpoint()
    # dynamic overwrite only rewrites partitions that appear in the
    # output — a partition whose every row was deleted produces no
    # output rows, so its stale directory would survive and the deleted
    # rows reappear on the next read; diff and remove those explicitly
    surviving = {
        r[0] for r in merged.select(partition_col).distinct().collect()
    }  # bounded metadata again (≤ len(touched) values)
    emptied = [v for v in touched if v not in surviving]
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition(F.col(partition_col))
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # deletion goes through the Hadoop FileSystem API so hdfs://, s3a://
    # and local paths all drop their stale partition directories
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for value in emptied:
        pdir = jvm.org.apache.hadoop.fs.Path(f"{path}/{partition_col}={value}")
        fs = pdir.getFileSystem(hconf)
        if fs.exists(pdir):
            fs.delete(pdir, True)


def compact_partitioned_parquet(
    spark: SparkSession,
    path: str,
    partition_col: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> list:
    """Small-file compaction (the OPTIMIZE half of table maintenance):
    rewrite each hive partition whose file count exceeds ``min_files``
    into ceil(bytes / target_file_bytes) files, leaving healthy
    partitions untouched (dynamic partition overwrite again). Streaming
    sinks and frequent upserts strew small files; scans then pay one
    task + one open per file — compaction restores scan parallelism ==
    data size. Returns the partition values rewritten.

    File listing happens driver-side but is bounded metadata (one stat
    per file of the TOUCHED partitions' directories, not data), and
    goes through the Hadoop FileSystem API — same as the emptied-
    partition cleanup above — so hdfs:// and s3a:// tables compact the
    same as local ones (r5; the os.listdir version silently saw zero
    partitions on any non-local filesystem).
    """
    import math

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)

    to_fix: list = []
    plans: dict = {}
    for st in fs.listStatus(root):
        entry = st.getPath().getName()
        if not (st.isDirectory() and entry.startswith(f"{partition_col}=")):
            continue
        files = [
            f
            for f in fs.listStatus(st.getPath())
            if f.isFile() and f.getPath().getName().endswith(".parquet")
        ]
        if len(files) <= min_files:
            continue
        nbytes = sum(f.getLen() for f in files)
        value = entry.split("=", 1)[1]
        to_fix.append(value)
        plans[value] = max(1, math.ceil(nbytes / target_file_bytes))
    if not to_fix:
        return []
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for value in to_fix:
            part = spark.read.parquet(path).filter(F.col(partition_col) == value)
            (
                part.repartition(plans[value])
                .write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(path)
            )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return to_fix


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Snapshot diff: (keys..., change_type) for every row that differs
    between two versions of a table — 'added' (key only in new),
    'removed' (key only in old), 'changed' (key in both, any compared
    column differs). The regression-testing / CDC-backfill primitive:
    one full-outer join keyed on the table key, column comparison via
    null-safe inequality (no value hashing, so no cross-engine string-
    cast hazards). Unchanged keys are dropped, so output is bounded by
    the churn, not the table.
    """
    keys = list(key_cols)
    cols = list(compare_cols) if compare_cols is not None else [
        c for c in old.columns if c not in keys
    ]
    o = old.select(*keys, *cols, F.lit(1).alias("_in_old"))
    n = new.select(
        *[F.col(k).alias(f"_n_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in cols],
        F.lit(1).alias("_in_new"),
    )
    cond = [o[k].eqNullSafe(n[f"_n_{k}"]) for k in keys]
    j = o.join(n, cond, "full_outer")
    changed = F.lit(False)
    for c in cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"_n_{c}"))
    out = j.select(
        *[F.coalesce(F.col(k), F.col(f"_n_{k}")).alias(k) for k in keys],
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .alias("change_type"),
    )
    return out.filter(F.col("change_type").isNotNull())
