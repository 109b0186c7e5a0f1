"""merge_upsert / upsert_partitioned_parquet (operators/merge.py)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from stream_spark.operators.merge import merge_upsert, upsert_partitioned_parquet

SCHEMA = "k long, part string, v double, tag string"


def _target(spark):
    rows = [
        (1, "a", 1.0, "old"),
        (2, "a", 2.0, "old"),
        (3, "b", 3.0, "old"),
        (4, "b", 4.0, "old"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_merge_update_insert_delete(spark):
    updates = spark.createDataFrame(
        [
            (2, "a", 20.0, "new", False),  # update
            (5, "b", 50.0, "new", False),  # insert
            (3, "b", 0.0, "new", True),  # delete
            (9, "a", 0.0, "new", True),  # delete of absent key: no-op
        ],
        SCHEMA + ", del boolean",
    )
    out = merge_upsert(_target(spark), updates, ["k"], delete_col="del")
    got = {r.k: (r.v, r.tag) for r in out.collect()}
    assert got == {1: (1.0, "old"), 2: (20.0, "new"), 4: (4.0, "old"), 5: (50.0, "new")}


def test_merge_order_cols_pick_latest(spark):
    # two updates for the same key: the greater order tuple must win
    updates = spark.createDataFrame(
        [(1, "a", 10.0, "v1", 1), (1, "a", 11.0, "v2", 2)], SCHEMA + ", ver long"
    )
    out = merge_upsert(_target(spark), updates, ["k"], order_cols=["ver"])
    assert {r.k: r.v for r in out.collect()}[1] == 11.0


def test_merge_single_shuffle_no_join(spark):
    updates = spark.createDataFrame([(2, "a", 20.0, "new")], SCHEMA)
    out = merge_upsert(_target(spark), updates, ["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # algebraic aggregate, not a full-outer join


def test_upsert_partitioned_parquet_rewrites_only_touched(spark, tmp_path):
    path = str(tmp_path / "tbl")
    shutil.rmtree(path, ignore_errors=True)
    _target(spark).repartition(1).write.partitionBy("part").parquet(path)
    import os

    mtime_b = max(
        os.path.getmtime(os.path.join(path, "part=b", f))
        for f in os.listdir(os.path.join(path, "part=b"))
        if f.endswith(".parquet")
    )
    updates = spark.createDataFrame(
        [(2, "a", 20.0, "new", False), (6, "a", 60.0, "new", False), (1, "a", 0.0, "n", True)],
        SCHEMA + ", del boolean",
    )
    upsert_partitioned_parquet(spark, path, updates, ["k"], "part", delete_col="del")
    back = spark.read.parquet(path)
    got = {r.k: (r.part, r.v) for r in back.collect()}
    assert got == {2: ("a", 20.0), 6: ("a", 60.0), 3: ("b", 3.0), 4: ("b", 4.0)}
    # untouched partition b was not rewritten (same data files)
    mtime_b2 = max(
        os.path.getmtime(os.path.join(path, "part=b", f))
        for f in os.listdir(os.path.join(path, "part=b"))
        if f.endswith(".parquet")
    )
    assert mtime_b2 == mtime_b
    # dynamic overwrite restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static").lower()
        != "dynamic"
    )


def test_rerank_stub_changes_order_and_is_deterministic(spark):
    from stream_spark.operators.ann_pandas import rerank_crossencoder_stub

    cand = spark.createDataFrame(
        [(1, 10, 0.90), (1, 11, 0.895), (1, 12, 0.5), (2, 10, 0.7), (2, 13, 0.69)],
        "query_id long, neighbor_id long, cosine double",
    )
    a = rerank_crossencoder_stub(cand, 2).collect()
    b = rerank_crossencoder_stub(cand, 2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_q = {}
    for r in a:
        per_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) == 2 for v in per_q.values())
    # blended score stays within [cosine, cosine + 0.1)
    for r in a:
        assert r.cosine <= r.rerank_score < r.cosine + 0.1


def test_compact_partitioned_parquet(spark, tmp_path):
    import os

    from stream_spark.operators.merge import compact_partitioned_parquet

    path = str(tmp_path / "frag")
    big = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 800, "a").otherwise("b").alias("part"),
        (F.col("id") * 1.0).alias("v"),
    )
    # fragment partition a into 8 files; leave b as 1
    big.filter(F.col("part") == "a").repartition(8).write.partitionBy("part").parquet(path)
    big.filter(F.col("part") == "b").repartition(1).write.mode("append").partitionBy(
        "part"
    ).parquet(path)
    n_before = len([f for f in os.listdir(f"{path}/part=a") if f.endswith(".parquet")])
    assert n_before >= 3
    fixed = compact_partitioned_parquet(spark, path, "part", min_files=2)
    assert fixed == ["a"]
    n_after = len([f for f in os.listdir(f"{path}/part=a") if f.endswith(".parquet")])
    assert n_after == 1  # tiny bytes → single target file
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.filter(F.col("part") == "b").count() == 200


def test_zorder_write_narrows_rowgroups_on_both_dims(spark, tmp_path):
    """Z-order vs single-column sort: per-file min/max width on the
    SECONDARY dimension must shrink by ≥2× (that's the whole point of
    the layout), while staying bounded on the primary."""
    import glob

    import pyarrow.parquet as pq

    from stream_spark.operators.layout import zorder_write
    from stream_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id",
        (F.col("user_id") % 256).alias("a"),
        ((F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(3600000)).cast("long") % 256).alias("b"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_write(ev, zpath, ["a", "b"], bits=8, n_files=8)
    ev.repartitionByRange(8, "a").sortWithinPartitions("a").write.parquet(spath)

    def mean_width(path, col):
        widths = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                stats = {
                    md.row_group(rg).column(i).path_in_schema: md.row_group(rg).column(i).statistics
                    for i in range(md.row_group(rg).num_columns)
                }[col]
                widths.append(stats.max - stats.min)
        return sum(widths) / len(widths)

    z_b, s_b = mean_width(zpath, "b"), mean_width(spath, "b")
    assert z_b * 2 <= s_b, f"z-order b-width {z_b} not ≥2x narrower than {s_b}"
    # primary dim: z-order trades a little a-width for the b gain, but
    # must still beat an unsorted (full-range) layout
    assert mean_width(zpath, "a") < 255


def test_stats_manifest_prunes_zordered_files(spark, tmp_path):
    """Manifest-driven file pruning on a z-ordered table: a narrow
    range predicate on the secondary dimension must skip files AND
    return exactly the rows a full scan returns."""
    from stream_spark.operators.layout import build_stats_manifest, manifest_prune, zorder_write
    from stream_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id",
        (F.col("user_id") % 256).alias("a"),
        ((F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(3600000)).cast("long") % 256).alias("b"),
    )
    path = str(tmp_path / "ztab")
    zorder_write(ev, path, ["a", "b"], bits=8, n_files=8)
    man = build_stats_manifest(spark, path, ["a", "b"])
    assert man.count() == 8
    files = manifest_prune(man, "b", 10.0, 30.0)
    assert 0 < len(files) < 8, f"no pruning: {len(files)} of 8 files"
    got = (
        spark.read.parquet(*files)
        .filter(F.col("b").between(10, 30))
        .select("event_id")
        .collect()
    )
    want = spark.read.parquet(path).filter(F.col("b").between(10, 30)).select("event_id").collect()
    assert sorted(r[0] for r in got) == sorted(r[0] for r in want)


def test_read_parquet_range_matches_full_scan(spark, tmp_path):
    from stream_spark.operators.layout import read_parquet_range, zorder_write
    from stream_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id",
        (F.col("user_id") % 256).alias("a"),
        ((F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(3600000)).cast("long") % 256).alias("b"),
    )
    path = str(tmp_path / "ranged")
    zorder_write(ev, path, ["a", "b"], bits=8, n_files=8)
    got = read_parquet_range(spark, path, "b", 40.0, 60.0).select("event_id").collect()
    want = (
        spark.read.parquet(path).filter(F.col("b").between(40, 60)).select("event_id").collect()
    )
    assert sorted(r[0] for r in got) == sorted(r[0] for r in want)
    # empty range → empty result with the right schema, no crash
    assert read_parquet_range(spark, path, "b", 300.0, 400.0).count() == 0


def test_upsert_deletes_entire_partition(spark, tmp_path):
    """Deleting every row of a touched partition must remove its
    directory — dynamic overwrite alone leaves the stale files behind
    (ADVICE r2 finding)."""
    import os

    path = str(tmp_path / "tbl_del")
    _target(spark).repartition(1).write.partitionBy("part").parquet(path)
    updates = spark.createDataFrame(
        [(3, "b", 0.0, "n", True), (4, "b", 0.0, "n", True)],
        SCHEMA + ", del boolean",
    )
    upsert_partitioned_parquet(spark, path, updates, ["k"], "part", delete_col="del")
    assert not os.path.isdir(os.path.join(path, "part=b"))
    back = spark.read.parquet(path)
    assert {r.k for r in back.collect()} == {1, 2}


def test_zorder_write_handles_negative_values(spark, tmp_path):
    """The fold must use pmod so negative column values land in
    [0, domain) (ADVICE r2 finding): a=-1 clusters with a=255, and every
    row survives the write."""
    import glob

    import pyarrow.parquet as pq

    from stream_spark.operators.layout import zorder_write

    df = spark.range(1024).select(
        F.col("id").alias("event_id"),
        (F.col("id") - 512).alias("a"),  # values in [-512, 511]
        (F.col("id") % 7).alias("b"),
    )
    path = str(tmp_path / "zneg")
    zorder_write(df, path, ["a", "b"], bits=8, n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 1024
    # per-file min/max of pmod(a, 256) must be narrow: with the sign bug
    # negatives fold to negative remainders and the interleave scatters
    # them across the key space
    widths = []
    for f in glob.glob(f"{path}/*.parquet"):
        vals = [((v % 256) + 256) % 256 for v in pq.read_table(f, columns=["a"])["a"].to_pylist()]
        widths.append(max(vals) - min(vals))
    assert sum(widths) / len(widths) < 200, widths


def test_diff_then_patch_reconstructs_new_version(spark):
    """Algebraic identity: table_diff(old, new) + the new rows is a
    patch that merge_upsert applies to old to reproduce new EXACTLY —
    changed/added rows upsert, removed keys delete. Ties the two
    operators together end to end (the CDC backfill path)."""
    from stream_spark.operators.merge import merge_upsert, table_diff

    old = spark.createDataFrame(
        [(k, f"s{k}", float(k)) for k in range(1, 30)], "k long, s string, v double"
    )
    new = spark.createDataFrame(
        [(k, ("S" if k % 5 == 0 else "s") + str(k), float(k) + (1.0 if k % 7 == 0 else 0.0))
         for k in range(1, 30) if k % 11 != 0]          # drop every 11th key
        + [(100, "added", 100.0), (101, "added2", 101.0)],
        "k long, s string, v double",
    )
    diff = table_diff(old, new, ["k"])
    updates = (
        diff.join(new, "k", "left")
        .select(
            "k",
            F.coalesce(F.col("s"), F.lit("?")).alias("s"),
            F.coalesce(F.col("v"), F.lit(0.0)).alias("v"),
            (F.col("change_type") == "removed").alias("del"),
        )
    )
    patched = merge_upsert(old, updates, ["k"], delete_col="del")
    got = {(r["k"], r["s"], r["v"]) for r in patched.collect()}
    want = {(r["k"], r["s"], r["v"]) for r in new.collect()}
    assert got == want
