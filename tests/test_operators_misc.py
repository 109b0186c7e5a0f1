from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stream_spark.operators.asof import asof_join
from stream_spark.operators.components import connected_components
from stream_spark.operators.rollup_cascade import finalize, merge_up, partials
from stream_spark.operators.sampling import deterministic_sample, stratified_sample


def ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "p1"), (1, ts(30), "p2"), (2, ts(5), "p3")],
        "user long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, ts(8), "c1"), (1, ts(10), "c2"), (1, ts(25), "c3"), (3, ts(1), "c4")],
        "user long, ts timestamp, cid string",
    )
    out = {r["pid"]: r["cid_right"] for r in
           asof_join(left, right, "user", "ts", "ts", ["cid"]).collect()}
    assert out["p1"] == "c2"  # equal-ts right row is visible
    assert out["p2"] == "c3"
    assert out["p3"] is None  # user 2 has no clicks → left-outer NULL


def test_connected_components_two_clusters(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10


def test_connected_components_chain_convergence(spark):
    # a 12-node path needs multiple propagation rounds
    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], "doc_a long, doc_b long")
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(comp.values()) == {0}


def test_rollup_cascade_merge_equals_direct(spark, sf_dir):
    from stream_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = partials(ev, "ts", "value", 3_600_000)
    daily = finalize(merge_up(hourly, 86_400_000))
    direct = finalize(partials(ev, "ts", "value", 86_400_000))
    d = {r["bucket_start"]: (r["sum_value"], r["p_count"]) for r in daily.collect()}
    e = {r["bucket_start"]: (r["sum_value"], r["p_count"]) for r in direct.collect()}
    assert d == e


def test_deterministic_sample_is_stable_and_proportional(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    s1 = {r["id"] for r in deterministic_sample(df, "id", 0.5).collect()}
    s2 = {r["id"] for r in deterministic_sample(df.repartition(7), "id", 0.5).collect()}
    assert s1 == s2  # partitioning-independent
    assert 0.45 < len(s1) / 2000 < 0.55


def test_stratified_sample_rates(spark):
    rows = [(i, "a" if i % 2 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, s string")
    out = stratified_sample(df, "id", "s", {"a": 1.0, "b": 0.0})
    got = {r["s"] for r in out.collect()}
    assert got == {"a"} and out.count() == 1000


def test_star_cc_matches_propagation(spark):
    """large-star/small-star and label propagation agree on a mixed
    graph: two clusters, a hub whose min is not its only link, and
    isolated pairs."""
    from stream_spark.operators.components import connected_components_star

    edges = spark.createDataFrame(
        [(1, 5), (4, 5), (2, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        ["doc_a", "doc_b"],
    )
    prop = {(r["node"], r["component"]) for r in connected_components(edges).collect()}
    star = {(r["node"], r["component"]) for r in connected_components_star(edges).collect()}
    assert star == prop
    # the (1,5),(4,5) hub case: 4 must stay in component 1
    assert (4, 1) in star


def test_star_cc_long_chain(spark):
    """A 64-node path has diameter 63: label propagation's default
    iteration budget can't close it, the O(log n) star scheme must."""
    from stream_spark.operators.components import connected_components_star

    chain = spark.createDataFrame([(i, i + 1) for i in range(63)], ["doc_a", "doc_b"])
    star = {r["node"]: r["component"] for r in connected_components_star(chain).collect()}
    assert len(star) == 64
    assert set(star.values()) == {0}


def test_global_cumsum_matches_serial(spark):
    from stream_spark.operators.rownum import with_global_cumsum

    vals = [(i, (i * 7) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(vals, ["id", "v"]).repartition(8)
    got = {r["id"]: r["cs"] for r in with_global_cumsum(df, "v", ["id"], out="cs").collect()}
    acc, want = 0, {}
    for i, v in vals:
        acc += v
        want[i] = acc
    assert got == want


def test_global_cummax_matches_serial(spark):
    """Prefix-max twin of the cumsum primitive: running max over a
    total order with NO single-partition stage; oscillating values
    exercise the cross-partition exclusive-offset combine."""
    from stream_spark.operators.rownum import with_global_cummax

    vals = [(i, (i * 37) % 101) for i in range(200)]
    df = spark.createDataFrame(vals, ["id", "v"]).repartition(8)
    got = {r["id"]: r["cm"] for r in with_global_cummax(df, "v", ["id"], out="cm").collect()}
    best, want = None, {}
    for i, v in vals:
        best = v if best is None else max(best, v)
        want[i] = best
    assert got == want
    plan = with_global_cummax(df, "v", ["id"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_pack_sequences_boundaries(spark):
    """Docs straddling pack boundaries span the right number of
    packs; offsets are the exact global concat positions."""
    from stream_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 1000), (2, 1500), (3, 48), (4, 5000)], ["doc_id", "n_tokens"]
    )
    rows = {r["doc_id"]: r for r in pack_sequences(df, budget=2048).collect()}
    assert rows[1]["start_offset"] == 0 and rows[1]["pack_id"] == 0 and rows[1]["n_packs_spanned"] == 1
    # doc 2: [1000, 2500) crosses the 2048 boundary → spans 2 packs
    assert rows[2]["pack_id"] == 0 and rows[2]["n_packs_spanned"] == 2
    # doc 3: [2500, 2548) inside pack 1
    assert rows[3]["pack_id"] == 1 and rows[3]["n_packs_spanned"] == 1
    # doc 4: [2548, 7548) → packs 1..3
    assert rows[4]["pack_id"] == 1 and rows[4]["n_packs_spanned"] == 3


def test_range_join_tolerance_boundaries(spark):
    from stream_spark.operators.rangejoin import range_join

    left = spark.createDataFrame([(1, 10, 1000), (1, 11, 5000)], ["k", "lid", "lts"])
    right = spark.createDataFrame(
        [(1, 20, 1000), (1, 21, 1300), (1, 22, 1301), (2, 23, 1000)], ["k", "rid", "rts"]
    )
    out = range_join(left, right, ["k"], "lts", "rts", 300)
    pairs = {(r["lid"], r["rid"]) for r in out.collect()}
    # lid 10 @1000: rid 20 (Δ0), 21 (Δ300 inclusive), NOT 22 (Δ301), NOT 23 (other key)
    assert pairs == {(10, 20), (10, 21)}
    # each qualifying pair appears exactly once despite the 3-bucket fan-out
    assert out.count() == 2


def test_mix_corpus_and_split_edges(spark):
    """Mixing: unlisted sources drop, oversubscribed sources cap at
    rate 1. Splitting: partitions are disjoint and exhaustive over the
    declared weights; membership survives re-partitioning."""
    from stream_spark.operators.sampling import mix_corpus, split_corpus

    rows = [(i, "a" if i < 40 else "b") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    # ask for more 'b' docs than exist → rate caps at 1 (all 10 kept)
    out = mix_corpus(df, "doc_id", "source", {"b": 1.0}, n_target=100)
    assert {r["source"] for r in out.collect()} == {"b"}
    assert out.count() == 10

    sp = split_corpus(df, "doc_id", {"train": 0.5, "val": 0.5})
    got = {r["doc_id"]: r["split"] for r in sp.collect()}
    assert len(got) == 50  # weights sum to 1 → exhaustive
    sp2 = {r["doc_id"]: r["split"] for r in split_corpus(df.repartition(7), "doc_id", {"train": 0.5, "val": 0.5}).collect()}
    assert got == sp2

    import pytest as _pytest
    with _pytest.raises(ValueError):
        split_corpus(df, "doc_id", {"a": 0.9, "b": 0.2})


# ---- bloom-filter join pruning ----


def test_bloom_no_false_negatives_and_bounded(spark):
    from pyspark.sql import functions as F

    from stream_spark.operators.bloom import M_BITS, bloom_build, bloom_prune

    build = spark.range(0, 200).select(F.col("id").alias("k"))
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    bits = bloom_build(build, "k")
    n_bits = bits.count()
    assert n_bits <= min(3 * 200, M_BITS)
    kept = {r["k"] for r in bloom_prune(probe, "k", bits).collect()}
    # no false negatives: every true member survives pruning
    assert set(range(200)) <= kept
    # pruning actually prunes: far fewer than the full probe side
    assert len(kept) < 2000


def test_bloom_prune_preserves_columns_and_rows(spark):
    from pyspark.sql import functions as F

    from stream_spark.operators.bloom import bloom_build, bloom_prune

    build = spark.range(0, 5).select(F.col("id").alias("k"))
    probe = spark.range(0, 5).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    out = bloom_prune(probe, "k", bloom_build(build, "k"))
    assert set(out.columns) == {"k", "v"}
    assert sorted((r["k"], r["v"]) for r in out.collect()) == [(i, i * 10) for i in range(5)]


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "p1"), (1, ts(30), "p2")],
        "user long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, ts(8), "c1"), (1, ts(25), "c2")],
        "user long, ts timestamp, cid string",
    )
    # 3-minute tolerance: p1 (click 2 min earlier) matches, p2's
    # closest click is 5 min earlier → nulled out
    out = {r["pid"]: r["cid_right"] for r in
           asof_join(left, right, "user", "ts", "ts", ["cid"],
                     tolerance_ms=180_000).collect()}
    assert out["p1"] == "c1"
    assert out["p2"] is None


def test_asof_join_tolerance_numeric_ts(spark):
    left = spark.createDataFrame([(1, 100, "p1"), (1, 500, "p2")],
                                 "user long, ts long, pid string")
    right = spark.createDataFrame([(1, 90, "c1")], "user long, ts long, cid string")
    out = {r["pid"]: r["cid_right"] for r in
           asof_join(left, right, "user", "ts", "ts", ["cid"],
                     tolerance_ms=50).collect()}
    assert out["p1"] == "c1"   # 10 units back, inside the bound
    assert out["p2"] is None   # 410 units back, outside


def test_asof_cogrouped_matches_catalyst_carry(spark):
    """Two independent as-of implementations (window carry vs cogroup
    pd.merge_asof) must agree row-for-row, with and without tolerance."""
    from stream_spark.operators.asof import asof_join, asof_join_cogrouped
    from stream_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    left = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    right = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    for tol in (None, 600_000):
        a = asof_join(left, right, "user_id", "ts", "ts", ["ts", "event_id"], tolerance_ms=tol)
        b = asof_join_cogrouped(
            left, right, "user_id", "ts", "ts", ["ts", "event_id"], tolerance_ms=tol
        )
        ka = sorted(map(tuple, a.select("user_id", "event_id", "event_id_right").collect()))
        kb = sorted(map(tuple, b.select("user_id", "event_id", "event_id_right").collect()))
        assert ka == kb, f"tol={tol}: implementations disagree"


def test_rownum_boundary_layout_pins_no_blocks(spark):
    """r11: the boundary layout (numeric key, scan-rooted input) is a
    single linear plan — no checkpoint, no cache write, so it must not
    register ANY persistent RDD at all."""
    from pyspark.sql import functions as F

    from stream_spark.operators.rownum import with_global_cumsum, with_global_row_number

    def rdd_ids() -> set:
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())

    baseline = rdd_ids()
    df = spark.range(50_000).select(F.col("id"), (F.col("id") % 97).alias("v"))
    assert with_global_row_number(df, ["id"]).count() == 50_000
    assert with_global_cumsum(df, "v", ["id"]).count() == 50_000
    assert not (rdd_ids() - baseline)


def test_rownum_primitives_lazy_and_release_their_blocks(spark):
    """VERDICT r2 #3: the global-order primitives must not pin
    executor memory for the session's lifetime — checkpoint blocks are
    reference-counted, so once the query's DataFrames are dropped the
    ContextCleaner frees them and getPersistentRDDs returns to its
    pre-query baseline. A STRING first order key forces the
    sampled-range fallback (the only layout that checkpoints, r11)."""
    import gc
    import time

    from pyspark.sql import functions as F

    from stream_spark.operators.rownum import with_global_cumsum, with_global_row_number

    def rdd_ids() -> set:
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())

    gc.collect()
    time.sleep(1.0)
    baseline = rdd_ids()

    def run_queries() -> set:
        # inner scope: every DataFrame reference dies when this returns,
        # so the poll below isn't at the mercy of test-frame locals.
        # (Construction still materializes the AQE stages behind the
        # lazy checkpoint's toRdd — "lazy" buys the absent driver
        # collect and the deferred cache write, not zero jobs.)
        df = spark.range(50_000).select(
            F.format_string("k%08d", F.col("id")).alias("s"), (F.col("id") % 97).alias("v")
        )
        assert with_global_row_number(df, ["s"]).count() == 50_000
        assert with_global_cumsum(df, "v", ["s"]).count() == 50_000
        return rdd_ids() - baseline

    created = run_queries()  # the primitives' lazy-checkpoint blocks
    assert created

    # cleaner runs async off JVM GC (periodic GC interval is 30 min) —
    # release the py4j handles, nudge the JVM, poll. Generous bound:
    # under full-suite load the detach+GC+cleanup chain can take a while.
    deadline = time.time() + 90
    while time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext._jvm.System.runFinalization()
        if not (rdd_ids() & created):
            break
        time.sleep(0.5)
    # track the SPECIFIC ids (other tests' cached data may coexist)
    assert not (rdd_ids() & created)


def test_rownum_in_plan_offsets_survive_arrow_collect(spark):
    """The r10 in-plan offsets are consumed by TWO subtrees of one
    plan; an exchange-reuse-based pin silently broke under column
    pruning (different exchange children → no reuse → divergent range
    sampling → straddling windows miscounted, visible only via the
    Arrow toPandas path). The lazy-checkpoint pin must hold for BOTH
    collect paths, with payload columns forcing asymmetric pruning."""
    from pyspark.sql import functions as F

    from stream_spark.operators.rownum import with_global_row_number

    df = spark.range(30_000).select(
        F.col("id"),
        (F.col("id") * 37 % 9973).alias("k"),
        F.concat(F.lit("payload"), F.col("id")).alias("txt"),
    )
    rn = with_global_row_number(df, ["k", "id"])
    # windowed completeness over rn — the exact shape that broke
    win = (
        rn.withColumn("w", ((F.col("rn") - 1) / 100).cast("long"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") == 100)
    )
    assert win.count() == 300
    assert len(win.toPandas()) == 300


def test_rownum_fallback_offsets_survive_arrow_collect(spark):
    """The sampled-range fallback (string first key, r11) keeps the
    r10 lazy-checkpoint pin — same straddling-window shape, both
    collect paths."""
    from pyspark.sql import functions as F

    from stream_spark.operators.rownum import with_global_row_number

    df = spark.range(30_000).select(
        F.col("id"),
        F.format_string("k%05d", (F.col("id") * 37 % 9973)).alias("k"),
        F.concat(F.lit("payload"), F.col("id")).alias("txt"),
    )
    rn = with_global_row_number(df, ["k", "id"])
    win = (
        rn.withColumn("w", ((F.col("rn") - 1) / 100).cast("long"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") == 100)
    )
    assert win.count() == 300
    assert len(win.toPandas()) == 300


def test_rownum_boundary_layout_repeat_and_append_exact(spark, tmp_path):
    """r11 boundary layout: the construction metadata (quantile
    boundaries + per-bucket totals) is recomputed at EVERY construction
    — a repeated identical plan stays exact, and an append to the file
    set is immediately reflected in the numbering (no stale
    cross-construction state anywhere)."""
    from pyspark.sql import functions as F

    import stream_spark.operators.rownum as rn

    p = str(tmp_path / "t")
    spark.range(5000).select(
        (F.col("id") * 13 % 5000).alias("k"), F.col("id").alias("i")
    ).write.parquet(p)
    assert rn.with_global_row_number(spark.read.parquet(p), ["k", "i"]).count() == 5000
    # second construction: same plan, independent metadata jobs, exact
    assert rn.with_global_row_number(spark.read.parquet(p), ["k", "i"]).count() == 5000
    # append → the very next construction numbers the grown file set
    spark.range(5000, 7000).select(
        (F.col("id") * 13 % 5000).alias("k"), F.col("id").alias("i")
    ).write.mode("append").parquet(p)
    out = rn.with_global_row_number(spark.read.parquet(p), ["k", "i"])
    rows = out.orderBy("rn").collect()
    assert [r["rn"] for r in rows] == list(range(1, 7001))
    assert rows == sorted(rows, key=lambda r: (r["k"], r["i"]))


def test_rownum_boundary_bucketing_is_monotone_and_total(spark):
    """Adversarial key distributions through the boundary layout: heavy
    duplicates (ties must never split buckets), all-equal keys
    (degenerates to one bucket, still exact), and NULL keys (sort
    first, bucket 0)."""
    from pyspark.sql import functions as F

    from stream_spark.operators.rownum import with_global_row_number

    dup = spark.range(2000).select((F.col("id") % 3).alias("k"), F.col("id").alias("i"))
    rows = with_global_row_number(dup, ["k", "i"]).orderBy("rn").collect()
    assert [r["rn"] for r in rows] == list(range(1, 2001))
    assert rows == sorted(rows, key=lambda r: (r["k"], r["i"]))

    eq = spark.range(500).select(F.lit(7).alias("k"), F.col("id").alias("i"))
    rows = with_global_row_number(eq, ["k", "i"]).orderBy("rn").collect()
    assert [r["rn"] for r in rows] == list(range(1, 501))

    withnull = spark.range(1000).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("i"),
    )
    rows = with_global_row_number(withnull, ["k", "i"]).orderBy("rn").collect()
    assert [r["rn"] for r in rows] == list(range(1, 1001))
    # nulls-first total order
    keyed = [((0, 0) if r["k"] is None else (1, r["k"]), r["i"]) for r in rows]
    assert keyed == sorted(keyed)


def test_rownum_two_level_bucket_search_exact(spark):
    """Force >64 boundaries (the √m block-search spelling) and verify
    the numbering stays exact end to end."""
    from pyspark.sql import functions as F

    import stream_spark.operators.rownum as rn

    df = spark.range(20_000).select((F.col("id") * 7919 % 20_000).alias("k"), F.col("id").alias("i"))
    skey = rn._surrogate_sql(df, "k")
    bounds = rn._key_boundaries(df, skey, 200)
    assert bounds is not None and len(bounds) > 64
    sql = rn._pid_sql(bounds, skey)
    got = df.selectExpr("k", f"{sql} AS p").collect()
    for r in got:
        want = sum(1 for b in bounds if b < float(r["k"]))
        assert r["p"] == want, (r["k"], r["p"], want)


def test_triangle_counts_known_graph(spark):
    """K4 plus a pendant: K4 has 4 triangles, each K4 node touches
    exactly 3 of them; the pendant node is in none."""
    from pyspark.sql import functions as F  # noqa: F401

    from stream_spark.operators.components import triangle_counts

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # duplicate + reversed edges must not change the counts
    df2 = spark.createDataFrame(edges + [(2, 1), (3, 1), (1, 2)], "u long, v long")
    assert {r["node"]: r["n_triangles"] for r in triangle_counts(df2).collect()} == got


def test_table_diff_branches(spark):
    from stream_spark.operators.merge import table_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 9.0), (4, None, 4.0), (5, "e", 5.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["change_type"] for r in table_diff(old, new, ["k"]).collect()}
    # 1 unchanged (absent), 2 changed, 3 removed, 4 unchanged w/ null col, 5 added
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_fuzzy_name_pairs_blocking_and_bound(spark):
    from stream_spark.operators.fuzzy import fuzzy_name_pairs

    rows = [
        (1, "red bolt"), (2, "rad bolt"), (3, "red bolt"),  # dup value
        (4, "blue bolt"), (5, "red gear"),                   # gear: other block
        (6, "completely different bolt"),                    # same block, far
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["name_a"], r["name_b"]): r["dist"] for r in fuzzy_name_pairs(df, "name", 2).collect()}
    assert got == {("rad bolt", "red bolt"): 1}  # distinct values, one close pair
    wide = {(r["name_a"], r["name_b"]) for r in fuzzy_name_pairs(df, "name", 4).collect()}
    assert ("blue bolt", "red bolt") in wide       # dist 4 within block
    assert not any("gear" in a and "bolt" in b or "bolt" in a and "gear" in b for a, b in wide)


def test_star_components_depth_bound_on_adversarial_graphs(spark):
    """Depth bound: a 256-node path (diameter 255) must converge in
    O(log n) star rounds, and a clique swarm must collapse in the
    pre-contraction (0-1 star rounds) — the adversarial shapes behind
    the sf1 probe's component-closure ratio. Also pins the convergence
    assertion: max_iter=1 on the deep path raises instead of returning
    a silently wrong clustering."""
    import pytest

    from stream_spark.operators.components import connected_components_star

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(255)], "doc_a long, doc_b long"
    )
    comp = {r["node"]: r["component"] for r in connected_components_star(path).collect()}
    assert set(comp.values()) == {0} and len(comp) == 256
    assert connected_components_star.last_rounds <= 10  # ~log2(256) + slack

    # two 40-node cliques: contraction alone collapses them
    cliques = spark.createDataFrame(
        [(base + i, base + j) for base in (0, 1000) for i in range(40) for j in range(i + 1, 40)],
        "doc_a long, doc_b long",
    )
    comp = {r["node"]: r["component"] for r in connected_components_star(cliques).collect()}
    assert set(comp.values()) == {0, 1000} and len(comp) == 80
    assert connected_components_star.last_rounds <= 1

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(path, max_iter=1)


def test_daily_ewma_hand_computed(spark, tmp_path):
    """alpha=1/2 truncated-8 EWMA with partial-head renormalization:
    exact rational expectations on a 3-day series with a gap (the
    frame is over grid ROWS, gaps don't pad)."""
    import pandas as pd

    # pandas/pyarrow writes ns-annotated timestamps, the same layout
    # as the driver testdata (load_table's nanosAsLong path)
    pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [1, 1, 1, 1],
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [10.0, 40.0, 20.0, 70.0],
            "o_orderdate": pd.to_datetime(
                ["1995-01-01", "1995-01-02", "1995-01-02", "1995-01-09"]  # gap week
            ),
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    ).to_parquet(str(tmp_path / "orders.parquet"))

    from stream_spark.queries import QUERIES

    out = sorted(
        QUERIES["orders_daily_ewma"](spark, str(tmp_path)).collect(),
        key=lambda r: r["day_ms"],
    )
    got = [(r["day_total"], r["ewma_8"]) for r in out]
    # day1: 10 -> ewma 10; day2: 60 -> (2*60+10)/3; day3 (grid row 3,
    # despite the calendar gap): 70 -> (4*70+2*60+10)/7
    assert got[0] == (10.0, 10.0)
    assert got[1] == (60.0, (2 * 60 + 10) / 3)
    assert got[2] == (70.0, (4 * 70 + 2 * 60 + 10) / 7)


def test_asof_nearest_directions_and_ties(spark):
    """Nearest-direction pick: backward when closer, forward when
    closer, backward on exact tie, NULL when the key has no right
    rows; equal-ts right row wins with delta 0."""
    from stream_spark.operators.asof import asof_nearest

    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 205), (3, "u2", 50), (4, "u3", 10), (5, "u1", 300)],
        "id long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("u1", 90), ("u1", 120), ("u1", 300), ("u2", 60)], "k string, ts long"
    )
    out = {r["id"]: r for r in asof_nearest(left, right, "k", "ts", "ts").collect()}
    assert (out[1]["near_ts"], out[1]["direction"], out[1]["delta"]) == (90, "backward", 10)
    # id 2 at 205: backward 120 (85 away), forward 300 (95 away) -> backward
    assert (out[2]["near_ts"], out[2]["direction"]) == (120, "backward")
    # id 3 at 50: only forward 60 exists for u2
    assert (out[3]["near_ts"], out[3]["direction"], out[3]["delta"]) == (60, "forward", 10)
    # id 4: u3 has no right rows
    assert out[4]["near_ts"] is None and out[4]["direction"] is None
    # id 5 at 300: equal-ts click -> backward, delta 0
    assert (out[5]["near_ts"], out[5]["direction"], out[5]["delta"]) == (300, "backward", 0)


def test_asof_nearest_exact_tie_prefers_backward(spark):
    from stream_spark.operators.asof import asof_nearest

    left = spark.createDataFrame([(1, "u", 100)], "id long, k string, ts long")
    right = spark.createDataFrame([("u", 90), ("u", 110)], "k string, ts long")
    r = asof_nearest(left, right, "k", "ts", "ts").collect()[0]
    assert (r["near_ts"], r["direction"], r["delta"]) == (90, "backward", 10)


def test_sized_partitions_grows_with_input_bytes(spark, tmp_path):
    """r6 (VERDICT item 2): the two-pass rownum primitives size their
    range-exchange partition count from INPUT BYTES (target ~128 MB per
    partition), floored at defaultParallelism and capped — never the
    data-independent defaultParallelism constant alone."""
    from pyspark.sql import functions as F

    from stream_spark.operators.rownum import MAX_RANGE_PARTITIONS, sized_partitions

    sp, bp = str(tmp_path / "s"), str(tmp_path / "b")
    pad = F.repeat(F.sha2(F.col("id").cast("string"), 256), 4)
    spark.range(500).withColumn("pad", pad).write.parquet(sp)
    spark.range(100_000).withColumn("pad", pad).write.parquet(bp)
    small, big = spark.read.parquet(sp), spark.read.parquet(bp)
    floor = spark.sparkContext.defaultParallelism

    s = sized_partitions(small, target_bytes=1024)
    b = sized_partitions(big, target_bytes=1024)
    assert b > s >= floor, (s, b, floor)
    # cap: a 1-byte target on a multi-MB file must clamp, not explode
    assert sized_partitions(big, target_bytes=1) == MAX_RANGE_PARTITIONS
    # at test scale the default 128 MB target leaves the floor in
    # charge — the r5 plans (and the sf1 probe) are unchanged
    assert sized_partitions(big) == floor


def test_rownum_correct_under_sized_partitions(spark, tmp_path):
    """Global rn/cumsum stay exact when the sized count exceeds the
    floor (many partitions, some possibly empty)."""
    from pyspark.sql import functions as F

    import stream_spark.operators.rownum as rn

    df = spark.range(10_000).select(
        (F.col("id") * 7919 % 10_000).alias("ts"), F.col("id").alias("event_id")
    )
    out = rn.with_global_row_number(df, ["ts", "event_id"])
    rows = out.orderBy("rn").collect()
    assert [r["rn"] for r in rows] == list(range(1, 10_001))
    assert rows == sorted(rows, key=lambda r: (r["ts"], r["event_id"]))


def test_cpu_partitions_floor_and_scaling(spark, tmp_path):
    """The explode-feeding exchanges (shingle/fingerprint/banded-index
    repartitions) are data-sized too (r6): floor = defaultParallelism
    at test SF (plans unchanged), scaling with bytes at its ~32 MB
    target exactly like sized_partitions."""
    from pyspark.sql import functions as F

    from stream_spark.operators.rownum import (
        CPU_TARGET_PARTITION_BYTES,
        cpu_partitions,
        sized_partitions,
    )

    p = str(tmp_path / "d")
    pad = F.repeat(F.sha2(F.col("id").cast("string"), 256), 4)
    spark.range(50_000).withColumn("pad", pad).write.parquet(p)
    df = spark.read.parquet(p)
    floor = spark.sparkContext.defaultParallelism
    assert cpu_partitions(df) == sized_partitions(df, CPU_TARGET_PARTITION_BYTES)
    assert cpu_partitions(df) == floor  # test-SF inputs stay at the floor
    assert sized_partitions(df, 1024) > floor  # …but the count is data-driven


def test_sized_partitions_unknown_stats_fall_back_to_floor(spark):
    """A localCheckpoint'ed frame reports Catalyst's Long.MaxValue
    stats sentinel — that must mean 'unknown → floor', never 'huge →
    cap' (the r6 bug: a 2k-row checkpointed frame got a
    131072-partition exchange)."""
    from stream_spark.operators.rownum import cpu_partitions, sized_partitions

    df = spark.range(2000).localCheckpoint(eager=True)
    floor = spark.sparkContext.defaultParallelism
    assert sized_partitions(df) == floor
    assert cpu_partitions(df) == floor


def test_topk_rank_matches_global_rownum_filter(spark):
    """with_topk_rank's contract: result-identical to
    with_global_row_number + filter(rank <= k), planned as the native
    TakeOrderedAndProject (no range layout, no WindowExec). Parity is
    asserted on a frame with duplicate sort keys (ties broken by id)
    and on both collect paths; the plan must carry TakeOrderedAndProject
    and no Window."""
    from pyspark.sql import functions as F

    from stream_spark.operators.rownum import with_global_row_number, with_topk_rank

    df = spark.range(20_000).select(
        F.col("id"),
        (F.col("id") * 37 % 997).alias("k"),  # duplicate keys → tie-broken order
    )
    k = 25
    fast = with_topk_rank(df, ["k", "id"], k, out="rank")
    slow = (
        with_global_row_number(df, ["k", "id"], out="rank")
        .filter(F.col("rank") <= k)
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))
    assert sorted(map(tuple, fast.toPandas().itertuples(index=False))) == sorted(
        map(tuple, slow.toPandas().itertuples(index=False))
    )
    plan = fast._jdf.queryExecution().executedPlan().treeString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan

    # empty input and k larger than the frame
    empty = with_topk_rank(df.filter(F.lit(False)), ["k", "id"], 5)
    assert empty.count() == 0
    small = with_topk_rank(df.filter(F.col("id") < 3), ["id"], 10, out="r").collect()
    assert sorted((r["id"], r["r"]) for r in small) == [(0, 1), (1, 2), (2, 3)]
