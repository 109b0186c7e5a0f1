from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_spark.operators.similarity import (
    cosine,
    cosine_pairs,
    cosine_pairs_lsh,
    hyperplane_weights,
    lsh_bucket,
    topk_bruteforce,
    topk_lsh,
)


@pytest.fixture()
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_known_values(vecs):
    df = vecs.filter(F.col("vec_id").isin(0, 2))
    pairs = cosine_pairs(df, threshold=-1.0)
    got = pairs.collect()[0]
    assert abs(got["cosine"]) < 1e-9  # orthogonal


def test_topk_bruteforce_ordering(vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    c = vecs.filter(F.col("vec_id") > 0)
    out = topk_bruteforce(q, c, k=3).collect()
    ranked = [(r["rank"], r["neighbor_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [(1, 1), (2, 2), (3, 3)]  # cos: ~0.994, 0, -1


def test_hyperplanes_deterministic():
    assert hyperplane_weights(2, 4) == hyperplane_weights(2, 4)
    assert all(-1.0 <= w <= 1.0 for row in hyperplane_weights(4, 64) for w in row)


def test_topk_lsh_returns_bucket_neighbors(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 3)
    c = df.filter(F.col("vec_id") >= 3)
    out = topk_lsh(q, c, k=5)
    rows = out.collect()
    assert len(rows) <= 15
    for r in rows:
        assert -1.0 <= r["cosine"] <= 1.0


def test_cosine_pairs_lsh_is_brute_restricted_to_buckets(spark):
    """The LSH pairs operator must equal the brute operator filtered to
    same-bucket pairs (its exact contract), and be a subset of brute."""
    import random

    rnd = random.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    thr = 0.0
    lsh = {(r["id_a"], r["id_b"]) for r in cosine_pairs_lsh(df, threshold=thr).collect()}
    brute = cosine_pairs(df, threshold=thr)
    buckets = {
        r["vec_id"]: r["bk"]
        for r in df.select("vec_id", lsh_bucket(F.col("embedding")).alias("bk")).collect()
    }
    expected = {
        (r["id_a"], r["id_b"])
        for r in brute.collect()
        if buckets[r["id_a"]] == buckets[r["id_b"]]
    }
    assert lsh == expected
    assert lsh <= {(r["id_a"], r["id_b"]) for r in brute.collect()}


def test_topk_pandas_matches_exact_neighbor_sets(spark):
    import random

    from stream_spark.operators.ann_pandas import topk_pandas
    from pyspark.sql import functions as F

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(32)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 4)
    c = df.filter(F.col("vec_id") >= 4)
    exact = topk_bruteforce(q, c, k=5)
    fast = topk_pandas(q, c, k=5)
    es = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    fs = {(r["query_id"], r["neighbor_id"]) for r in fast.collect()}
    assert es == fs


def test_ivf_recall_vs_brute(spark, sf_dir):
    """IVF with n_probe=4/16 cells must find most true neighbors, and
    every reported neighbor's cosine must agree with the exact one."""
    from stream_spark.operators.similarity import topk_ivf
    from stream_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in topk_bruteforce(q, c, 5).collect()}
    approx = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in topk_ivf(q, c, 5).collect()}
    # every returned pair that is also in the exact top-5 has the same score
    for pair, cos in approx.items():
        if pair in exact:
            assert abs(cos - exact[pair]) < 1e-9
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.3  # 4/16 cells probed; deterministic seeding


def test_kmeans_deterministic_and_converging(spark, sf_dir):
    """Same input → identical assignments across runs; every vector
    lands in exactly one of k clusters; a second round never lowers a
    vector's cosine to its assigned centroid on average."""
    from stream_spark.operators.clustering import kmeans_assign
    from stream_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = kmeans_assign(emb, k=4, iters=2)
    b = kmeans_assign(emb, k=4, iters=2)
    ra = {r["vec_id"]: (r["cluster"], r["cos"]) for r in a.collect()}
    rb = {r["vec_id"]: (r["cluster"], r["cos"]) for r in b.collect()}
    assert ra == rb
    assert ra, "no assignments"
    assert set(c for c, _ in ra.values()) <= set(range(4))
    assert emb.count() == len(ra)

    one = {r["vec_id"]: r["cos"] for r in kmeans_assign(emb, k=4, iters=1).collect()}
    two = {k_: c for k_, (_cl, c) in ra.items()}
    import statistics
    assert statistics.mean(two.values()) >= statistics.mean(one.values()) - 1e-12


def test_kmeans_inplan_matches_literal_path(spark, sf_dir):
    """The large-k in-plan assignment (broadcast centroid table +
    map-side-combined argmax) must be BIT-IDENTICAL to the literal-
    centroid path at any k where both run — same decimal arithmetic,
    same lowest-cell tie-break, so divergence means a real bug. Since
    the r11 fused refine pass this also pins the fused partial MEANS
    (inplan) against the Catalyst posexplode means (literal path)."""
    from stream_spark.operators.clustering import kmeans_assign, kmeans_assign_inplan
    from stream_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    lit = {r["vec_id"]: (r["cluster"], r["cos"]) for r in kmeans_assign(emb, k=6, iters=2).collect()}
    inp = {r["vec_id"]: (r["cluster"], r["cos"]) for r in kmeans_assign_inplan(emb, k=6, iters=2).collect()}
    assert lit == inp


def _quantize_stress_embeddings(spark, dim=8, n=40, with_nan=False):
    """Corpus whose components stress the scale-12 HALF_UP
    quantization the fused mean pass vectorizes: exact half-boundary
    ties (odd multiples of 1/2^13 — the decimal expansion terminates
    with a 5 in position 13, where HALF_UP and rint/half-even
    disagree), shortest-repr values (0.1·j), negatives, zeros, integer
    values, and a ~1e2 magnitude."""
    tie = 1.0 / 8192.0
    rows = []
    for i in range(n):
        v = []
        for j in range(dim):
            t = (i * dim + j) % 7
            v.append(
                [
                    tie * (2 * (i + j) + 1),
                    -tie * (2 * i + 3),
                    0.1 * (j + 1),
                    -0.7 + 0.013 * i,
                    float(i - j),
                    123.456789 + i,
                    0.0,
                ][t]
            )
        if with_nan and i == 5:
            v[2] = float("nan")
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_fused_mean_partials_match_catalyst_aggregate(spark):
    """The fused Lloyd mean pass (per-batch scaled-integer partials:
    similarity._mean_partials_from_batch + exact_means_by_cell) must be
    BIT-IDENTICAL to the Catalyst posexplode spelling
    sum(cast(x as decimal(28,12))).cast("double") / count(x) over the
    SAME assignment, on the quantize-stress corpus — including a NaN
    element (cast→NULL skipped by SUM but still counted by count(x);
    the fused path zeroes the contribution and counts the row)."""
    import numpy as np

    from stream_spark.operators.clustering import _assign_arrow, _refine_means

    emb = _quantize_stress_embeddings(spark, with_nan=True)
    base = emb.select(
        F.col("vec_id").alias("_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    seed_rows = base.orderBy("_id").limit(3).collect()
    cells = list(range(3))
    mat = np.array([[float(x) for x in r["v"]] for r in seed_rows])

    fused = _refine_means(base, cells, mat)

    assigned = _assign_arrow(base, cells, mat, "bigint", keep_vec=True)
    ref_rows = (
        assigned.select("cluster", F.posexplode("v").alias("i", "x"))
        .groupBy("cluster", "i")
        .agg((F.sum(F.col("x").cast("decimal(28,12)")).cast("double") / F.count("x")).alias("m"))
        .groupBy(F.col("cluster").alias("cell"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
            ).alias("cv")
        )
        .collect()
    )
    ref = sorted((int(r["cell"]), [float(x) for x in r["cv"]]) for r in ref_rows)
    assert [c for c, _ in fused] == [c for c, _ in ref]
    for (cf, vf), (_cr, vr) in zip(fused, ref):
        assert vf == vr, (cf, vf, vr)  # bit-identical doubles


def test_kmeans_inplan_fused_means_adversarial_parity(spark):
    """End-to-end: inplan (fused refine means) vs the literal path
    (Catalyst posexplode means) stay bit-identical over 3 Lloyd rounds
    on the quantize-stress corpus — every refine round's centroid
    divergence would compound into different assignments."""
    from stream_spark.operators.clustering import kmeans_assign, kmeans_assign_inplan

    emb = _quantize_stress_embeddings(spark)
    lit = {r["vec_id"]: (r["cluster"], r["cos"]) for r in kmeans_assign(emb, k=4, iters=3).collect()}
    inp = {r["vec_id"]: (r["cluster"], r["cos"]) for r in kmeans_assign_inplan(emb, k=4, iters=3).collect()}
    assert lit == inp


def test_ivf_refined_centroids_fused_match_posexplode(spark):
    """ivf_centroids' fused refine rounds reproduce the former
    assign_cells_arrow + posexplode Catalyst spelling bit-for-bit
    (including the keep-seed-on-empty-cell rule), over 2 rounds on the
    quantize-stress corpus."""
    from stream_spark.operators.similarity import assign_cells_arrow, ivf_centroids

    corpus = _quantize_stress_embeddings(spark)
    fused = ivf_centroids(corpus, 4, refine_iters=2)

    cents = corpus.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")).orderBy("cid").limit(4).collect()
    ref = [[float(x) for x in r["cv"]] for r in cents]
    for _ in range(2):
        assigned_r = assign_cells_arrow(
            corpus, ref, "vec_id", "embedding", keep_vec=True, vec_out="v"
        ).select("v", "cell")
        rows = (
            assigned_r.select("cell", F.posexplode("v").alias("i", "x"))
            .groupBy("cell", "i")
            .agg((F.sum(F.col("x").cast("decimal(28,12)")).cast("double") / F.count("x")).alias("m"))
            .collect()
        )
        upd: dict[int, dict[int, float]] = {}
        for r in rows:
            upd.setdefault(int(r["cell"]), {})[int(r["i"])] = float(r["m"])
        ref = [
            [upd[j][i] for i in sorted(upd[j])] if j in upd else ref[j]
            for j in range(len(ref))
        ]
    assert fused == ref


def test_semantic_dedup_groups_identical_vectors(spark):
    """SemDeDup on a constructed corpus: three copies of one vector and
    two of another collapse to keepers with the right sizes; distinct
    vectors stay singletons; every id appears exactly once in the
    partition (keeper multiplicity Σ sizes == corpus size)."""
    from stream_spark.operators.clustering import semantic_dedup_clusters

    v1 = [1.0, 0.0, 0.0, 0.0]
    v2 = [0.0, 1.0, 0.0, 0.0]
    v3 = [0.0, 0.0, 1.0, 0.0]
    rows = [(1, v1), (2, v2), (3, v1), (4, v3), (5, v1), (6, v2)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["keeper_id"]: r["cluster_size"]
        for r in semantic_dedup_clusters(emb, threshold=0.95, members_per_cluster=64).collect()
    }
    assert out[1] == 3  # {1,3,5}
    assert out[2] == 2  # {2,6}
    assert out[4] == 1
    assert sum(out.values()) == 6


def test_ivf_refined_recall_and_exact_scores(spark, sf_dir):
    """One Lloyd refinement round: scores still exact, recall at least
    as usable as the seeded variant's floor."""
    from stream_spark.operators.similarity import topk_ivf
    from stream_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in topk_bruteforce(q, c, 5).collect()}
    ref = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in topk_ivf(q, c, 5, refine_iters=1).collect()}
    for pair, cos in ref.items():
        if pair in exact:
            assert abs(cos - exact[pair]) < 1e-9
    assert len(set(ref) & set(exact)) / len(exact) >= 0.3


def test_kmeans_parallel_seeds_deterministic_and_spread(spark, sf_dir):
    from stream_spark.operators.clustering import kmeans_parallel_seeds
    from stream_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    k = 6
    s1 = kmeans_parallel_seeds(emb, k)
    s2 = kmeans_parallel_seeds(emb, k)
    assert s1 == s2  # hash-sampled, no RNG
    assert len(s1) == k
    assert len({tuple(v) for v in s1}) == k  # distinct seeds


def test_kmeans_parallel_seeding_cost_not_worse(spark, sf_dir):
    """Seeding cost Σ(1 - max cos) with k-means|| seeds should beat (or
    at worst match) the naive k-lowest-id seeds."""
    from pyspark.sql import functions as F
    from stream_spark.operators.clustering import (
        _assign,
        kmeans_parallel_seeds,
    )
    from stream_spark.operators.similarity import norm
    from stream_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    k = 6
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(F.col("vec_id").alias("_id"), vec_d.alias("v")).withColumn(
        "nrm", norm(F.col("v"))
    )

    def cost(cents):
        return _assign(base, cents).agg(
            F.sum((F.lit(1.0) - F.col("cos")).cast("decimal(28,12)")).cast("double")
        ).collect()[0][0]

    naive_rows = emb.select("vec_id", vec_d.alias("v")).orderBy("vec_id").limit(k).collect()
    naive = [(i, [float(x) for x in r["v"]]) for i, r in enumerate(naive_rows)]
    par = [(i, v) for i, v in enumerate(kmeans_parallel_seeds(emb, k))]
    assert cost(par) <= cost(naive) * 1.001


def test_kmeans_assign_parallel_seeding_runs(spark, sf_dir):
    from stream_spark.operators.clustering import kmeans_assign
    from stream_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans_assign(emb, k=4, iters=2, seeding="parallel")
    rows = out.collect()
    assert len(rows) == emb.count()
    assert 1 < len({r["cluster"] for r in rows}) <= 4

    import pytest

    with pytest.raises(ValueError):
        kmeans_assign(emb, k=4, seeding="nope")


def test_banded_lsh_bucket_space_and_bounded_pair_volume(spark):
    """OR-construction scale contract (VERDICT r2 #1): each of the H
    tables buckets into a 2^b space with b >= 12. On an ADVERSARIAL
    half-space corpus (every coordinate positive — the worst benign case
    for sign LSH, since planes whose weight sum is large become
    constant-sign) the r2 AND-only 4-plane scheme collapses to 8 buckets
    (~468k pairs at n=1500); banded must (a) keep >50 live buckets in
    EVERY table, (b) beat the AND-only pair volume even uncapped, and
    (c) with the documented max_bucket_size control land far below
    n²/16."""
    import random

    from stream_spark.operators.similarity import BAND_PLANES, N_TABLES, banded_buckets, lsh_bucket

    assert BAND_PLANES >= 12 and (1 << BAND_PLANES) >= 4096
    rnd = random.Random(11)
    n = 1500
    rows = [(i, [rnd.uniform(0.0, 1.0) for _ in range(64)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    and4 = [
        r["count"]
        for r in df.select(lsh_bucket(F.col("embedding")).alias("bk")).groupBy("bk").count().collect()
    ]
    and4_pairs = sum(m * (m - 1) // 2 for m in and4)
    idx = (
        df.select(F.explode(banded_buckets(F.col("embedding"))).alias("tb"))
        .select(F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))
    )
    hist = idx.groupBy("t", "bucket").count().collect()
    per_table: dict[int, list[int]] = {}
    for r in hist:
        per_table.setdefault(r["t"], []).append(r["count"])
    assert len(per_table) == N_TABLES
    total_pairs = capped_pairs = 0
    for t, counts in per_table.items():
        # the b-bit code space is actually exercised, not collapsed
        assert len(counts) > 50, f"table {t}: only {len(counts)} buckets hit"
        total_pairs += sum(m * (m - 1) // 2 for m in counts)
        capped_pairs += sum(m * (m - 1) // 2 for m in counts if m <= 50)
    assert total_pairs < and4_pairs, (total_pairs, and4_pairs)
    assert capped_pairs < (n * n / 16) / 2, capped_pairs


def test_banded_lsh_recall_vs_brute_on_planted_neardups(spark):
    """Recall tolerance (VERDICT r2 #1): plant 40 near-dup pairs at
    cosine ≈0.99 among 400 background vectors; with H=8 tables × b=12
    planes the theoretical pair recall at θ=acos(0.99) is ≈0.997 — the
    operator must recover ≥90% of the brute-force pairs, and every pair
    it reports must BE a brute pair with the identical exact-decimal
    cosine."""
    import random

    from stream_spark.operators.similarity import cosine_pairs, cosine_pairs_lsh_banded

    rnd = random.Random(5)
    rows = []
    vid = 0
    for _ in range(40):  # planted pair: v and v + tiny noise
        v = [rnd.gauss(0, 1) for _ in range(64)]
        w = [x + rnd.gauss(0, 0.02) for x in v]
        rows.append((vid, v)); rows.append((vid + 1, w))
        vid += 2
    for _ in range(320):  # background
        rows.append((vid, [rnd.gauss(0, 1) for _ in range(64)])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    thr = 0.95
    brute = {(r["id_a"], r["id_b"]): r["cosine"] for r in cosine_pairs(df, thr).collect()}
    banded = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs_lsh_banded(df, thr).collect()
    }
    assert len(brute) >= 40
    assert set(banded) <= set(brute)  # no false positives, same exact scores
    for k, v in banded.items():
        assert v == brute[k]
    recall = len(banded) / len(brute)
    assert recall >= 0.9, f"recall {recall:.3f} over {len(brute)} true pairs"


def test_banded_lsh_max_bucket_size_drops_identical_swarm(spark):
    """An identical-vector swarm collides in EVERY table; max_bucket_size
    must cap the pair volume by dropping those buckets while keeping
    normal pairs."""
    import random

    from stream_spark.operators.similarity import cosine_pairs_lsh_banded

    rnd = random.Random(9)
    swarm = [1.0] * 64
    rows = [(i, swarm) for i in range(100)]  # 100 identical vectors
    v = [rnd.gauss(0, 1) for _ in range(64)]
    rows.append((1000, v))
    rows.append((1001, [x + rnd.gauss(0, 0.01) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_pairs_lsh_banded(df, threshold=0.95, max_bucket_size=10)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1000, 1001) in got  # the small-bucket pair survives
    assert not any(a < 100 and b < 100 for a, b in got)  # swarm dropped


def test_banded_index_matches_catalyst_buckets(spark):
    """The vectorized (matmul) index must agree bit-for-bit with the
    all-decimal Catalyst fold on every (id, table): the float64 sign is
    exact away from zero and the near-zero escape recomputes with the
    oracle's decimal arithmetic."""
    import random

    from stream_spark.operators.similarity import banded_buckets, banded_index

    rnd = random.Random(21)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fast = {
        (r["id"], r["t"]): r["bucket"] for r in banded_index(df).collect()
    }
    slow = {}
    for r in df.select(
        "vec_id", F.explode(banded_buckets(F.col("embedding"))).alias("tb")
    ).collect():
        slow[(r["vec_id"], r["tb"]["t"])] = r["tb"]["bucket"]
    assert fast == slow


def test_banded_lsh_centering_rebalances_halfspace_buckets(spark):
    """Sign LSH assumes zero-centered data; on the all-positive corpus
    centering must multiply the live-bucket count and slash the hot
    bucket — the documented cure for the adversarial case above."""
    import random

    from stream_spark.operators.similarity import banded_index, embedding_mean

    rnd = random.Random(11)
    n = 1500
    rows = [(i, [rnd.uniform(0.0, 1.0) for _ in range(64)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def stats(idx):
        per = {}
        for r in idx.groupBy("t", "bucket").count().collect():
            per.setdefault(r["t"], []).append(r["count"])
        buckets = min(len(v) for v in per.values())
        hot = max(max(v) for v in per.values())
        pairs = sum(m * (m - 1) // 2 for v in per.values() for m in v)
        return buckets, hot, pairs

    b0, h0, p0 = stats(banded_index(df))
    mu = embedding_mean(df)
    assert len(mu) == 64 and all(0.3 < m < 0.7 for m in mu)
    b1, h1, p1 = stats(banded_index(df, center=mu))
    assert b1 >= 4 * b0, (b0, b1)
    assert h1 * 4 <= h0, (h0, h1)
    assert p1 * 10 <= p0, (p0, p1)


def test_pq_seed_vectors_encode_to_themselves_and_topk_finds_planted(spark):
    """Each codebook seed's subvectors are distance-0 to their own
    centroid, so seeds encode to their own code in every subspace; a
    query equal to corpus vector X must rank X first under asymmetric
    PQ distance (its LUT entries for X's codes sum to X's quantization
    residual, minimal here since X is a seed → adist 0)."""
    import random

    from stream_spark.operators.pq import K_CODES, N_SUB, pq_codes, topk_pq

    rnd = random.Random(13)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes = {(r["id"], r["sub"]): r["code"] for r in pq_codes(df).collect()}
    assert len(codes) == 40 * N_SUB
    for i in range(K_CODES):  # seeds are the K lowest ids
        for s in range(N_SUB):
            assert codes[(i, s)] == i, (i, s, codes[(i, s)])
    # query = corpus vector 3 (a seed): adist to itself is exactly 0
    q = df.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    out = topk_pq(q, df, 3).collect()
    best = min(out, key=lambda r: r["rank"])
    assert best["neighbor_id"] == 3 and best["adist"] == 0.0


def test_hard_negatives_exclude_query_label(spark, sf_dir):
    """Every mined negative has a different label than its query, and
    each negative's cosine is >= the best SAME-label vector that ranks
    below it would not beat it (i.e. ranking is by cosine among the
    label-excluded set only)."""
    from stream_spark.operators.similarity import hard_negatives
    from stream_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    out = hard_negatives(q, c, 5).collect()
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    assert out, "no negatives mined"
    per_q: dict = {}
    for r in out:
        assert labels[r["query_id"]] != labels[r["neighbor_id"]]
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for ranks in per_q.values():
        ranks.sort()
        assert [rk for rk, _ in ranks] == list(range(1, len(ranks) + 1))
        coss = [cs for _, cs in ranks]
        assert coss == sorted(coss, reverse=True)


def test_ivfpq_agrees_with_pq_on_overlap(spark, sf_dir):
    """IVF-PQ = PQ restricted to probed cells: every (query, neighbor)
    it returns must carry the IDENTICAL asymmetric distance the
    full-scan PQ computes, and per-query ranks are contiguous."""
    from stream_spark.operators.pq import topk_ivfpq, topk_pq
    from stream_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    full = {(r["query_id"], r["neighbor_id"]): r["adist"] for r in topk_pq(q, c, 50).collect()}
    ivf = topk_ivfpq(q, c, 5).collect()
    assert ivf, "no ivfpq results"
    per_q: dict = {}
    for r in ivf:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
        key = (r["query_id"], r["neighbor_id"])
        if key in full:
            assert abs(r["adist"] - full[key]) < 1e-12
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_two_phase_tie_resolves_to_lowest_code_and_cell(spark):
    """Identical seed vectors make codebook entries 0 and 1 exactly
    equidistant from every row — the float prefilter keeps BOTH and
    the decimal phase must re-resolve to the LOWER code/cell, proving
    the two-phase path's tie contract (not just its fast path)."""
    from stream_spark.operators.clustering import kmeans_assign_inplan
    from stream_spark.operators.pq import pq_codes
    from stream_spark.operators.similarity import assign_cell_two_phase
    from pyspark.sql import functions as F

    base = [float((i * 3) % 7 - 3) for i in range(64)]
    other = [float((i * 5) % 11 - 5) for i in range(64)]
    rows = [(0, base), (1, base), (2, other), (3, [x + 0.25 for x in base])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    codes = pq_codes(emb, k=2).collect()
    assert codes, "no codes"
    # seeds 0 and 1 identical -> both codebook entries equal -> every
    # (id, sub) must carry code 0
    assert all(r["code"] == 0 for r in codes)

    cents = [base, base, other]
    got = {
        r["vec_id"]: r["cell"]
        for r in emb.select(
            "vec_id", assign_cell_two_phase(F.col("embedding"), cents).alias("cell")
        ).collect()
    }
    # cells 0 and 1 are identical centroids: ties must go to cell 0
    assert got[0] == 0 and got[1] == 0 and got[3] == 0
    assert got[2] == 2


def test_knn_graph_contract_and_planted_duplicates(spark):
    """embeddings_knn_graph: ranks are contiguous per node, cosines
    non-increasing along ranks, and planted identical vectors are each
    other's rank-1 neighbor with cosine 1.0 (identical vectors collide
    in EVERY LSH table by construction, so recall is exact for them)."""
    import random

    from stream_spark.queries import QUERIES

    rng = random.Random(7)
    rows = []
    for i in range(30):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)]))
    rows.append((100, rows[3][1]))  # exact duplicate of vec 3
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        emb.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = QUERIES["embeddings_knn_graph"](spark, d).collect()
    by_node: dict[int, list] = {}
    for r in by_node_rows(out):
        by_node.setdefault(r["vec_id"], []).append(r)
    for node, edges in by_node.items():
        edges.sort(key=lambda r: r["knn_rank"])
        assert [e["knn_rank"] for e in edges] == list(range(1, len(edges) + 1))
        cosines = [e["cosine"] for e in edges]
        assert cosines == sorted(cosines, reverse=True)
        assert all(e["neighbor_id"] != node for e in edges)
    assert by_node[3][0]["neighbor_id"] == 100 and abs(by_node[3][0]["cosine"] - 1.0) < 1e-9
    assert by_node[100][0]["neighbor_id"] == 3


def by_node_rows(rows):
    return [r.asDict() for r in rows]


def test_topk_bruteforce_tie_break_partition_independent(spark):
    """Exact-duplicate swarms (40 identical vectors, k=3, m=10) make
    the float prerank all-ties: which candidates survive the per-batch
    cut must NOT depend on Arrow batch boundaries or input layout.
    r6 fix: the local cut orders by (fcos desc, neighbor_id asc) — the
    same total order as the global cut (r5 advice, similarity.py:374)."""
    from stream_spark.operators.similarity import topk_bruteforce

    base = [1.0, 2.0, 3.0, 4.0]
    rows = [(i, base) for i in range(100, 140)]  # identical swarm
    rows += [(i, [float(i), 1.0, 0.0, 2.0]) for i in range(40)]  # fillers
    queries = spark.createDataFrame([(0, base)], "vec_id long, embedding array<double>")
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        # tiny batches: the swarm spans many Arrow batches, so any
        # batch-boundary tie sensitivity becomes visible
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        results = []
        for nparts in (1, 4, 16):
            corpus = spark.createDataFrame(
                rows, "vec_id long, embedding array<double>"
            ).repartition(nparts)
            got = [
                (r["neighbor_id"], r["rank"])
                for r in topk_bruteforce(queries, corpus, k=3).orderBy("rank").collect()
            ]
            results.append(got)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert results[0] == results[1] == results[2]
    # ties on cosine must resolve to the LOWEST neighbor_ids
    assert results[0] == [(100, 1), (101, 2), (102, 3)]


def _tie_corpus(spark, n=40, dim=64):
    """Deterministic corpus with planted EXACT ties: vec_id 0 and 1 are
    identical (both land in the centroid/codebook seed set, so every
    row within the float margin of one is within it of both) — forces
    the decimal-escape + lowest-index tie rule, the hardest parity
    case for the Arrow twins."""
    rows = []
    for i in range(n):
        base = 0 if i <= 1 else i  # ids 0 and 1 share one vector
        v = [((base * 31 + j * 7) % 97) / 97.0 + 0.01 for j in range(dim)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_arrow_assign_matches_catalyst_on_ties(spark):
    from pyspark.sql import functions as F

    from stream_spark.operators.similarity import assign_cell_two_phase, assign_cells_arrow

    corpus = _tie_corpus(spark)
    cents = [r["embedding"] for r in corpus.orderBy("vec_id").limit(16).collect()]
    catalyst = {
        r["vec_id"]: r["cell"]
        for r in corpus.select(
            "vec_id", assign_cell_two_phase(F.col("embedding"), cents).alias("cell")
        ).collect()
    }
    arrow = {
        r["neighbor_id"]: r["cell"]
        for r in assign_cells_arrow(corpus, cents).collect()
    }
    assert arrow == catalyst
    # the duplicated seed vector must resolve to the LOWEST cell
    assert arrow[0] == 0 and arrow[1] == 0


def test_arrow_pq_codes_match_catalyst_on_ties(spark):
    from stream_spark.operators.pq import pq_codes, pq_codes_arrow

    corpus = _tie_corpus(spark)
    catalyst = {(r["id"], r["sub"]): r["code"] for r in pq_codes(corpus).collect()}
    arrow = {(r["id"], r["sub"]): r["code"] for r in pq_codes_arrow(corpus).collect()}
    assert arrow == catalyst
    # row 1 == row 0 == codebook entry 0 AND 1 (duplicate seeds): the
    # distance-0 tie must go to the SMALLER code on every subspace
    assert all(catalyst[(0, s)] == 0 for s in range(8))
    assert all(catalyst[(1, s)] == 0 for s in range(8))


def test_fused_ivfpq_corpus_rows_match_join_of_parts(spark):
    from pyspark.sql import functions as F

    from stream_spark.operators.pq import ivfpq_corpus_rows, pq_codes
    from stream_spark.operators.similarity import assign_cell_two_phase

    corpus = _tie_corpus(spark)
    cents = [r["embedding"] for r in corpus.orderBy("vec_id").limit(16).collect()]
    want = {
        (r["id"], r["sub"]): (None, r["code"]) for r in pq_codes(corpus).collect()
    }
    cells = {
        r["vec_id"]: r["cell"]
        for r in corpus.select(
            "vec_id", assign_cell_two_phase(F.col("embedding"), cents).alias("cell")
        ).collect()
    }
    got = {
        (r["neighbor_id"], r["sub"]): (r["cell"], r["code"])
        for r in ivfpq_corpus_rows(corpus, cents).collect()
    }
    assert set(got) == set(want)
    for (i, s), (cell, code) in got.items():
        assert code == want[(i, s)][1]
        assert cell == cells[i]


# --- r7: Arrow exact-cosine pair scorer parity ---------------------------


def test_dec_q12_matches_spark_double_to_decimal_cast(spark):
    """The scalar escape cast (Decimal(repr(x)) → HALF_UP at scale 12)
    must reproduce Spark's double→DECIMAL(28,12) cast bit-for-bit,
    including shortest-repr half-boundary values where the binary
    expansion sits on the other side of the tie (ADVICE r6)."""
    from decimal import Decimal

    from stream_spark.operators.similarity import _dec_q12

    vals = [
        2.5e-12, 1.5e-12, -2.5e-12, -1.5e-12, 0.5e-12, -0.5e-12,
        # shortest repr ends ...5e-13 but binary value is just below it
        float("0.0000000000005"), float("1.0000000000005"),
        float("-3.0000000000025"), 0.1, -0.1, 0.0, -0.0,
        0.1983642578125, 1.0, 123.456789,
    ] + [((i * 2654435761) % 10**6) / 7e5 * (-1) ** i for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.select(F.col("x").cast("decimal(28,12)").alias("d")).collect()
    for v, r in zip(vals, got):
        assert Decimal(str(r["d"])) == _dec_q12(v), f"cast mismatch at {v!r}"


def test_quantize12_matches_scalar_cast_on_boundaries():
    """Vectorized np.rint fast path + escape == the scalar JVM-exact
    cast elementwise, on half-boundary, dyadic-tie, and random grids."""
    import numpy as np

    from stream_spark.operators.similarity import _dec_q12, _quantize12_int64

    vals = np.array(
        [2.5e-12, -2.5e-12, 1.5e-12, -1.5e-12, 0.5e-12, 3.5e-12,
         0.0000000000005, 1.0000000000005, -7.0000000000015,
         0.1983642578125, 0.0, -0.0, 0.1, -123.456789]
        + [((i * 40503) % 99991) / 3.3e4 * (-1) ** i for i in range(5000)]
        + [((i * 7919) % 10**7) * 1e-13 for i in range(5000)],
        dtype=np.float64,
    )
    got = _quantize12_int64(vals)
    for v, n in zip(vals, got):
        assert int(n) == int(_dec_q12(float(v)).scaleb(12)), f"quantize mismatch at {v!r}"


def test_mean_partials_from_batch_exact_and_chunked():
    """Pure-numpy pin of the fused mean pass's accumulation: partials
    re-sum to the exact scaled-integer totals of the scalar cast
    (Decimal reference), non-finite elements contribute 0 but count,
    and the int64-overflow chunking path (forced by large-magnitude
    elements) yields multiple exact partials that still re-sum
    correctly."""
    import numpy as np

    from stream_spark.operators.similarity import _dec_q12, _mean_partials_from_batch

    rng = np.random.default_rng(11)
    V = rng.uniform(-1.0, 1.0, size=(100, 5))
    V[3, 2] = float("nan")
    V[7, 4] = float("inf")
    idx = rng.integers(0, 3, size=100)
    tot = np.zeros((3, 5), dtype=object)
    cnt_ref = np.zeros((3, 5), dtype=np.int64)
    for r in range(100):
        for j in range(5):
            x = V[r, j]
            if np.isfinite(x):
                cnt_ref[idx[r], j] += 1
                tot[idx[r], j] += int(_dec_q12(float(x)).scaleb(12))
    got = np.zeros((3, 5), dtype=object)
    cnt_got = np.zeros((3, 5), dtype=np.int64)
    n_chunks = 0
    for present, cnt, acc in _mean_partials_from_batch(V, idx, 3):
        n_chunks += 1
        for c in present:
            got[c] += acc[c]
            cnt_got[c] += cnt[c]
    assert n_chunks == 1
    assert (got == tot).all() and (cnt_got == cnt_ref).all()

    # force chunking: |scaled| ~ 2.5e16 ⇒ chunk = 2^62 // 2.5e16 ≈ 184 rows
    W = np.full((500, 2), 25000.0)
    W[:, 1] = -25000.0
    widx = np.zeros(500, dtype=np.int64)
    chunks = list(_mean_partials_from_batch(W, widx, 1))
    assert len(chunks) > 1
    s = sum(int(acc[0, 0]) for _p, _c, acc in chunks)
    n = sum(int(cnt[0, 0]) for _p, cnt, _a in chunks)
    assert s == 500 * int(_dec_q12(25000.0).scaleb(12)) and n == 500


def _pair_tie_corpus(spark):
    """Vectors with exact duplicates (cosine ties at 1.0), near-
    antipodes, dyadic values whose products land on scale-12
    boundaries, and ordinary random floats."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        rows.append((i, [rng.uniform(-0.5, 0.5) for _ in range(64)]))
    dup = [rng.uniform(-0.5, 0.5) for _ in range(64)]
    for i in range(40, 44):
        rows.append((i, list(dup)))  # identical swarm: exact ties
    dy = [0.5 if j % 2 == 0 else -0.25 for j in range(64)]
    rows.append((44, dy))
    rows.append((45, [-x for x in dy]))  # exact antipode: cosine −1
    rows.append((46, [1.5e-6 if j == 0 else 0.0 for j in range(64)]))
    rows.append((47, [1e-6 if j == 0 else 1e-9 for j in range(64)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.mark.parametrize("threshold", [-1.0, 0.4])
def test_arrow_pair_scorer_matches_catalyst(spark, threshold):
    """cosine_pairs_lsh_banded's Arrow kernel == the Catalyst
    _guarded_cosine spelling row-for-row (ids AND cosine doubles),
    including exact-tie swarms and the threshold filter on the exact
    value."""
    from stream_spark.operators.similarity import (
        _guarded_cosine,
        banded_index,
        cosine_pairs_lsh_banded,
    )

    df = _pair_tie_corpus(spark)
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs_lsh_banded(df, threshold=threshold).collect()
    }
    idx = banded_index(df)
    a, b = idx.alias("a"), idx.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    vb = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    want = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", _guarded_cosine(F.col("va"), F.col("vb"), threshold))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        # bit-identical doubles, not approx
        assert got[k] == want[k], f"cosine mismatch on pair {k}"


def test_score_pairs_arrow_degenerate_norm_parity(spark):
    """Degenerate-norm region (r7 ADVICE): a zero-norm vector — or one
    whose components all quantize to 0 at scale 12 (|x| < ~7.07e-7) —
    gives 0/0. Under this session's ANSI mode the Catalyst
    _guarded_cosine spelling RAISES (DIVIDE_BY_ZERO); numpy returns
    NaN, and the kernel's old bare ``>=`` silently DROPPED the pair —
    divergent. Both paths must now fail loudly on the same input, and
    stay bit-identical on healthy vectors sharing the batch."""
    import pytest as _pytest

    from stream_spark.operators.similarity import _guarded_cosine, score_pairs_arrow

    def catalyst(cand, df):
        va = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        vb = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        return (
            cand.join(va, "id_a").join(vb, "id_b")
            .withColumn("cosine", _guarded_cosine(F.col("va"), F.col("vb"), 0.5))
            .filter(F.col("cosine") >= 0.5)
            .select("id_a", "id_b", "cosine")
        )

    healthy = [(3, [1.0] + [0.0] * 63), (4, [1.0] + [0.0] * 63)]

    # region 1 — TRUE zero vector: the float guard itself divides by
    # zero; both paths raise.
    df = spark.createDataFrame([(1, [0.0] * 64)] + healthy, "vec_id long, embedding array<double>")
    cand = spark.createDataFrame([(1, 3), (3, 4)], "id_a long, id_b long")
    with _pytest.raises(Exception, match="zero-norm"):
        score_pairs_arrow(cand, df, threshold=0.5).collect()
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        catalyst(cand, df).collect()

    # region 2 — tiny vector vs healthy: float norms are fine, float
    # cosine fails the guard, exact path never evaluates — both paths
    # silently DROP the pair and agree on the healthy remainder.
    df = spark.createDataFrame([(1, [5e-7] * 64)] + healthy, "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in score_pairs_arrow(cand, df, 0.5).collect()}
    want = {(r["id_a"], r["id_b"]): r["cosine"] for r in catalyst(cand, df).collect()}
    assert got == want == {(3, 4): 1.0}

    # region 3 — tiny vs tiny: float cosine 1.0 clears the guard, the
    # QUANTIZED norm collapses to 0 on the exact path; both raise.
    df = spark.createDataFrame(
        [(1, [5e-7] * 64), (2, [5e-7] * 64)] + healthy, "vec_id long, embedding array<double>"
    )
    cand2 = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    with _pytest.raises(Exception, match="degenerate quantized norm"):
        score_pairs_arrow(cand2, df, threshold=0.5).collect()
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        catalyst(cand2, df).collect()


def test_cosine_edges_are_both_directions_of_pairs(spark):
    from stream_spark.operators.similarity import (
        cosine_edges_lsh_banded,
        cosine_pairs_lsh_banded,
    )

    df = _pair_tie_corpus(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs_lsh_banded(df, threshold=-1.0).collect()
    }
    edges = {
        (r["vec_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_edges_lsh_banded(df, threshold=-1.0).collect()
    }
    want = dict(pairs)
    want.update({(b, a): c for (a, b), c in pairs.items()})
    assert edges == want


def test_pq_topk_clamps_on_undersized_corpus(spark):
    """A corpus with fewer than K_CODES vectors must clamp the codebook
    instead of raising IndexError (ADVICE r6)."""
    import random

    from stream_spark.operators.pq import K_CODES, topk_ivfpq, topk_pq

    rng = random.Random(3)
    n = max(2, K_CODES - 2)
    rows = [(i, [rng.uniform(-0.5, 0.5) for _ in range(64)]) for i in range(n)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.limit(2)
    got = topk_pq(queries, corpus, topk=3).collect()
    assert len(got) == 2 * 3
    got2 = topk_ivfpq(queries, corpus, topk=3).collect()
    assert len(got2) == 2 * 3


def test_sql_text_folds_match_functions_api(spark):
    """The r10 SQL-text fold twins (sql_dvec / dot_sql / norm_sql /
    cosine_sql / _sq_dist_dec_sql) must be BIT-IDENTICAL to the
    functions-API decimal folds they replace — same casts, same fold
    shapes — including awkward floats (negative zero, subnormal-ish
    magnitudes, repr with exponent, 12+ significant digits)."""
    from pyspark.sql import functions as F

    from stream_spark.operators.pq import _sq_dist_dec, _sq_dist_dec_sql
    from stream_spark.operators.similarity import (
        cosine,
        cosine_sql,
        dot,
        dot_sql,
        norm,
        norm_sql,
        sql_dvec,
    )

    lits = [0.123456789012345, -3.5e-7, 12.25, 1013.75, -0.0, 7.000000001, 1e-12, -256.03125]
    vecs = [
        [1.5, -2.25, 0.001, 3.0, -7.5, 0.3333333333333333, 1e-9, 42.0],
        [-0.0, 0.0, 1.0, -1.0, 2.5e-5, 999.999999999, -3.25, 0.1],
    ]
    df = spark.createDataFrame([(v,) for v in vecs], "v array<double>")
    lit_fn = F.array(*[F.lit(float(x)) for x in lits])
    lit_sql = sql_dvec(lits)
    rows = df.select(
        cosine(F.col("v"), lit_fn).alias("c1"),
        F.expr(cosine_sql("v", lit_sql)).alias("c2"),
        dot(F.col("v"), lit_fn).alias("d1"),
        F.expr(dot_sql("v", lit_sql)).alias("d2"),
        norm(F.col("v")).alias("n1"),
        F.expr(norm_sql("v")).alias("n2"),
        _sq_dist_dec(F.col("v"), lit_fn).alias("s1"),
        F.expr(_sq_dist_dec_sql("v", lit_sql)).alias("s2"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"]
        assert r["d1"] == r["d2"]
        assert r["n1"] == r["n2"]
        assert r["s1"] == r["s2"]


def test_banded_buckets_sql_path_matches_column_path(spark, sf_dir):
    """banded_buckets' r10 SQL-text fast path (string arg) must emit
    the exact same (t, bucket) entries as the functions-API Column
    path on real embeddings."""
    from pyspark.sql import functions as F

    from stream_spark.operators.similarity import banded_buckets
    from stream_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    a = emb.select("vec_id", F.explode(banded_buckets("embedding")).alias("tb"))
    b = emb.select("vec_id", F.explode(banded_buckets(F.col("embedding"))).alias("tb"))
    ra = sorted((r["vec_id"], r["tb"]["t"], r["tb"]["bucket"]) for r in a.collect())
    rb = sorted((r["vec_id"], r["tb"]["t"], r["tb"]["bucket"]) for r in b.collect())
    assert ra == rb and len(ra) == 50 * 8


def test_ivf_centroid_and_codebook_deterministic(spark, tmp_path):
    """r11: IVF centroids and PQ codebooks are deterministic given the
    data — a repeat construction over unchanged files reproduces the
    exact same values (min-id seeds, decimal-exact means), and an
    append is reflected immediately (every construction recomputes;
    there is no cross-construction memo to go stale)."""
    import numpy as np

    from stream_spark.operators.pq import _codebooks
    from stream_spark.operators.similarity import ivf_centroids

    p = str(tmp_path / "emb")
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(200)]
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").write.parquet(p)

    emb = spark.read.parquet(p)
    c1 = ivf_centroids(emb, 4, refine_iters=1)
    c2 = ivf_centroids(spark.read.parquet(p), 4, refine_iters=1)
    assert c1 == c2  # deterministic reconstruction
    b1 = _codebooks(emb, "vec_id", "embedding", n_sub=2, k=4, dim=8)
    assert _codebooks(emb, "vec_id", "embedding", n_sub=2, k=4, dim=8) == b1

    # append → id 0..3 seeds unchanged but the refine round sees the
    # grown corpus, so the refined table may move — and must reflect
    # the new bytes on the very next construction
    extra = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(200, 400)]
    spark.createDataFrame(extra, "vec_id long, embedding array<double>").write.mode(
        "append"
    ).parquet(p)
    c3 = ivf_centroids(spark.read.parquet(p), 4, refine_iters=1)
    assert len(c3) == 4
