"""Embedding k-means (Lloyd iterations) — deterministic and
oracle-expressible.

Design for scale: each iteration is ONE map-only corpus scan for
assignment (centroids are a k×dim literal broadcast into the plan —
no join, no shuffle of the corpus) plus one keyed aggregation
(cluster, dim) to recompute means. Centroids live on the driver
between iterations — k×dim doubles is bounded metadata, the sanctioned
collect. This is exactly how Spark MLlib's own KMeans structures the
loop; here the arithmetic is decimal-exact so a SQL oracle can verify
it bit-for-bit.

Determinism: seeds are the k lowest-id vectors (no RNG); every dot
product / norm / mean accumulates in DECIMAL(28,12) (order-free) and
surfaces as DOUBLE; argmax ties resolve to the lowest cell index
(array_position finds the FIRST maximum).
"""

from __future__ import annotations

from stream_spark.operators.rownum import cpu_partitions

from pyspark.sql import DataFrame, functions as F

from stream_spark.operators.similarity import dot, dot_sql, norm, norm_sql, sql_dvec


def _assign(base: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """One map-only assignment pass: cosine against every centroid
    literal, first-max argmax (ties → lowest cell)."""
    if not cents:
        # empty corpus ⇒ no centroids; a zero-entry F.array() literal
        # is NULL-typed and fails analysis — emit the empty typed frame
        return (
            base.withColumn("_coss", F.array().cast("array<double>"))
            .withColumn("cluster", F.lit(None).cast("bigint"))
            .withColumn("cos", F.lit(None).cast("double"))
            .filter(F.lit(False))
        )
    # one parsed expression for all k cosines — the functions-API loop
    # paid 2 HOF lambda builds × k cells in py4j round trips per Lloyd
    # iteration (r10; parity pinned in tests/test_ann.py)
    coss = F.expr(
        "array("
        + ", ".join(
            f"({dot_sql('v', sql_dvec(cv))} / (nrm * {norm_sql(sql_dvec(cv))}))"
            for _cell, cv in cents
        )
        + ")"
    )
    cells = [c for c, _ in cents]
    d = base.withColumn("_coss", coss)
    pos = F.array_position(F.col("_coss"), F.array_max(F.col("_coss"))).cast("int")
    cell_map = F.array(*[F.lit(c) for c in cells])
    return d.withColumn("cluster", F.element_at(cell_map, pos).cast("bigint")).withColumn(
        "cos", F.array_max(F.col("_coss"))
    )


def kmeans_parallel_seeds(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 2,
    oversample: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """k-means||-style distributed seeding (Bahmani et al. 2012),
    fully deterministic — the scale path when naive seeding's k×dim
    driver collect is fine but its seed QUALITY isn't (lowest-id seeds
    can all land in one dense region and waste Lloyd rounds).

    Per round: ONE map-only corpus scan computes each point's cosine
    distance d(x) = 1 - max cos(x, seeds) against the current seed
    literals, one decimal aggregate yields φ = Σ d(x), and points keep
    themselves with probability min(1, oversample·k·d/φ) decided by a
    hash of (id, round) — no RNG, so the sample is reproducible and
    partition-independent. Only the sampled candidates (expected
    oversample·k per round — bounded metadata) ever reach the driver.
    A final scan weights each candidate by the number of points
    closest to it; the driver then greedily reduces the weighted
    candidate set to k (max weight×distance gain, ties → lowest
    candidate index) — the standard recluster step, at candidate not
    corpus size.
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("_id"), vec_d.alias("v")).withColumn(
        "nrm", norm(F.col("v"))
    )
    first = base.orderBy("_id").limit(1).collect()[0]
    cand: list[tuple[int, list[float]]] = [(0, [float(x) for x in first["v"]])]

    l_factor = oversample * k
    # hash-of-(id, round) uniform in [0,1): deterministic "coin"
    def coin(rnd: int):
        h = F.conv(
            F.substring(F.md5(F.concat_ws("#", F.col("_id"), F.lit(str(rnd)))), 1, 6),
            16,
            10,
        ).cast("double")
        return h / float(16**6)

    for rnd in range(1, rounds + 1):
        scored = _assign(base, cand).withColumn(
            "_d", (F.lit(1.0) - F.col("cos"))
        )
        phi = scored.agg(
            F.sum(F.col("_d").cast("decimal(28,12)")).cast("double").alias("phi")
        ).collect()[0]["phi"]
        if not phi or phi <= 0.0:  # degenerate: all points on a seed
            break
        picked = (
            scored.filter(coin(rnd) < (F.lit(l_factor) * F.col("_d") / F.lit(float(phi))))
            .select("_id", "v")
            .collect()  # bounded: expected oversample·k rows by construction
        )
        known = {tuple(v) for _c, v in cand}
        for r in sorted(picked, key=lambda r: r["_id"]):
            v = [float(x) for x in r["v"]]
            if tuple(v) not in known:
                known.add(tuple(v))
                cand.append((len(cand), v))

    if len(cand) <= k:
        return [v for _c, v in cand]

    # weight candidates by closest-point counts (one scan, k' rows back)
    wrows = _assign(base, cand).groupBy("cluster").count().collect()
    weights = {int(r["cluster"]): int(r["count"]) for r in wrows}

    # driver-side deterministic weighted greedy reduction to k
    def cos_d(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return 1.0 - num / (na * nb) if na > 0 and nb > 0 else 1.0

    order = sorted(cand, key=lambda cv: (-weights.get(cv[0], 0), cv[0]))
    chosen = [order[0]]
    rest = order[1:]
    while len(chosen) < k and rest:
        best_i, best_gain = 0, -1.0
        for i, (ci, cv) in enumerate(rest):
            gain = weights.get(ci, 0) * min(cos_d(cv, sv) for _si, sv in chosen)
            if gain > best_gain:
                best_i, best_gain = i, gain
        chosen.append(rest.pop(best_i))
    return [v for _c, v in chosen]


def _dec_sum_py(products) -> float:
    """Driver/worker-side emulation of similarity._dec_sum: each float64
    product quantized to DECIMAL scale 12 with HALF_UP (Spark's
    double→decimal cast rounding), summed exactly, surfaced as the
    nearest double — bit-identical to the Catalyst fold for our
    magnitudes (the (30,12) accumulator never saturates)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-12)
    return float(sum(Decimal(p).quantize(q, rounding=ROUND_HALF_UP) for p in products))


def _kmeans_argmax_kernel(mat, cn_f, cn_exact, k_):
    """The per-batch argmax of ``_assign_arrow`` factored out so the
    fused mean-partials pass (``_kmeans_mean_partials_arrow``) uses the
    IDENTICAL two-phase exactness contract: float cosines pick the max,
    any cell within 1e-6 re-resolves with the exact decimal emulation,
    ties to the LOWEST cell; NaN columns keep np.argmax's first-NaN
    (Spark's NaN-is-largest + lowest-cell). Returns V → int indices
    into ``mat`` rows."""
    import math

    import numpy as np

    def argmax(V):
        S = (V @ mat.T) / (np.sqrt((V * V).sum(axis=1))[:, None] * cn_f[None, :])
        top = S.argmax(axis=1)
        if k_ > 1:
            mx = S[np.arange(len(V)), top]
            near = S >= (mx - 1e-6)[:, None]
            for r in np.where(near.sum(axis=1) > 1)[0]:
                vrow = V[r].tolist()
                nv = math.sqrt(_dec_sum_py(x * x for x in vrow))
                best_cos, best_c = None, 0
                for c in np.where(near[r])[0]:
                    d = _dec_sum_py(x * w for x, w in zip(vrow, mat[c].tolist()))
                    cosv = d / (nv * cn_exact[c])
                    if best_cos is None or cosv > best_cos:
                        best_cos, best_c = cosv, int(c)
                top[r] = best_c
        return top

    return argmax


def _assign_arrow(
    base: DataFrame, cells, mat, id_type: str, keep_vec: bool = False
) -> DataFrame:
    """One assignment pass as ONE numpy matmul per Arrow batch — the
    shape a real 100 TB assignment pass takes (FAISS flat-assign:
    map-only, O(n·k·dim) flops in BLAS, no n×k row explosion). The
    former broadcast-join spelling materialized n·k Catalyst rows each
    paying a 64-term decimal fold — 9× wall per 3× corpus on the sf3
    stretch probe because k tracks n below the cap; the matmul is
    milliseconds for the same flops.

    Exactness is preserved by sign resolution, same contract as
    similarity.banded_index: float64 cosines decide the argmax, and any
    row whose runner-up is within 1e-6 of the max (float-vs-decimal
    divergence is < 1e-9 at dim 64) re-resolves the contested cells
    with the exact decimal emulation (``_dec_sum_py``), ties to the
    LOWEST cell — pytest asserts bit-equality with the literal-centroid
    decimal path. NaN columns (zero-norm centroid) match Spark's
    NaN-is-largest + lowest-cell ordering because np.argmax also
    returns the first NaN position.

    ``keep_vec``: pass the input vector column through unchanged
    (bit-exact — the Arrow doubles are re-emitted, never recomputed),
    so callers that need (id, v, cluster) avoid a corpus re-join with
    the base frame — one fewer shuffle of the vector payload
    (guide §2.4/§8: the vectors already cross the Python boundary for
    the matmul; shipping them back out is the same order, a JOIN back
    is an extra exchange).
    """
    import math

    import numpy as np

    cells_arr = np.asarray(cells, dtype=np.int64)
    cn_f = np.sqrt((mat * mat).sum(axis=1))
    cn_exact = [math.sqrt(_dec_sum_py(x * x for x in row)) for row in mat.tolist()]
    argmax = _kmeans_argmax_kernel(mat, cn_f, cn_exact, len(cells))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["_id"].to_numpy()
            V = np.array([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            top = argmax(V)
            out = {"_id": ids, "cluster": cells_arr[top]}
            if keep_vec:
                out["v"] = pdf["v"]
            yield pd.DataFrame(out)

    # repartition first: a single-split parquet would score the whole
    # corpus in one task otherwise (map-only either way)
    par = cpu_partitions(base)
    schema = f"_id {id_type}, cluster bigint" + (", v array<double>" if keep_vec else "")
    return base.select("_id", "v").repartition(par, F.col("_id")).mapInPandas(gen, schema)


def _refine_means(base: DataFrame, cells, mat) -> list[tuple[int, list[float]]]:
    """One Lloyd refine round as ONE fused corpus pass (guide §2.3 —
    aggregate before you shuffle): the Arrow batch runs the IDENTICAL
    argmax kernel as ``_assign_arrow`` and then accumulates EXACT
    per-cluster partial sums of the scale-12-quantized elements
    (similarity._mean_partials_from_batch — the vectorized Spark
    double→DECIMAL(28,12) cast). The post-Python exchange carries
    ~n_batches×k tiny partial rows instead of the former spelling's n
    assigned vectors posexploded to n×dim rows through two keyed
    exchanges. Scaled-integer addition is exact and associative, so the
    resulting means are bit-identical to
    ``sum(cast(x as decimal(28,12))).cast("double") / count(x)`` —
    pinned end to end by test_kmeans_inplan_matches_literal_path (the
    literal path keeps the Catalyst posexplode spelling as reference).
    Domain: dense fixed-dim vectors without NULL elements — the same
    domain ``_assign_arrow`` already requires (np.array would reject
    ragged/None rows). Returns [(cell, centroid)] sorted by cell;
    clusters that lost all members drop, exactly as the posexplode
    aggregate produced no row for them."""
    import math

    import numpy as np
    import pandas as pd

    from stream_spark.operators.similarity import (
        _mean_partials_from_batch,
        exact_means_by_cell,
    )

    k_ = len(cells)
    cells_arr = np.asarray(cells, dtype=np.int64)
    cn_f = np.sqrt((mat * mat).sum(axis=1))
    cn_exact = [math.sqrt(_dec_sum_py(x * x for x in row)) for row in mat.tolist()]
    argmax = _kmeans_argmax_kernel(mat, cn_f, cn_exact, k_)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            top = argmax(V)
            for present, cnt, acc in _mean_partials_from_batch(V, top, k_):
                yield pd.DataFrame(
                    {
                        "cell": cells_arr[present],
                        "pcnt": [cnt[c].tolist() for c in present],
                        "psum": [acc[c].tolist() for c in present],
                    }
                )

    par = cpu_partitions(base)
    partials = (
        base.select("_id", "v")
        .repartition(par, F.col("_id"))
        .mapInPandas(gen, "cell bigint, pcnt array<long>, psum array<long>")
    )
    means = exact_means_by_cell(partials)
    return sorted((c, cv) for c, cv in means.items())


def kmeans_assign_inplan(
    emb: DataFrame,
    k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    attach_cos: bool = True,
    keep_vec: bool = False,
) -> DataFrame:
    """Lloyd k-means for large k — SemDeDup-style clustering wants
    k ∝ corpus/target_cluster_size, past what ``kmeans_assign``'s
    literal-centroid codegen tolerates (quadratic in k).

    Assignment is a vectorized Arrow matmul (``_assign_arrow``):
    O(n·k·dim) BLAS flops, map-only, with the float-prefilter →
    exact-decimal-escape contract keeping results bit-identical to the
    all-decimal path. Mean recomputation stays a Spark (cell, dim)
    keyed DECIMAL aggregate; the k-row centroid table round-trips
    through the driver between rounds — k×dim doubles bounded by
    ``semantic_dedup_clusters``' max_k (4096×64×8 B ≈ 2 MB), the same
    bounded-metadata contract as every centroid collect in this module,
    and the shape FAISS itself uses (centroids are driver/host state).
    The final cos is computed by the Catalyst decimal fold against the
    broadcast k-row centroid frame, so surfaced values are the engine's
    own decimal arithmetic, not a Python reimplementation.

    Seeds are the k lowest-id vectors (LIMIT k — bounded rows through
    the single-partition top-k, the same contract as every top-N).
    Ties argmax to the lowest cell. Returns (id, cluster, cos) after
    ``iters`` assignment rounds.

    ``attach_cos=False`` skips the final-cos attachment entirely —
    callers that only consume (id, cluster) (SemDeDup pair generation,
    cluster labeling/sampling) otherwise pay a corpus join back with
    the base frame plus the broadcast-centroid join for a column
    Catalyst cannot prune away (the inner joins survive projection
    pruning). ``keep_vec`` (with attach_cos=False) additionally passes
    the double-cast vectors through the Arrow pass, so (id, v, cluster)
    consumers need NO join at all (guide §2.4: remove exchanges
    outright).
    """
    import numpy as np

    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("_id"), vec_d.alias("v")).withColumn(
        "nrm", norm(F.col("v"))
    )
    id_type = emb.schema[id_col].dataType.simpleString()

    def lloyd() -> tuple[list[int], list[list[float]]]:
        # seeds: k lowest ids, cell = dense 0..k-1 by id order (k-row collect)
        seed_rows = sorted(
            base.select("_id", "v").orderBy("_id").limit(k).collect(), key=lambda r: r["_id"]
        )
        if not seed_rows:
            return [], []
        cells = list(range(len(seed_rows)))
        mat = np.array([[float(x) for x in r["v"]] for r in seed_rows])
        for _ in range(iters - 1):
            # fused refine pass: assignment + exact partial means in ONE
            # corpus scan — no n-row Arrow output, no n×dim posexplode
            # shuffle (guide §2.3; bit parity via _refine_means)
            refined = _refine_means(base, cells, mat)
            cells = [c for c, _ in refined]
            mat = np.array([cv for _, cv in refined])
        return cells, mat.tolist()

    # The Lloyd loop runs at EVERY construction — no cross-construction
    # memo (the bench contract: every invocation computes from the
    # parquet inputs; a module-level cache would move the refine rounds
    # out of the timed reps).
    cells, mat_l = lloyd()
    if not cells:
        empty = emb.select(
            F.col(id_col), F.lit(0).cast("bigint").alias("cluster"), F.lit(0.0).alias("cos")
        ).limit(0)
        if not attach_cos:
            empty = empty.drop("cos")
            if keep_vec:
                empty = empty.withColumn("v", F.array().cast("array<double>"))
        return empty
    mat = np.array(mat_l)
    assigned = _assign_arrow(base, cells, mat, id_type, keep_vec=(keep_vec and not attach_cos))
    if not attach_cos:
        out_cols = [F.col("_id").alias(id_col), "cluster"] + (["v"] if keep_vec else [])
        return assigned.select(*out_cols)

    cent_df = emb.sparkSession.createDataFrame(
        [(int(c), [float(x) for x in row]) for c, row in zip(cells, mat.tolist())],
        "cluster bigint, cv array<double>",
    )
    return (
        assigned.join(base, "_id")
        # broadcast-ok: centroid table is k rows by construction (bounded metadata scale)
        .join(F.broadcast(cent_df), "cluster")
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            (dot(F.col("v"), F.col("cv")) / (F.col("nrm") * norm(F.col("cv")))).alias("cos"),
        )
    )


def semantic_dedup_clusters(
    emb: DataFrame,
    threshold: float = 0.4,
    members_per_cluster: int = 64,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_k: int = 4096,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the
    embedding space, compare pairs only WITHIN a cluster, chain
    cosine≥threshold pairs into connected components, keep one doc per
    component. Returns (keeper_id, cluster_size) per near-dup group
    (singletons included, size 1).

    The scale contract is two-sided. k ∝ n/members_per_cluster keeps
    cluster size bounded so within-cluster pair volume stays LINEAR in
    n (Σ (n/k)·n ≈ n·members_per_cluster) — but assignment scores n·k
    candidate rows per Lloyd round, so UNcapped k makes assignment
    itself quadratic (n²/64). ``max_k`` bounds that: assignment work is
    O(n·max_k) — at the default 4096 that's the fixed-k regime the
    SemDeDup paper actually runs (110k clusters for LAION-scale; k
    stops tracking n long before that). Past n = members_per_cluster ×
    max_k, cluster sizes grow as n/max_k and the within-cluster pair
    bound degrades to n²/max_k — at that corpus size, raise max_k with
    centroids trained on a sample, or pre-partition with the banded-LSH
    coarse path. Assignment uses the in-plan centroid table
    (``kmeans_assign_inplan``); pairs run the float-prefilter →
    exact-decimal-rescore two-phase from similarity.cosine_pairs;
    components use the O(log n) star scheme. The only driver-side value
    is count() to size k — bounded metadata.
    """
    from stream_spark.operators.components import connected_components_star
    from stream_spark.operators.similarity import _guarded_cosine

    # the corpus size only sizes k — one count job per construction
    # (bounded metadata; column-pruned scan)
    n = emb.count()
    k = min(max(8, n // members_per_cluster), max_k)
    # (id, v, cluster) straight out of the Arrow assignment pass — no
    # corpus re-join, no broadcast-centroid join (attach_cos=False),
    # one fewer exchange of the vector payload (guide §2.4)
    mem = kmeans_assign_inplan(
        emb, k, iters=iters, id_col=id_col, vec_col=vec_col, attach_cos=False, keep_vec=True
    ).select(F.col(id_col).alias("_id"), "v", "cluster")
    a = mem.select(F.col("_id").alias("id_a"), F.col("v").alias("va"), "cluster")
    b = mem.select(F.col("_id").alias("id_b"), F.col("v").alias("vb"), "cluster")
    pairs = (
        a.join(b, ["cluster"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("_gcos", _guarded_cosine(F.col("va"), F.col("vb"), threshold))
        .filter(F.col("_gcos") >= threshold)
        .select("id_a", "id_b")
    )
    comps = connected_components_star(pairs, "id_a", "id_b")
    groups = comps.groupBy(F.col("component").alias("keeper_id")).agg(
        F.count("*").alias("cluster_size")
    )
    singles = (
        emb.select(F.col(id_col).alias("keeper_id"))
        .join(comps.select(F.col("node").alias("keeper_id")), "keeper_id", "left_anti")
        .withColumn("cluster_size", F.lit(1).cast("bigint"))
    )
    return groups.unionByName(singles)


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeding: str = "min-id",
) -> DataFrame:
    """Cluster embeddings with ``iters`` assignment rounds of Lloyd
    k-means; returns (id, cluster, cos) after the final round.
    ``seeding``: "min-id" (k lowest ids — the oracle-replayable
    default) or "parallel" (k-means|| — better spread, still
    deterministic)."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("_id"), vec_d.alias("v")).withColumn(
        "nrm", norm(F.col("v"))
    )

    def lloyd() -> list[tuple[int, list[float]]]:
        if seeding == "parallel":
            seed_vecs = kmeans_parallel_seeds(emb, k, id_col=id_col, vec_col=vec_col)
            cents = [(i, v) for i, v in enumerate(seed_vecs)]
        elif seeding == "min-id":
            # seeds: k lowest ids — bounded metadata collect (k rows)
            seed_rows = (
                emb.select(id_col, vec_d.alias("v")).orderBy(id_col).limit(k).collect()
            )
            cents = [(i, [float(x) for x in r["v"]]) for i, r in enumerate(seed_rows)]
        else:
            raise ValueError(f"unsupported seeding: {seeding!r}")

        for _ in range(iters - 1):
            assigned = _assign(base, cents)
            # recompute means per (cluster, dim) with exact-decimal
            # sums; k×dim rows back to the driver = bounded metadata
            rows = (
                assigned.select("cluster", F.posexplode("v").alias("i", "x"))
                .groupBy("cluster", "i")
                .agg((F.sum(F.col("x").cast("decimal(28,12)")).cast("double") / F.count("x")).alias("m"))
                .collect()
            )
            by_cell: dict[int, dict[int, float]] = {}
            for r in rows:
                by_cell.setdefault(int(r["cluster"]), {})[int(r["i"])] = float(r["m"])
            cents = [
                (cell, [dims[i] for i in sorted(dims)]) for cell, dims in sorted(by_cell.items())
            ]
        return cents

    cents = lloyd()
    return _assign(base, cents).select(F.col("_id").alias(id_col), "cluster", "cos")
