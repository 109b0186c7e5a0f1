"""Connected components over a pair-edge list — turns pairwise
near-dup hits into dedup CLUSTERS (keep one representative per
component, not per pair).

Min-label propagation: every node starts labeled with itself; each
round nodes adopt the minimum label among themselves and their
neighbors; converged when no label changes. Iterations are bounded by
component diameter — near-dup clusters are shallow, so a handful of
rounds suffice; the loop checks convergence with a cheap count.

``connected_components_star`` is the O(log n) alternating
large-star/small-star scheme (same (node, component=min) contract) —
the registered dedup_clusters path and the 100 TB-safe default; label
propagation remains for shallow graphs where its fewer shuffles win.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b", max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node in the edge list; component =
    min node id reachable."""
    # materialize once: every propagation round joins against the edge
    # list, and without this the full upstream plan (e.g. the Jaccard
    # pipeline that produced the pairs) would recompute per iteration
    undirected = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .localCheckpoint()
    )
    nodes = undirected.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint()

    for _ in range(max_iter):
        neighbor_labels = undirected.join(
            labels, undirected["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), "component")
        new_labels = (
            labels.select("node", "component")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()  # truncate the growing lineage each round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def connected_components_star(
    edges: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b", max_iter: int = 20
) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round scheme that replaces diameter-bounded label
    propagation at graph scale: a path of length 2^k collapses in ~k
    alternations instead of 2^k propagation rounds.

    A single min-neighborhood CONTRACTION runs first (r5): every node
    maps to min(itself ∪ neighbors), edges rewrite through that partial
    label, self-loops drop. Near-dup graphs are clique-heavy (an
    identical-document swarm is an all-pairs clique), and one
    contraction collapses every clique to nothing — the sf1 probe's
    92.8k-edge swarm graph enters the star loop as ~2k edges — while
    chains halve. Cost: one keyed min + one self-join, once; star
    rounds then run on the contracted representatives and the final
    labels compose node → partial → component.

    Each star round is two keyed shuffles (groupBy node → neighborhood
    min, join back); state is only the shrinking edge list,
    checkpointed per round to truncate lineage. Raises RuntimeError if
    ``max_iter`` rounds pass without the convergence predicate holding
    (depth bound: rounds grow with log(diameter), so 20 covers any
    graph these pipelines produce; a non-converged result would be a
    silently WRONG clustering, hence the hard assertion).
    ``connected_components_star.last_rounds`` records the round count
    of the most recent call — the hook the depth-bound tests read.
    Returns (node, component) with component = min reachable node id,
    same contract as ``connected_components``.
    """
    spark = edges.sparkSession

    raw = (
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    sym0 = raw.select("u", "v").union(raw.select(F.col("v").alias("u"), F.col("u").alias("v")))
    partial = (
        sym0.union(raw.select("u", "u").union(raw.select(F.col("v").alias("u"), F.col("v"))))
        .groupBy("u")
        .agg(F.min("v").alias("p"))
        .localCheckpoint()  # (node, partial-label) — reused for contraction and final compose
    )
    pu = partial.select(F.col("u").alias("_cu"), F.col("p").alias("_pu"))
    pv = partial.select(F.col("u").alias("_cv"), F.col("p").alias("_pv"))
    e = (
        raw.join(pu, raw["u"] == pu["_cu"])
        .join(pv, raw["v"] == pv["_cv"])
        .select(
            F.greatest("_pu", "_pv").alias("u"), F.least("_pu", "_pv").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def _min_nbr(d: DataFrame) -> DataFrame:
        # m(u) = min over neighborhood of u including u itself
        return (
            d.select("u", "v")
            .union(d.select(F.col("u"), F.col("u")))
            .groupBy("u")
            .agg(F.min("v").alias("m"))
        )

    converged = e.count() == 0
    rounds = 0
    for _ in range(max_iter):
        if converged:
            break
        rounds += 1
        # large-star: for every directed edge (u,v) with v > u … here e
        # keeps u > v, so the "larger" endpoints hang off u's min
        sym = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = _min_nbr(sym)
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()  # consumed 3x below (mins2, sym2, rows) —
            # unmaterialized, the whole large-star would recompute per use
        )
        # small-star: smaller-or-equal endpoints hang off the min
        mins2 = _min_nbr(large.union(large.select(F.col("v").alias("u"), F.col("u").alias("v"))))
        sym2 = large.select("u", "v").union(
            large.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        rows = sym2.join(mins2, "u").filter(F.col("v") <= F.col("u"))
        # canonical small-star: attach u AND every smaller neighbor v
        # to the neighborhood min (dropping the v→m edges severs
        # smaller leaves whose hub has an even smaller neighbor)
        small = (
            rows.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(rows.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # converged when the edge list is already a star into minima:
        # every edge in `small` equals an edge in `e` (and counts match)
        if small.count() == e.count() and small.exceptAll(e).count() == 0:
            e = small
            converged = True
            break
        e = small

    connected_components_star.last_rounds = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds — "
            "the result would be a wrong clustering; raise max_iter"
        )
    star_labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        e.select(F.col("v").alias("node")).distinct().withColumn("component", F.col("node"))
    )
    comp = star_labels.union(roots).groupBy("node").agg(F.min("component").alias("component"))
    # compose the contraction back out: node → partial p → component(p)
    # (a representative that vanished in contraction IS its component)
    cp = comp.select(F.col("node").alias("_r"), "component")
    return (
        partial.join(cp, partial["p"] == cp["_r"], "left")
        .select(
            F.col("u").alias("node"),
            F.coalesce(F.col("component"), F.col("p")).alias("component"),
        )
    )


def triangle_counts(
    edges: DataFrame, a_col: str = "u", b_col: str = "v"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list — the
    clustering-structure primitive (local clustering coefficient is
    one division away).

    Degree-ordered orientation (the standard MR/GraphX scheme): each
    edge points from its lower-(degree, id) endpoint to the higher, so
    every node's oriented out-degree is O(√m) on any graph — wedge
    generation (the quadratic step) is bounded per node no matter how
    skewed the degree distribution. Wedges (a→b, a→c) then probe the
    canonical edge set once: two equi-joins total, no node ever
    enumerates its full neighborhood square. Returns (node,
    n_triangles) for nodes in ≥1 triangle.
    """
    # The canonical edge set feeds SIX consuming subtrees (sym twice,
    # deg through sym, both wedge sides through oriented, the closing
    # probe) — unmaterialized, Catalyst re-derives the caller's whole
    # edge pipeline per reference (r11: the co-purchase query's
    # lineitem self-join appeared 78 times in the frozen plan, the
    # same disease the r7 pagerank pin fixed). One lineage cut here
    # and one on `oriented` (both wedge-join sides) leave exactly one
    # derivation of each (guide §2.4 / §5; same lazy-localCheckpoint
    # contract as dedup._materialize_index).
    und = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = und.select("u", "v").union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    ranked = (
        sym.join(deg.withColumnRenamed("u", "u1").withColumnRenamed("d", "du"), F.col("u") == F.col("u1"))
        .join(deg.withColumnRenamed("u", "v1").withColumnRenamed("d", "dv"), F.col("v") == F.col("v1"))
        .select("u", "v", "du", "dv")
    )
    oriented = (
        ranked.filter(
            (F.col("du") < F.col("dv")) | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = (
        e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")))
        .select(F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c"))
    )
    tri = wedges.join(
        und.select(F.col("u").alias("_bu"), F.col("v").alias("_bv")),
        (F.least(F.col("b"), F.col("c")) == F.col("_bu"))
        & (F.greatest(F.col("b"), F.col("c")) == F.col("_bv")),
    ).select("a", "b", "c")
    # one triangle row fans to its three corners via explode — the old
    # 3-way union of `tri` evaluated the whole wedge+probe pipeline
    # three times
    nodes = tri.select(F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node"))
    return nodes.groupBy("node").agg(F.count("*").cast("long").alias("n_triangles"))


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
) -> DataFrame:
    """PageRank in EXACT integer arithmetic (micro-rank units of 1e-9,
    damping 0.85 as the rational 17/20): contributions are
    ``r DIV outdeg``, the damped update is ``0.15e9 + (17·Σ) DIV 20``
    — floor division on positive BIGINTs, so every engine computes the
    identical ranks and an iterative graph algorithm fits the exact
    oracle gate (same trick as the decimal k-means).

    Plan shape per iteration: one equi-join of edges to ranks on the
    source (ranks is one row per node — AQE broadcasts it when small,
    shuffles on the key when not) and one keyed sum on the
    destination. Never materializes anything denser than the edge
    list; lineage grows linearly with iters, so localCheckpoint every
    few rounds for deep runs (2 here).

    The edge list is localCheckpoint-ed ONCE up front: every iteration
    references ``edges`` (and ``deg``/``nodes`` derived from it), and
    when the caller's edge list is itself a derived plan (the
    co-purchase query feeds a fact-fact self-join + groupBy), Catalyst
    re-derives that subtree per reference — the r7 frozen plan showed
    28 lineitem FileScans for 2 iterations. Materializing severs the
    upstream plan; each reference is then a scan of the cached edge
    RDD. (Stats caveat: checkpointed frames report the Long.MaxValue
    sizeInBytes sentinel, so joins against them rely on AQE's runtime
    sizes — see CLAUDE.md Catalyst-stats rules.)
    """
    edges = edges.select(F.col(src), F.col(dst)).localCheckpoint()
    deg = edges.groupBy(src).agg(F.count("*").alias("_outdeg"))
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    ranks = nodes.withColumn("r", F.lit(1_000_000_000).cast("long"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", src), src)
            .join(deg, src)
            .select(F.col(dst).alias("node"), F.expr("r DIV _outdeg").alias("_c"))
        )
        s = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        ranks = (
            nodes.join(s, "node", "left")
            .na.fill(0, ["_s"])
            .select(
                "node",
                (F.lit(150_000_000) + F.expr("(17 * _s) DIV 20")).cast("long").alias("r"),
            )
        )
    return ranks
