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

from pyspark.sql import DataFrame, functions as F

from stream_spark.operators.similarity import dot, norm


def _assign(base: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """One map-only assignment pass: cosine against every centroid
    literal, first-max argmax (ties → lowest cell)."""
    coss = F.array(
        *[
            dot(F.col("v"), F.array(*[F.lit(float(x)) for x in cv]))
            / (F.col("nrm") * norm(F.array(*[F.lit(float(x)) for x in cv])))
            for _cell, cv in cents
        ]
    )
    cells = [c for c, _ in cents]
    d = base.withColumn("_coss", coss)
    pos = F.array_position(F.col("_coss"), F.array_max(F.col("_coss"))).cast("int")
    cell_map = F.array(*[F.lit(c) for c in cells])
    return d.withColumn("cluster", F.element_at(cell_map, pos).cast("bigint")).withColumn(
        "cos", F.array_max(F.col("_coss"))
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster embeddings with ``iters`` assignment rounds of Lloyd
    k-means; returns (id, cluster, cos) after the final round."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("_id"), vec_d.alias("v")).withColumn(
        "nrm", norm(F.col("v"))
    )

    # seeds: k lowest ids — bounded metadata collect (k rows)
    seed_rows = (
        emb.select(id_col, vec_d.alias("v")).orderBy(id_col).limit(k).collect()
    )
    cents = [(i, [float(x) for x in r["v"]]) for i, r in enumerate(seed_rows)]

    assigned = _assign(base, cents)
    for _ in range(iters - 1):
        # recompute means per (cluster, dim) with exact-decimal sums;
        # k×dim rows back to the driver = bounded metadata
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
        assigned = _assign(base, cents)

    return assigned.select(F.col("_id").alias(id_col), "cluster", "cos")
