"""Connected components over a pair-edge list — turns pairwise
near-dup hits into dedup CLUSTERS (keep one representative per
component, not per pair).

Min-label propagation: every node starts labeled with itself; each
round nodes adopt the minimum label among themselves and their
neighbors; converged when no label changes. Iterations are bounded by
component diameter — near-dup clusters are shallow, so a handful of
rounds suffice; the loop checks convergence with a cheap count. (At
graph scale the O(log n) alternating large-star/small-star scheme is
the upgrade path; the shuffle structure — join on node, groupBy min —
is identical.)
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
