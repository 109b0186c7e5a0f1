"""Fuzzy string matching — the entity-resolution primitive.

``fuzzy_name_pairs`` finds pairs of DISTINCT string values within a
Levenshtein bound, restricted to a blocking key (default: the value's
last whitespace token — for "adjective noun" style names the head
noun; callers pass any Column for domain blocking). Working on the
distinct-value set first matters twice at scale: a 10⁹-row table with
10⁵ distinct names pairs 10⁵ values, not 10⁹ rows, and the blocked
self-join is an equi-join on the block key — pair volume is
Σ block_size², never all-pairs. Levenshtein runs JVM-side
(``F.levenshtein``, same DP as DuckDB's — cross-engine identical).

Chain the pairs into ``components.connected_components_star`` for
canonical entity clusters (see parts_name_entity_clusters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_name_pairs(
    df: DataFrame,
    text_col: str,
    max_dist: int,
    block: Column | None = None,
) -> DataFrame:
    """(name_a, name_b, dist) for distinct values of ``text_col`` in
    the same block with levenshtein ≤ ``max_dist`` (name_a < name_b)."""
    blk = block if block is not None else F.element_at(F.split(F.col(text_col), r"\s+"), -1)
    names = df.select(F.col(text_col).alias("name"), blk.alias("_blk")).distinct()
    a = names.select(F.col("name").alias("name_a"), F.col("_blk").alias("_ba"))
    b = names.select(F.col("name").alias("name_b"), F.col("_blk").alias("_bb"))
    return (
        a.join(b, (F.col("_ba") == F.col("_bb")) & (F.col("name_a") < F.col("name_b")))
        .withColumn("dist", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )
