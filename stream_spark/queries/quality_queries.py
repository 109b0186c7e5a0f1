"""Data-quality queries: dataset profiling and referential-integrity
auditing — the checks a pipeline runs before trusting a new drop of
data.

Both are single-shuffle plans by construction: the profiler unpivots
the table to (column_name, value) rows and runs ONE keyed aggregate
(not one global aggregate per column, which would stack N
single-partition exchanges); the FK audit unions every (edge, key)
pair into one tagged frame and runs ONE left join + ONE keyed
aggregate across all edges.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.queries.registry import register
from stream_spark.sources import load_table

_DOC_NUM_COLS = ["doc_id", "n_chars"]
_DOC_STR_COLS = ["text", "lang", "source"]
_DOC_COLS = _DOC_NUM_COLS + _DOC_STR_COLS


@register(
    "documents_profile",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_str,
               CAST(MAX({c}) AS VARCHAR) AS max_str
        FROM documents
        """
        for c in _DOC_COLS
    ),
)
def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column dataset profile (long format): null count, exact
    distinct count, min/max surfaced as strings so one schema covers
    every column type. The table is unpivoted to (column_name,
    num_val, str_val) and profiled by ONE groupBy(column_name) — a
    single shuffle regardless of column count; numeric min/max runs on
    the typed value (stringified numbers would sort "10" < "9").
    The approximate-distinct variant for wide tables is
    sketches.approx_distinct. String min/max rely on binary (UTF-8)
    collation, which Spark and DuckDB share by default."""
    docs = load_table(spark, sf_dir, "documents")
    cells = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(c).cast("double").alias("num_val"),
                F.lit(None).cast("string").alias("str_val"),
            )
            for c in _DOC_NUM_COLS
        ],
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.lit(None).cast("double").alias("num_val"),
                F.col(c).cast("string").alias("str_val"),
            )
            for c in _DOC_STR_COLS
        ],
    )
    melted = docs.select(F.explode(cells).alias("cell")).select("cell.*")
    val = F.coalesce(F.col("str_val"), F.col("num_val").cast("string"))
    return (
        melted.groupBy("column_name")
        .agg(
            F.sum(F.when(val.isNull(), 1).otherwise(0)).cast("long").alias("n_nulls"),
            F.countDistinct(val).cast("long").alias("n_distinct"),
            F.coalesce(
                F.min("num_val").cast("long").cast("string"), F.min("str_val")
            ).alias("min_str"),
            F.coalesce(
                F.max("num_val").cast("long").cast("string"), F.max("str_val")
            ).alias("max_str"),
        )
    )


_FKS = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


@register(
    "referential_integrity_audit",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{name}' AS fk,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p ON c.{fk} = p.{pk}
        """
        for (name, child, fk, parent, pk) in _FKS
    ),
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key audit across the whole star schema: for each child→
    parent edge, total child rows and orphans (child keys with no
    parent). Every edge's child keys union into one (fk, key) frame,
    every parent's distinct keys into one (fk, pk) frame; a single
    left join on (fk, key) + one groupBy(fk) covers all edges — one
    shuffle each instead of an aggregate per edge. The first gate a
    100 TB ingest runs before anything joins."""
    children = reduce(
        DataFrame.unionByName,
        [
            load_table(spark, sf_dir, child).select(
                F.lit(name).alias("fk"), F.col(fkc).alias("_k")
            )
            for (name, child, fkc, _parent, _pk) in _FKS
        ],
    )
    parents = reduce(
        DataFrame.unionByName,
        [
            load_table(spark, sf_dir, parent)
            .select(F.lit(name).alias("fk"), F.col(pk).alias("_pk"))
            .distinct()
            for (name, _child, _fkc, parent, pk) in _FKS
        ],
    )
    j = children.join(
        parents, (children["fk"] == parents["fk"]) & (children["_k"] == parents["_pk"]), "left"
    ).select(children["fk"], "_pk")
    return j.groupBy("fk").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0)).cast("long").alias("n_orphans"),
    )
