"""Sequence packing for LLM training: concatenate documents in a
deterministic order and chunk the token stream into fixed-budget
contexts (the standard concat-then-chunk packing used to build
training batches). A document may straddle pack boundaries;
``n_packs_spanned`` says how many contexts it touches.

Scale: the only global coordination is one exact prefix sum over the
doc order, done with the two-pass partition-offset primitive
(``rownum.with_global_cumsum``) — no single-partition window, no
driver data beyond per-partition partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_spark.operators.rownum import with_global_cumsum


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
) -> DataFrame:
    """Assign each doc its global token ``start_offset``, the
    ``pack_id`` (context index) where it begins, and how many packs it
    spans. All-integer arithmetic — exact on any engine."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    c = with_global_cumsum(df, token_col, [id_col], out="_cum", value_cast="long")
    # integer DIV keeps offsets exact past 2^53 tokens (double floor
    # division would not); all values are non-negative so DIV == floor
    c = c.withColumn("_start", (F.col("_cum") - F.col(token_col)).cast("long"))
    return c.select(
        id_col,
        F.col(token_col).cast("long").alias("n_tokens"),
        F.col("_start").alias("start_offset"),
        F.expr(f"_start DIV {budget}").cast("long").alias("pack_id"),
        F.expr(f"(_cum - 1) DIV {budget} - _start DIV {budget} + 1")
        .cast("long")
        .alias("n_packs_spanned"),
    )
