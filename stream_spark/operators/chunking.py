"""Token-window chunking and span-level dedup over documents.

Two training-data primitives the reference has no analogue for (they
come from the LLM-data literature, e.g. Lee et al. 2022 "Deduplicating
Training Data Makes Language Models Better"):

- ``chunk_tokens`` — RAG-style overlapping chunking: split each
  document's whitespace token stream into windows of ``chunk_size``
  tokens advancing by ``stride``. One-to-many map (explode over a
  per-row ``sequence``), zero shuffles — the chunker is a streaming-
  friendly projection, linear in corpus tokens at any scale.
- ``repeated_spans`` — approximate substring dedup: hash every rolling
  ``span_size``-token window (stride ``stride``) and mark spans whose
  hash occurs in ≥2 distinct documents. The exact suffix-array method
  is inherently sequential; rolling fixed-width spans is the
  shuffle-bounded distributed approximation (one groupBy on a 16-byte
  hash, one key-shuffle join back — both linear in corpus tokens).

Determinism: spans/chunks hash via md5 of the space-joined token
slice, so a DuckDB oracle reproduces them exactly (CLAUDE.md rule 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_windows(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    size: int,
    stride: int,
    full_only: bool,
) -> DataFrame:
    """(id, chunk_id, chunk_tokens, chunk_md5) for each token window.

    ``full_only`` drops ragged tail windows (span dedup wants equal-
    width spans; RAG chunking keeps the tail).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = df.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "_n", F.size("_toks")
    )
    if full_only:
        # windows fully inside the doc: floor((n-size)/stride)+1 for n>=size
        n_win = F.when(
            F.col("_n") >= size,
            (F.floor((F.col("_n") - size) / stride) + 1).cast("int"),
        ).otherwise(F.lit(0))
    else:
        # cover every token: ceil(max(n-size,0)/stride)+1
        n_win = F.when(F.col("_n") <= size, F.lit(1)).otherwise(
            (F.ceil((F.col("_n") - size) / stride) + 1).cast("int")
        )
    d = d.withColumn("_nw", n_win).filter(F.col("_nw") > 0)
    d = d.withColumn("chunk_id", F.explode(F.sequence(F.lit(0), F.col("_nw") - 1)))
    sl = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, size)
    return d.select(
        F.col(id_col),
        F.col("chunk_id").cast("int"),
        F.size(sl).cast("long").alias("chunk_tokens"),
        F.md5(F.array_join(sl, " ")).alias("chunk_md5"),
    )


def chunk_tokens(
    df: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token chunks covering the whole document (the RAG
    ingestion shape). Returns (id, chunk_id, chunk_tokens, chunk_md5)."""
    if stride <= 0 or chunk_size <= 0 or stride > chunk_size:
        raise ValueError("need 0 < stride <= chunk_size")
    return _token_windows(
        df,
        id_col=id_col,
        text_col=text_col,
        size=chunk_size,
        stride=stride,
        full_only=False,
    )


def repeated_spans(
    df: DataFrame,
    span_size: int = 16,
    stride: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-span accounting.

    Returns (id, n_spans, n_dup_spans, dup_frac) where a span is
    duplicated iff its hash occurs in ≥2 distinct documents. Both the
    span groupBy and the join back shuffle on the 16-byte md5 — never
    the text.
    """
    spans = _token_windows(
        df, id_col=id_col, text_col=text_col, size=span_size, stride=stride, full_only=True
    )
    dup = (
        spans.groupBy("chunk_md5")
        .agg(F.count_distinct(id_col).alias("_ndocs"))
        .filter(F.col("_ndocs") >= 2)
        .select("chunk_md5", F.lit(1).alias("_dup"))
    )
    marked = spans.join(dup, "chunk_md5", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).cast("long").alias("n_dup_spans"),
        )
        .withColumn(
            "dup_frac",
            F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double"),
        )
    )
