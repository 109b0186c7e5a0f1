"""Chunking / span-dedup / char-diversity / radius-search queries —
round-3 additions to the LLM-training-data block (SURVEY §2 C).

All four are exact-SQL-oracled: chunk and span hashes are md5 of the
space-joined token slice (portable across engines), diversity metrics
are rational arithmetic on integer counts (no transcendentals in the
gated path — Spark's log2 is JVM ``Math.log`` and not bit-identical
to DuckDB's correctly-rounded libm, so entropy stays an operator-only
extra under pytest tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.operators.chunking import chunk_tokens, repeated_spans
from stream_spark.operators.similarity import range_search
from stream_spark.operators.text import char_diversity
from stream_spark.queries.registry import register
from stream_spark.sources import load_table

_CHUNK, _CSTRIDE = 64, 48
_SPAN, _SSTRIDE = 16, 8
_RADIUS = 0.35

_TOKS = "string_split_regex(trim(text), '\\s+')"


@register(
    "text_chunk_overlap",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), n AS (
        SELECT doc_id, toks,
               CASE WHEN len(toks) <= {_CHUNK} THEN 1
                    ELSE CAST(ceil((len(toks) - {_CHUNK}) / {_CSTRIDE}.0) AS INT) + 1
               END AS n_chunks
        FROM t
    ), e AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, n_chunks - 1)) AS cid
        FROM n
    )
    SELECT doc_id,
           CAST(cid AS INT) AS chunk_id,
           CAST(len(list_slice(toks, cid * {_CSTRIDE} + 1, cid * {_CSTRIDE} + {_CHUNK})) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(list_slice(toks, cid * {_CSTRIDE} + 1, cid * {_CSTRIDE} + {_CHUNK}), ' ')) AS chunk_md5
    FROM e
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping token chunks (64 tokens, stride 48)."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_tokens(docs, chunk_size=_CHUNK, stride=_CSTRIDE)


@register(
    "dedup_repeated_spans",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), n AS (
        SELECT doc_id, toks,
               CASE WHEN len(toks) >= {_SPAN}
                    THEN CAST(floor((len(toks) - {_SPAN}) / {_SSTRIDE}.0) AS INT) + 1
                    ELSE 0 END AS nw
        FROM t
    ), e AS (
        SELECT doc_id, toks, unnest(generate_series(0, nw - 1)) AS i
        FROM n WHERE nw > 0
    ), spans AS (
        SELECT doc_id,
               md5(array_to_string(list_slice(toks, i * {_SSTRIDE} + 1, i * {_SSTRIDE} + {_SPAN}), ' ')) AS h
        FROM e
    ), dup AS (
        SELECT h FROM spans GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ), perdoc AS (
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
        FROM spans s LEFT JOIN dup d USING (h)
        GROUP BY s.doc_id
    )
    SELECT doc_id, n_spans, n_dup_spans,
           CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE) AS dup_frac
    FROM perdoc
    """,
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup accounting: fraction of each doc's rolling
    16-token spans whose hash occurs in ≥2 documents (the distributed
    approximation of suffix-array substring dedup, Lee et al. 2022)."""
    docs = load_table(spark, sf_dir, "documents")
    return repeated_spans(docs, span_size=_SPAN, stride=_SSTRIDE)


@register(
    "text_char_diversity",
    oracle="""
    WITH c AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ), cc AS (
        SELECT doc_id, ch, COUNT(*) AS c FROM c GROUP BY doc_id, ch
    ), agg AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_chars,
               CAST(COUNT(*) AS BIGINT) AS distinct_chars,
               CAST(SUM(c * c) AS BIGINT) AS sum_c2
        FROM cc GROUP BY doc_id
    )
    SELECT doc_id, n_chars, distinct_chars,
           CAST(sum_c2 AS DOUBLE) / CAST(n_chars * n_chars AS DOUBLE) AS simpson,
           CAST(n_chars * n_chars AS DOUBLE) / CAST(sum_c2 AS DOUBLE) AS effective_alphabet
    FROM agg
    """,
)
def text_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution concentration (gibberish signal):
    Simpson Σp² and inverse-Simpson effective alphabet, exact."""
    docs = load_table(spark, sf_dir, "documents")
    return char_diversity(docs)


@register(
    "ann_range_search",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
    ),
    norms AS (
        SELECT vec_id, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
        FROM e GROUP BY vec_id
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (nq.nrm * nc.nrm) AS cosine
        FROM e q JOIN e c ON q.i = c.i AND q.vec_id < 10 AND c.vec_id >= 10
        JOIN norms nq ON q.vec_id = nq.vec_id
        JOIN norms nc ON c.vec_id = nc.vec_id
        GROUP BY query_id, neighbor_id, nq.nrm, nc.nrm
    )
    SELECT query_id, neighbor_id, cosine FROM scored WHERE cosine >= {_RADIUS}
    """,
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search: every corpus vector within cosine ≥ 0.35 of a
    query vector — map-only broadcast scan, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return range_search(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10), _RADIUS
    )
