"""Vectorized ANN top-k via Arrow-batched numpy (the dense-math scale
path).

The JVM-side `aggregate`/`zip_with` cosine is exact and portable, but
dense float math at 100 TB belongs in BLAS: this variant broadcasts
the query matrix, streams the corpus through ``mapInPandas``, and does
one numpy matmul per Arrow batch — thousands of dot products per
instruction instead of one per codegen loop iteration. Per-batch
local top-k keeps the shuffle tiny (k rows per batch per query), then
a final global top-k resolves.

Results are float32/float64 BLAS sums (not the exact-decimal values of
`similarity.topk_bruteforce`); ranking can differ only on ties closer
than float error, so this is the perf path, verified in tests against
the exact operator's neighbor sets.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OUT_SCHEMA = "query_id long, neighbor_id long, cosine double"


def rerank_crossencoder_stub(
    candidates: DataFrame,
    k: int,
    query_col: str = "query_id",
    cand_col: str = "neighbor_id",
    retrieval_col: str = "cosine",
) -> DataFrame:
    """Two-stage retrieval: rerank ANN candidates with a pair scorer,
    keep the top ``k`` per query by the blended score.

    This is the retrieve-then-rerank shape every serving stack uses: a
    cheap first stage (LSH/IVF/brute top-N) fans candidate PAIRS into
    Arrow batches, an expensive per-pair model scores each batch, and
    a per-query window keeps the winners. The scorer here is a
    deterministic STUB — a real cross-encoder would load its model
    once per executor and score (query_text, candidate_text) batches
    in exactly this mapInPandas slot; no model runtime ships in this
    container. The stub emits md5(query:candidate)-derived
    pseudo-logits in [0, 0.1), so the pipeline stays oracle-checkable
    (portable hash, CLAUDE.md rule 2) while exercising the real
    batch shape. Cost scales with candidates (n_queries × N), never
    the corpus — the whole point of reranking at 100 TB.
    """
    import hashlib

    cols = [query_col, cand_col, retrieval_col]

    def score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model stub: per-pair pseudo-logit from the portable md5_long
        # hash (first 15 hex chars as int), scaled to [0, 0.1)
        for pdf in it:
            key = pdf[query_col].astype(str) + ":" + pdf[cand_col].astype(str)
            logit = key.map(
                lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 1000
            ) / 10000.0
            yield pd.DataFrame(
                {
                    query_col: pdf[query_col],
                    cand_col: pdf[cand_col],
                    retrieval_col: pdf[retrieval_col],
                    "rerank_score": pdf[retrieval_col] + logit,
                }
            )

    scored = candidates.select(*cols).mapInPandas(
        score_batches,
        schema=f"{query_col} long, {cand_col} long, {retrieval_col} double, rerank_score double",
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rerank_score").desc(), F.col(cand_col)
    )
    return (
        scored.withColumn("rerank_rank", F.row_number().over(w))
        .filter(F.col("rerank_rank") <= k)
        .withColumn("rerank_rank", F.col("rerank_rank").cast("long"))
    )


def topk_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    spark = queries.sparkSession
    qrows = queries.select(id_col, vec_col).collect()  # query set is small by contract
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    bq = spark.sparkContext.broadcast((qids, qmat, qnorm))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qm, qn = bq.value
        for pdf in it:
            cmat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if cmat.size == 0:
                continue
            cnorm = np.linalg.norm(cmat, axis=1)
            sims = (qm @ cmat.T) / (qn[:, None] * cnorm[None, :])
            nb = pdf[id_col].to_numpy(dtype=np.int64)
            top = min(k, sims.shape[1])
            part = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            rows = {
                "query_id": np.repeat(ids, top),
                "neighbor_id": nb[part].ravel(),
                "cosine": np.take_along_axis(sims, part, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    local = corpus.select(id_col, vec_col).mapInPandas(batches, schema=OUT_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
