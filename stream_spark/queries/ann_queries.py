"""Similarity-search and multimodal queries (SURVEY §2 C6, C7, C12).

Query set = vec_id < 10, corpus = the rest. The LSH variant must
produce the SAME result as its oracle because bucketing is
deterministic (md5-derived hyperplanes) — approximation error vs
brute force is a recall property, not nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.operators.clustering import kmeans_assign_inplan
from stream_spark.operators.multimodal import extract_binary_features, sample_frames, to_media_table
from stream_spark.operators.similarity import N_CELLS, N_PLANES, N_PROBE, topk_bruteforce, topk_ivf, topk_lsh
from stream_spark.queries.registry import register
from stream_spark.sources import load_table

_K = 5

_UNNEST_E = """
    e AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
    ),
    norms AS (
        SELECT vec_id, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
        FROM e GROUP BY vec_id
    )
"""


@register(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH {_UNNEST_E},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (nq.nrm * nc.nrm) AS cosine
        FROM e q JOIN e c ON q.i = c.i AND q.vec_id < 10 AND c.vec_id >= 10
        JOIN norms nq ON q.vec_id = nq.vec_id
        JOIN norms nc ON c.vec_id = nc.vec_id
        GROUP BY query_id, neighbor_id, nq.nrm, nc.nrm
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {_K}
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = topk_bruteforce(emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10), _K)
    return out.withColumn("rank", F.col("rank").cast("long"))


_HP = """
    hp AS (
        SELECT j, i,
               ((CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 2001) - 1000) / 1000.0 AS w
        FROM unnest(generate_series(0, {np})) t(j), unnest(generate_series(0, 63)) s(i)
    ),
    buckets AS (
        SELECT e.vec_id,
               CAST(SUM(CASE WHEN proj >= 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
        FROM (
            SELECT e.vec_id, hp.j,
                   CAST(SUM(CAST(e.x * hp.w AS DECIMAL(28,12))) AS DOUBLE) AS proj
            FROM e JOIN hp ON e.i = hp.i + 1
            GROUP BY e.vec_id, hp.j
        ) e GROUP BY e.vec_id
    )
"""


@register(
    "ann_topk_lsh",
    oracle=f"""
    WITH {_UNNEST_E},
    {_HP.format(np=N_PLANES - 1)},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (nq.nrm * nc.nrm) AS cosine
        FROM e q JOIN e c ON q.i = c.i AND q.vec_id < 10 AND c.vec_id >= 10
        JOIN buckets bq ON q.vec_id = bq.vec_id
        JOIN buckets bc ON c.vec_id = bc.vec_id AND bq.bucket = bc.bucket
        JOIN norms nq ON q.vec_id = nq.vec_id
        JOIN norms nc ON c.vec_id = nc.vec_id
        GROUP BY query_id, neighbor_id, nq.nrm, nc.nrm
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {_K}
    """,
)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = topk_lsh(emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10), _K)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "ann_topk_ivf",
    oracle=f"""
    WITH {_UNNEST_E},
    cents AS (
        SELECT vec_id AS cent_vid, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell
        FROM (SELECT vec_id FROM embeddings WHERE vec_id >= 10 ORDER BY vec_id LIMIT {N_CELLS})
    ),
    ccos AS (
        SELECT v.vec_id, ct.cell,
               CAST(SUM(CAST(v.x * ce.x AS DECIMAL(28,12))) AS DOUBLE) / (nv.nrm * nc.nrm) AS cos
        FROM e v
        JOIN cents ct ON TRUE
        JOIN e ce ON ce.vec_id = ct.cent_vid AND ce.i = v.i
        JOIN norms nv ON nv.vec_id = v.vec_id
        JOIN norms nc ON nc.vec_id = ct.cent_vid
        GROUP BY v.vec_id, ct.cell, nv.nrm, nc.nrm
    ),
    assign AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
            FROM ccos WHERE vec_id >= 10
        ) WHERE rn = 1
    ),
    probe AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
            FROM ccos WHERE vec_id < 10
        ) WHERE rn <= {N_PROBE}
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (nq.nrm * nc.nrm) AS cosine
        FROM probe p
        JOIN assign a ON a.cell = p.cell
        JOIN e q ON q.vec_id = p.query_id
        JOIN e c ON c.vec_id = a.vec_id AND c.i = q.i
        JOIN norms nq ON nq.vec_id = p.query_id
        JOIN norms nc ON nc.vec_id = a.vec_id
        GROUP BY p.query_id, neighbor_id, nq.nrm, nc.nrm
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {_K}
    """,
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat scale path (C6/C7 family): deterministic seed
    centroids keep it oracle-expressible; probes an equi-joined subset
    of the corpus instead of scanning it."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = topk_ivf(emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10), _K)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "embeddings_hard_negatives",
    oracle=f"""
    WITH {_UNNEST_E},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (nq.nrm * nc.nrm) AS cosine
        FROM e q JOIN e c ON q.i = c.i AND q.vec_id < 10 AND c.vec_id >= 10
        JOIN embeddings eq ON eq.vec_id = q.vec_id
        JOIN embeddings ec ON ec.vec_id = c.vec_id AND eq.label <> ec.label
        JOIN norms nq ON q.vec_id = nq.vec_id
        JOIN norms nc ON c.vec_id = nc.vec_id
        GROUP BY query_id, neighbor_id, nq.nrm, nc.nrm
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {_K}
    """,
)
def embeddings_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide hard-negative mining for contrastive training: per
    query, the top-{_K} highest-cosine corpus vectors whose LABEL
    differs — the high-similarity wrong-class negatives in-batch
    sampling never finds. Broadcast bounded query set over one corpus
    scan (similarity.hard_negatives); exact decimal rescore decides."""
    from stream_spark.operators.similarity import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    out = hard_negatives(emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10), _K)
    return out.withColumn("rank", F.col("rank").cast("long"))


_RERANK_N = 20


@register(
    "ann_topk_rerank",
    oracle=f"""
    WITH {_UNNEST_E},
    {_HP.format(np=N_PLANES - 1)},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (nq.nrm * nc.nrm) AS cosine
        FROM e q JOIN e c ON q.i = c.i AND q.vec_id < 10 AND c.vec_id >= 10
        JOIN buckets bq ON q.vec_id = bq.vec_id
        JOIN buckets bc ON c.vec_id = bc.vec_id AND bq.bucket = bc.bucket
        JOIN norms nq ON q.vec_id = nq.vec_id
        JOIN norms nc ON c.vec_id = nc.vec_id
        GROUP BY query_id, neighbor_id, nq.nrm, nc.nrm
    ),
    cand AS (
        SELECT query_id, neighbor_id, cosine FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored
        ) WHERE rank <= {_RERANK_N}
    ),
    rr AS (
        SELECT query_id, neighbor_id, cosine,
               cosine + (CAST(('0x' || substr(md5(CAST(query_id AS VARCHAR) || ':'
                   || CAST(neighbor_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000) / 10000.0
                   AS rerank_score
        FROM cand
    )
    SELECT query_id, neighbor_id, cosine, rerank_score, CAST(rn AS BIGINT) AS rerank_rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rerank_score DESC, neighbor_id) AS rn
        FROM rr
    ) WHERE rn <= {_K}
    """,
)
def ann_topk_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieve-then-rerank, the production two-stage shape: LSH
    bucket-join retrieval (equi-join, no corpus product) fans top-20
    candidates into a cross-encoder STUB pair scorer over Arrow
    batches (ann_pandas.rerank_crossencoder_stub), final top-5 by
    blended score. The stub's md5 pseudo-logits keep the pipeline
    under the exact oracle gate; a real model drops into the same
    mapInPandas slot."""
    from stream_spark.operators.ann_pandas import rerank_crossencoder_stub

    emb = load_table(spark, sf_dir, "embeddings")
    cand = topk_lsh(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10), _RERANK_N
    )
    return rerank_crossencoder_stub(cand, _K).select(
        "query_id", "neighbor_id", "cosine", "rerank_score", "rerank_rank"
    )


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id, 'text/plain' AS media_type,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: encode → mapInPandas feature extraction.
    The oracle checks byte length + md5 of the payload, proving the
    Arrow round-trip is byte-exact."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_binary_features(to_media_table(docs))


@register(
    "multimodal_image_decode",
    oracle="""
    SELECT d.doc_id,
           CAST(4 + d.doc_id % 5 AS BIGINT) AS img_width,
           CAST(3 + d.doc_id % 4 AS BIGINT) AS img_height,
           CAST(SUM((d.doc_id + i) % 256) AS BIGINT) AS pixel_sum
    FROM documents d,
         unnest(generate_series(0, (4 + d.doc_id % 5) * (3 + d.doc_id % 4) * 3 - 1)) t(i)
    GROUP BY d.doc_id
    """,
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the oracle gate (closes the r3 C12
    stub): a deterministic P6 PPM corpus is encoded distributed, then
    decode_image header-parses + numpy-decodes each raster (native
    codec, no PIL) and emits dims + exact pixel sum, which the oracle
    recomputes arithmetically from the id. The resize output is
    pytest-verified (float-free but byte-array-valued, so it stays out
    of the hash compare)."""
    from stream_spark.operators.multimodal import decode_image, synthetic_image_table

    docs = load_table(spark, sf_dir, "documents")
    return decode_image(synthetic_image_table(docs), width=4, height=4).select(
        "doc_id", "img_width", "img_height", "pixel_sum"
    )


@register(
    "multimodal_audio_resample",
    oracle="""
    SELECT d.doc_id,
           CAST(8000 * (1 + d.doc_id % 2) AS BIGINT) AS sample_rate,
           CAST(40 + d.doc_id % 17 AS BIGINT) AS n_samples,
           CAST(SUM((d.doc_id * 31 + i * 7) % 65536) - 32768 * (40 + d.doc_id % 17) AS BIGINT)
             AS sample_sum,
           CAST(CASE WHEN d.doc_id % 2 = 1 THEN 40 + d.doc_id % 17
                     ELSE 2 * (40 + d.doc_id % 17) END AS BIGINT) AS out_n_samples
    FROM documents d,
         unnest(generate_series(0, 39 + d.doc_id % 17)) t(i)
    GROUP BY d.doc_id
    """,
)
def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode + resample under the oracle gate: mono PCM16
    WAVs (RIFF chunk-walk parse, native codec) linear-resampled to
    16 kHz; rate/count/exact-int sample sum and the resampled length
    are recomputed arithmetically by the oracle. Interpolated sample
    VALUES are pytest-verified against np.interp closed forms."""
    from stream_spark.operators.multimodal import resample_audio, synthetic_audio_table

    docs = load_table(spark, sf_dir, "documents")
    return resample_audio(synthetic_audio_table(docs), rate=16000)


def _ahash_ctes(src: str = "documents") -> str:
    """Image-aHash CTE chain over a caller-chosen source relation
    (anything exposing doc_id) — ends with ``ahashes(doc_id,
    img_width, img_height, ahash)``. Parameterized (r9) so composed
    oracles can hash a derived relation instead of string-editing this
    fragment (the ADVICE r8 discipline for shared CTEs)."""
    return f"""pos AS (
        SELECT d.doc_id,
               4 + d.doc_id % 5 AS w, 3 + d.doc_id % 4 AS h,
               y.y, x.x
        FROM {src} d,
             unnest(generate_series(0, 3)) y(y),
             unnest(generate_series(0, 3)) x(x)
    ),
    g AS (
        SELECT doc_id, w, h, y, x,
               (((doc_id + ((y * h // 4) * w + (x * w // 4)) * 3 + 0) % 256)
              + ((doc_id + ((y * h // 4) * w + (x * w // 4)) * 3 + 1) % 256)
              + ((doc_id + ((y * h // 4) * w + (x * w // 4)) * 3 + 2) % 256)) // 3 AS gray
        FROM pos
    ),
    t AS (SELECT doc_id, SUM(gray) AS total FROM g GROUP BY doc_id),
    ahashes AS (
        SELECT g.doc_id,
               CAST(MAX(g.w) AS BIGINT) AS img_width,
               CAST(MAX(g.h) AS BIGINT) AS img_height,
               CAST(SUM(CASE WHEN g.gray * 16 >= t.total
                             THEN 1 << (g.y * 4 + g.x) ELSE 0 END) AS BIGINT) AS ahash
        FROM g JOIN t USING (doc_id)
        GROUP BY g.doc_id
    )"""


_AHASH_CTES = _ahash_ctes()


@register(
    "multimodal_image_ahash",
    oracle=f"""
    WITH {_AHASH_CTES}
    SELECT doc_id, img_width, img_height, ahash FROM ahashes
    """,
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash image fingerprinting under the exact
    oracle gate: REAL decode (native PPM codec) → integer downsample →
    cross-multiplied mean threshold → 16-bit hash, recomputed
    arithmetically by the oracle from the synthetic generator. The
    image-level near-dup primitive: exact dups collide, near-dups are
    a hamming-banded join away (same composition as simhash)."""
    from stream_spark.operators.multimodal import ahash_image, synthetic_image_table

    docs = load_table(spark, sf_dir, "documents")
    return ahash_image(synthetic_image_table(docs))


_KM_K = 8


def _km_ctes(seed_limit: str) -> str:
    """The 2-round Lloyd k-means CTE chain (seeds = lowest-id vectors,
    decimal-exact, ties to lowest cell) shared by ``embeddings_kmeans``
    and ``dedup_semantic_clusters``. ``seed_limit`` is the LIMIT
    expression sizing k — a literal, or a scalar subquery for the
    corpus-proportional SemDeDup sizing. Final assignment = cos2 argmax."""
    return f"""
    seed AS (
        SELECT vec_id AS seed_vid, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {seed_limit})
    ),
    c0 AS (SELECT s.cell, e.i, e.x FROM seed s JOIN e ON e.vec_id = s.seed_vid),
    c0n AS (SELECT cell, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
            FROM c0 GROUP BY cell),
    cos1 AS (
        SELECT v.vec_id, c.cell,
               CAST(SUM(CAST(v.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (n.nrm * cn.nrm) AS cos
        FROM e v JOIN c0 c ON c.i = v.i
        JOIN norms n ON n.vec_id = v.vec_id JOIN c0n cn ON cn.cell = c.cell
        GROUP BY v.vec_id, c.cell, n.nrm, cn.nrm
    ),
    a1 AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        FROM cos1) WHERE rn = 1),
    c1 AS (
        SELECT a.cell, e.i,
               CAST(SUM(CAST(e.x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS x
        FROM a1 a JOIN e ON e.vec_id = a.vec_id GROUP BY a.cell, e.i
    ),
    c1n AS (SELECT cell, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
            FROM c1 GROUP BY cell),
    cos2 AS (
        SELECT v.vec_id, c.cell,
               CAST(SUM(CAST(v.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (n.nrm * cn.nrm) AS cos
        FROM e v JOIN c1 c ON c.i = v.i
        JOIN norms n ON n.vec_id = v.vec_id JOIN c1n cn ON cn.cell = c.cell
        GROUP BY v.vec_id, c.cell, n.nrm, cn.nrm
    )"""


@register(
    "embeddings_kmeans",
    oracle=f"""
    WITH {_UNNEST_E},
    {_km_ctes(str(_KM_K))}
    SELECT vec_id, cell AS cluster, cos FROM (
        SELECT vec_id, cell, cos,
               row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        FROM cos2) WHERE rn = 1
    """,
)
def embeddings_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative algorithm under the exact oracle gate: 2 Lloyd
    rounds of cosine k-means (deterministic lowest-id seeds,
    decimal-exact arithmetic) — the oracle replays both rounds in SQL
    and the assignments + cosines must match bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    # the Arrow in-plan assignment (r11): bit-identical to the literal-
    # centroid spelling (test_kmeans_inplan_matches_literal_path) and
    # -23% at sf0.1 (3.01 -> 2.32 warm min-of-3) — the literal path's
    # n x k per-row decimal folds are the cost the Arrow matmul removes;
    # kmeans_assign stays as the decimal reference implementation
    return kmeans_assign_inplan(emb, k=_KM_K, iters=2)


_SEM_TAU = 0.4
_SEM_MPC = 64


@register(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH RECURSIVE {_UNNEST_E},
    {_km_ctes(f"(SELECT GREATEST(8, COUNT(*)//{_SEM_MPC}) FROM embeddings)")},
    a2 AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        FROM cos2) WHERE rn = 1),
    cand AS (
        SELECT x.vec_id AS id_a, y.vec_id AS id_b
        FROM a2 x JOIN a2 y ON x.cell = y.cell AND x.vec_id < y.vec_id
        JOIN embeddings ea ON ea.vec_id = x.vec_id
        JOIN embeddings eb ON eb.vec_id = y.vec_id
        WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                     CAST(eb.embedding AS DOUBLE[])) >= {_SEM_TAU} - 1e-6
    ),
    dots AS (
        SELECT c.id_a, c.id_b,
               CAST(SUM(CAST(a.x * b.x AS DECIMAL(28,12))) AS DOUBLE) AS dot
        FROM cand c JOIN e a ON a.vec_id = c.id_a
        JOIN e b ON b.vec_id = c.id_b AND a.i = b.i
        GROUP BY c.id_a, c.id_b
    ),
    edges AS (
        SELECT id_a, id_b FROM dots
        JOIN norms na ON id_a = na.vec_id JOIN norms nb ON id_b = nb.vec_id
        WHERE dot / (na.nrm * nb.nrm) >= {_SEM_TAU}
    ),
    und AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM edges
            UNION ALL SELECT id_b, id_a FROM edges),
    reach(node, label) AS (
        SELECT src, src FROM und
        UNION
        SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
    SELECT component AS keeper_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
    FROM comp GROUP BY component
    UNION ALL
    SELECT vec_id AS keeper_id, CAST(1 AS BIGINT) AS cluster_size
    FROM embeddings WHERE vec_id NOT IN (SELECT node FROM comp)
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means partitions the embedding
    space with k ∝ corpus/{_SEM_MPC} (cluster size bounded as the
    corpus grows ⇒ within-cluster pair volume LINEAR in n — the scale
    contract the paper's FAISS clustering provides), then cosine≥τ
    pairs are found only within a cluster and chained into components;
    one keeper per semantic-dup group. Assignment is the Arrow-matmul
    Lloyd pass (clustering.kmeans_assign_inplan — O(n·k·dim) BLAS flops
    map-only, decimal escape on ≤1e-6 argmax ties, bit-identical to the
    all-decimal fold); driver values are count() sizing k and the k-row
    centroid table between rounds — both bounded metadata. The oracle
    replays both Lloyd rounds, the float-prefilter→decimal-rescore pair
    phase, and the closure."""
    from stream_spark.operators.clustering import semantic_dedup_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_clusters(emb, threshold=_SEM_TAU, members_per_cluster=_SEM_MPC)


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST((i - 1) * 4 AS BIGINT) AS frame_idx,
           CAST(strlen(substr(text, (i - 1) * 4 * 256 + 1, 256)) AS BIGINT) AS frame_len,
           md5(substr(text, (i - 1) * 4 * 256 + 1, 256)) AS frame_md5
    FROM documents,
         unnest(generate_series(1, CAST(ceil(strlen(text) / 256.0 / 4) AS BIGINT))) t(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-like binary payloads: one-to-many
    mapInPandas fan-out, every 4th 256-byte frame; the oracle slices
    the same frames in SQL (ASCII corpus ⇒ byte == char offsets) and
    md5s must match frame-for-frame."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(to_media_table(docs), frame_size=256, stride=4)


@register(
    "ann_topk_ivf_refined",
    oracle=f"""
    WITH {_UNNEST_E},
    cents AS (
        SELECT vec_id AS cent_vid, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell
        FROM (SELECT vec_id FROM embeddings WHERE vec_id >= 10 ORDER BY vec_id LIMIT {N_CELLS})
    ),
    c0 AS (SELECT ct.cell, e.i, e.x FROM cents ct JOIN e ON e.vec_id = ct.cent_vid),
    c0n AS (SELECT cell, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
            FROM c0 GROUP BY cell),
    rcos0 AS (
        SELECT v.vec_id, c.cell,
               CAST(SUM(CAST(v.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (n.nrm * cn.nrm) AS cos
        FROM e v JOIN c0 c ON c.i = v.i
        JOIN norms n ON n.vec_id = v.vec_id JOIN c0n cn ON cn.cell = c.cell
        WHERE v.vec_id >= 10
        GROUP BY v.vec_id, c.cell, n.nrm, cn.nrm
    ),
    a0 AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        FROM rcos0) WHERE rn = 1),
    c1m AS (
        SELECT a.cell, e.i, CAST(SUM(CAST(e.x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS x
        FROM a0 a JOIN e ON e.vec_id = a.vec_id GROUP BY a.cell, e.i
    ),
    cr AS (SELECT c0.cell, c0.i, COALESCE(c1m.x, c0.x) AS x
           FROM c0 LEFT JOIN c1m ON c1m.cell = c0.cell AND c1m.i = c0.i),
    crn AS (SELECT cell, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
            FROM cr GROUP BY cell),
    rcos AS (
        SELECT v.vec_id, c.cell,
               CAST(SUM(CAST(v.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (n.nrm * cn.nrm) AS cos
        FROM e v JOIN cr c ON c.i = v.i
        JOIN norms n ON n.vec_id = v.vec_id JOIN crn cn ON cn.cell = c.cell
        GROUP BY v.vec_id, c.cell, n.nrm, cn.nrm
    ),
    assign AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        FROM rcos WHERE vec_id >= 10) WHERE rn = 1),
    probe AS (SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        FROM rcos WHERE vec_id < 10) WHERE rn <= {N_PROBE}),
    scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (nq.nrm * nc.nrm) AS cosine
        FROM probe p
        JOIN assign a ON a.cell = p.cell
        JOIN e q ON q.vec_id = p.query_id
        JOIN e c ON c.vec_id = a.vec_id AND c.i = q.i
        JOIN norms nq ON nq.vec_id = p.query_id
        JOIN norms nc ON nc.vec_id = a.vec_id
        GROUP BY p.query_id, neighbor_id, nq.nrm, nc.nrm
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {_K}
    """,
)
def ann_topk_ivf_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with one Lloyd refinement round on the centroids before
    assignment — the oracle replays seeding, the k-means round
    (seed-fallback for emptied cells), re-assignment, probing, and
    exact in-cell ranking, all decimal-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = topk_ivf(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10), _K, refine_iters=1
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "source_binary_documents",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def source_binary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal I/O round trip: payloads exported one-file-per-
    row from the executors (mapInPandas sink), re-ingested through
    Spark's binaryFile source, feature-extracted — md5 proves the
    bytes survived both hops."""
    import shutil

    from stream_spark.sources import read_binary_files, write_binary_files

    docs = load_table(spark, sf_dir, "documents")
    stage = "/root/repo/.scratch/binary_docs"
    shutil.rmtree(stage, ignore_errors=True)
    media = to_media_table(docs)
    write_binary_files(media, stage)
    back = read_binary_files(spark, stage)
    return extract_binary_features(
        back.withColumn("meta", F.struct(F.lit("application/octet-stream").alias("media_type")))
    ).select("doc_id", "byte_len", "payload_md5")


@register(
    "source_partitioned_parquet_pruned",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
    FROM documents WHERE lang IN ('en', 'de') GROUP BY lang
    """,
)
def source_partitioned_parquet_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet round trip with partition PRUNING:
    documents re-written partitioned by lang, re-read with a lang
    filter — the plan's PartitionFilters prune non-matching
    directories before any IO (asserted here, not just hoped)."""
    import shutil

    from stream_spark.sources.sinks import write_table

    docs = load_table(spark, sf_dir, "documents")
    stage = "/root/repo/.scratch/part_docs"
    shutil.rmtree(stage, ignore_errors=True)
    write_table(docs, stage, partition_by=["lang"])
    back = spark.read.parquet(stage).filter(F.col("lang").isin("en", "de"))
    plan = back._jdf.queryExecution().executedPlan().toString()
    if "PartitionFilters: [" not in plan or "lang" not in plan.split("PartitionFilters:")[1][:120]:
        raise AssertionError("partition pruning did not reach the scan:\n" + plan)
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
    )


@register(
    "embeddings_quantize_int8",
    oracle="""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), s AS (
        SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e
    )
    SELECT vec_id, scale,
           array_to_string(list_transform(v, x ->
               CAST(CASE WHEN scale = 0 THEN 0 ELSE floor(x / scale + 0.5) END AS BIGINT)), ',') AS q_csv
    FROM s
    """,
)
def embeddings_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization (scale = max|x|/127,
    q = floor(x/scale + 0.5)) — 4× memory cut for ANN serving /
    embedding storage. Map-only, no shuffle; arithmetic is all-double
    elementwise so both engines produce identical integers, and the
    quantized vector is emitted as a CSV string so the gate can hash
    it. floor(+0.5) not round(): CLAUDE.md rule 4 — round() ties
    differ across engines, floor is identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    e = emb.select("vec_id", v.alias("v"))
    s = e.select(
        "vec_id",
        "v",
        (F.array_max(F.transform("v", lambda x: F.abs(x))) / F.lit(127.0)).alias("scale"),
    )
    scale = F.col("scale")
    quant = F.transform(
        "v",
        lambda x: F.when(scale == 0, F.lit(0).cast("long"))
        .otherwise(F.floor(x / scale + F.lit(0.5)))
        .cast("long"),
    )
    return s.select(
        "vec_id", "scale", F.array_join(quant.cast("array<string>"), ",").alias("q_csv")
    )


_CASCADE_N1 = 50  # stage-1 retrieval depth
_CASCADE_N2 = 10  # survivors into the expensive stage


@register(
    "ann_topk_rerank_cascade",
    oracle=f"""
    WITH {_UNNEST_E},
    {_HP.format(np=N_PLANES - 1)},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (nq.nrm * nc.nrm) AS cosine
        FROM e q JOIN e c ON q.i = c.i AND q.vec_id < 10 AND c.vec_id >= 10
        JOIN buckets bq ON q.vec_id = bq.vec_id
        JOIN buckets bc ON c.vec_id = bc.vec_id AND bq.bucket = bc.bucket
        JOIN norms nq ON q.vec_id = nq.vec_id
        JOIN norms nc ON c.vec_id = nc.vec_id
        GROUP BY query_id, neighbor_id, nq.nrm, nc.nrm
    ),
    c1 AS (
        SELECT query_id, neighbor_id, cosine FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
            FROM scored) WHERE rk <= {_CASCADE_N1}
    ),
    r1 AS (
        SELECT query_id, neighbor_id, cosine,
               cosine + (CAST(('0x' || substr(md5(CAST(query_id AS VARCHAR) || ':'
                   || CAST(neighbor_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000) / 10000.0
                   AS rerank_score
        FROM c1
    ),
    c2 AS (
        SELECT query_id, neighbor_id, cosine FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rerank_score DESC, neighbor_id) AS rk
            FROM r1) WHERE rk <= {_CASCADE_N2}
    ),
    r2 AS (
        SELECT query_id, neighbor_id, cosine,
               cosine + (CAST(('0x' || substr(md5('x2:' || CAST(query_id AS VARCHAR) || ':'
                   || CAST(neighbor_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000) / 5000.0
                   AS final_score
        FROM c2
    )
    SELECT query_id, neighbor_id, cosine, final_score, CAST(rk AS BIGINT) AS final_rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY final_score DESC, neighbor_id) AS rk
        FROM r2
    ) WHERE rk <= {_K}
    """,
)
def ann_topk_rerank_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged-escalation retrieval cascade: LSH retrieve top-50 →
    cheap pair scorer keeps 10 → expensive scorer (different model
    salt, 2× logit weight) ranks the final 5. Each stage's cost-depth
    product stays flat while per-candidate cost grows 10× per stage —
    the production serving economics. Both scorer stages are the
    deterministic md5 STUB (real models drop into the same Arrow
    slots); the oracle replays all three stages."""
    from pyspark.sql import Window

    from stream_spark.operators.ann_pandas import rerank_crossencoder_stub
    from stream_spark.operators.text import md5_long

    emb = load_table(spark, sf_dir, "embeddings")
    c1 = topk_lsh(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10), _CASCADE_N1
    )
    c2 = rerank_crossencoder_stub(c1, _CASCADE_N2)
    # stage-2 "expensive" scorer: distinct salt, stronger logit weight
    pair = F.concat(F.lit("x2:"), F.col("query_id"), F.lit(":"), F.col("neighbor_id"))
    scored = c2.select(
        "query_id",
        "neighbor_id",
        "cosine",
        (F.col("cosine") + (md5_long(pair) % 1000) / F.lit(5000.0)).alias("final_score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("final_score").desc(), "neighbor_id")
    return (
        scored.withColumn("final_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("final_rank") <= _K)
    )


from stream_spark.operators.pq import K_CODES, N_SUB  # noqa: E402

# PQ codebook + exact-decimal assignment, replayed in SQL: seeds are
# the K lowest-id vectors of the given corpus expression {corpus_pred}.
_PQ_CODES = f"""
    seeds AS (
        SELECT vec_id AS cent_vid,
               CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code
        FROM (SELECT vec_id FROM embeddings WHERE {{corpus_pred}} ORDER BY vec_id LIMIT {K_CODES})
    ),
    cb AS (
        SELECT (e.i - 1) // 8 AS sub, s.code, (e.i - 1) % 8 AS j, e.x AS w
        FROM e JOIN seeds s ON e.vec_id = s.cent_vid
    ),
    dists AS (
        SELECT v.vec_id, cb.sub, cb.code,
               CAST(SUM(CAST((v.x - cb.w) * (v.x - cb.w) AS DECIMAL(28,12))) AS DECIMAL(30,12)) AS d
        FROM e v JOIN cb ON (v.i - 1) // 8 = cb.sub AND (v.i - 1) % 8 = cb.j
        WHERE {{code_pred}}
        GROUP BY v.vec_id, cb.sub, cb.code
    ),
    codes AS (
        SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
            FROM dists
        ) WHERE rn = 1
    )
"""


@register(
    "embeddings_pq_codes",
    oracle=f"""
    WITH {_UNNEST_E},
    {_PQ_CODES.format(corpus_pred="TRUE", code_pred="TRUE")}
    SELECT vec_id AS id, CAST(sub AS INT) AS sub, code FROM codes
    """,
)
def embeddings_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (operators/pq.pq_codes_arrow —
    numpy two-phase argmin per Arrow batch, bit-parity pytested against
    the Catalyst ``pq_codes`` spec spelling): every vector compressed
    to {N_SUB} sub-codes against deterministic per-subspace codebooks —
    map-only, the memory-bound ANN representation (64 floats →
    {N_SUB} bytes-ish). Encode is the pass a 100 TB index build pays
    per vector, so it runs the BLAS-batched path."""
    from stream_spark.operators.pq import pq_codes_arrow

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_codes_arrow(emb)


@register(
    "ann_topk_pq",
    oracle=f"""
    WITH {_UNNEST_E},
    {_PQ_CODES.format(corpus_pred="vec_id >= 10", code_pred="v.vec_id >= 10")},
    lut AS (
        SELECT q.vec_id AS query_id, cb.sub, cb.code,
               CAST(SUM(CAST((q.x - cb.w) * (q.x - cb.w) AS DECIMAL(28,12))) AS DECIMAL(30,12)) AS d
        FROM e q JOIN cb ON (q.i - 1) // 8 = cb.sub AND (q.i - 1) % 8 = cb.j
        WHERE q.vec_id < 10
        GROUP BY query_id, cb.sub, cb.code
    ),
    scored AS (
        SELECT l.query_id, c.vec_id AS neighbor_id,
               CAST(SUM(l.d) AS DECIMAL(30,12)) AS adist
        FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
        GROUP BY l.query_id, neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(adist AS DOUBLE) AS adist,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {_K}
    """,
)
def ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance PQ top-k (operators/pq.topk_pq): queries stay
    full precision, the corpus ships only its {N_SUB} codes per vector;
    per query a bounded (sub, code) distance LUT replaces the corpus
    scan — one equi-join on (sub, code) + one keyed sum. Exact-decimal
    distances keep both engines' rankings identical."""
    from stream_spark.operators.pq import topk_pq

    emb = load_table(spark, sf_dir, "embeddings")
    return topk_pq(emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10), _K)


@register(
    "ann_topk_ivfpq",
    oracle=f"""
    WITH {_UNNEST_E},
    ivfc AS (
        SELECT vec_id AS cent_vid, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell
        FROM (SELECT vec_id FROM embeddings WHERE vec_id >= 10 ORDER BY vec_id LIMIT {N_CELLS})
    ),
    ivf0 AS (SELECT ct.cell, e.i, e.x FROM ivfc ct JOIN e ON e.vec_id = ct.cent_vid),
    ivf0n AS (SELECT cell, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
              FROM ivf0 GROUP BY cell),
    icos AS (
        SELECT v.vec_id, c.cell,
               CAST(SUM(CAST(v.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (n.nrm * cn.nrm) AS cos
        FROM e v JOIN ivf0 c ON c.i = v.i
        JOIN norms n ON n.vec_id = v.vec_id JOIN ivf0n cn ON cn.cell = c.cell
        GROUP BY v.vec_id, c.cell, n.nrm, cn.nrm
    ),
    iassign AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
            FROM icos WHERE vec_id >= 10
        ) WHERE rn = 1
    ),
    iprobe AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
            FROM icos WHERE vec_id < 10
        ) WHERE rn <= {N_PROBE}
    ),
    {_PQ_CODES.format(corpus_pred="vec_id >= 10", code_pred="v.vec_id >= 10")},
    lut AS (
        SELECT q.vec_id AS query_id, cb.sub, cb.code,
               CAST(SUM(CAST((q.x - cb.w) * (q.x - cb.w) AS DECIMAL(28,12))) AS DECIMAL(30,12)) AS d
        FROM e q JOIN cb ON (q.i - 1) // 8 = cb.sub AND (q.i - 1) % 8 = cb.j
        WHERE q.vec_id < 10
        GROUP BY query_id, cb.sub, cb.code
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               CAST(SUM(l.d) AS DECIMAL(30,12)) AS adist
        FROM iprobe p
        JOIN iassign a ON a.cell = p.cell
        JOIN codes c ON c.vec_id = a.vec_id
        JOIN lut l ON l.query_id = p.query_id AND l.sub = c.sub AND l.code = c.code
        GROUP BY p.query_id, neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(adist AS DOUBLE) AS adist,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {_K}
    """,
)
def ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k — the composition production ANN runs (FAISS
    IVFPQ): coarse cosine cells prune the corpus to {N_PROBE}/{N_CELLS}
    inverted lists, asymmetric PQ distance ranks only the probed
    codes. Per query: (corpus/{N_CELLS})·{N_PROBE} code rows × {N_SUB}
    LUT lookups — scan volume AND per-vector cost both drop, the
    billion-vector scale shape. The oracle replays coarse assignment,
    encoding, probing, and the LUT sum bit-for-bit."""
    from stream_spark.operators.pq import topk_ivfpq

    emb = load_table(spark, sf_dir, "embeddings")
    return topk_ivfpq(emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10), _K)


@register(
    "embeddings_split_drift",
    oracle="""
    WITH el AS (
        SELECT em.label, em.vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings em, unnest(generate_series(1, len(embedding))) t(i)
    ),
    ma AS (
        SELECT label, i, CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
        FROM el WHERE vec_id % 2 = 0 GROUP BY label, i
    ),
    mb AS (
        SELECT label, i, CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
        FROM el WHERE vec_id % 2 = 1 GROUP BY label, i
    ),
    stats AS (
        SELECT a.label,
               CAST(SUM(CAST(a.m * b.m AS DECIMAL(28,12))) AS DOUBLE) AS d,
               sqrt(CAST(SUM(CAST(a.m * a.m AS DECIMAL(28,12))) AS DOUBLE)) AS na,
               sqrt(CAST(SUM(CAST(b.m * b.m AS DECIMAL(28,12))) AS DOUBLE)) AS nb
        FROM ma a JOIN mb b ON a.label = b.label AND a.i = b.i
        GROUP BY a.label
    ),
    cnts AS (
        SELECT label,
               CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
               CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
        FROM embeddings GROUP BY label
    )
    SELECT CAST(s.label AS BIGINT) AS label, c.n_even, c.n_odd,
           s.d / (s.na * s.nb) AS centroid_cosine
    FROM stats s JOIN cnts c ON s.label = c.label
    """,
)
def embeddings_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: per label, the cosine between the
    even-id-half and odd-id-half centroids — split-half consistency.
    A healthy homogeneous class sits near 1.0; a drop flags a shifted
    or contaminated slice (the embedding twin of corpus_token_drift's
    token-rate test). Two keyed (label, dim) aggregates with exact
    decimal means, a dim-bounded join, decimal cosine — no per-vector
    pairwork anywhere, linear at any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    el = emb.select("label", "vec_id", F.posexplode("embedding").alias("i0", "xf")).select(
        "label", "vec_id", (F.col("i0") + 1).alias("i"), F.col("xf").cast("double").alias("x")
    )

    def half_means(parity: int):
        return (
            el.filter(F.col("vec_id") % 2 == parity)
            .groupBy("label", "i")
            .agg((F.sum(F.col("x").cast("decimal(28,12)")).cast("double") / F.count("x")).alias("m"))
        )

    ma = half_means(0).withColumnRenamed("m", "ma")
    mb = half_means(1).withColumnRenamed("m", "mb")
    dec = lambda c: F.sum(c.cast("decimal(28,12)")).cast("double")  # noqa: E731
    stats = (
        ma.join(mb, ["label", "i"])
        .groupBy("label")
        .agg(
            dec(F.col("ma") * F.col("mb")).alias("d"),
            F.sqrt(dec(F.col("ma") * F.col("ma"))).alias("na"),
            F.sqrt(dec(F.col("mb") * F.col("mb"))).alias("nb"),
        )
    )
    cnts = emb.groupBy("label").agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0)).cast("bigint").alias("n_even"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0)).cast("bigint").alias("n_odd"),
    )
    return stats.join(cnts, "label").select(
        F.col("label").cast("bigint"),
        "n_even",
        "n_odd",
        (F.col("d") / (F.col("na") * F.col("nb"))).alias("centroid_cosine"),
    )


@register("embeddings_pca_project")
def embeddings_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 PCA projection of the embedding corpus (operators/pca):
    one map-only moment pass + driver d×d eigh + one map-only Arrow
    projection — the tall-skinny PCA shape, no shuffle anywhere.
    Pytest tier (contract tests: orthonormality, numpy parity,
    variance ordering, whitening): an eigendecomposition is not
    SQL-expressible, so the driver records the rows-only check."""
    from stream_spark.operators.pca import pca_fit, pca_transform

    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, vals = pca_fit(emb, k=8)
    return pca_transform(emb, mean, comps, vals)


from stream_spark.queries.dedup_queries import _HPB as _HPB_BANDS  # noqa: E402


@register(
    "embeddings_knn_graph",
    oracle=f"""
    WITH {_UNNEST_E},
    {_HPB_BANDS},
    dots AS (
        SELECT c.id_a, c.id_b,
               CAST(SUM(CAST(a.x * b.x AS DECIMAL(28,12))) AS DOUBLE) AS dot
        FROM cand c
        JOIN e a ON a.vec_id = c.id_a
        JOIN e b ON b.vec_id = c.id_b AND a.i = b.i
        GROUP BY c.id_a, c.id_b
    ),
    scored AS (
        SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS cosine
        FROM dots JOIN norms na ON id_a = na.vec_id JOIN norms nb ON id_b = nb.vec_id
    ),
    edges AS (
        SELECT id_a AS vec_id, id_b AS neighbor_id, cosine FROM scored
        UNION ALL
        SELECT id_b AS vec_id, id_a AS neighbor_id, cosine FROM scored
    )
    SELECT vec_id, neighbor_id, knn_rank, cosine FROM (
        SELECT vec_id, neighbor_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
               ) AS BIGINT) AS knn_rank
        FROM edges
    ) r WHERE knn_rank <= 5
    """,
)
def embeddings_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN graph over the whole corpus (k=5): candidate
    edges from the multi-table banded hyperplane LSH index (the same
    OR-construction as dedup_embedding_cosine — never all-pairs), each
    candidate scored with the exact-decimal cosine in the Arrow matmul
    kernel (threshold=-1: every candidate is a potential graph edge,
    so the scorer runs the exact path on all of them — r7 moved that
    from the interpreted Catalyst fold, ~0.2 ms/row, to numpy), with
    BOTH directions of each undirected pair emitted by the kernel
    (a unionAll of the pairs frame with its swap would recompute the
    entire LSH-index subtree twice), then ranked per source node
    (cosine desc, id tie-break).

    The k-NN graph is the backbone primitive for graph-based corpus
    curation — SemDeDup-style neighborhoods, kNN-classifier label
    noise detection, connectivity-based diversity sampling. Scale: the
    candidate volume is Σ_t Σ_bucket m² (bucket-bounded, hot buckets
    capped upstream), the per-node rank is a keyed window — no global
    sort, no corpus² term anywhere."""
    from stream_spark.operators.similarity import cosine_edges_lsh_banded
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    edges = cosine_edges_lsh_banded(emb, threshold=-1.0)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        edges.withColumn("knn_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("knn_rank") <= 5)
        .select("vec_id", "neighbor_id", "knn_rank", "cosine")
    )


@register(
    "embeddings_label_propagation",
    oracle=f"""
    WITH {_UNNEST_E},
    {_HPB_BANDS},
    dots AS (
        SELECT c.id_a, c.id_b,
               CAST(SUM(CAST(a.x * b.x AS DECIMAL(28,12))) AS DOUBLE) AS dot
        FROM cand c
        JOIN e a ON a.vec_id = c.id_a
        JOIN e b ON b.vec_id = c.id_b AND a.i = b.i
        GROUP BY c.id_a, c.id_b
    ),
    scored AS (
        SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS cosine
        FROM dots JOIN norms na ON id_a = na.vec_id JOIN norms nb ON id_b = nb.vec_id
    ),
    edges AS (
        SELECT id_a AS vec_id, id_b AS neighbor_id, cosine FROM scored
        UNION ALL
        SELECT id_b AS vec_id, id_a AS neighbor_id, cosine FROM scored
    ),
    knn AS (
        SELECT vec_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
               ) AS rnk
        FROM edges WHERE vec_id % 2 = 1 AND neighbor_id % 2 = 0
    ),
    votes AS (
        SELECT k.vec_id, CAST(l.label AS BIGINT) AS nl, CAST(COUNT(*) AS BIGINT) AS nv
        FROM knn k JOIN embeddings l ON k.neighbor_id = l.vec_id
        WHERE k.rnk <= 5 GROUP BY k.vec_id, l.label
    ),
    mx AS (SELECT vec_id, MAX(nv) AS m FROM votes GROUP BY vec_id),
    pred AS (
        SELECT v.vec_id, MIN(v.nl) AS pred_label, MAX(v.nv) AS n_votes
        FROM votes v JOIN mx ON v.vec_id = mx.vec_id AND v.nv = mx.m
        GROUP BY v.vec_id
    )
    SELECT p.vec_id, CAST(t.label AS BIGINT) AS true_label, p.pred_label, p.n_votes,
           (p.pred_label = CAST(t.label AS BIGINT)) AS is_correct
    FROM pred p JOIN embeddings t ON p.vec_id = t.vec_id
    """,
)
def embeddings_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised kNN label propagation / label-noise detection:
    labels on the EVEN half of the corpus are propagated to the ODD
    (held-out) half by majority vote of each held-out vector's 5
    nearest labeled neighbors from the banded-LSH k-NN graph (C66
    machinery). Deterministic vote resolution: highest count, then
    smallest label among ties — no engine-specific max_by. Output per
    held-out vector: true label, predicted label, winning vote count,
    correctness — rows where a confident vote disagrees with the
    stored label are the label-noise review queue.

    Scale: candidate edges are bucket-bounded LSH (never all-pairs);
    the neighbor rank, vote count, and vote argmax are all keyed by
    vec_id (window max, not a self-join — no subtree duplication, no
    global sort); the label lookup is a keyed join on 8-byte ids."""
    from pyspark.sql import Window

    from stream_spark.operators.similarity import cosine_edges_lsh_banded

    emb = load_table(spark, sf_dir, "embeddings")
    edges = cosine_edges_lsh_banded(emb, threshold=-1.0)
    t2t = edges.filter((F.col("vec_id") % 2 == 1) & (F.col("neighbor_id") % 2 == 0))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    knn = t2t.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").cast("long").alias("nl")
    )
    votes = (
        knn.join(labels, "neighbor_id")
        .groupBy("vec_id", "nl")
        .agg(F.count("*").cast("long").alias("nv"))
    )
    best = votes.withColumn("mx", F.max("nv").over(Window.partitionBy("vec_id")))
    pred = (
        best.filter(F.col("nv") == F.col("mx"))
        .groupBy("vec_id")
        .agg(F.min("nl").alias("pred_label"), F.max("nv").alias("n_votes"))
    )
    truth = emb.select("vec_id", F.col("label").cast("long").alias("true_label"))
    return pred.join(truth, "vec_id").select(
        "vec_id",
        "true_label",
        "pred_label",
        "n_votes",
        (F.col("pred_label") == F.col("true_label")).alias("is_correct"),
    )


@register(
    "ann_recall_at_k",
    oracle=f"""
    WITH {_UNNEST_E},
    bscored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (nq.nrm * nc.nrm) AS cosine
        FROM e q JOIN e c ON q.i = c.i AND q.vec_id < 10 AND c.vec_id >= 10
        JOIN norms nq ON q.vec_id = nq.vec_id
        JOIN norms nc ON c.vec_id = nc.vec_id
        GROUP BY query_id, neighbor_id, nq.nrm, nc.nrm
    ),
    bftop AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
            FROM bscored
        ) WHERE rank <= {_K}
    ),
    cents AS (
        SELECT vec_id AS cent_vid, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell
        FROM (SELECT vec_id FROM embeddings WHERE vec_id >= 10 ORDER BY vec_id LIMIT {N_CELLS})
    ),
    ccos AS (
        SELECT v.vec_id, ct.cell,
               CAST(SUM(CAST(v.x * ce.x AS DECIMAL(28,12))) AS DOUBLE) / (nv.nrm * nc.nrm) AS cos
        FROM e v
        JOIN cents ct ON TRUE
        JOIN e ce ON ce.vec_id = ct.cent_vid AND ce.i = v.i
        JOIN norms nv ON nv.vec_id = v.vec_id
        JOIN norms nc ON nc.vec_id = ct.cent_vid
        GROUP BY v.vec_id, ct.cell, nv.nrm, nc.nrm
    ),
    assign AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
            FROM ccos WHERE vec_id >= 10
        ) WHERE rn = 1
    ),
    probe AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
            FROM ccos WHERE vec_id < 10
        ) WHERE rn <= {N_PROBE}
    ),
    iscored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (nq.nrm * nc.nrm) AS cosine
        FROM probe p
        JOIN assign a ON a.cell = p.cell
        JOIN e q ON q.vec_id = p.query_id
        JOIN e c ON c.vec_id = a.vec_id AND c.i = q.i
        JOIN norms nq ON nq.vec_id = p.query_id
        JOIN norms nc ON nc.vec_id = a.vec_id
        GROUP BY p.query_id, neighbor_id, nq.nrm, nc.nrm
    ),
    ivftop AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
            FROM iscored
        ) WHERE rank <= {_K}
    )
    SELECT b.query_id,
           CAST(SUM(CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS recall
    FROM bftop b LEFT JOIN ivftop iv
      ON b.query_id = iv.query_id AND b.neighbor_id = iv.neighbor_id
    GROUP BY b.query_id
    """,
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index self-evaluation: recall@k of the IVF probe path against
    the exact brute-force ground truth, per query — the measurement an
    ANN deployment runs on a held-out query sample before trusting the
    index ("measure, don't guess": n_probe/n_cells tuning is a recall
    curve, not a feeling). Output per query: hit count, k, recall.

    Scale: ground truth is the brute-force op on the CONTRACT-BOUNDED
    query sample (the only place exact scan is ever paid — this is how
    recall measurement works at any scale, FAISS does the same); the
    IVF side probes n_probe/n_cells of the corpus; the comparison is a
    k-row-per-query left join, driver never sees per-vector data."""
    from stream_spark.operators.similarity import topk_bruteforce, topk_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    exact = topk_bruteforce(q, c, _K).select("query_id", "neighbor_id")
    approx = topk_ivf(q, c, _K).select(
        F.col("query_id").alias("iq"), F.col("neighbor_id").alias("inb"), F.lit(1).alias("hit")
    )
    joined = exact.join(
        approx,
        (F.col("query_id") == F.col("iq")) & (F.col("neighbor_id") == F.col("inb")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
        F.count("*").cast("long").alias("k"),
        (
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
            / F.count("*").cast("double")
        ).alias("recall"),
    )


@register(
    "embeddings_diversity_sample",
    oracle=f"""
    WITH {_UNNEST_E},
    {_HPB_BANDS},
    t0 AS (SELECT vec_id, bucket FROM tbuckets WHERE tbl = 0)
    SELECT bucket, MIN(vec_id) AS keeper_vec_id,
           CAST(COUNT(*) AS BIGINT) AS region_size
    FROM t0 GROUP BY bucket
    """,
)
def embeddings_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-preserving diversity downsample: ONE representative
    (min vec_id) per hyperplane-LSH region — table 0's 12-bit sign
    code partitions the embedding space into ≤4096 angular cells, and
    keeping one member per occupied cell preserves the corpus's
    directional coverage while collapsing dense clusters to a single
    delegate (the cheap stand-in for k-center / facility-location
    selection, which is inherently sequential). region_size doubles as
    the density diagnostic: a handful of huge regions = embedding
    collapse.

    Scale: the bucket code comes from the Arrow-matmul banded index
    (one numpy matmul per batch — the same machinery as the dedup
    index; the pure-Catalyst decimal-fold spelling costs ~17 s of
    interpreted-expression overhead at ANY size, the matmul is
    milliseconds), then ONE keyed aggregate on a ≤4096-cardinality
    key. No pairs, no windows, no collect."""
    from stream_spark.operators.similarity import banded_index

    emb = load_table(spark, sf_dir, "embeddings")
    # n_tables=1 projects only table 0's planes (indices 0..11 of the
    # same md5 family) — exactly the oracle's tbl=0 slice, 1/8 the work
    t0 = banded_index(emb, n_tables=1).select(F.col("id").alias("vec_id"), "bucket")
    return t0.groupBy("bucket").agg(
        F.min("vec_id").alias("keeper_vec_id"),
        F.count("*").cast("long").alias("region_size"),
    )



@register(
    "multimodal_image_neardup_groups",
    oracle=f"""
    WITH {_AHASH_CTES},
    grp AS (
        SELECT ahash, CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS rep
        FROM ahashes GROUP BY ahash
    ),
    nib AS (
        SELECT ahash, k, CAST((ahash >> (4 * k)) & 15 AS BIGINT) AS v
        FROM grp, unnest(generate_series(0, 3)) t(k)
    ),
    cand AS (
        SELECT DISTINCT a.ahash AS h1, b.ahash AS h2
        FROM nib a JOIN nib b ON a.k = b.k AND a.v = b.v AND a.ahash < b.ahash
    ),
    edges AS (
        SELECT c.h1 AS hash_a, c.h2 AS hash_b,
               CAST(bit_count(xor(c.h1, c.h2)) AS BIGINT) AS hamming,
               ga.n AS n_a, gb.n AS n_b, ga.rep AS rep_a, gb.rep AS rep_b
        FROM cand c JOIN grp ga ON ga.ahash = c.h1 JOIN grp gb ON gb.ahash = c.h2
        WHERE bit_count(xor(c.h1, c.h2)) <= 3
    ),
    selfies AS (
        SELECT ahash AS hash_a, ahash AS hash_b, CAST(0 AS BIGINT) AS hamming,
               n AS n_a, n AS n_b, rep AS rep_a, rep AS rep_b
        FROM grp WHERE n >= 2
    )
    SELECT * FROM edges UNION ALL SELECT * FROM selfies
    """,
)
def multimodal_image_neardup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH image near-dup structure — completes C51 at the
    HASH-GROUP level, the only level that survives crawl scale:
    perceptual aHash groups (real native decode) plus hamming ≤ 3
    edges BETWEEN groups via the simhash-style nibble pigeonhole
    (16 bits / 4 nibbles: ≤3 differing bits ⇒ ≥1 equal nibble ⇒
    equi-join). Self-rows (hash_a = hash_b, hamming 0, n ≥ 2) report
    exact-duplicate swarms as (size, keeper) instead of enumerating
    n² doc pairs — the r5 probe measured 4×10⁸ doc pairs on the sf1
    swarm corpus (47 distinct hashes over 50 k images), so DOC-level
    pair output is quadratic-in-group-size by definition and is
    deliberately not offered; downstream keeper selection / connected
    components run on these group edges.

    Scale: everything after the map-only decode+hash runs on the
    DISTINCT-hash table — ≤65 536 rows at ANY corpus size (16-bit hash
    space) — so the nibble join, the edge filter, and the group stats
    are all bounded by the hash space, not the image count."""
    from stream_spark.operators.multimodal import ahash_image, synthetic_image_table

    docs = load_table(spark, sf_dir, "documents")
    h = ahash_image(synthetic_image_table(docs)).select("doc_id", "ahash")
    grp = h.groupBy("ahash").agg(
        F.count("*").cast("long").alias("n"), F.min("doc_id").alias("rep")
    )
    parts = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.expr(f"CAST((ahash >> {4 * k}) & 15 AS BIGINT)").alias("v"),
            )
            for k in range(4)
        ]
    )
    nib = grp.select("ahash", F.explode(parts).alias("p")).select(
        "ahash", F.col("p.k").alias("k"), F.col("p.v").alias("v")
    )
    cand = (
        nib.alias("a")
        .join(
            nib.alias("b"),
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.ahash") < F.col("b.ahash")),
        )
        .select(F.col("a.ahash").alias("hash_a"), F.col("b.ahash").alias("hash_b"))
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("hash_a").bitwiseXOR(F.col("hash_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= 3)
    )
    ga = grp.select(
        F.col("ahash").alias("hash_a"), F.col("n").alias("n_a"), F.col("rep").alias("rep_a")
    )
    gb = grp.select(
        F.col("ahash").alias("hash_b"), F.col("n").alias("n_b"), F.col("rep").alias("rep_b")
    )
    edges = cand.join(ga, "hash_a").join(gb, "hash_b").select(
        "hash_a", "hash_b", "hamming", "n_a", "n_b", "rep_a", "rep_b"
    )
    selfies = grp.filter(F.col("n") >= 2).select(
        F.col("ahash").alias("hash_a"),
        F.col("ahash").alias("hash_b"),
        F.lit(0).cast("long").alias("hamming"),
        F.col("n").alias("n_a"),
        F.col("n").alias("n_b"),
        F.col("rep").alias("rep_a"),
        F.col("rep").alias("rep_b"),
    )
    return edges.unionByName(selfies)


# shared brute-force ground-truth CTE for the recall self-evaluations:
# exact cosine top-K of the bounded query sample vs the corpus.
_BF_TOP = f"""
    bscored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (nq.nrm * nc.nrm) AS cosine
        FROM e q JOIN e c ON q.i = c.i AND q.vec_id < 10 AND c.vec_id >= 10
        JOIN norms nq ON q.vec_id = nq.vec_id
        JOIN norms nc ON c.vec_id = nc.vec_id
        GROUP BY query_id, neighbor_id, nq.nrm, nc.nrm
    ),
    bftop AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
            FROM bscored
        ) WHERE rank <= {_K}
    )
"""


@register(
    "ann_recall_pq_paths",
    oracle=f"""
    WITH {_UNNEST_E},
    {_BF_TOP},
    ivfc AS (
        SELECT vec_id AS cent_vid, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell
        FROM (SELECT vec_id FROM embeddings WHERE vec_id >= 10 ORDER BY vec_id LIMIT {N_CELLS})
    ),
    ivf0 AS (SELECT ct.cell, e.i, e.x FROM ivfc ct JOIN e ON e.vec_id = ct.cent_vid),
    ivf0n AS (SELECT cell, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
              FROM ivf0 GROUP BY cell),
    icos AS (
        SELECT v.vec_id, c.cell,
               CAST(SUM(CAST(v.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (n.nrm * cn.nrm) AS cos
        FROM e v JOIN ivf0 c ON c.i = v.i
        JOIN norms n ON n.vec_id = v.vec_id JOIN ivf0n cn ON cn.cell = c.cell
        GROUP BY v.vec_id, c.cell, n.nrm, cn.nrm
    ),
    iassign AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
            FROM icos WHERE vec_id >= 10
        ) WHERE rn = 1
    ),
    iprobe AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
            FROM icos WHERE vec_id < 10
        ) WHERE rn <= {N_PROBE}
    ),
    {_PQ_CODES.format(corpus_pred="vec_id >= 10", code_pred="v.vec_id >= 10")},
    lut AS (
        SELECT q.vec_id AS query_id, cb.sub, cb.code,
               CAST(SUM(CAST((q.x - cb.w) * (q.x - cb.w) AS DECIMAL(28,12))) AS DECIMAL(30,12)) AS d
        FROM e q JOIN cb ON (q.i - 1) // 8 = cb.sub AND (q.i - 1) % 8 = cb.j
        WHERE q.vec_id < 10
        GROUP BY query_id, cb.sub, cb.code
    ),
    pqscored AS (
        SELECT l.query_id, c.vec_id AS neighbor_id, CAST(SUM(l.d) AS DECIMAL(30,12)) AS adist
        FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
        GROUP BY l.query_id, neighbor_id
    ),
    pqtop AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
            FROM pqscored
        ) WHERE rank <= {_K}
    ),
    ivscored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id, CAST(SUM(l.d) AS DECIMAL(30,12)) AS adist
        FROM iprobe p
        JOIN iassign a ON a.cell = p.cell
        JOIN codes c ON c.vec_id = a.vec_id
        JOIN lut l ON l.query_id = p.query_id AND l.sub = c.sub AND l.code = c.code
        GROUP BY p.query_id, neighbor_id
    ),
    ivtop AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
            FROM ivscored
        ) WHERE rank <= {_K}
    )
    SELECT b.query_id,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS pq_hits,
           CAST(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS pq_recall,
           CAST(SUM(CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ivfpq_hits,
           CAST(SUM(CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS ivfpq_recall
    FROM bftop b
    LEFT JOIN pqtop p ON b.query_id = p.query_id AND b.neighbor_id = p.neighbor_id
    LEFT JOIN ivtop iv ON b.query_id = iv.query_id AND b.neighbor_id = iv.neighbor_id
    GROUP BY b.query_id
    """,
)
def ann_recall_pq_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the COMPRESSED rankings — PQ asymmetric-LUT and
    IVF-PQ (coarse probe × LUT) — against the exact brute-force ground
    truth on the bounded query sample, per query. Completes the
    C43/C71 family's self-evaluation: `ann_recall_at_k` measures the
    IVF pruning loss alone; this measures the quantization loss (PQ)
    and the combined pruning+quantization loss (IVF-PQ), so the
    compression/recall trade-off is MEASURED, not assumed (the FAISS
    practice: every deployed index ships with its recall curve).

    Scale: the exact scan is paid only on the contract-bounded query
    sample (the sanctioned place); both approximate sides are the
    production-shaped gated operators; the comparison is a k-row-per-
    query double left join — bounded by |queries|·k rows.
    """
    from stream_spark.operators.pq import topk_ivfpq, topk_pq

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    exact = topk_bruteforce(q, c, _K).select("query_id", "neighbor_id")
    pq = topk_pq(q, c, _K).select(
        F.col("query_id").alias("pq_q"), F.col("neighbor_id").alias("pq_n"),
        F.lit(1).alias("pq_hit"),
    )
    iv = topk_ivfpq(q, c, _K).select(
        F.col("query_id").alias("iv_q"), F.col("neighbor_id").alias("iv_n"),
        F.lit(1).alias("iv_hit"),
    )
    joined = (
        exact.join(
            pq, (F.col("query_id") == F.col("pq_q")) & (F.col("neighbor_id") == F.col("pq_n")), "left"
        ).join(
            iv, (F.col("query_id") == F.col("iv_q")) & (F.col("neighbor_id") == F.col("iv_n")), "left"
        )
    )
    return joined.groupBy("query_id").agg(
        F.count("*").cast("long").alias("k"),
        F.sum(F.coalesce(F.col("pq_hit"), F.lit(0))).cast("long").alias("pq_hits"),
        (
            F.sum(F.coalesce(F.col("pq_hit"), F.lit(0))).cast("double")
            / F.count("*").cast("double")
        ).alias("pq_recall"),
        F.sum(F.coalesce(F.col("iv_hit"), F.lit(0))).cast("long").alias("ivfpq_hits"),
        (
            F.sum(F.coalesce(F.col("iv_hit"), F.lit(0))).cast("double")
            / F.count("*").cast("double")
        ).alias("ivfpq_recall"),
    )


def _mmr_oracle(n_cand: int = 16, k_sel: int = 8) -> str:
    """Unrolled-greedy MMR oracle: top-``n_cand`` exact-cosine
    candidates per query, the full candidate-pair cosine matrix, then
    ``k_sel`` selection steps each spelled as a CTE pair (score the
    unselected against the selected-so-far, pick the per-query argmax)
    — the same fixed-iteration-unroll technique as the PageRank oracle.
    All ordering arithmetic on scale-12 BIGINTs (floor on both
    engines), so the selection replays exactly."""
    parts = [
        f"""
    WITH {_UNNEST_E},
    scored AS MATERIALIZED (
        SELECT q.vec_id AS query_id, c.vec_id AS id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,12))) AS DOUBLE) / (nq.nrm * nc.nrm) AS cosine
        FROM e q JOIN e c ON q.i = c.i AND q.vec_id < 10 AND c.vec_id >= 10
        JOIN norms nq ON q.vec_id = nq.vec_id
        JOIN norms nc ON c.vec_id = nc.vec_id
        GROUP BY query_id, id, nq.nrm, nc.nrm
    ),
    cand AS MATERIALIZED (
        SELECT query_id, id, CAST(floor(cosine * 1e12) AS BIGINT) AS s_q
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rn FROM scored)
        WHERE rn <= {n_cand}
    ),
    ce AS MATERIALIZED (SELECT c.query_id, c.id, e.i, e.x FROM cand c JOIN e ON e.vec_id = c.id),
    pair AS MATERIALIZED (
        SELECT a.query_id, a.id AS pa, b.id AS pb,
               CAST(floor(CAST(SUM(CAST(a.x * b.x AS DECIMAL(28,12))) AS DOUBLE) / (na.nrm * nb.nrm) * 1e12) AS BIGINT) AS s_ab
        FROM ce a JOIN ce b ON a.query_id = b.query_id AND a.i = b.i AND a.id <> b.id
        JOIN norms na ON na.vec_id = a.id
        JOIN norms nb ON nb.vec_id = b.id
        GROUP BY a.query_id, a.id, b.id, na.nrm, nb.nrm
    ),
    pick1 AS (
        SELECT query_id, id, 7 * s_q AS score, CAST(1 AS BIGINT) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s_q DESC, id) AS rn FROM cand)
        WHERE rn = 1
    ),
    sel1 AS (SELECT query_id, id FROM pick1)"""
    ]
    for i in range(2, k_sel + 1):
        parts.append(
            f""",
    score{i} AS (
        SELECT c.query_id, c.id,
               7 * c.s_q - 3 * (SELECT MAX(p.s_ab) FROM pair p
                                JOIN sel{i - 1} s ON s.query_id = p.query_id AND s.id = p.pb
                                WHERE p.query_id = c.query_id AND p.pa = c.id) AS score
        FROM cand c
        WHERE NOT EXISTS (SELECT 1 FROM sel{i - 1} s WHERE s.query_id = c.query_id AND s.id = c.id)
    ),
    pick{i} AS (
        SELECT query_id, id, score, CAST({i} AS BIGINT) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rn FROM score{i})
        WHERE rn = 1
    ),
    sel{i} AS MATERIALIZED (SELECT query_id, id FROM sel{i - 1} UNION ALL SELECT query_id, id FROM pick{i})"""
        )
    picks = "\n    UNION ALL ".join(
        f"SELECT query_id, rank, id AS vec_id, score AS mmr_score FROM pick{i}"
        for i in range(1, k_sel + 1)
    )
    parts.append(f"\n    {picks}")
    return "".join(parts)


@register("embeddings_mmr_rerank", oracle=_mmr_oracle())
def embeddings_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversity rerank (r8): per query,
    the top-16 exact-cosine candidates are greedily reduced to 8
    exemplars maximizing ``0.7·sim(q,d) − 0.3·max_{s∈S} sim(d,s)`` —
    relevant but mutually non-redundant, the standard diverse
    few-shot / eval-exemplar mining step (Carbonell & Goldstein).
    Distributed shape: candidates from the C6 two-phase exact path
    (BLAS prerank + decimal rescore, corpus scanned once); the
    candidate-pair cosine matrix is one bounded self-join (≤ 10
    queries × 16×15 pairs); the inherently-sequential greedy runs
    per-query in one Arrow batch over pure scale-12 integer scores
    (operators/retrieval.mmr_select). The oracle unrolls all 8
    selection steps in SQL."""
    from stream_spark.operators.retrieval import mmr_select
    from stream_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    topc = topk_bruteforce(q, c, 16)
    # EAGER lineage cuts (r11): `cand` feeds the candidate-vector join
    # AND the greedy selector, `ce` feeds both pair-join sides —
    # unmaterialized, each reference re-derived the full two-phase
    # top-k corpus pass (8 embeddings scans in the frozen plan; now 1).
    # Both frames are bounded (≤ 10 queries × 16 candidates) by
    # construction; eager because the consumers are parallel subtrees
    # of one job (a lazy pin lets their stages race on the uncached
    # RDD — measured worse).
    cand = topc.select(
        "query_id",
        F.col("neighbor_id").alias("cid"),
        F.floor(F.col("cosine") * F.lit(1e12)).cast("long").alias("s_q"),
    ).localCheckpoint()
    ce = (
        cand.join(emb.select(F.col("vec_id").alias("cid"), "embedding"), "cid")
        .select("query_id", "cid", "embedding")
        .localCheckpoint()
    )
    ps = (
        ce.alias("L")
        .join(
            # broadcast-ok: ce is ≤ 10 queries × 16 candidates = 160 rows by construction
            F.broadcast(ce.alias("R")),
            (F.col("L.query_id") == F.col("R.query_id")) & (F.col("L.cid") != F.col("R.cid")),
        )
        .select(
            F.col("L.query_id").alias("query_id"),
            F.col("L.cid").alias("pa"),
            F.col("R.cid").alias("pb"),
            F.floor(cosine(F.col("L.embedding"), F.col("R.embedding")) * F.lit(1e12))
            .cast("long")
            .alias("s_ab"),
        )
    )
    return mmr_select(cand, ps, k=8)


_NORM_D = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"


@register(
    "embeddings_cluster_topics",
    oracle=f"""
    WITH {_UNNEST_E},
    {_km_ctes(str(_KM_K))},
    a2 AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        FROM cos2) WHERE rn = 1),
    nrmt AS (SELECT doc_id, {_NORM_D} AS norm FROM documents),
    t AS (SELECT doc_id, unnest(string_split_regex(norm, '\\s+')) AS term FROM nrmt),
    ct AS (SELECT a.cell AS cluster, t.term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM t JOIN a2 a ON a.vec_id = t.doc_id GROUP BY a.cell, t.term),
    cdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cdf FROM ct GROUP BY term),
    scored AS (SELECT cluster, ct.term, tf, cdf,
                      CAST((tf * (2*{_KM_K} - 2*cdf + 1) * 1000) // (2*cdf + 1) AS BIGINT) AS score
               FROM ct JOIN cdf USING (term))
    SELECT cluster, CAST(rank AS BIGINT) AS rank, term, tf, cdf, score FROM (
        SELECT *, row_number() OVER (PARTITION BY cluster ORDER BY score DESC, term) AS rank
        FROM scored) WHERE rank <= 5
    """,
)
def embeddings_cluster_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster labeling (r8): the top-5 distinctive terms per k-means
    embedding cell — the "what is this cluster made of" inspection run
    on SemDeDup/domain-discovery partitions before acting on them
    (Abbas et al. inspect clusters exactly this way). Weight = tf ×
    the log-free Robertson cluster-idf odds ``(2K−2df+1)/(2df+1)``
    (same pre-log surrogate as the BM25 operator — monotone in df,
    pure BIGINT via ×1000 DIV — rule 8), so a term scoring high must
    be frequent IN the cluster and rare ACROSS clusters.

    Scale: the 2-round Lloyd assignment is the Arrow-matmul path
    (clustering.kmeans_assign_inplan — O(n·k·dim) BLAS flops, map-only,
    bit-identical to the C19 all-decimal fold via the float-prefilter →
    exact-decimal-escape contract, already oracle-pinned by the
    SemDeDup query against these same _km_ctes; swapped in r9 after the
    interpreted decimal fold measured 3.07 s as the slowest tier-2
    entry — VERDICT r8 item 4); token counts are keyed (cluster, term)
    aggregates; the cluster-df table is vocab-keyed (never broadcast);
    top-5 is the C73 salted two-stage rank — no window ever sees a full
    vocabulary, exact by the containment argument. The oracle replays
    both Lloyd rounds and ranks per cluster directly.

    The (cluster, term) aggregate feeds BOTH the cluster-df branch and
    the score join — without a cut Catalyst evaluates the whole token
    explode + assignment join twice (measured 2.37 s vs 0.29 s at
    sf0.1, r9 A/B), so ``ct`` is localCheckpointed once (the r8
    pagerank edge-checkpoint discipline; the frame is the keyed
    (cluster, term) count table — corpus-vocab-bounded, distributed,
    never a driver collect)."""
    from pyspark.sql import Window

    from stream_spark.operators.clustering import kmeans_assign_inplan
    from stream_spark.operators.text import md5_long, normalize_text, tokens

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    assign = kmeans_assign_inplan(emb, k=_KM_K, iters=2, attach_cos=False).select("vec_id", "cluster")
    tok = docs.select(
        "doc_id", F.explode(tokens(normalize_text(F.col("text")))).alias("term")
    )
    ct = (
        tok.join(assign, tok.doc_id == assign.vec_id)
        .groupBy("cluster", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint(eager=True)
    )
    cdf = ct.groupBy("term").agg(F.count("*").cast("long").alias("cdf"))
    scored = ct.join(cdf, "term").withColumn(
        "score",
        F.expr(f"(tf * (2*{_KM_K} - 2*cdf + 1) * 1000) DIV (2*cdf + 1)").cast("long"),
    )
    salted = Window.partitionBy(
        "cluster", F.pmod(md5_long(F.col("term")), F.lit(64))
    ).orderBy(F.desc("score"), F.asc("term"))
    survivors = scored.withColumn("srnk", F.row_number().over(salted)).filter(
        F.col("srnk") <= 5
    )
    final = Window.partitionBy("cluster").orderBy(F.desc("score"), F.asc("term"))
    return (
        survivors.withColumn("rank", F.row_number().over(final).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("cluster", "rank", "term", "tf", "cdf", "score")
    )


def _audio_fp_ctes(src: str = "documents") -> str:
    """Audio-fingerprint CTE chain over a caller-chosen source
    relation (anything exposing doc_id) — ends with ``afp(doc_id,
    sample_rate, n_samples, audio_hash)``. Same parameterization
    rationale as ``_ahash_ctes``."""
    return f"""s AS (
        SELECT d.doc_id, 40 + d.doc_id % 17 AS n, t.i,
               ABS((d.doc_id * 31 + t.i * 7) % 65536 - 32768) AS a
        FROM {src} d, unnest(generate_series(0, 39 + d.doc_id % 17)) t(i)
    ),
    w AS (SELECT doc_id, n, i * 16 // n AS wi, a FROM s),
    we AS (SELECT doc_id, n, wi, SUM(a) AS e, COUNT(*) AS nw
           FROM w GROUP BY doc_id, n, wi),
    tot AS (SELECT doc_id, SUM(a) AS total FROM s GROUP BY doc_id),
    afp AS (
        SELECT we.doc_id,
               CAST(8000 * (1 + we.doc_id % 2) AS BIGINT) AS sample_rate,
               CAST(MAX(we.n) AS BIGINT) AS n_samples,
               CAST(SUM(CASE WHEN we.e * we.n >= t.total * we.nw
                             THEN 1 << wi ELSE 0 END) AS BIGINT) AS audio_hash
        FROM we JOIN tot t USING (doc_id)
        GROUP BY we.doc_id
    )"""


@register(
    "multimodal_audio_fingerprint",
    oracle=f"""
    WITH {_audio_fp_ctes()}
    SELECT doc_id, sample_rate, n_samples, audio_hash FROM afp
    """,
)
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio perceptual fingerprinting (r8) — completes the multimodal
    dedup story next to C51's image aHash: REAL native PCM16 WAV
    decode → 16 near-equal index windows → exact-int64 energy per
    window → cross-multiplied mean threshold → 16-bit loudness-profile
    hash. Identical clips collide, near-identical clips land a
    hamming-banded join away — the same downstream grouping machinery
    as simhash/image-aHash. All integer ops, so the oracle recomputes
    every hash arithmetically from the synthetic generator (the same
    discipline as the C12/C51 oracles)."""
    from stream_spark.operators.multimodal import ahash_audio, synthetic_audio_table

    docs = load_table(spark, sf_dir, "documents")
    return ahash_audio(synthetic_audio_table(docs))


_MD5_60_A = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
_CBS_M = 12  # exemplars kept per semantic cluster


@register(
    "embeddings_cluster_balanced_sample",
    oracle=f"""
    WITH {_UNNEST_E},
    {_km_ctes(str(_KM_K))},
    a2 AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        FROM cos2) WHERE rn = 1),
    hkd AS (SELECT vec_id, cell,
                   {_MD5_60_A.format(x='CAST(vec_id AS VARCHAR)')} AS hk
            FROM a2)
    SELECT cell AS cluster, CAST(rank AS BIGINT) AS rank, vec_id FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY cell ORDER BY hk, vec_id) AS rank
        FROM hkd)
    WHERE rank <= {_CBS_M}
    """,
)
def embeddings_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced corpus selection (r9, VERDICT r8 item 8's
    second widening candidate): k-means the embedding space, then keep
    a fixed budget of exemplars PER semantic cluster in deterministic
    md5-of-id order — the diversity-preserving selection step the
    D4-style curation recipes run after dedup (sampling uniformly
    over clusters instead of over documents, so head topics can't
    crowd out the tail; Tirumala et al. 2023, arXiv:2308.12284,
    compose SemDeDup clusters with diversification exactly this way).

    Scale: assignment is the Arrow-matmul Lloyd path (map-only,
    broadcast centroids); the per-cluster pick is the C73 salted
    two-stage top-k — per-(cluster, salt) row_numbers keep ≤ m rows
    each, then the bounded survivor set (≤ m·64 per cluster) takes the
    final rank, so NO window ever sees a full cluster partition (at
    100 TB a semantic cluster is millions of docs; a naive
    partitionBy(cluster) rank would put them in one task). The hash
    order makes the sample reproducible on any layout (md5-derived —
    determinism rule 2)."""
    from pyspark.sql import Window

    from stream_spark.operators.clustering import kmeans_assign_inplan
    from stream_spark.operators.text import md5_long

    emb = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_assign_inplan(emb, k=_KM_K, iters=2, attach_cos=False).select("vec_id", "cluster")
    keyed = assign.withColumn("hk", md5_long(F.col("vec_id").cast("string")))
    salted = Window.partitionBy("cluster", F.pmod(F.col("vec_id"), F.lit(64))).orderBy(
        "hk", "vec_id"
    )
    surv = keyed.withColumn("srnk", F.row_number().over(salted)).filter(
        F.col("srnk") <= _CBS_M
    )
    final = Window.partitionBy("cluster").orderBy("hk", "vec_id")
    return (
        surv.withColumn("rank", F.row_number().over(final).cast("long"))
        .filter(F.col("rank") <= _CBS_M)
        .select("cluster", "rank", "vec_id")
    )
