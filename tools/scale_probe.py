"""sf1 scale probe (VERDICT r2 #8): run the most scale-sensitive gated
queries at 10x sf0.1 and check none goes super-linear.

For each query: time at sf0.1 (steady-state best-of-2 after a warm
run, same methodology as bench.py) and at sf1; report the wall-time
ratio. PASS if every ratio <= 10x (linear) with 2x headroom (<= 20x) —
a query whose cost is quadratic in corpus size would show ~100x.

Run: python tools/scale_probe.py [sf1_dir]   (writes SCALE_PROBE.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_blocked",
    "dedup_simhash",
    "dedup_ngram_jaccard_capped",
    "dedup_containment_capped",
    "dedup_embedding_cosine",
    "embedding_dedup_clusters",
    "dedup_clusters",
    "dedup_incremental_batch",
    "events_sessionize",
    "training_pack_sequences",
    "training_data_prep_packed",
    "parts_copurchase_pagerank",
    "agg_tumbling_count_sum",
    "streaming_stream_join_time",
    "streaming_stream_left_join_time",
    "streaming_count_window_sum",
    # round-3 additions
    "parts_copurchase_triangles",
    "parts_name_entity_clusters",
    "corpus_cross_source_dup_matrix",
    "events_out_of_order_rate",
    "orders_snapshot_diff",
    "streaming_dedup_minhash",
    # round-4 additions: SemDeDup's pair volume is linear only because
    # k tracks corpus size (bounded cluster occupancy); the streaming
    # embedding fold is bounded-state like its minhash twin
    "dedup_semantic_clusters",
    "streaming_dedup_embedding",
    "corpus_bpe_merges",
    "dedup_keep_best_quality",
    "ann_topk_ivfpq",
    "pipeline_curation",
    # round-5 additions: the corpus-level text/dedup family — all
    # equi-join + keyed-aggregate shapes that must stay linear
    "dedup_exact_substring",
    "documents_substring_dup_coverage",
    "documents_bm25_search",
    "documents_lm_quality_buckets",
    "documents_line_dedup",
    "documents_winnowing_fingerprints",
    "dedup_winnowed_pairs",
    "documents_dsir_selection",
    "orders_daily_ewma",
    "documents_token_budget_sample",
    "embeddings_semantic_decontaminate",
    "documents_hybrid_search",
    "documents_substring_removal",
    "documents_ngram_novelty",
    "corpus_vocab_growth",
    "streaming_dsir_gate",
    "events_asof_nearest_click",
    "embeddings_pca_project",
    # round-5 late additions: feature-store / classifier / graph ops —
    # the knn graph + label propagation share the banded-LSH edge
    # volume, the classifier is token-stream keyed joins, the
    # split audit rides the minhash index, the PIT join is bounded by
    # per-user version count
    "events_pit_dimension_join",
    "embeddings_knn_graph",
    "embeddings_label_propagation",
    "embeddings_outlier_filter",
    "documents_langid_classifier",
    "documents_split_contamination",
    "ann_recall_at_k",
    "documents_source_keywords",
    "streaming_decontaminate_gate",
    "events_decay_sample",
    "events_user_sequences",
    "documents_temperature_sample",
    "documents_shard_assignment",
    "dedup_minhash_estimate_error",
    "embeddings_diversity_sample",
    "documents_curriculum_order",
    "multimodal_image_neardup_groups",
    # round-6 addition: the compressed-ranking recall self-evaluation
    # (brute ground truth bounded by the query contract; PQ + IVF-PQ
    # sides must stay corpus-linear)
    "ann_recall_pq_paths",
    # r8: banded exact-Jaccard family (VERDICT r7 item 1) — candidate
    # volume band-collision-bounded, must beat the exact family's axis
    "dedup_jaccard_banded",
    "dedup_clusters_banded",
    "dedup_keep_best_quality_banded",
    "documents_soft_dedup_weights",
    "embeddings_mmr_rerank",
    "embeddings_cluster_topics",
    "dedup_banded_recall",
    "dedup_incremental_verified",
    "multimodal_audio_fingerprint",
    # r9: the capstone's near-dup stage now routes through the banded
    # pair generator (VERDICT r8 item 1) — probe it on the band-
    # candidate axis to show the production entrypoint is off Σ freq²
    "training_data_prep",
    # r9 widening: the composed multimodal-curation DSL pipeline
    # (media hashing is map-side Arrow; dedups are keyed groupBys; the
    # text stage shares the band-candidate axis) and the cluster-
    # balanced selection (map-only assignment + salted two-stage rank)
    "pipeline_multimodal_curation",
    "embeddings_cluster_balanced_sample",
    # r9 late additions: the stored-index incremental shape (write +
    # load + probe lifecycle) and the langid eval matrix
    "dedup_index_persisted",
    "documents_langid_confusion",
    # r11 (VERDICT r10 item 5): the stored-index LIFECYCLE under the
    # probe — the two-day append/compact/probe loop (index-I/O-shaped:
    # two writes + a compaction rewrite inside the timed window), the
    # zero-state online probe, and the per-batch maintain fold; all
    # keyed equi-join + distinct shapes whose cost axis is bands
    # (linear in docs)
    "dedup_index_update",
    "dedup_index_update_bucketed",
    "streaming_dedup_index_probe",
    "streaming_dedup_index_maintain",
    "streaming_dedup_index_maintain_bucketed",
]


def _jaccard_candidate_volume(spark, sf_dir: str) -> int:
    """Σ_g freq(g)² over the documents shingle index — the EXACT number
    of candidate rows the uncapped inverted-index Jaccard self-join
    enumerates (the intrinsic work metric for dedup_clusters /
    dedup_keep_best_quality; output-pair counts hide the clique m²
    term the planted near-dup swarms create: r7 measured 2.78M at
    sf0.1 vs 279M at sf1 — 100× candidate volume at 10× docs, against
    which the ~10.7× wall is strongly SUBLINEAR)."""
    from pyspark.sql import functions as F

    from stream_spark.operators.dedup import shingle_docs
    from stream_spark.sources import load_table

    sh = shingle_docs(load_table(spark, sf_dir, "documents"))
    freq = sh.groupBy("g").agg(F.count("*").alias("f"))
    return int(freq.agg(F.sum(F.col("f") * F.col("f"))).collect()[0][0])


def _banded_lsh_candidate_volume(spark, sf_dir: str) -> int:
    """Distinct banded-LSH candidate pairs over the embeddings table —
    the rows the Arrow pair scorer actually scores in
    embeddings_knn_graph / embeddings_label_propagation."""
    from pyspark.sql import functions as F

    from stream_spark.operators.similarity import banded_index
    from stream_spark.sources import load_table

    idx = banded_index(load_table(spark, sf_dir, "embeddings"))
    a, b = idx.alias("a"), idx.alias("b")
    return (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .count()
    )


#: candidate-volume axis per query (VERDICT r6 item 4): the intrinsic
#: enumeration count a linearity claim should normalize against when
#: output rows understate the work (clique-heavy planted dup corpora).
from tools.probe_common import band_candidate_volume as _band_candidate_volume  # noqa: E402


VOLUME_AXES = {
    "dedup_clusters": ("sum_freq2_shingles", _jaccard_candidate_volume),
    "dedup_keep_best_quality": ("sum_freq2_shingles", _jaccard_candidate_volume),
    "dedup_jaccard_banded": ("band_candidates", _band_candidate_volume),
    "dedup_clusters_banded": ("band_candidates", _band_candidate_volume),
    "dedup_keep_best_quality_banded": ("band_candidates", _band_candidate_volume),
    "documents_soft_dedup_weights": ("band_candidates", _band_candidate_volume),
    "training_data_prep": ("band_candidates", _band_candidate_volume),
    "pipeline_multimodal_curation": ("band_candidates", _band_candidate_volume),
    "embeddings_knn_graph": ("banded_lsh_candidates", _banded_lsh_candidate_volume),
    "embeddings_label_propagation": ("banded_lsh_candidates", _banded_lsh_candidate_volume),
}


def _bestof2(spark, fn, sf_dir):
    """Warm once, then best of 2 FULL fn()+count runs. Unlike bench.py
    (which times a pre-built plan), the probe rebuilds per run: several
    probe queries do real work at construction time — streaming queries
    run their readStream job inside fn(), iterative operators
    (components, k-means, the two-pass rownum primitives) collect or
    localCheckpoint while building — and a count() of the finished
    result would time only the tail."""
    fn(spark, sf_dir).count()
    best, n = None, 0
    for _ in range(2):
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best, n


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf1_dir = args[0] if args else "/root/repo/.scratch/sf1"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--queries="):
            only = set(a.split("=", 1)[1].split(","))
    if not os.path.isdir(sf1_dir):
        raise SystemExit(f"{sf1_dir} missing — run tools/make_sf1.py first")
    from stream_spark.queries import QUERIES
    from stream_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # resumable: --queries=a,b re-times a subset and merges into the
    # existing report (long full runs can be split across invocations)
    report = {}
    if only is not None and os.path.exists("SCALE_PROBE.json"):
        with open("SCALE_PROBE.json") as f:
            report = json.load(f)
    worst = 0
    for name in PROBE:
        if only is not None and name not in only:
            continue
        if name not in QUERIES:
            continue
        t01, n01 = _bestof2(spark, QUERIES[name], "/root/testdata/sf0.1")
        t1, n1 = _bestof2(spark, QUERIES[name], sf1_dir)
        ratio = t1 / t01 if t01 > 0 else float("inf")
        ok = ratio <= 20.0  # linear 10x + 2x headroom
        report[name] = {
            "sf0.1_sec": round(t01, 3),
            "sf1_sec": round(t1, 3),
            "ratio": round(ratio, 2),
            "sf0.1_rows": n01,
            "sf1_rows": n1,
            "linear_ok": ok,
        }
        if name in VOLUME_AXES:
            axis, vfn = VOLUME_AXES[name]
            v01, v1 = vfn(spark, "/root/testdata/sf0.1"), vfn(spark, sf1_dir)
            report[name].update(
                {
                    "volume_axis": axis,
                    "sf0.1_volume": v01,
                    "sf1_volume": v1,
                    "volume_ratio": round(v1 / v01, 2) if v01 else None,
                }
            )
        flag = "" if ok else "  <-- SUPER-LINEAR"
        print(f"{name}: {t01:.2f}s -> {t1:.2f}s ({ratio:.1f}x){flag}", file=sys.stderr)
        if not ok:
            worst = 1
        with open("SCALE_PROBE.json", "w") as f:  # incremental: survive kills
            json.dump(report, f, indent=1)
    with open("SCALE_PROBE.json", "w") as f:
        json.dump(report, f, indent=1)
    all_linear = all(v["linear_ok"] for v in report.values())
    print(json.dumps({"probe": "sf1", "queries": len(report), "all_linear": all_linear}))
    raise SystemExit(0 if all_linear else 1)


if __name__ == "__main__":
    main()
