"""Regenerate PLANS.md: formatted physical plans for the flagship and
the scale-critical queries, annotated with what to look for. Run after
plan-shape changes: python tools/dump_plans.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from stream_spark.queries import QUERIES

SHOW = [
    ("tpch_q5_local_supplier", "flagship: 6-way join — every dim broadcast, one fact shuffle, pushed date filter, pruned columns"),
    ("tpch_q1_pricing_summary", "scan+agg: pushed shipdate filter, 7-column ReadSchema, partial aggregation before the exchange"),
    ("agg_tumbling_count_sum", "count window: two-pass partition-offset row numbering — NO single-partition window"),
    ("dedup_minhash_lsh", "minhash LSH: one (band,bucket) shuffle; no cartesian product"),
    ("text_decontaminate", "decontamination: bench gram set broadcast, corpus streams through one BroadcastHashJoin"),
    ("events_range_join_click_purchase", "range join: bucketized EQUI-join (SortMerge/Hash), no BroadcastNestedLoopJoin"),
    ("embeddings_kmeans", "k-means assignment: map-only scan against literal centroids — zero joins below the final projection"),
    ("training_pack_sequences", "sequence packing: range exchange + local window + bounded-metadata offset join"),
    ("dedup_embedding_cosine", "banded hyperplane LSH: matmul index (MapInPandas, map-only) -> (t,bucket) equi-join -> DISTINCT pairs -> id joins + decimal rescore; no cartesian product"),
    ("dedup_ngram_jaccard_capped", "df-cut inverted-index join: HAVING-capped shingle set before the self-join"),
    ("dedup_semantic_clusters", "SemDeDup: Arrow-matmul Lloyd assignment (MapInPandas, map-only — O(n*k*dim) BLAS flops, no n*k row explosion; decimal escape on <=1e-6 argmax ties), cos surfaced by the Catalyst decimal fold against the broadcast k-row centroid frame; within-cluster pairs equi-join on cluster; star components behind localCheckpoints"),
    ("ann_topk_ivfpq", "IVF-PQ: map-only cell assignment + PQ encode (two-phase argmin expressions, no join below them); probe = broadcast equi-join on cell; bounded LUT broadcast joined on (query,sub,code)"),
    ("documents_bm25_search", "BM25 retrieval: query-term filter BEFORE the tf shuffle (token stream pruned to the query vocabulary), df + 1-row corpus stats broadcast, integer-sum scores, two-pass partition-offset top-k — no global-ordered window"),
    ("dedup_winnowed_pairs", "winnowing: doc-partitioned window-min selection (NO array-derived column through the Generate — the quadratic-collapse trap), ~0.4-density fingerprint index, df-cut equi-join pairs"),
    ("documents_line_dedup", "corpus line dedup: one map-side chunk explode, UNHINTED line-frequency equi-join (shuffle join at scale, AQE skew-splittable), keyed per-doc rebuild"),
    ("documents_dsir_selection", "DSIR: B<=1024-row weight table broadcast, one fused T/R global aggregate behind the rownum checkpoint, two-pass quartile rank"),
    ("embeddings_semantic_decontaminate", "semantic decontamination: corpus bands equi-join the broadcast DISTINCT eval index (no self-pairing), WHEN-guarded decimal rescore on candidates only"),
    ("documents_substring_removal", "ExactSubstr removal: gram doc-frequency (distinct+aggregate, no self-join), bounded 5-row coverage fan-out, keyed position-mark join"),
    ("documents_langid_classifier", "NB classifier: checkpointed <=|classes|-row denominator scan (the vocab scalar never re-expands), token-keyed rate join, doc-keyed argmax window — ZERO single-partition exchanges in the inference plan"),
    ("documents_source_keywords", "keyword lift: salted two-stage top-k — 64-way (source,salt) windows then a <=640-row final rank; no window sees the full vocabulary"),
    ("embeddings_knn_graph", "kNN graph: banded-LSH candidate equi-join (no all-pairs), exact-decimal rescore, per-node keyed rank window"),
    ("documents_shard_assignment", "shard balance: range exchange + bounded offsets collect (two-pass rownum), map-side snake CASE — no single-partition sort"),
    ("dedup_jaccard_banded", "banded exact-Jaccard (the crawl-scale pair default, r8): minhash band equi-join proposes candidates, keyed shingle joins verify over FULL sets — candidate volume band-collision-bounded, never sum-freq-squared"),
    ("training_data_prep", "corpus-prep capstone (r9: banded by default): band-candidate near-dup drop -> pushed length gate -> hash-stable sample -> per-language accounting; the anti-join side is O(dupes), unhinted"),
    ("embeddings_cluster_balanced_sample", "cluster-balanced selection: Arrow-matmul assignment (map-only), salted two-stage per-cluster top-k (WindowGroupLimit partial/final) — no window sees a full cluster"),
]


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out = [
        "# PLANS — physical plans of the scale-critical queries",
        "",
        f"Generated by `python tools/dump_plans.py` at `{sf_dir}`. The",
        "shapes (joins, exchanges, pushdowns) are what matters; AQE will",
        "re-plan sizes at runtime. `tools/audit_plans.py` enforces the",
        "anti-pattern checks on every registered query.",
        "",
    ]
    for name, note in SHOW:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", f"_{note}_", "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
