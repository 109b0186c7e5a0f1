"""Empty-input robustness: every operator family must return an empty
(correctly-schemed) result on empty input, not crash — at 100 TB a
filter can legitimately empty a partition-pruned branch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame([], "ts timestamp, event_id long, event_type string, value double")


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_windows_on_empty(empty_events):
    from stream_spark.operators.windows import (
        sliding_count_window,
        sliding_time_window,
        tumbling_count_window,
        tumbling_time_window,
    )

    assert tumbling_count_window(empty_events, "value", "sum", 5).count() == 0
    assert sliding_count_window(empty_events, "value", "avg", 4, 2).count() == 0
    assert tumbling_time_window(empty_events, "ts", "value", "min", 1000).count() == 0
    assert sliding_time_window(empty_events, "ts", "value", "max", 1000, 500).count() == 0


def test_dedup_on_empty(empty_docs):
    from stream_spark.operators.dedup import exact_dedup, minhash_lsh_candidates, ngram_jaccard_pairs

    assert exact_dedup(empty_docs).count() == 0
    assert ngram_jaccard_pairs(empty_docs, threshold=0.5).count() == 0
    assert minhash_lsh_candidates(empty_docs).count() == 0


def test_text_and_packing_on_empty(empty_docs):
    from stream_spark.operators.packing import pack_sequences
    from stream_spark.operators.text import quality_features, repetition_features

    assert quality_features(empty_docs).count() == 0
    assert repetition_features(empty_docs).count() == 0
    toks = empty_docs.select("doc_id", F.lit(1).alias("n_tokens"))
    assert pack_sequences(toks).count() == 0


def test_components_and_rangejoin_on_empty(spark):
    from stream_spark.operators.components import connected_components_star
    from stream_spark.operators.rangejoin import range_join

    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components_star(edges).count() == 0
    l = spark.createDataFrame([], "k long, lts long")
    r = spark.createDataFrame([], "k long, rts long")
    assert range_join(l, r, ["k"], "lts", "rts", 100).count() == 0


def test_null_values_in_windows(spark):
    """Null measurements: SUM/AVG skip nulls (SQL semantics) but the
    row still occupies its count-window slot — a sample arrived, its
    measurement was missing."""
    from stream_spark.operators.windows import tumbling_count_window

    rows = [(i, i, None if i % 3 == 0 else float(i)) for i in range(12)]
    df = spark.createDataFrame(rows, "ts long, event_id long, value double")
    out = {r["window_id"]: r["result"] for r in
           tumbling_count_window(df, "value", "sum", 4, order_cols=("ts", "event_id")).collect()}
    # windows of 4 rows each; nulls (0,3,6,9) excluded from sums
    assert out == {0: 1.0 + 2.0, 1: 4.0 + 5.0 + 7.0, 2: 8.0 + 10.0 + 11.0}


def test_merge_upsert_empty_sides(spark):
    from stream_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, 1.0)], "k long, v double")
    empty = spark.createDataFrame([], "k long, v double")
    # empty updates → target unchanged
    assert {r.k for r in merge_upsert(target, empty, ["k"]).collect()} == {1}
    # empty target → updates inserted
    assert {r.k for r in merge_upsert(empty, target, ["k"]).collect()} == {1}
    # both empty → empty with the right columns
    out = merge_upsert(empty, empty, ["k"])
    assert out.count() == 0 and out.columns == ["k", "v"]


def test_boilerplate_and_gopher_on_empty(spark, empty_docs):
    from stream_spark.operators.text import boilerplate_share, gopher_rules

    empty_sourced = empty_docs.withColumn("source", F.lit(None).cast("string"))
    assert boilerplate_share(empty_sourced).count() == 0
    assert gopher_rules(empty_docs).count() == 0


def test_pagerank_on_empty_edges(spark):
    from stream_spark.operators.components import pagerank_integer

    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank_integer(edges, iters=2).count() == 0


def test_incremental_dedup_empty_sides(spark, empty_docs):
    from stream_spark.operators.dedup import incremental_dedup_flags

    docs = spark.createDataFrame([(1, "alpha beta gamma delta")], "doc_id long, text string")
    # empty batch → no rows flagged
    assert incremental_dedup_flags(empty_docs, docs).count() == 0
    # empty corpus → batch rows all flagged NOT duplicate
    out = incremental_dedup_flags(docs, empty_docs).collect()
    assert [(r.doc_id, r.is_dup) for r in out] == [(1, 0)]


def test_sampled_and_tdigest_quantiles_on_empty(spark, empty_events):
    from stream_spark.operators.sketches import sampled_quantiles, tdigest_quantiles

    s = sampled_quantiles(empty_events, "value", "event_id", 0.5, (0.5,))
    assert s.count() == 1  # global agg emits one all-null row
    assert s.collect()[0]["p50"] is None
    assert (
        sampled_quantiles(
            empty_events, "value", "event_id", 0.5, (0.5,), group_by=["event_type"]
        ).count()
        == 0
    )
    # keyed t-digest on empty input → no groups, no crash
    assert tdigest_quantiles(empty_events, "value", (0.5,), group_by=["event_type"]).count() == 0


def test_zorder_and_manifest_on_empty(spark, tmp_path):
    from stream_spark.operators.layout import build_stats_manifest, manifest_prune, zorder_write

    empty = spark.createDataFrame([], "a long, b long")
    path = str(tmp_path / "zempty")
    zorder_write(empty, path, ["a", "b"], bits=8, n_files=2)
    back = spark.read.parquet(path)
    assert back.count() == 0 and set(back.columns) == {"a", "b"}
    man = build_stats_manifest(spark, path, ["a"])
    # stats-less files are kept by the conservative prune
    assert len(manifest_prune(man, "a", 0, 10)) == man.count()


def test_rerank_stub_on_empty(spark):
    from stream_spark.operators.ann_pandas import rerank_crossencoder_stub

    cand = spark.createDataFrame([], "query_id long, neighbor_id long, cosine double")
    assert rerank_crossencoder_stub(cand, 5).count() == 0


def test_round3_operators_on_empty(spark):
    """Round-3 additions: banded LSH index/pairs, fuzzy pairs, triangle
    counts, table diff, streaming minhash signature map — all must
    return empty (correct-schema) results on empty input, no crash."""
    from stream_spark.operators.components import triangle_counts
    from stream_spark.operators.fuzzy import fuzzy_name_pairs
    from stream_spark.operators.merge import table_diff
    from stream_spark.operators.similarity import banded_index, cosine_pairs_lsh_banded

    empty_vecs = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert banded_index(empty_vecs).count() == 0
    assert cosine_pairs_lsh_banded(empty_vecs, 0.5).count() == 0

    empty_named = spark.createDataFrame([], "id long, name string")
    assert fuzzy_name_pairs(empty_named, "name", 2).count() == 0

    empty_edges = spark.createDataFrame([], "u long, v long")
    assert triangle_counts(empty_edges).count() == 0

    empty_tbl = spark.createDataFrame([], "k long, v double")
    d = table_diff(empty_tbl, empty_tbl, ["k"])
    assert d.count() == 0 and set(d.columns) == {"k", "change_type"}
    # one-sided empties: everything added / removed
    one = spark.createDataFrame([(1, 1.0)], "k long, v double")
    assert [r["change_type"] for r in table_diff(empty_tbl, one, ["k"]).collect()] == ["added"]
    assert [r["change_type"] for r in table_diff(one, empty_tbl, ["k"]).collect()] == ["removed"]


def test_round4_operators_on_empty(spark):
    """Round-4 additions: SemDeDup, in-plan kmeans, BPE induction,
    hard negatives, incremental embedding flags, aHash — all return
    empty (correct-schema) results on empty input, no crash."""
    from stream_spark.operators.bpe import bpe_merge_rounds
    from stream_spark.operators.clustering import kmeans_assign_inplan, semantic_dedup_clusters
    from stream_spark.operators.multimodal import ahash_image
    from stream_spark.operators.similarity import hard_negatives, incremental_embedding_flags

    empty_vecs = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert semantic_dedup_clusters(empty_vecs).count() == 0
    assert kmeans_assign_inplan(empty_vecs, k=4).count() == 0

    empty_toked = spark.createDataFrame([], "doc_id long, toks array<string>")
    out = bpe_merge_rounds(empty_toked, rounds=2)
    assert out.count() == 0
    assert set(out.columns) == {"round", "tok_a", "tok_b", "pair_count"}

    labeled = "vec_id long, embedding array<float>, label int"
    empty_lab = spark.createDataFrame([], labeled)
    one_lab = spark.createDataFrame([(1, [1.0, 0.0], 0)], labeled)
    assert hard_negatives(empty_lab, one_lab, 3).count() == 0
    assert hard_negatives(one_lab, empty_lab, 3).count() == 0

    assert incremental_embedding_flags(empty_vecs, empty_vecs).count() == 0
    one_vec = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<float>")
    # empty corpus -> nothing to collide with: batch rows all is_dup=0
    flags = incremental_embedding_flags(one_vec, empty_vecs).collect()
    assert [(r["vec_id"], r["is_dup"]) for r in flags] == [(1, 0)]

    empty_media = spark.createDataFrame([], "doc_id long, payload binary")
    assert ahash_image(empty_media).count() == 0


def test_bpe_apply_passes_through_on_empty_rule(spark):
    """apply_merge with NO learnable rule (every document < 2 tokens)
    must pass the corpus through unchanged — regression for the inner
    join that dropped every row when the 1-row rule frame was empty."""
    from stream_spark.operators.bpe import bpe_apply_rounds

    docs = spark.createDataFrame(
        [(1, ["a"]), (2, ["b"]), (3, [])], "doc_id long, toks array<string>"
    )
    got = {r["doc_id"]: r["toks"] for r in bpe_apply_rounds(docs, rounds=2).collect()}
    assert got == {1: ["a"], 2: ["b"], 3: []}


def test_semantic_dedup_k_cap(spark):
    """semantic_dedup_clusters caps k at max_k so Lloyd assignment work
    is O(n·max_k), not n²/members: with max_k=2 on 12 vectors the run
    completes and still groups the identical-vector pairs."""
    from stream_spark.operators.clustering import semantic_dedup_clusters

    rows = [(i, [float(i % 6), 1.0, float((i * 7) % 5)]) for i in range(12)]
    rows += [(100, [9.0, 9.0, 9.0]), (101, [9.0, 9.0, 9.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup_clusters(
        emb, threshold=0.9999, members_per_cluster=1, max_k=2
    )
    sizes = {r["keeper_id"]: r["cluster_size"] for r in out.collect()}
    # identical 9s collapse to one keeper (the min id) of size 2
    assert sizes[100] == 2 and 101 not in sizes
    assert sum(sizes.values()) == 14


def test_pq_family_on_empty_corpus(spark):
    """topk_pq / topk_ivfpq with an EMPTY corpus must return empty
    typed frames (r6: both crashed — VOID cell-score array / IndexError
    on codebook literals — the same class topk_ivf was fixed for in r5)."""
    from stream_spark.operators.pq import topk_ivfpq, topk_pq

    q = spark.createDataFrame([(0, [1.0] * 64)], "vec_id long, embedding array<double>")
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert topk_pq(q, empty, 5).count() == 0
    assert topk_ivfpq(q, empty, 5).count() == 0
