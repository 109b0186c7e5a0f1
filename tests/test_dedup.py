from __future__ import annotations

import pytest

from stream_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "THE QUICK  brown fox jumps over the lazy dog near the river bank today"),  # exact dup after normalize
    (3, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup (1 word)
    (4, "completely different content about spark sql engines and parquet scans here"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_collapses_normalized_dups(docs):
    out = {r["keeper_doc_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out[1] == 2  # docs 1+2 identical post-normalization
    assert out[3] == 1 and out[4] == 1


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical shingle sets
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_candidates_superset_of_high_jaccard(docs):
    cands = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_candidates(docs).collect()}
    assert (1, 2) in cands  # identical sets always collide on every band
    assert (1, 4) not in cands and (2, 4) not in cands


def test_simhash_near_dups_close(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs.get((1, 2)) == 0  # same token set → same signature
    assert (1, 3) in pairs  # one-word swap stays within 10 bits
