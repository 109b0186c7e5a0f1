"""Whitespace-semantics parity: every Python replay of the Catalyst
tokenizers must match Spark bit-for-bit on hostile whitespace (leading
tabs, NBSP, trailing runs). Python str.strip()/\\s are Unicode-aware
while F.trim strips only ' ' and Java \\s is ASCII-only — the r5 advice
found the replays diverging there; these tests pin the fix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_spark.operators.text import tokens, word_ngrams

HOSTILE_WS_TEXTS = {
    # leading tab: F.trim strips only ' ', Java \s splits it away with a
    # LEADING EMPTY TOKEN — the Python replay must reproduce that token
    1: "\tthe cat sat on the mat today",
    # NBSP ( ) is whitespace to Python \s but NOT to Java \s: it
    # must stay INSIDE a token on both paths
    2: "the cat\u00a0sat on the mat again now",
    3: "  the cat sat on the mat twice  ",
    4: "the cat\tsat on the mat thrice",
    5: "the cat sat on the mat plainly here",
    6: "\u00a0leading nbsp stays in the first token here",
    7: "trailing tab keeps an empty token\t",
}


def test_bm25_empty_terms_raises_value_error(spark):
    from stream_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame([(1, "spark streams data")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(docs, (), k=5)


def test_tokens_py_replays_catalyst_tokens_on_hostile_whitespace(spark):
    """tokens_py must be BIT-identical to tokens() (F.trim + Java-\\s
    split) including leading/trailing empty tokens and NBSP-glued
    tokens."""
    from stream_spark.operators.text import tokens_py

    df = spark.createDataFrame(list(HOSTILE_WS_TEXTS.items()), "doc_id long, text string")
    catalyst = {
        r["doc_id"]: r["ws"]
        for r in df.select("doc_id", tokens(F.col("text")).alias("ws")).collect()
    }
    for d, t in HOSTILE_WS_TEXTS.items():
        assert tokens_py(t) == catalyst[d], (d, tokens_py(t), catalyst[d])


def test_normalized_tokens_py_replays_catalyst(spark):
    from stream_spark.operators.text import normalize_text, normalized_tokens_py

    df = spark.createDataFrame(list(HOSTILE_WS_TEXTS.items()), "doc_id long, text string")
    catalyst = {
        r["doc_id"]: r["ws"]
        for r in df.select(
            "doc_id", tokens(normalize_text(F.col("text"))).alias("ws")
        ).collect()
    }
    for d, t in HOSTILE_WS_TEXTS.items():
        assert normalized_tokens_py(t) == catalyst[d], (d, normalized_tokens_py(t), catalyst[d])


def test_ngram_hits_rows_parity_on_hostile_whitespace(spark):
    """Per-doc hit counts from the Arrow replay == the Catalyst
    word_ngrams path on tab/NBSP-polluted documents."""
    from stream_spark.operators.text import ngram_hits_rows

    df = spark.createDataFrame(
        [(str(k), v, "web") for k, v in HOSTILE_WS_TEXTS.items()],
        "doc_id string, text string, source string",
    )
    n = 3
    bench = sorted(
        {
            r["g"]
            for r in df.select(
                F.explode(word_ngrams(tokens(F.col("text")), n)).alias("g")
            ).collect()
        }
    )
    catalyst = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id",
            F.size(
                F.array_intersect(
                    word_ngrams(tokens(F.col("text")), n),
                    F.array(*[F.lit(g) for g in bench]),
                )
            )
            .cast("long")
            .alias("h"),
        ).collect()
    }
    arrow = {
        r["doc_id"]: r["n_hits"]
        for r in ngram_hits_rows(df, bench, n=n, keep_cols=("doc_id",)).collect()
    }
    assert arrow == catalyst
    # the hostile rows must actually score nonzero hits (the divergence
    # the old replay produced was silent zero/shifted counts)
    assert all(v > 0 for v in catalyst.values())


def test_dsir_arrow_scorer_parity_on_hostile_whitespace(spark):
    from stream_spark.operators.dsir import dsir_score, dsir_score_rows, dsir_weight_map

    df = spark.createDataFrame(
        [(d, t, "en" if d % 2 else "de") for d, t in HOSTILE_WS_TEXTS.items()],
        "doc_id long, text string, lang string",
    )
    weights, default = dsir_weight_map(df, F.col("lang") == "en")
    expr = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", dsir_score(F.col("text"), weights, default).alias("s"))
        .filter(F.col("s").isNotNull())
        .collect()
    }
    arrow = {
        r["doc_id"]: r["score"]
        for r in dsir_score_rows(df, weights, default, keep_cols=("doc_id",)).collect()
    }
    assert arrow == expr


def test_arrow_minhash_bands_match_both_catalyst_spellings(spark):
    """minhash_band_rows_arrow == minhash_band_buckets ==
    minhash_band_rows_stateless row-for-row on hostile whitespace,
    NULL text, <n-token docs, exact duplicates, and unicode."""
    from stream_spark.operators.dedup import (
        minhash_band_buckets,
        minhash_band_rows_arrow,
        minhash_band_rows_stateless,
    )

    rows = list(HOSTILE_WS_TEXTS.items()) + [
        (10, None),
        (11, ""),
        (12, "two tokens"),
        (13, "exactly three tokens"),
        (14, "the cat sat on the mat today"),  # dup of text 1 sans tab
        (15, "naïve café über straße 日本語 mixed unicode tokens here"),
        (16, "a a a a a a a a"),  # one distinct shingle
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def key(frame):
        return {(r["doc"], r["band"], r["bucket"]) for r in frame.collect()}

    arrow = key(minhash_band_rows_arrow(df))
    batch = key(minhash_band_buckets(df))
    stateless = key(minhash_band_rows_stateless(df))
    assert arrow == batch
    assert arrow == stateless
