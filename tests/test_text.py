from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    langid,
    quality_features,
    token_count,
    word_ngrams,
    tokens,
)


@pytest.fixture()
def doc(spark):
    return spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "der hund ist ein gutes tier und der beste")],
        "doc_id long, text string",
    )


def test_token_counts(doc):
    out = {r["doc_id"]: (r["n"], r["b"]) for r in doc.select(
        "doc_id", token_count(F.col("text")).alias("n"), bpe_ish_token_count(F.col("text")).alias("b")
    ).collect()}
    assert out[1] == (6, 6)


def test_word_ngrams_short_text(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    out = df.select(word_ngrams(tokens(F.col("text")), 3).alias("g")).collect()[0]["g"]
    assert out == []  # fewer tokens than n → empty, not an error


def test_quality_features(doc):
    row = [r for r in quality_features(doc).collect() if r["doc_id"] == 1][0]
    assert row["n_tokens"] == 6
    assert row["n_stopwords"] == 3  # the, on, the
    assert row["stopword_ratio"] == 0.5
    assert 0 <= row["quality_score"] <= 1.0


def test_langid_picks_stopword_language(doc):
    out = {r["doc_id"]: r["predicted_lang"] for r in langid(doc).collect()}
    assert out[1] == "en"
    assert out[2] == "de"


def test_fingerprint_stable_under_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "  ALPHA beta   gamma delta epsilon zeta ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["fp_md5"], r["fp_min_shingle"]) for r in fingerprint(df).collect()}
    assert out[1] == out[2]  # normalization makes fingerprints identical
