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


def test_gopher_rules_flags(spark):
    from stream_spark.operators.text import gopher_rules

    docs = spark.createDataFrame(
        [
            (1, "the and " + "word " * 60),      # passes all rules
            (2, "tiny doc"),                      # fails n_words
            (3, ("the " + "a " * 70).strip()),    # mean len < 3 → fails
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert got[1].gopher_keep == 1
    assert got[2].rule_n_words == 0 and got[2].gopher_keep == 0
    assert got[3].rule_mean_len == 0 and got[3].gopher_keep == 0


def test_boilerplate_share_detects_shared_footer(spark):
    from stream_spark.operators.text import boilerplate_share

    footer = "visit our site today"
    docs = spark.createDataFrame(
        [
            (1, "s1", f"alpha beta gamma delta {footer}"),
            (2, "s1", f"epsilon zeta eta theta {footer}"),
            (3, "s1", f"iota kappa lambda mu {footer}"),
            # s2 has two docs with disjoint text: nothing reaches min_df
            # in BOTH docs except the footer — but df 2/2 needs min_df=2,
            # met, so the footer IS hot in s2 too; the unique grams are not
            (4, "s2", "unique words only here now"),
            (5, "s2", "other totally different content here"),
        ],
        "doc_id long, source string, text string",
    )
    got = {r.doc_id: r for r in boilerplate_share(docs).collect()}
    assert got[1].n_hot == 2  # the two footer 3-grams are hot in s1
    assert got[1].boilerplate_share > 0
    # s2's docs share nothing: no gram meets min_df there
    assert got[4].n_hot == 0 and got[4].boilerplate_share == 0.0
    assert got[5].n_hot == 0


def test_boilerplate_share_dedupes_intra_doc_repeats(spark):
    """df counts are DOCUMENT frequency: a single doc repeating a 3-gram
    twice must not clear min_df=2 on its own (ADVICE r2 finding), and
    n_grams counts distinct grams per the docstring."""
    from stream_spark.operators.text import boilerplate_share

    rep = "alpha beta gamma"
    docs = spark.createDataFrame(
        [
            # doc 1 repeats the same 3-gram twice within itself — the
            # only doc in source s1 containing it
            (1, "s1", f"{rep} filler {rep}"),
            (2, "s1", "totally different words here now"),
        ],
        "doc_id long, source string, text string",
    )
    got = {r.doc_id: r for r in boilerplate_share(docs).collect()}
    # no gram appears in >= 2 DOCS, so nothing is hot anywhere
    assert got[1].n_hot == 0 and got[1].boilerplate_share == 0.0
    assert got[2].n_hot == 0
    # n_grams = distinct grams: "alpha beta gamma filler alpha beta gamma"
    # has 5 positional 3-grams but only 4 distinct (rep occurs twice)
    assert got[1].n_grams == 4


def test_corpus_token_drift_zero_for_identical_sources(spark, tmp_path):
    """A source whose token multiset equals the rest of the corpus has
    EXACTLY zero drift (equal exact ppm rates); a disjoint-vocabulary
    source maxes out near 2e6 per token row. Exercises the zero-filled
    grid (absent tokens still drift) and the integer DIV arithmetic."""
    import os

    from stream_spark.queries import QUERIES

    rows = [
        (1, "aa bb cc dd", "en", "s1", 11),
        (2, "aa bb cc dd", "en", "s2", 11),  # s2 identical to s1
        (3, "xx yy zz ww", "en", "s3", 11),  # s3 disjoint vocabulary
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "drift_sf")
    os.makedirs(d, exist_ok=True)
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = {r["source"]: r for r in QUERIES["corpus_token_drift"](spark, d).collect()}
    assert set(out) == {"s1", "s2", "s3"}
    # s1's rest = {s2 (identical), s3}; s1 vs rest differs only via s3's
    # half-share of the rest -> strictly positive but below the max
    assert out["s1"]["drift_ppm_sum"] == out["s2"]["drift_ppm_sum"] > 0
    # s3 shares no tokens with its rest: every vocab token drifts fully
    # (8 tokens x ~250000 ppm each side)
    assert out["s3"]["drift_ppm_sum"] > out["s1"]["drift_ppm_sum"]
    assert out["s3"]["src_vocab_tokens"] == 4


def test_bpe_merge_rounds_greedy_and_iterative(spark):
    """BPE induction on a constructed corpus: round 1 picks the most
    frequent adjacent pair with the deterministic tie-break; the greedy
    left-to-right application means "a a a" yields ONE merge (the fresh
    unit can't be the left side again); round 2 counts pairs over the
    MERGED tokens, so a phrase unit can extend."""
    from pyspark.sql import functions as F

    from stream_spark.operators.bpe import apply_merge, bpe_merge_rounds, top_merge, adjacent_pair_counts

    rows = [
        (1, ["a", "a", "a"]),
        (2, ["a", "a", "b"]),
        (3, ["a", "a", "b"]),
        (4, ["c"]),
        (5, []),
    ]
    toked = spark.createDataFrame(rows, "doc_id long, toks array<string>")

    out = {r["round"]: (r["tok_a"], r["tok_b"], r["pair_count"]) for r in bpe_merge_rounds(toked, rounds=2).collect()}
    # round 1: (a,a) appears 4 times (2 in doc1, 1 each in docs 2-3) vs (a,b) 2
    assert out[1] == ("a", "a", 4)
    # after merging: doc1 -> ["a a", "a"], docs 2-3 -> ["a a", "b"]
    # round 2 pairs: ("a a","a") x1, ("a a","b") x2 -> winner ("a a","b")
    assert out[2] == ("a a", "b", 2)

    rule = top_merge(adjacent_pair_counts(toked))
    merged = {r["doc_id"]: r["toks"] for r in apply_merge(toked, rule).collect()}
    assert merged[1] == ["a a", "a"]
    assert merged[2] == ["a a", "b"]
    assert merged[4] == ["c"] and merged[5] == []


def test_langid_pred_matches_column_variant(spark, sf_dir):
    """The single-expression langid_pred must agree row-for-row with
    langid()'s predicted_lang (same stoplists, same fixed-order
    strict-> tie-break)."""
    from pyspark.sql import functions as F

    from stream_spark.operators.text import langid, langid_pred
    from stream_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["predicted_lang"] for r in langid(docs).select("doc_id", "predicted_lang").collect()}
    b = {
        r["doc_id"]: r["p"]
        for r in docs.select("doc_id", langid_pred(F.col("text")).alias("p")).collect()
    }
    assert a == b
