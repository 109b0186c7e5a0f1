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


def test_bm25_tf_monotone_and_length_penalty(spark):
    """BM25 core semantics on a constructed corpus: (1) with equal doc
    length, more occurrences of a query term rank higher; (2) with
    equal tf, the shorter document ranks higher (b=0.75 length
    normalization); (3) matching more query terms beats matching one."""
    from stream_spark.operators.retrieval import bm25_topk

    rows = [
        (1, "spark spark spark pad pad pad"),  # tf=3, dl=6
        (2, "spark spark pad pad pad pad"),    # tf=2, dl=6
        (3, "spark pad pad"),                  # tf=1, dl=3 (short)
        (4, "spark pad pad pad pad pad"),      # tf=1, dl=6 (long)
        (5, "spark stream pad pad pad pad"),   # two terms, dl=6
        (6, "pad pad pad pad pad pad"),        # no match
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bm25_topk(docs, ("spark", "stream"), k=10).collect()}
    assert 6 not in out  # unmatched docs don't surface
    assert out[1]["score_scaled"] > out[2]["score_scaled"] > out[4]["score_scaled"]
    assert out[3]["score_scaled"] > out[4]["score_scaled"]  # shorter wins at equal tf
    assert out[5]["matched_terms"] == 2
    assert out[5]["score_scaled"] > out[4]["score_scaled"]  # 2 hits beat 1
    ranks = sorted(r["rank"] for r in out.values())
    assert ranks == list(range(1, len(out) + 1))


def test_bm25_matches_direct_python_spec(spark):
    """Spec parity: the Spark plan's scaled integer scores equal a
    direct Python evaluation of the documented exact formula
    (odds-ratio IDF x 10T-scaled tf saturation, floored at 1e12) —
    the same arithmetic the DuckDB oracle replays."""
    import math

    from stream_spark.operators.retrieval import bm25_topk

    rows = [
        (i, txt)
        for i, txt in enumerate(
            [
                "spark window spark table",
                "stream stream window pad pad pad pad pad",
                "spark pad",
                "window window window spark stream",
                "pad pad pad spark spark stream window pad",
                "stream pad pad pad",
                "table pad spark window stream table",
            ]
        )
    ]
    terms = ("spark", "stream", "window")
    toks = {i: t.split() for i, t in rows}
    n = len(rows)
    big_t = sum(len(v) for v in toks.values())
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}

    def spec_scaled(i):
        s = 0
        for t in terms:
            tf = toks[i].count(t)
            if not tf:
                continue
            idf = float(2 * n - 2 * df[t] + 1) / float(2 * df[t] + 1)
            tfs = float(22 * big_t * tf) / float(
                10 * big_t * tf + 3 * big_t + 9 * len(toks[i]) * n
            )
            s += int(math.floor((idf * tfs) * 1e12))
        return s

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["score_scaled"], r["rank"])
        for r in bm25_topk(docs, terms, k=10).collect()
    }
    matched = [i for i, _ in rows if any(t in toks[i] for t in terms)]
    want_rank = sorted(matched, key=lambda i: (-spec_scaled(i), i))
    for i in matched:
        assert got[i][0] == spec_scaled(i)
    assert [i for i, _ in sorted(got.items(), key=lambda kv: kv[1][1])] == want_rank


def test_lm_quality_buckets_semantics(spark, tmp_path):
    """Bigram-LM bucketing on a hand-computable corpus: a doc made of
    the corpus's dominant bigram scores highest (head), a doc of
    one-off transitions scores lowest (tail), and the ppm arithmetic
    is exact integer DIV."""
    import pyspark.sql.functions as F

    rows = [
        (1, "a b a b a b a b"),   # rides the dominant a->b / b->a loop
        (2, "a b c d e f g h"),   # one-off transitions
        (3, "a b a b x y z w"),   # mixed
    ]
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from stream_spark.queries import QUERIES

    out = {
        r["doc_id"]: r
        for r in QUERIES["documents_lm_quality_buckets"](spark, str(tmp_path)).collect()
    }
    assert out[1]["mean_ppm"] > out[3]["mean_ppm"] > out[2]["mean_ppm"]
    assert out[1]["lm_bucket"] == "head"
    assert out[2]["lm_bucket"] == "tail"
    assert out[3]["lm_bucket"] == "middle"
    # exact arithmetic spot-check (Laplace, V=12 distinct tokens):
    # doc 1 bigrams = 4x "a b", 3x "b a";
    # c("a b")=7 (4 in d1, 1 in d2, 2 in d3), c1("a")=7
    #   -> ppm("a b") = 8_000_000 DIV 19 = 421052;
    # c("b a")=4 (3 in d1, 1 in d3), c1("b")=7
    #   -> ppm("b a") = 5_000_000 DIV 19 = 263157
    want = (4 * (8_000_000 // 19) + 3 * (5_000_000 // 19)) // 7
    assert out[1]["mean_ppm"] == want


def test_line_chunks_segmentation(spark):
    """Fixed-width chunk 'lines': exact multiples, a short tail, and
    sub-width docs; order preserved."""
    from stream_spark.operators.text import line_chunks, tokens

    rows = [(1, "a b c d e f"), (2, "a b c d"), (3, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["ls"]
        for r in df.select(
            "doc_id", line_chunks(tokens(F.col("text")), 3).alias("ls")
        ).collect()
    }
    assert got[1] == ["a b c", "d e f"]
    assert got[2] == ["a b c", "d"]
    assert got[3] == ["a"]


def test_line_dedup_drops_corpus_hot_lines(spark, tmp_path):
    """A chunk line appearing >=3 times across the corpus is dropped
    from every doc; retained_md5 is the md5 of the order-preserved
    surviving text."""
    import hashlib

    hot = "x " * 9 + "y"            # one full 10-token chunk
    uniq = " ".join(f"u{i}" for i in range(10))
    rows = [
        (1, f"{hot} {uniq}"),        # chunks: hot (dropped), uniq (kept)
        (2, hot),                    # fully dropped -> md5('')
        (3, hot),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from stream_spark.queries import QUERIES

    out = {r["doc_id"]: r for r in QUERIES["documents_line_dedup"](spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    # the hot chunk occurs 3x corpus-wide -> dropped everywhere
    assert (out[1]["n_lines"], out[1]["n_dropped"]) == (2, 1)
    assert out[1]["retained_md5"] == hashlib.md5(uniq.encode()).hexdigest()
    for d in (2, 3):
        assert (out[d]["n_lines"], out[d]["n_dropped"]) == (1, 1)
        assert out[d]["retained_md5"] == hashlib.md5(b"").hexdigest()


def _dsir_reference(texts, target_langs, B=1024):
    """Direct single-machine replay of the DSIR integer arithmetic:
    hashed-bigram Laplace bucket ratios, clipped at 1e9, per-doc mean."""
    import hashlib
    import re

    def buckets(text):
        ws = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
        return [
            int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:15], 16) % B
            for a, b in zip(ws, ws[1:])
        ]

    rb: dict[int, int] = {}
    tb: dict[int, int] = {}
    per_doc = {}
    for doc_id, (text, lang) in texts.items():
        bs = buckets(text)
        per_doc[doc_id] = bs
        for b in bs:
            rb[b] = rb.get(b, 0) + 1
            if lang in target_langs:
                tb[b] = tb.get(b, 0) + 1
    R, T = sum(rb.values()), sum(tb.values())
    scores = {}
    for doc_id, bs in per_doc.items():
        if not bs:
            continue
        s = 0
        for b in bs:
            pt = (tb.get(b, 0) + 1) * 10_000_000_000 // (T + B)
            pr = (rb[b] + 1) * 10_000_000_000 // (R + B)
            s += min(pt * 1_000_000 // pr, 1_000_000_000)
        scores[doc_id] = s // len(bs)
    return scores


def test_dsir_scores_match_direct_arithmetic(spark, tmp_path):
    """The distributed DSIR score equals the sequential integer replay
    exactly, and target-resembling docs outrank off-target docs."""
    texts = {
        1: ("the cat sat on the mat and the dog sat too", "en"),
        2: ("the cat sat on the mat", "en"),
        3: ("der hund sitzt auf der matte heute wieder da", "de"),
        4: ("the cat sat on the mat near the dog", "de"),  # en-like text, de label
    }
    rows = [(d, t, l) for d, (t, l) in texts.items()]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from stream_spark.queries import QUERIES

    out = {
        r["doc_id"]: r
        for r in QUERIES["documents_dsir_selection"](spark, str(tmp_path)).collect()
    }
    want = _dsir_reference(texts, {"en"})
    assert {d: out[d]["dsir_score"] for d in out} == want
    # doc 4 is written in target-like bigrams despite its label: it
    # must outscore the genuinely off-target doc 3
    assert out[4]["dsir_score"] > out[3]["dsir_score"]
    assert out[3]["quartile"] == 3  # the off-target doc lands in the tail


def test_token_budget_sample_greedy_fill(spark, tmp_path):
    """Within a source, higher-quality docs fill the 500-token budget
    first; the doc that crosses the budget line is cut."""
    good = "the and is of " * 50         # 200 tokens, stopword-rich, in range
    bad = "zzz9!! " * 80                  # digit+punct heavy, 80 tokens
    rows = [
        (1, good, "s1"), (2, good, "s1"), (3, good, "s1"),  # 3x200 -> third crosses 500
        (4, bad, "s1"),
        (5, good, "s2"),                                     # other source: own budget
    ]
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from stream_spark.queries import QUERIES

    out = {r["doc_id"]: r for r in QUERIES["documents_token_budget_sample"](spark, str(tmp_path)).collect()}
    assert [out[d]["kept"] for d in (1, 2, 3, 4)] == [1, 1, 0, 0]
    assert out[3]["cum_tokens"] == 600  # crosses the 500 budget
    assert out[4]["qscore"] < out[1]["qscore"]  # junk ranks below
    assert out[5]["kept"] == 1 and out[5]["rnk"] == 1  # fresh budget per source


def test_dsir_score_expr_matches_batch_arithmetic(spark):
    """The stateless frozen-map score (streaming gate path) equals the
    sequential integer replay doc for doc."""
    from stream_spark.operators.dsir import dsir_score, dsir_weight_map

    texts = {
        1: ("the cat sat on the mat and the dog sat too", "en"),
        2: ("der hund sitzt auf der matte heute wieder da", "de"),
        3: ("the cat sat on the mat near the dog", "de"),
    }
    df = spark.createDataFrame(
        [(d, t, l) for d, (t, l) in texts.items()], "doc_id long, text string, lang string"
    )
    weights, default = dsir_weight_map(df, F.col("lang") == "en")
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", dsir_score(F.col("text"), weights, default).alias("s")).collect()
    }
    want = _dsir_reference(texts, {"en"})
    assert got == want
    assert 0 < default <= 1_000_000_000  # unseen-bucket weight positive, clipped


def test_dsir_arrow_scorer_matches_expression_path(spark):
    """dsir_score_rows (Arrow hot path) == dsir_score (Catalyst spec
    expression) on the same weights, row for row."""
    from stream_spark.operators.dsir import dsir_score, dsir_score_rows, dsir_weight_map

    texts = {
        1: ("the cat sat on the mat and the dog sat too", "en"),
        2: ("der hund sitzt auf der matte heute wieder da", "de"),
        3: ("the cat sat on the mat near the dog", "de"),
        4: ("single", "en"),  # <2 tokens: dropped by both paths
    }
    df = spark.createDataFrame(
        [(d, t, l) for d, (t, l) in texts.items()], "doc_id long, text string, lang string"
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
    assert arrow == expr and 4 not in arrow


def test_mmr_select_prefers_diversity_over_redundant_topk(spark):
    """Planted geometry: candidates 1,2 are near-identical and both
    very relevant; candidate 3 is slightly less relevant but
    orthogonal to them. Plain top-2 keeps the redundant twins; MMR's
    second pick must be the diverse candidate. Also pins: rank 1 is
    the pure-relevance argmax, scores are exact ints (7·s_q − 3·max),
    and k caps the output."""
    from stream_spark.operators.retrieval import mmr_select

    cand = spark.createDataFrame(
        [(0, 1, 990), (0, 2, 985), (0, 3, 900)],
        "query_id long, cid long, s_q long",
    )
    sims = {(1, 2): 999, (1, 3): 10, (2, 3): 10}
    rows = [
        (0, a, b, s)
        for (x, y), s in sims.items()
        for a, b in ((x, y), (y, x))
    ]
    ps = spark.createDataFrame(rows, "query_id long, pa long, pb long, s_ab long")
    out = {r["rank"]: r for r in mmr_select(cand, ps, k=2).collect()}
    assert len(out) == 2
    assert out[1]["vec_id"] == 1 and out[1]["mmr_score"] == 7 * 990
    # twin 2 scores 7*985 - 3*999 = 5898; diverse 3 scores 7*900 - 3*10 = 6270
    assert out[2]["vec_id"] == 3 and out[2]["mmr_score"] == 7 * 900 - 3 * 10


def test_mmr_select_tie_breaks_min_id_and_handles_short_groups(spark):
    from stream_spark.operators.retrieval import mmr_select

    # two candidates, identical relevance, no redundancy: pick min id
    cand = spark.createDataFrame(
        [(7, 20, 500), (7, 10, 500)], "query_id long, cid long, s_q long"
    )
    ps = spark.createDataFrame(
        [(7, 10, 20, 0), (7, 20, 10, 0)], "query_id long, pa long, pb long, s_ab long"
    )
    rows = mmr_select(cand, ps, k=8).orderBy("rank").collect()
    # group smaller than k: all candidates emitted, ranks dense 1..n
    assert [r["vec_id"] for r in rows] == [10, 20]
    assert [r["rank"] for r in rows] == [1, 2]


def test_mmr_select_sharded_parity_and_single_candidate(spark):
    """Many queries across a small shard count: per-query selections
    are identical whether queries share an Arrow batch (shards=1 packs
    all of them together) or spread (shards=8) — the r9 sharded
    dispatch changes batching only, never the greedy result. Includes
    a single-candidate query (no pair rows at all — an empty matrix is
    complete for n=1)."""
    from stream_spark.operators.retrieval import mmr_select

    cand_rows, pair_rows = [], []
    for qid in range(10):
        ids = [1, 2, 3] if qid % 3 else [1]
        for i in ids:
            cand_rows.append((qid, i, 1000 - i * (qid % 4)))
        for a in ids:
            for b in ids:
                if a != b:
                    pair_rows.append((qid, a, b, (a + b) * 37 % 500))
    cand = spark.createDataFrame(cand_rows, "query_id long, cid long, s_q long")
    ps = spark.createDataFrame(pair_rows, "query_id long, pa long, pb long, s_ab long")
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    one = sorted(mmr_select(cand, ps, k=2, shards=1).collect(), key=key)
    eight = sorted(mmr_select(cand, ps, k=2, shards=8).collect(), key=key)
    assert [tuple(r) for r in one] == [tuple(r) for r in eight]
    assert {r["query_id"] for r in one} == set(range(10))


def test_mmr_select_sparse_pair_matrix_raises(spark):
    """The complete-pair-matrix contract fails LOUDLY: dropping one
    direction of one pair raises instead of silently scoring the
    missing pair as zero redundancy (ADVICE r8)."""
    import pytest

    from stream_spark.operators.retrieval import mmr_select

    cand = spark.createDataFrame(
        [(0, 1, 990), (0, 2, 985), (0, 3, 900)],
        "query_id long, cid long, s_q long",
    )
    ps = spark.createDataFrame(
        [(0, 1, 2, 999), (0, 2, 1, 999), (0, 1, 3, 10), (0, 3, 1, 10), (0, 2, 3, 10)],
        "query_id long, pa long, pb long, s_ab long",
    )
    with pytest.raises(Exception, match="pair matrix incomplete"):
        mmr_select(cand, ps, k=2).collect()


def test_soft_dedup_weights_mass_and_inverse_size(spark, sf_dir):
    """Every doc appears exactly once; weight_ppm == 1e6 DIV
    cluster_size; docs outside any near-dup cluster carry weight 1e6;
    and each multi-doc cluster's members share one size."""
    from stream_spark.queries.dedup_queries import documents_soft_dedup_weights

    out = documents_soft_dedup_weights(spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == docs_n
    for r in out:
        assert r["weight_ppm"] == 1_000_000 // r["cluster_size"]
    assert any(r["cluster_size"] > 1 for r in out)  # testdata plants near-dups
    assert any(r["cluster_size"] == 1 and r["weight_ppm"] == 1_000_000 for r in out)
