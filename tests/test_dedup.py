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
    # max_hamming=10 needs n_chunks >= 12 for the chunk-pair pigeonhole
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=10, n_chunks=12).collect()
    }
    assert pairs.get((1, 2)) == 0  # same token set → same signature
    assert (1, 3) in pairs  # one-word swap stays within 10 bits


def test_simhash_chunk_pair_blocking_is_exact(spark):
    """Operator output == brute-force hamming over the collected
    signatures (the chunk-pair equi-join may not miss any pair)."""
    from stream_spark.operators.dedup import simhash

    rows = [
        (i, f"shared base words alpha beta gamma delta epsilon zeta {suffix}")
        for i, suffix in enumerate(
            ["", "", "eta", "eta theta", "iota kappa", "completely different everything"]
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc"]: r["simhash"] for r in simhash(df).collect()}
    for mh in (0, 3, 4):
        brute = {
            (a, b)
            for a in sigs
            for b in sigs
            if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= mh
        }
        got = {(r["doc_a"], r["doc_b"]) for r in simhash_pairs(df, max_hamming=mh).collect()}
        assert got == brute, f"max_hamming={mh}"


def test_simhash_rejects_unsafe_chunking(docs):
    with pytest.raises(ValueError):
        simhash_pairs(docs, max_hamming=5, n_chunks=6)


@pytest.fixture()
def hot_bucket_docs(spark):
    """Adversarial corpus: 30 identical docs → one 30-member bucket in
    EVERY minhash band, plus a few singletons."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [(i, base) for i in range(30)] + [
        (100 + i, f"entirely unrelated document number {i} holding words like token{i} mark{i * 7} value{i + 13}")
        for i in range(5)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_blocked_pairs_identical_to_plain(hot_bucket_docs):
    plain = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_candidates(hot_bucket_docs).collect()}
    blocked = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(hot_bucket_docs, block_size=4).collect()
    }
    assert blocked == plain
    assert len(plain) >= 30 * 29 // 2  # the hot bucket's full pair set


def test_minhash_bucket_cap_drops_hot_bucket(hot_bucket_docs):
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(hot_bucket_docs, max_bucket_size=10).collect()
    }
    assert not any(a < 100 and b < 100 for a, b in capped)


def test_containment_catches_snippet_inclusion(spark):
    from stream_spark.operators.dedup import containment_pairs

    snippet = "alpha beta gamma delta epsilon zeta"
    big = snippet + " " + " ".join(f"filler{i} word{i} extra{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, snippet), (2, big), (3, "totally different content here entirely now")],
        "doc_id long, text string",
    )
    out = {(r["doc_a"], r["doc_b"]): r for r in containment_pairs(docs, 0.9).collect()}
    assert (1, 2) in out  # snippet fully contained in big
    r = out[(1, 2)]
    assert r["containment_ab"] == 1.0  # all of doc1's 3-grams appear in doc2
    assert r["containment_ba"] < 0.2  # but doc2 is mostly other content
    assert not any(3 in k for k in out)


def test_containment_df_cut_bounds_candidates(spark):
    from stream_spark.operators.dedup import containment_pairs

    hot = "the common gram here"  # appears everywhere
    docs = spark.createDataFrame(
        [(i, hot + f" unique{i} token{i} tail{i}") for i in range(10)],
        "doc_id long, text string",
    )
    # df-cut removes the universal shingles → no pair survives
    out = containment_pairs(docs, 0.5, max_doc_freq=3).collect()
    assert out == []


def test_jaccard_df_cut_bounds_candidate_volume_adversarially(spark):
    """VERDICT r2 #2: the gated df-cut path must bound the inverted-index
    join on a boilerplate corpus. One shingle shared by all 200 docs
    costs C(200,2)=19900 candidate pairs uncapped; with the cut the
    candidate volume collapses >50x while a planted true near-dup pair
    (rare shingles only) still surfaces with its pruned-set Jaccard."""
    from pyspark.sql import functions as F

    from stream_spark.operators.dedup import ngram_jaccard_pairs, shingle_docs

    boiler = "all rights reserved contact us"
    rows = [
        (i, f"{boiler} page{i} body{i} text{i} words{i} here{i}") for i in range(200)
    ]
    # planted near-dup pair 500/501: identical rare content + the boilerplate
    dup = f"{boiler} shared rare content alpha beta gamma delta epsilon"
    rows += [(500, dup), (501, dup)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def cand_volume(max_doc_freq):
        sh = shingle_docs(docs)
        if max_doc_freq is not None:
            rare = sh.groupBy("g").count().filter(F.col("count") <= max_doc_freq).select("g")
            sh = sh.join(rare, "g")
        freqs = [r["c"] for r in sh.groupBy("g").agg(F.count("*").alias("c")).collect()]
        return sum(c * (c - 1) // 2 for c in freqs)

    uncapped, capped = cand_volume(None), cand_volume(5)
    assert uncapped >= 19900
    assert capped * 50 < uncapped, (capped, uncapped)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.8, max_doc_freq=5).collect()
    }
    assert got.get((500, 501)) == 1.0  # pruned sets identical → Jaccard 1
    assert not any(a < 500 for a, _b in got)  # boilerplate-only overlap gone


SUBSTR_DOCS = [
    # A and B share the verbatim 7-token span "alpha beta gamma delta
    # epsilon zeta eta" -> 3 distinct shared 5-grams; C is disjoint.
    (1, "intro words alpha beta gamma delta epsilon zeta eta closing remark one"),
    (2, "other opening alpha beta gamma delta epsilon zeta eta and a tail"),
    (3, "nothing here matches the shared span from the first two documents at all"),
]


@pytest.fixture()
def substr_docs(spark):
    return spark.createDataFrame(SUBSTR_DOCS, "doc_id long, text string")


def test_exact_substring_pairs_span_sharing(substr_docs):
    from stream_spark.operators.dedup import exact_substring_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared_grams"]
        for r in exact_substring_pairs(substr_docs, k=5, min_shared=1).collect()
    }
    # a shared 7-token span contains exactly 7-5+1 = 3 distinct 5-grams
    assert pairs == {(1, 2): 3}


def test_exact_substring_min_shared_threshold(substr_docs):
    from stream_spark.operators.dedup import exact_substring_pairs

    assert exact_substring_pairs(substr_docs, k=5, min_shared=4).count() == 0


def test_exact_substring_df_cut_drops_boilerplate(spark):
    from stream_spark.operators.dedup import exact_substring_pairs

    # the same 5-token boilerplate sentence in every doc; unique tails.
    rows = [(i, f"all rights reserved by publisher unique tail {i} a b c") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = exact_substring_pairs(docs, k=5, min_shared=1).count()
    capped = exact_substring_pairs(docs, k=5, min_shared=1, max_doc_freq=3).count()
    assert uncapped == 15  # 6-doc boilerplate clique = C(6,2)
    assert capped == 0  # df-cut removes the swarm gram before the join


def test_substring_dup_coverage_fractions(substr_docs):
    from stream_spark.operators.dedup import substring_dup_coverage

    cov = {r["doc_id"]: r for r in substring_dup_coverage(substr_docs, k=5).collect()}
    # 12-token docs -> 8 distinct 5-grams each; 3 shared between 1 and 2
    assert cov[1]["total_grams"] == 8 and cov[1]["dup_grams"] == 3
    assert cov[2]["dup_grams"] == 3
    assert cov[3]["dup_grams"] == 0 and cov[3]["dup_fraction"] == 0.0
    assert abs(cov[1]["dup_fraction"] - 3 / 8) < 1e-12


def _winnow_reference(text, k=5, w=4):
    """Direct single-machine winnowing (Schleimer et al. 2003):
    rolling k-gram md5 hashes, per-window rightmost-min selection.
    The distributed operator must match this set exactly."""
    import hashlib
    import re

    norm = re.sub(r"\s+", " ", text.strip().lower())
    ws = norm.split(" ")
    grams = [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
    fps = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    if not fps:
        return set()
    sel = set()
    n = len(fps)
    for s in range(max(1, n - w + 1)):
        window = fps[s : s + w]
        m = min(h % 2147483647 for h in window)
        # rightmost position attaining the 31-bit selection min
        p = max(i for i, h in enumerate(window, start=s) if h % 2147483647 == m)
        sel.add((p + 1, fps[p]))
    return sel


def test_winnowing_matches_direct_algorithm(spark):
    """The distributed window-min selection reproduces the classic
    sequential winnowing selection exactly, including short docs
    (clamped single window) and sub-w-gram docs."""
    from stream_spark.operators.dedup import winnow_fingerprints

    texts = {
        1: "the quick brown fox jumps over the lazy dog today and tomorrow it naps",
        2: "a b c d e f",          # 2 grams < w -> one clamped window
        3: "one two three four five",  # exactly 1 gram
        4: "alpha beta gamma",     # < k tokens -> no grams, absent
        5: " ".join(f"w{i % 7}" for i in range(40)),  # heavy repetition -> hash ties
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=5, w=4).collect():
        got.setdefault(r["doc"], set()).add((r["spos"], r["fp"]))
    for d, text in texts.items():
        want = _winnow_reference(text, k=5, w=4)
        assert got.get(d, set()) == want, f"doc {d}"


def test_winnowing_guarantee_shared_long_span(spark):
    """Any shared verbatim span of >= w+k-1 = 8 tokens must yield at
    least one shared selected fingerprint (the winnowing guarantee)."""
    from stream_spark.operators.dedup import winnow_fingerprints

    span = "zero one two three four five six seven"  # 8 tokens
    rows = [
        (1, f"prefix junk words here {span} and some trailing junk"),
        (2, f"{span} completely different remainder text follows now"),
        (3, "unrelated document with no overlap at all whatsoever here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sel = winnow_fingerprints(df, k=5, w=4)
    fps = {d: set() for d in (1, 2, 3)}
    for r in sel.collect():
        fps[r["doc"]].add(r["fp"])
    assert fps[1] & fps[2], "shared 8-token span must survive winnowing"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_semantic_decontaminate_flags_planted_near_dup(spark, tmp_path):
    """A corpus vector nearly parallel to an eval vector is flagged
    with cosine ~1; orthogonal corpus vectors are not flagged."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim = 64
    ev = rng.normal(size=dim)
    near = ev + rng.normal(scale=0.01, size=dim)      # planted leak
    orth = np.zeros(dim); orth[0] = 1.0
    ev2 = np.zeros(dim); ev2[1] = 1.0                  # second eval vec
    rows = [
        (0, [float(x) for x in ev], "a"),              # eval (id%50==0)
        (50, [float(x) for x in ev2], "a"),            # eval
        (7, [float(x) for x in near], "a"),            # leaked corpus vec
        (9, [float(x) for x in orth], "a"),            # clean corpus vec
    ]
    spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))

    from stream_spark.queries import QUERIES

    out = {r["vec_id"]: r for r in QUERIES["embeddings_semantic_decontaminate"](spark, str(tmp_path)).collect()}
    assert 7 in out and out[7]["max_cosine"] > 0.99
    assert out[7]["first_eval_id"] == 0
    assert 9 not in out  # orthogonal vec never crosses 0.4


def test_hybrid_search_rrf_consistency(spark):
    """On the sf0.001 corpus: the fused score always equals the RRF
    formula over the surfaced ranks, fused rank order follows
    (rrf desc, doc_id), and both retrieval sides contribute."""
    from stream_spark.queries import QUERIES

    rows = sorted(
        QUERIES["documents_hybrid_search"](spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["rank"],
    )
    assert rows and rows[0]["rank"] == 1 and len(rows) <= 20
    prev = None
    for r in rows:
        expect = 0
        if r["sparse_rank"] > 0:
            expect += 10**12 // (60 + r["sparse_rank"])
        if r["dense_rank"] > 0:
            expect += 10**12 // (60 + r["dense_rank"])
        assert r["rrf_scaled"] == expect
        if prev is not None:
            assert (-prev["rrf_scaled"], prev["doc_id"]) < (-r["rrf_scaled"], r["doc_id"])
        prev = r
    assert any(r["sparse_rank"] > 0 for r in rows)
    assert any(r["dense_rank"] > 0 for r in rows)


def test_substring_removal_deletes_shared_spans(spark, tmp_path):
    """Tokens covered by a cross-doc 5-gram are removed; within-doc
    repeats of a unique gram are NOT removed; surviving text md5
    matches a hand rebuild."""
    import hashlib

    from pyspark.sql import functions as F

    shared = "alpha beta gamma delta epsilon"        # 5 tokens, in docs 1+2
    rows = [
        (1, f"{shared} unique tail one two"),
        (2, f"lead in {shared}"),
        (3, "totally different words here repeated totally different words here repeated x"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from stream_spark.queries import QUERIES

    out = {r["doc_id"]: r for r in QUERIES["documents_substring_removal"](spark, str(tmp_path)).collect()}
    # doc1: the 5 shared tokens removed, 4-token tail survives
    assert (out[1]["n_tokens"], out[1]["n_removed"]) == (9, 5)
    assert out[1]["retained_md5"] == hashlib.md5(b"unique tail one two").hexdigest()
    # doc2: lead-in survives
    assert (out[2]["n_tokens"], out[2]["n_removed"]) == (7, 5)
    assert out[2]["retained_md5"] == hashlib.md5(b"lead in").hexdigest()
    # doc3: its grams repeat only WITHIN the doc -> doc-frequency 1,
    # nothing removed
    assert out[3]["n_removed"] == 0


def test_winnowing_pos_overflow_raises(spark, monkeypatch):
    """The 24-bit position field is ENFORCED (r6): a document whose
    gram count reaches WINNOW_POSBITS must raise, not silently corrupt
    the window-min key. Patch the bound small so a normal doc trips it;
    the key arithmetic stays self-consistent under the patched value."""
    import stream_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "WINNOW_POSBITS", 8)
    df = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(40)))], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="exceeds"):
        dd.winnow_fingerprints(df, k=3, w=4).collect()


def test_winnowing_guard_passes_in_bounds(spark):
    """The guard must be a no-op for in-bounds documents: same selected
    fingerprints as before the r6 guard (pinned by the direct-algorithm
    test above; here just assert it still returns rows cleanly)."""
    from stream_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(30)))], "doc_id long, text string"
    )
    rows = winnow_fingerprints(df, k=3, w=4).collect()
    assert rows and all(r["spos"] >= 1 for r in rows)


def test_banded_jaccard_subset_with_exact_scores(docs):
    """banded_jaccard_pairs ⊆ ngram_jaccard_pairs by construction
    (candidates are a subset of all pairs; verification is the same
    exact Jaccard over the FULL shingle sets) — and every emitted
    score must be bit-identical to the exhaustive variant's."""
    from stream_spark.operators.dedup import banded_jaccard_pairs

    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    banded = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in banded_jaccard_pairs(docs, 0.5).collect()}
    assert set(banded) <= set(exact)
    for p, j in banded.items():
        assert j == exact[p]
    assert (1, 2) in banded  # identical sets collide on every band


def test_banded_jaccard_recall_on_corpus(spark):
    """Recall characterization on the real sf0.001 corpus at the gated
    threshold (0.8): the planted near-dups are high-Jaccard, and
    16-perm/4-row bands catch them all here — pin full recall on THIS
    corpus so a band-scheme change that silently costs recall fails
    loudly. (The general guarantee is probabilistic: P(candidate) =
    1-(1-j^4)^4, ≈0.98 at j=0.8.)"""
    from stream_spark.operators.dedup import banded_jaccard_pairs
    from stream_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    exact = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs, 0.8).collect()}
    banded = {(r["doc_a"], r["doc_b"]) for r in banded_jaccard_pairs(docs, 0.8).collect()}
    assert banded <= exact
    assert exact, "corpus must contain planted near-dups for this test to bite"
    recall = len(banded) / len(exact)
    assert recall == 1.0, f"banded recall dropped to {recall:.3f} on the pinned corpus"


def test_banded_jaccard_blocked_path_identical(hot_bucket_docs):
    """The adversarial-swarm controls pass through: block_size produces
    the IDENTICAL verified pair set (blocked candidates are identical
    by the minhash_lsh_candidates contract)."""
    from stream_spark.operators.dedup import banded_jaccard_pairs

    plain = {(r["doc_a"], r["doc_b"]) for r in banded_jaccard_pairs(hot_bucket_docs, 0.8).collect()}
    blocked = {
        (r["doc_a"], r["doc_b"])
        for r in banded_jaccard_pairs(hot_bucket_docs, 0.8, block_size=8).collect()
    }
    assert plain == blocked and plain


def test_index_staging_dir_repo_derived_and_sweeps_dead_pids(tmp_path, monkeypatch):
    """The staging helper derives its root from the package location
    (not a hardcoded path), allocates per-pid, and sweeps sibling dirs
    whose pid is dead — the unbounded-accumulation fix (ADVICE r9)."""
    import os

    from stream_spark.queries.dedup_queries import _index_staging_dir

    path = _index_staging_dir("test_staging")
    base = os.path.dirname(path)
    assert os.path.basename(path) == str(os.getpid())
    assert base.endswith(os.path.join(".scratch", "test_staging"))
    # plant a dir for a pid that cannot be alive (pid_max is < 2^22+2)
    dead = os.path.join(base, "4194306")
    os.makedirs(dead, exist_ok=True)
    live_marker = os.path.join(base, "not_a_pid")
    os.makedirs(live_marker, exist_ok=True)
    _index_staging_dir("test_staging")
    assert not os.path.exists(dead)  # dead pid swept
    assert os.path.exists(live_marker)  # non-pid dirs untouched


def test_simhash_inline_matches_explode_reference(spark):
    """The one-pass zip_with-accumulator simhash (r11) must reproduce
    the explode-per-bit spelling bit for bit — including NULL text
    (emits no row), whitespace-only text (tokens() yields one ''
    token, which hashes — both spellings keep the doc), single-token
    docs (signature == the token hash), and repeated tokens
    (array_distinct)."""
    from pyspark.sql import functions as F

    from stream_spark.operators.dedup import SIMHASH_BITS, simhash
    from stream_spark.operators.text import md5_long, normalize_text, tokens

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),          # exact dup
        (3, "alpha  beta   gamma delta "),       # whitespace noise
        (4, "alpha alpha alpha beta"),           # repeated tokens
        (5, "единственный"),                     # single non-ascii token
        (6, "   "),                              # whitespace-only: one '' token
        (7, None),                               # NULL text
        (8, "tok"),                              # single token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def explode_ref(d):
        toks = (
            d.select(
                F.col("doc_id").alias("doc"),
                F.array_distinct(tokens(normalize_text(F.col("text")))).alias("ws"),
            )
            .select("doc", F.explode(F.col("ws")).alias("w"))
            .withColumn("h", md5_long(F.col("w")))
        )
        bits = toks.select(
            "doc", "h", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j")
        ).withColumn("contrib", F.expr("CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END"))
        sums = bits.groupBy("doc", "j").agg(F.sum("contrib").alias("s"))
        return sums.groupBy("doc").agg(
            F.sum(
                F.expr("CASE WHEN s >= 0 THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END")
            ).alias("simhash")
        )

    got = {(r["doc"], r["simhash"]) for r in simhash(df).collect()}
    want = {(r["doc"], r["simhash"]) for r in explode_ref(df).collect()}
    assert got == want and {d for d, _ in got} == {1, 2, 3, 4, 5, 6, 8}


def test_minhash_signatures_prehashed_shingles_identical(spark):
    """r12: the hashed shingle index (gh = md5_long(g)) must produce
    BIT-IDENTICAL signatures to the string path — the base hash is
    md5_long(g) % M31 either way, the pre-hashed frame just folds the
    md5 into the shared pass. Pins the identity the banded/incremental
    verify families rely on after the §2.3 narrower-type change
    (verify joins and the cached index carry the 8-byte md5 key, not
    the shingle text). Edge rows: exact dup, NULL text, <n tokens,
    hostile whitespace."""
    from pyspark.sql import functions as F

    from stream_spark.operators.dedup import minhash_signatures, shingle_docs
    from stream_spark.operators.text import md5_long

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, None),
            (4, "one two"),
            (5, "  spaced   out\ttokens  here  and   more  of them  "),
        ],
        "doc_id long, text string",
    )
    ref = {tuple(r) for r in minhash_signatures(df).collect()}
    hashed = shingle_docs(df).select("doc", md5_long(F.col("g")).alias("gh"))
    got = {tuple(r) for r in minhash_signatures(df, shingles=hashed).collect()}
    assert got == ref and {r[0] for r in got} == {1, 2, 5}


def test_minhash_signatures_keep_set_requires_prehashed(spark, docs):
    """r12: keep_set fuses the doc's hashed shingle set into the
    signature aggregation — it is only defined over a pre-hashed
    (doc, gh) frame; a string frame (or none) must fail loudly, and
    the fused profile must carry exactly the doc's shingle-set size."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from stream_spark.operators.dedup import minhash_signatures, shingle_docs
    from stream_spark.operators.text import md5_long

    with _pytest.raises(ValueError, match="pre-hashed"):
        minhash_signatures(docs, keep_set=True)
    hashed = shingle_docs(docs).select("doc", md5_long(F.col("g")).alias("gh"))
    prof = minhash_signatures(docs, shingles=hashed, keep_set=True)
    sizes = {r["doc"]: r["n"] for r in prof.select("doc", F.size("gs").alias("n")).collect()}
    want = {
        r["doc"]: r["n"]
        for r in hashed.groupBy("doc").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == want
