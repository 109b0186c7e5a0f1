from __future__ import annotations

import math

from pyspark.sql import functions as F

from stream_spark.operators.chunking import chunk_tokens, repeated_spans
from stream_spark.operators.similarity import range_search, topk_bruteforce
from stream_spark.operators.text import char_diversity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_tokens_covers_every_token(spark):
    text = " ".join(f"t{i}" for i in range(10))
    out = chunk_tokens(_docs(spark, [(1, text)]), chunk_size=4, stride=3).collect()
    # ceil((10-4)/3)+1 = 3 chunks at starts 0,3,6 — together covering t0..t9
    starts = sorted(r["chunk_id"] for r in out)
    assert starts == [0, 1, 2]
    sizes = {r["chunk_id"]: r["chunk_tokens"] for r in out}
    assert sizes == {0: 4, 1: 4, 2: 4}


def test_chunk_tokens_short_doc_single_chunk(spark):
    out = chunk_tokens(_docs(spark, [(1, "a b")]), chunk_size=64, stride=48).collect()
    assert len(out) == 1
    assert out[0]["chunk_id"] == 0
    assert out[0]["chunk_tokens"] == 2


def test_chunk_tokens_ragged_tail_kept(spark):
    text = " ".join(f"t{i}" for i in range(11))
    out = chunk_tokens(_docs(spark, [(1, text)]), chunk_size=4, stride=3).collect()
    # starts 0,3,6,9 — last chunk is ragged (2 tokens)
    sizes = {r["chunk_id"]: r["chunk_tokens"] for r in out}
    assert sizes == {0: 4, 1: 4, 2: 4, 3: 2}


def test_chunk_identical_text_identical_hashes(spark):
    rows = [(1, "w x y z"), (2, "w x y z"), (3, "other words here now")]
    out = chunk_tokens(_docs(spark, rows), chunk_size=4, stride=4).collect()
    md5 = {r["doc_id"]: r["chunk_md5"] for r in out}
    assert md5[1] == md5[2] != md5[3]


def test_repeated_spans_cross_doc(spark):
    shared = " ".join(f"s{i}" for i in range(16))
    uniq_a = " ".join(f"a{i}" for i in range(16))
    uniq_b = " ".join(f"b{i}" for i in range(16))
    rows = [(1, shared + " " + uniq_a), (2, shared + " " + uniq_b)]
    out = {r["doc_id"]: r for r in repeated_spans(_docs(spark, rows), 16, 8).collect()}
    # 32 tokens → spans at 0,8,16: span0 = shared (dup), span1 straddles,
    # span2 = uniq — exactly one dup span per doc
    assert out[1]["n_spans"] == 3 and out[2]["n_spans"] == 3
    assert out[1]["n_dup_spans"] == 1 and out[2]["n_dup_spans"] == 1
    assert abs(out[1]["dup_frac"] - 1 / 3) < 1e-12


def test_repeated_spans_within_doc_repeat_not_cross(spark):
    block = " ".join(f"r{i}" for i in range(16))
    rows = [(1, block + " " + block)]  # repeats internally, no other doc
    out = repeated_spans(_docs(spark, rows), 16, 8).collect()[0]
    assert out["n_dup_spans"] == 0  # dup requires ≥2 distinct docs


def test_char_diversity_exact_counts(spark):
    out = char_diversity(_docs(spark, [(1, "aab")]), with_entropy=True).collect()[0]
    assert out["n_chars"] == 3
    assert out["distinct_chars"] == 2
    # Σc² = 4+1 = 5
    assert abs(out["simpson"] - 5 / 9) < 1e-15
    assert abs(out["effective_alphabet"] - 9 / 5) < 1e-15
    expect_h = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(out["entropy_bits"] - expect_h) < 1e-9


def test_char_diversity_uniform_vs_repeated(spark):
    rows = [(1, "abcdefgh"), (2, "aaaaaaaa")]
    out = {r["doc_id"]: r for r in char_diversity(_docs(spark, rows)).collect()}
    assert out[1]["effective_alphabet"] == 8.0
    assert out[2]["effective_alphabet"] == 1.0
    assert out[2]["simpson"] == 1.0


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )


def test_range_search_matches_threshold(spark):
    qs = _emb(spark, [(0, [1.0, 0.0])])
    corpus = _emb(
        spark,
        [(10, [1.0, 0.0]), (11, [1.0, 1.0]), (12, [0.0, 1.0]), (13, [-1.0, 0.0])],
    )
    got = {
        r["neighbor_id"]: r["cosine"]
        for r in range_search(qs, corpus, 0.5).collect()
    }
    assert set(got) == {10, 11}
    assert abs(got[10] - 1.0) < 1e-12
    assert abs(got[11] - math.sqrt(0.5)) < 1e-12


def test_range_search_consistent_with_topk(spark):
    import random

    rng = random.Random(7)
    corpus = _emb(
        spark, [(i + 10, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    )
    qs = _emb(spark, [(0, [rng.uniform(-1, 1) for _ in range(8)])])
    tk = topk_bruteforce(qs, corpus, 40).collect()
    tau = 0.2
    expect = {r["neighbor_id"] for r in tk if r["cosine"] >= tau}
    got = {r["neighbor_id"] for r in range_search(qs, corpus, tau).collect()}
    assert got == expect


# ---- property tests: chunk geometry invariants for arbitrary docs ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

GEOM = st.tuples(st.integers(1, 10), st.integers(1, 10)).filter(lambda t: t[1] <= t[0])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(n_tokens=st.integers(1, 40), geom=GEOM)
def test_chunk_geometry_model(spark, n_tokens, geom):
    """Chunk count, sizes, and coverage must match the direct model:
    starts at 0, stride, ... ; every token lands in ≥1 chunk; ragged
    tail kept; no chunk empty."""
    size, stride = geom
    text = " ".join(f"w{i}" for i in range(n_tokens))
    rows = chunk_tokens(_docs(spark, [(1, text)]), size, stride).collect()

    if n_tokens <= size:
        starts = [0]
    else:
        import math

        starts = list(range(0, stride * (math.ceil((n_tokens - size) / stride) + 1), stride))
    assert sorted(r["chunk_id"] for r in rows) == list(range(len(starts)))
    covered = set()
    for r in rows:
        s = starts[r["chunk_id"]]
        expect_len = min(size, n_tokens - s)
        assert r["chunk_tokens"] == expect_len > 0
        covered.update(range(s, s + expect_len))
    assert covered == set(range(n_tokens))


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(n_tokens=st.integers(1, 40), geom=GEOM)
def test_span_count_model(spark, n_tokens, geom):
    size, stride = geom
    text = " ".join(f"w{i}" for i in range(n_tokens))
    rows = repeated_spans(_docs(spark, [(1, text)]), size, stride).collect()
    if n_tokens < size:
        assert rows == []
    else:
        assert rows[0]["n_spans"] == (n_tokens - size) // stride + 1
        assert rows[0]["n_dup_spans"] == 0  # single doc → nothing cross-doc
