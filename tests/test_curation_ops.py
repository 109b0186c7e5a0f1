"""Planted-signal tests for the late round-5 curation operators:
label propagation, split contamination, decay / temperature sampling,
and shard assignment. Each test constructs a corpus where the correct
output is known by hand, writes it as the table the registry query
reads, and asserts the planted signal is recovered exactly."""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import random
import tempfile

from stream_spark.queries import QUERIES


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_label_propagation_recovers_planted_duplicates(spark):
    """An odd (held-out) vector identical to an even (labeled) vector
    must be predicted that neighbor's label: identical vectors collide
    in every LSH table, cosine 1.0 dominates every rank."""
    rng = random.Random(11)
    rows = []
    for i in range(0, 40, 2):  # labeled train half, labels 0/1/2
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)], i % 3))
    va, vb = rows[2][1], rows[3][1]
    # three train copies of va, all label 1: any held-out duplicate's
    # top-5 vote is >=3/5 label 1 regardless of the random tail
    rows += [(50, va, 1), (52, va, 1)]
    rows.append((101, va, 1))  # held-out duplicate, true label 1
    # three train copies of vb, all label 0; held-out duplicate carries
    # true label 2 -> a planted LABEL-NOISE row: confident vote
    # disagrees with truth
    rows += [(60, vb, 0), (62, vb, 0)]
    rows.append((103, vb, 2))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    with tempfile.TemporaryDirectory() as d:
        emb.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = {r["vec_id"]: r.asDict() for r in QUERIES["embeddings_label_propagation"](spark, d).collect()}
    assert out[101]["pred_label"] == 1 and out[101]["is_correct"]
    assert out[103]["pred_label"] == 0 and not out[103]["is_correct"]


def test_split_contamination_flags_cross_split_duplicates(spark):
    """A test-split doc with a train-split near-duplicate is flagged;
    a test-split doc with unique text is not."""
    train_id = next(i for i in range(1000) if _md5_long(str(i)) % 10 < 8)
    test_ids = [i for i in range(1000) if _md5_long(str(i)) % 10 >= 8]
    leak_id, clean_id = test_ids[0], test_ids[1]
    dup_text = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [
        (train_id, dup_text, "en", "web", len(dup_text)),
        (leak_id, dup_text, "en", "web", len(dup_text)),
        (clean_id, "completely unrelated words about astronomy telescopes nebula " * 3,
         "en", "web", 60),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: r.asDict() for r in QUERIES["documents_split_contamination"](spark, d).collect()}
    assert set(out) == {leak_id, clean_id}  # test-split docs only
    assert out[leak_id]["is_contaminated"] and out[leak_id]["min_train_dup"] == train_id
    assert not out[clean_id]["is_contaminated"] and out[clean_id]["n_train_dups"] == 0


def test_decay_sample_keeps_all_fresh_events(spark):
    """Events within the first half-life (age < 7 days) have keep
    modulus 2^0 = 1 — every one of them must be in the sample."""
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(50):  # fresh: spread over 3 days before the anchor
        rows.append((i, base - dt.timedelta(hours=i), 100, "view", 1.0, "{}"))
    for i in range(50, 80):  # stale: 8-10 weeks old, keep rate 2^-8..-10
        rows.append((i, base - dt.timedelta(days=56 + (i % 14)), 100, "view", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["event_id"]: r.asDict() for r in QUERIES["events_decay_sample"](spark, d).collect()}
    fresh = {i for i in range(50)}
    assert fresh <= set(out)
    assert all(out[i]["decay_bucket"] == 0 for i in fresh)
    stale_kept = set(out) - fresh
    assert len(stale_kept) < 30  # 2^-8 keep rate: overwhelmingly dropped


def test_temperature_sample_flattens_big_sources(spark):
    """Sources with n_s <= 4 are kept whole (C/sqrt(n) >= M); a
    1000-doc source is downsampled to roughly C/(M*sqrt(n)) ~ 6%."""
    rows = [(i, f"doc {i}", "en", "big", 10) for i in range(1000)]
    rows += [(10_000 + i, f"tiny {i}", "en", "small", 10) for i in range(3)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = QUERIES["documents_temperature_sample"](spark, d).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert by_src["small"] == {10_000, 10_001, 10_002}
    assert 10 <= len(by_src["big"]) <= 250  # ~6.3% expected, generous band


def test_shard_assignment_snake_balances_exactly(spark):
    """16 docs with token counts 16..1 dealt over 8 shards: the snake
    pairs rank r with rank 17-r, so every shard's token sum is 17."""
    rows = [(i, "w " * (16 - i) + "w", "en", "synth", 40) for i in range(16)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = QUERIES["documents_shard_assignment"](spark, d).collect()
    sums: dict[int, int] = {}
    for r in out:
        sums[r["shard"]] = sums.get(r["shard"], 0) + r["n_tokens"]
    assert set(sums) == set(range(8))
    # rank r holds 18-r tokens; shard s pairs ranks s+1 and 16-s:
    # (17-s) + (2+s) = 19 for every shard
    assert all(v == 19 for v in sums.values())


def test_new_curation_queries_on_empty_tables(spark):
    """Every late-round-5 batch query must return an empty result on
    empty tables, not crash — at 100 TB a pruned branch can
    legitimately be empty (same contract test_empty_inputs.py pins for
    the operator layer). Streaming queries are exercised elsewhere."""
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        emb.write.parquet(os.path.join(d, "embeddings.parquet"))
        ev.write.parquet(os.path.join(d, "events.parquet"))
        for name in [
            "documents_langid_classifier",
            "documents_split_contamination",
            "embeddings_label_propagation",
            "ann_recall_at_k",
            "documents_source_keywords",
            "events_decay_sample",
            "events_user_sequences",
            "documents_temperature_sample",
            "documents_shard_assignment",
            "dedup_minhash_estimate_error",
            "embeddings_diversity_sample",
            "documents_curriculum_order",
            "multimodal_image_neardup_groups",
            "events_value_quantile_transform",
            "events_pit_dimension_join",
        ]:
            assert QUERIES[name](spark, d).count() == 0, name
