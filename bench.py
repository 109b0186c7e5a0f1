"""Benchmark headline queries; prints ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

The frozen 16-query headline set (metric/value/queries keys) is
comparable round over round back to BENCH_r01.json. A second tier
covering the C-block operators the headliners miss (pagerank, packing,
embedding dedup, k-means, boilerplate, ...) plus one streaming
replay-throughput measurement rides along under the "tier2" key of the
SAME json line — run ``python bench.py --tier2`` to execute only that
tier while iterating. ``--sf1-streaming`` additionally emits the
crawl-scale streaming throughputs (replay rows/s, minhash docs/s at
sf1 under ``sf1_streaming``) — the numbers where per-trigger fixed
cost amortizes; requires ``tools/make_sf1.py`` to have run.

Since r8 a frozen sf1 BATCH tier (headliners + scale-sensitive
C-block queries, under ``sf1``) runs by default and is the PRIMARY
round-over-round regression signal — at 10x data the compute is far
above the machine-noise floor that made sf0.1 drift adjudication a
recurring cost (BASELINE.md). The sf1 dataset auto-derives
(deterministic replication, tools/make_sf1.py) on first run;
``--no-sf1`` skips the tier while iterating.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINERS = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "agg_time_tumbling_sum",
    "agg_tumbling_count_sum",
    "agg_sliding_count_avg",
    "events_sessionize",
    "pipeline_agg_filter",
    "stream_join_time",
    "tpch_q6_revenue_delta",
    "events_asof_join_purchase_click",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality_score",
    "ann_topk_bruteforce",
]

#: frozen sf1 tier (r8, VERDICT item 3): the PRIMARY round-over-round
#: regression signal. Three judging rounds adjudicated sub-second
#: sf0.1 drift that BASELINE.md proves is regime noise (fresh-session
#: 5-10x inflation, loadavg 2x incidents); at sf1 the compute is 10x
#: the noise floor. The set = the 16 headliners plus the scale-
#: sensitive C-block queries whose drift has been contentious. Band
#: adjudication happens HERE; sf0.1 keys stay for baseline continuity.
SF1_EXTRAS = [
    "parts_copurchase_pagerank",
    "training_pack_sequences",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "embeddings_knn_graph",
    "embeddings_label_propagation",
    "dedup_clusters_banded",
    "dedup_keep_best_quality_banded",
    "documents_langid_classifier",
    # r9 (VERDICT r8 item 6): the df-cut fingerprint family drifted up
    # two rounds running at sf0.1 (winnowed 1.80→2.03, substring
    # 1.58→1.73) — inside the band, but adjudication happens at sf1
    # now, so the primary signal must cover them.
    "dedup_winnowed_pairs",
    "dedup_exact_substring",
    # r10 (VERDICT r9 item 4): the two compositions a user actually
    # runs end to end were probe-only at scale — pin them in the
    # primary signal.
    "training_data_prep",
    "pipeline_multimodal_curation",
]

#: tier 2: scale-sensitive C-block operators invisible to the frozen
#: headline set — regressions here were untracked before round 3.
TIER2 = [
    "parts_copurchase_pagerank",
    "training_pack_sequences",
    "dedup_embedding_cosine",
    "embedding_dedup_clusters",
    "embeddings_kmeans",
    "documents_boilerplate_share",
    "dedup_ngram_jaccard_capped",
    "corpus_tfidf_top_terms",
    # round-4 flagships
    "dedup_semantic_clusters",
    "corpus_bpe_merges",
    "corpus_token_drift",
    "ann_topk_ivfpq",
    "dedup_keep_best_quality",
    "pipeline_curation",
    # round-5 additions
    "dedup_exact_substring",
    "documents_bm25_search",
    "documents_lm_quality_buckets",
    "documents_line_dedup",
    "dedup_winnowed_pairs",
    "documents_dsir_selection",
    "documents_hybrid_search",
    "documents_langid_classifier",
    "documents_split_contamination",
    "embeddings_knn_graph",
    "embeddings_label_propagation",
    # round-8 additions: the banded exact-Jaccard cluster family and
    # the curation additions (soft dedup / MMR / cluster labeling)
    "dedup_jaccard_banded",
    "dedup_clusters_banded",
    "dedup_keep_best_quality_banded",
    "documents_soft_dedup_weights",
    "embeddings_mmr_rerank",
    "embeddings_cluster_topics",
    # round-9 additions: the banded-by-default corpus-prep capstone,
    # the composed multimodal-curation pipeline, cluster-balanced
    # selection
    "training_data_prep",
    "pipeline_multimodal_curation",
    "embeddings_cluster_balanced_sample",
    "documents_langid_confusion",
    "dedup_index_persisted",
    # round-10 addition: the index-update lifecycle.
    # (pipeline_media_hash_binary stays GATED but out of the timed
    # tier: ~90% of its wall is the test harness exporting 2×N
    # one-file-per-row payloads so the binaryFile scan has something
    # to read — at 15 s it would be 16% of tier-2 total while
    # measuring the stand-in, not the engine.)
    "dedup_index_update",
    # round-11 additions (VERDICT r10 items 6-7): the bucketed
    # saveAsTable spelling of the same lifecycle — the timed artifact
    # behind the "at 100 TB the index is bucketed" claim — and the
    # streaming maintain loop (per-batch probe + delta append).
    "dedup_index_update_bucketed",
    "streaming_dedup_index_maintain",
]


def _time_query(spark, fn, sf_dir) -> tuple[float, int]:
    """One untimed warm run (JIT/codegen/broadcast warmup), then the
    best of two timed runs measures steady-state compute — the regime a
    long-running stream processor actually operates in. A forced JVM GC
    before each timed run (JMH-style iteration hygiene) keeps it from
    paying the warm run's garbage debt — without it, timings degrade
    2-5x across the suite as heap pressure accumulates. Min-of-2
    (standard steady-state practice) filters one-off scheduler/GC
    spikes that showed 2-4x outliers on single-shot runs of an
    otherwise unchanged plan; the floor, not the average, is the
    compute cost.

    Each timed rep re-CONSTRUCTS the DataFrame and counts it in ONE
    window (r10, ADVICE r9): the r9 index-materialization act made
    fn() eager for ~9 queries (localCheckpoint at construction), so
    the old construct-untimed/count-timed split silently excluded the
    index build from the recorded number. Timing construct+count
    together restores the r1–r8 regime (construction was lazy then, so
    the whole compute already sat in the timed window) and makes an
    index-computation regression visible again. The payload stamps
    ``timed_window: construct+count``."""
    df = fn(spark, sf_dir)
    df.count()
    best, n = None, 0
    for _rep in range(2):
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best, n


def _streaming_throughput(spark, sf_dir: str) -> float:
    """Replay the sf events table through a real readStream →
    hourly-tumbling-sum → memory-sink job (availableNow, 4 file
    slices) and report end-to-end input rows/sec — the engine's
    streaming pitch, measured, not inferred from batch timings.

    Trigger/state tuning (r4): two files per trigger — still multi-
    batch, so cross-batch state merge is exercised — and state
    partitions sized to the ~24-window key cardinality instead of the
    batch shuffle default (the state-store instance count is pinned at
    query start; empty state tasks were most of each micro-batch).
    16.5k → 73k rows/s recorded at sf0.1."""
    import shutil

    from stream_spark.sources import load_table
    from stream_spark.streaming import (
        file_replay_stream,
        run_stream_to_memory,
        streaming_tumbling_time_window,
    )

    import uuid

    ev = load_table(spark, sf_dir, "events")
    n_rows = ev.count()
    stage = "/root/repo/.scratch/bench_stream"
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else "/root/repo/.scratch"
    best = None
    # r6: the two levers the minhash tier already uses, applied here —
    # offset/commit/state logs on RAM-fs (the per-trigger fsyncs are
    # fixed-cost housekeeping, not engine work) and 3 reps (the
    # streaming runner JITs later than batch plans; the r4→r5 driver
    # delta on this metric adjudicated to session noise on identical
    # code — min-of-3 narrows the band).
    for _rep in range(3):
        shutil.rmtree(stage, ignore_errors=True)
        stream = file_replay_stream(spark, ev, stage, n_slices=4, max_files_per_trigger=2)
        ckpt = f"{ckpt_base}/bench_replay_ckpt_{uuid.uuid4().hex[:8]}"
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        out = run_stream_to_memory(
            streaming_tumbling_time_window(stream, "ts", "value", "sum", 3_600_000),
            output_mode="complete",
            state_partitions=8,
            checkpoint_dir=ckpt,
        )
        out.count()
        dt = time.time() - t0
        shutil.rmtree(ckpt, ignore_errors=True)
        best = dt if best is None or dt < best else best
    return round(n_rows / best, 1)


def _streaming_minhash_throughput(spark, sf_dir: str) -> float:
    """End-to-end docs/sec of the online near-dup job (ordered replay →
    stateless JVM minhash band projection → stateful first-seen fold) —
    the crawl-ingest pitch. Tracked since r4, when the signature map
    moved from Python hashlib loops to Catalyst expressions."""
    import shutil

    from stream_spark.sources import load_table
    from stream_spark.streaming import ordered_replay_stream, run_stream_to_memory
    from stream_spark.streaming.dedup import streaming_minhash_dedup

    import uuid

    docs = load_table(spark, sf_dir, "documents")
    n_rows = docs.count()
    stage = "/root/repo/.scratch/bench_stream_mh"
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else "/root/repo/.scratch"
    best = None
    # r5 tuning, three levers (662 -> ~2k docs/s at sf0.1):
    #  - sharded first-seen fold: few large vectorized pandas groups
    #    instead of one Python dispatch per bucket;
    #  - scan-split hashing: stage slices with 64 KiB row groups and a
    #    small maxPartitionBytes so the Catalyst signature projection
    #    parallelizes INSIDE each micro-batch's scan stage
    #    (parallelism=0 = no repartition — one less exchange/trigger);
    #  - offset/commit logs + state on RAM-fs scratch (the fsyncs were
    #    ~100 ms of the ~650 ms per-trigger floor).
    # The residual floor is the 4 triggers' planning+state fixed cost —
    # the same job at sf1 amortizes it to ~7.6k docs/s (BASELINE.md).
    #  - state sizing tracks trigger volume (r5b): at ~1.2k docs/trigger
    #    the stateful stage is pure fixed cost (protocol handshake +
    #    store commit PER TASK), so ONE state partition / one shard
    #    beats spreading it (interleaved A/B: 3.26 s vs 3.69 s for
    #    sp=2/shards=8); at sf1 volumes the sharded layout wins, so
    #    scale both with rows-per-trigger.
    #  - trigger batching (r7): two slices per micro-batch on a small
    #    corpus — the per-trigger fixed cost (~1.1 s: planning + offset/
    #    commit logs + state commit) was 4/5 of the wall at 4 triggers ×
    #    1.25k docs. Two triggers still exercise the cross-batch state
    #    fold, and order stays exact: the file source takes slices
    #    OLDEST-FIRST so each batch is a consecutive key range, and the
    #    fold resolves within-batch order by id (measured 956 → ~2.3k
    #    docs/s; the oracle-gated query is unchanged).
    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_oc = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        # 3 reps (vs the suite's 2): the streaming-runner codepaths
        # (stateful Arrow protocol, state store) JIT later than batch
        # plans — rep 2 is still measurably colder than rep 3 here.
        small = n_rows <= 20000  # <=5k docs/trigger: fixed cost dominates
        for _rep in range(3):
            shutil.rmtree(stage, ignore_errors=True)
            stream = ordered_replay_stream(
                spark, docs, stage, ["doc_id"], n_slices=4,
                writer_options={"parquet.block.size": 65536},
                max_files_per_trigger=2 if small else 1,
            )
            # ~16 scan splits per trigger regardless of sf: finer
            # over-splits (measured at 32 KiB groups) cost more in task
            # scheduling than the hashing they spread.
            import glob as _glob
            fsz = max(os.path.getsize(f) for f in _glob.glob(f"{stage}/part-*.parquet"))
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(131072, fsz // 16)))
            spark.conf.set("spark.sql.files.openCostInBytes", "0")
            ckpt = f"{ckpt_base}/bench_mh_ckpt_{uuid.uuid4().hex[:8]}"
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            out = run_stream_to_memory(
                streaming_minhash_dedup(stream, parallelism=0, shards=1 if small else 8),
                output_mode="append",
                state_partitions=1 if small else 2,
                checkpoint_dir=ckpt,
            )
            out.count()
            dt = time.time() - t0
            shutil.rmtree(ckpt, ignore_errors=True)
            best = dt if best is None or dt < best else best
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_oc)
    return round(n_rows / best, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tier2_only = "--tier2" in sys.argv
    from stream_spark.queries import QUERIES
    from stream_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    if not tier2_only:
        # ONE untimed warmup pass over the whole headline set before any
        # timing (r7). The metric is declared steady-state, but per-query
        # warmup alone under-warms the SESSION for the earliest
        # positions: the first queries time while codegen/JIT for the
        # shared operators is still compiling, and that debt grew with
        # the package (r4 5.90 → r6 7.81 s on frozen plans). Measured
        # attribution (BASELINE.md r7 note): first-5 headliners sum
        # 3.72 s on the first pass vs 2.54 s re-timed in the same
        # session — tpch_q1 0.75 → 0.30 s with zero code change. The
        # warmup pass makes the recorded number the steady-state the
        # docstring already claims.
        for name in HEADLINERS:
            if name in QUERIES:
                QUERIES[name](spark, sf_dir).count()
        for name in HEADLINERS:
            if name not in QUERIES:
                continue
            best, n = _time_query(spark, QUERIES[name], sf_dir)
            timings[name] = round(best, 3)
            print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    tier2: dict[str, float] = {}
    for name in TIER2:
        if name not in QUERIES:
            continue
        best, n = _time_query(spark, QUERIES[name], sf_dir)
        tier2[name] = round(best, 3)
        print(f"# tier2 {name}: {n} rows in {tier2[name]}s", file=sys.stderr)
    rps = _streaming_throughput(spark, sf_dir)
    tier2["streaming_replay_rows_per_sec"] = rps
    print(f"# tier2 streaming replay: {rps} rows/s", file=sys.stderr)
    mh_rps = _streaming_minhash_throughput(spark, sf_dir)
    tier2["streaming_minhash_docs_per_sec"] = mh_rps
    print(f"# tier2 streaming minhash: {mh_rps} docs/s", file=sys.stderr)

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # methodology-version fields (r7 ADVICE): the untimed full-set
    # warmup pass (r7) and the sf1 tier (r8) changed what the recorded
    # numbers mean — stamp the regime so cross-round comparisons can
    # detect it mechanically, not via BASELINE.md prose.
    payload: dict = {
        "tier2": tier2,
        "sf": sf,
        "warmup_pass": True,
        "timed_window": "construct+count",
    }

    # frozen sf1 tier — always emitted (r8): auto-derives the dataset
    # (deterministic 10x replication of sf0.1) on first run.
    if "--no-sf1" not in sys.argv and not tier2_only:
        sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.scratch/sf1")
        if not os.path.isdir(sf1_dir):
            import subprocess

            print(f"# building sf1 dataset at {sf1_dir} ...", file=sys.stderr)
            subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "make_sf1.py"), sf1_dir],
                check=True,
            )
        sf1_set = [n for n in HEADLINERS + SF1_EXTRAS if n in QUERIES]
        for name in sf1_set:  # same warmup-pass discipline as the headline tier
            QUERIES[name](spark, sf1_dir).count()
        sf1_timings: dict[str, float] = {}
        for name in sf1_set:
            best, n = _time_query(spark, QUERIES[name], sf1_dir)
            sf1_timings[name] = round(best, 3)
            print(f"# sf1 {name}: {n} rows in {sf1_timings[name]}s", file=sys.stderr)
        payload["sf1"] = {
            "metric": "sf1_query_wall_time",
            "value": round(sum(sf1_timings.values()), 3),
            "unit": "sec",
            "queries": sf1_timings,
        }

    if "--sf1-streaming" in sys.argv:
        # crawl-scale streaming tier (r6, VERDICT item 6): the honest
        # throughput numbers — where triggers are 10x larger and the
        # per-trigger fixed cost amortizes — emitted in the JSON line
        # instead of living only in BASELINE.md prose, so round-over-
        # round streaming comparisons stop depending on narrative.
        sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.scratch/sf1")
        if os.path.isdir(sf1_dir):
            s1_rps = _streaming_throughput(spark, sf1_dir)
            print(f"# sf1 streaming replay: {s1_rps} rows/s", file=sys.stderr)
            s1_mh = _streaming_minhash_throughput(spark, sf1_dir)
            print(f"# sf1 streaming minhash: {s1_mh} docs/s", file=sys.stderr)
            payload["sf1_streaming"] = {
                "replay_rows_per_sec": s1_rps,
                "minhash_docs_per_sec": s1_mh,
            }
        else:
            payload["sf1_streaming"] = {
                "error": f"{sf1_dir} missing — run tools/make_sf1.py first"
            }
    if tier2_only:
        # no headline timings ran — marking the record (instead of
        # emitting value=0.0 with the frozen keys) keeps a redirected
        # line from masquerading as a regressed-to-zero headline bench
        payload["tier2_only"] = True
        print(json.dumps(payload))
        return

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        **payload,
    }
    # Self-contained artifact discipline (VERDICT r8 item 2): the
    # driver records only a 2000-char tail window of this process's
    # output and parses the JSON line out of it. The full payload
    # outgrew that window in r8 (~2.6k chars once the sf1 tier landed)
    # and the round's headline number survived only in .ci/bench.json.
    # So: the FULL payload goes to a sidecar file (+ stderr for logs),
    # and stdout carries ONE COMPACT line (<1 KB — headline metric +
    # per-query headliners + per-tier TOTALS) that always fits the
    # window whole.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".ci", "bench_full.json"
    )
    os.makedirs(os.path.dirname(full_path), exist_ok=True)
    with open(full_path, "w") as fh:
        json.dump(payload, fh)
    print(json.dumps(payload), file=sys.stderr)

    t2_times = {k: v for k, v in tier2.items() if not k.startswith("streaming_")}
    compact: dict = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "warmup_pass": True,
        "timed_window": "construct+count",
        "tier2_total": round(sum(t2_times.values()), 3),
        "streaming_replay_rows_per_sec": tier2.get("streaming_replay_rows_per_sec"),
        "streaming_minhash_docs_per_sec": tier2.get("streaming_minhash_docs_per_sec"),
        "detail": ".ci/bench_full.json",
    }
    if "sf1" in payload:
        sf1_q = payload["sf1"]["queries"]
        compact["sf1_total"] = payload["sf1"]["value"]
        compact["sf1_n"] = len(sf1_q)
        compact["sf1_worst"] = dict(
            sorted(sf1_q.items(), key=lambda kv: -kv[1])[:3]
        )
    line = json.dumps(compact)
    assert len(line) < 1900, f"compact bench line grew past the driver window: {len(line)}"
    print(line)


if __name__ == "__main__":
    main()
