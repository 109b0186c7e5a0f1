"""Stretch scale probe (VERDICT r4 #9): one more decade of evidence
for the scale-probe's worst ratios before calling the design
100 TB-shaped.

The sf1 probe (tools/scale_probe.py) is 10x; this probe steps sf1 ->
sf3 (3x rows via tools/make_sf1.py --src=sf1 --replicas=3) for the
queries whose sf1 ratios were the worst, and checks the wall-time
ratio against the INPUT-VOLUME ratio rather than raw row count:

- For the graph/closure queries the natural axis is EDGES, not docs —
  the replica generator grows near-dup cliques with every decade
  (10-member at sf1, 30-member at sf3), so pair volume grows ~9x while
  docs grow 3x. A components algorithm that tracked 3x on 9x edges
  would look "super-linear in docs" while actually being sublinear in
  its real input. Each entry therefore names a volume query whose
  OUTPUT ROW COUNT defines the linear axis (the uncapped pair
  generator for dedup_clusters; the corpus row count otherwise).
- PASS per query: wall_ratio <= 2 x volume_ratio (the same 2x
  headroom scale_probe.py uses).

Run: python tools/stretch_probe.py [sf3_dir [sf1_dir]]
(writes STRETCH_PROBE.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: probe query -> volume axis: either another registered query whose
#: output row count measures the true input volume ("query:<name>"),
#: or a table whose row count does ("table:<name>").
PROBE = {
    "dedup_clusters": "query:dedup_ngram_jaccard",  # closure input = pairs
    "dedup_semantic_clusters": "table:documents",
    "dedup_keep_best_quality": "query:dedup_ngram_jaccard",
    "dedup_embedding_cosine": "table:embeddings",
    "embedding_dedup_clusters": "table:embeddings",
    "streaming_dedup_embedding": "table:embeddings",
    # r5: the knn-graph family was the sf1 probe's worst ratio (13x on
    # 10x docs) — its true input is the banded CANDIDATE EDGE volume,
    # which the replica generator grows ~9x per 3x docs (cliques 10 ->
    # 30 members); dedup_embedding_cosine's pair output tracks that
    # same clique volume, so it is the honest axis.
    "embeddings_knn_graph": "query:dedup_embedding_cosine",
    "embeddings_label_propagation": "query:dedup_embedding_cosine",
    # r8: banded exact-Jaccard family — the axis is the band-candidate
    # pair count itself (the rows the verifier scores); MUST come out
    # far below the exact family's Σ freq² growth on the same corpus
    "dedup_jaccard_banded": "volume:band_candidates",
    "dedup_clusters_banded": "volume:band_candidates",
    "dedup_keep_best_quality_banded": "volume:band_candidates",
    # r9: the corpus-prep capstone, now banded by default — its
    # one-decade-up wall must track the band-candidate axis, not the
    # Σ freq² axis the pre-r9 exact spelling was on
    "training_data_prep": "volume:band_candidates",
}


def _bestof2(spark, fn, sf_dir):
    fn(spark, sf_dir).count()
    best, n = None, 0
    for _ in range(2):
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best, n


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf3_dir = args[0] if args else "/root/repo/.scratch/sf3"
    sf1_dir = args[1] if len(args) > 1 else "/root/repo/.scratch/sf1"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--queries="):
            only = set(a.split("=", 1)[1].split(","))
    for d in (sf1_dir, sf3_dir):
        if not os.path.isdir(d):
            raise SystemExit(f"{d} missing — run tools/make_sf1.py first")
    # sf3 on a SINGLE shared JVM needs a bigger heap than the 8g test
    # default: dedup_keep_best_quality's pair graph + quality join OOMs
    # at 8g with 32 concurrent tasks but runs (sublinear, 6.6x wall on
    # 9.2x pairs) at 16g. A real cluster gives each executor its own
    # heap — the probe measures plan SHAPE, so provision the one JVM
    # like the per-executor norm rather than starve 32 tasks.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from stream_spark.queries import QUERIES
    from stream_spark.session import get_spark
    from stream_spark.sources import load_table

    spark = get_spark("stretch-probe")
    spark.sparkContext.setLogLevel("ERROR")

    report = {}
    if only is not None and os.path.exists("STRETCH_PROBE.json"):
        with open("STRETCH_PROBE.json") as f:
            report = json.load(f)

    vol_cache: dict = {}

    def volume(axis: str, sf_dir: str) -> int:
        key = (axis, sf_dir)
        if key not in vol_cache:
            kind, name = axis.split(":", 1)
            if kind == "table":
                vol_cache[key] = load_table(spark, sf_dir, name).count()
            elif kind == "volume":  # named non-query volume helpers (r8)
                # one definition for the axis, shared with scale_probe
                # (ADVICE r8: the two inline spellings could drift)
                from tools.probe_common import band_candidate_volume

                assert name == "band_candidates", name
                vol_cache[key] = band_candidate_volume(spark, sf_dir)
            else:
                vol_cache[key] = QUERIES[name](spark, sf_dir).count()
        return vol_cache[key]

    for name, axis in PROBE.items():
        if only is not None and name not in only:
            continue
        t1, n1 = _bestof2(spark, QUERIES[name], sf1_dir)
        t3, n3 = _bestof2(spark, QUERIES[name], sf3_dir)
        v1, v3 = volume(axis, sf1_dir), volume(axis, sf3_dir)
        wall_ratio = t3 / t1 if t1 > 0 else float("inf")
        vol_ratio = v3 / v1 if v1 > 0 else float("inf")
        ok = wall_ratio <= 2.0 * vol_ratio
        report[name] = {
            "sf1_sec": round(t1, 3),
            "sf3_sec": round(t3, 3),
            "wall_ratio": round(wall_ratio, 2),
            "volume_axis": axis,
            "sf1_volume": v1,
            "sf3_volume": v3,
            "volume_ratio": round(vol_ratio, 2),
            "sf1_rows": n1,
            "sf3_rows": n3,
            "linear_ok": ok,
        }
        flag = "" if ok else "  <-- SUPER-LINEAR vs its input volume"
        print(
            f"{name}: {t1:.2f}s -> {t3:.2f}s ({wall_ratio:.1f}x wall, "
            f"{vol_ratio:.1f}x volume){flag}",
            file=sys.stderr,
        )
        with open("STRETCH_PROBE.json", "w") as f:
            json.dump(report, f, indent=1)
    all_ok = all(v["linear_ok"] for v in report.values())
    print(json.dumps({"probe": "sf1->sf3", "queries": len(report), "all_linear": all_ok}))
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
