"""Interleaved sf1 samples for band adjudication (VERDICT r8 item 3).

The r8 sf1 pin is a single idle-machine sample; before trusting a ±N×
band, flagged queries need repeated SAME-REGIME measurements. This
tool takes N interleaved rounds over the flagged set in ONE warm
session (full warmup pass first, then round-robin A/B/C/... so slow
session drift hits every query equally — the interleaved methodology
BASELINE.md's r5/r7 adjudications established), printing per-query
sample lists + min/median so the band note in BASELINE.md is
mechanical to write.

Usage: python tools/sf1_band_sampler.py [query ...] [--rounds=N]
Default queries: the r8-flagged sf1 entries + the r9 additions.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    # r10 watch list: the sf1-tier entries whose construct+count pins
    # are newest (BASELINE r10) — sample these first when adjudicating
    "embeddings_knn_graph",
    "embeddings_label_propagation",
    "training_data_prep",
    "pipeline_multimodal_curation",
    "dedup_keep_best_quality_banded",  # 11.4 s at r10 close — largest sf1 entry after the capstone
    "dedup_clusters_banded",
]


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or DEFAULT
    rounds = 3
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.scratch/sf1")
    from stream_spark.queries import QUERIES
    from stream_spark.session import get_spark

    spark = get_spark("sf1-band-sampler")
    spark.sparkContext.setLogLevel("ERROR")

    # session warmup pass (same discipline as bench.py)
    for n in names:
        QUERIES[n](spark, sf1_dir).count()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for r in range(rounds):
        for n in names:  # interleaved: session drift hits all equally
            QUERIES[n](spark, sf1_dir).count()  # per-measurement warm pass
            spark.sparkContext._jvm.System.gc()
            # construct+count in ONE timed window (r10, matches
            # bench._time_query): eager index materialization would
            # otherwise fall outside the measurement
            t0 = time.time()
            QUERIES[n](spark, sf1_dir).count()
            samples[n].append(round(time.time() - t0, 3))
        print(f"# round {r + 1}/{rounds} done", file=sys.stderr)

    out = {
        n: {
            "samples": v,
            "min": min(v),
            "median": round(statistics.median(v), 3),
            "max": max(v),
        }
        for n, v in samples.items()
    }
    print(json.dumps({"sf1_dir": sf1_dir, "rounds": rounds, "queries": out}, indent=1))


if __name__ == "__main__":
    main()
