"""Stage-cost profile of pipeline_multimodal_curation (VERDICT r11
item 7): run the declarative pipeline truncated after each stage and
time construct+count for every prefix — the increment between prefixes
is that stage's cost in composition (bench regime: warm session,
forced-GC min-of-2).

Usage: python tools/profile_mm.py <sf_dir> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = [
    {"type": "quality_gate", "settings": {"column": "text", "minWords": 20}},
    {"type": "media_hash", "settings": {"modality": "image", "id": "doc_id"}},
    {"type": "dedup_by", "settings": {"column": "image_hash", "id": "doc_id"}},
    {"type": "media_hash", "settings": {"modality": "audio", "id": "doc_id"}},
    {"type": "dedup_by", "settings": {"column": "audio_hash", "id": "doc_id"}},
    {"type": "near_dedup", "settings": {"column": "text", "id": "doc_id", "threshold": 0.8}},
    {"type": "pack", "settings": {"column": "text", "id": "doc_id", "budget": 1024}},
]


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from stream_spark.pipeline import Pipeline
    from stream_spark.session import get_spark

    spark = get_spark("profile_mm")
    spark.sparkContext.setLogLevel("ERROR")

    def run_prefix(k: int) -> float:
        pipe = Pipeline.from_dict(
            {"name": f"mm_prefix_{k}", "source": {"table": "documents"}, "stages": STAGES[:k]}
        )
        pipe.run(spark, sf_dir).count()  # warm
        best = None
        for _ in range(reps):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            pipe.run(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    out: dict[str, float] = {}
    prev = 0.0
    for k in range(1, len(STAGES) + 1):
        t = run_prefix(k)
        name = f"{k}:{STAGES[k-1]['type']}"
        out[name] = t
        print(f"# prefix {name}: {t}s (increment {round(t - prev, 3)}s)", file=sys.stderr)
        prev = t
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
