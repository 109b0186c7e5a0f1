"""One interleaved-A/B streaming-throughput sample for a checkout.

Usage: python tools/ab_stream.py <repo_root> [sf_dir]

Fresh session, then bench.py's own `_streaming_throughput` and
`_streaming_minhash_throughput` (same reps/levers as the recorded
tier-2 numbers) — one JSON line. Run alternately against checkouts for
the BASELINE.md drift-adjudication ledgers.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    root = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sys.path.insert(0, root)
    os.chdir(root)
    import bench

    from stream_spark.session import get_spark

    spark = get_spark("ab_stream")
    spark.sparkContext.setLogLevel("ERROR")
    rps = bench._streaming_throughput(spark, sf_dir)
    mh = bench._streaming_minhash_throughput(spark, sf_dir)
    print(
        json.dumps(
            {
                "root": os.path.basename(root.rstrip("/")) or root,
                "replay_rows_per_sec": rps,
                "minhash_docs_per_sec": mh,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
