"""One interleaved-A/B sample: bench-regime timings for a query list.

Usage: python tools/ab_one.py <repo_root> <sf_dir> <query,query,...>

Fresh session, session-level warmup pass over the listed queries, then
per-query forced-GC min-of-2 construct+count — exactly bench.py's
`_time_query` regime — printed as one JSON line. Run alternately
against two checkouts for the BASELINE.md interleaved ledgers.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    root, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sys.path.insert(0, root)
    from stream_spark.queries import QUERIES
    from stream_spark.session import get_spark

    spark = get_spark("ab_one")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:  # session warmup pass (untimed)
        QUERIES[name](spark, sf_dir).count()
    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()
        best = None
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
    print(json.dumps({"root": os.path.basename(root.rstrip("/")) or root, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
