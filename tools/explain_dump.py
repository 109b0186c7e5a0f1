"""Dump .explain('formatted') for named queries to files — the
plans/r11 before/after artifact generator.

Usage: python tools/explain_dump.py <out_dir> <suffix> <query,query,...>

Writes <out_dir>/<query>_<suffix>.txt for each query. Uses sf0.001 by
default (SPARK_GRAFT_SF_DIR to override) — plan SHAPE is what the
artifact pins; sizes re-plan under AQE at runtime anyway. Queries with
construction-time side effects (index writes) run those at dump time,
same as any construction.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    os.makedirs(out_dir, exist_ok=True)
    from stream_spark.queries import QUERIES
    from stream_spark.session import get_spark

    spark = get_spark("explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
