"""Physical-plan audit: flags scale anti-patterns in every registered
query. Run: python tools/audit_plans.py [sf_dir]

Checks:
- CartesianProduct / BroadcastNestedLoopJoin on non-tiny inputs
  (intentional for the brute-force pair ops, flagged elsewhere)
- Exchange SinglePartition outside a final global aggregate / top-N
- BatchEvalPython (row-at-a-time Python UDF) anywhere
- parquet scans with no pushed filters AND no column pruning
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries where an all-pairs product is the documented algorithm
PAIRWISE_OK = {
    "dedup_embedding_cosine",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "events_asof_join_purchase_click",  # broadcast ts-recovery join
}


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan and name not in PAIRWISE_OK:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in PAIRWISE_OK:
        flags.append("BroadcastNestedLoopJoin")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time Python UDF")
    n_single = len(re.findall(r"Exchange SinglePartition", plan))
    # one SinglePartition is legal for a global agg / final top-N;
    # more than one means an operator pipeline collapses repeatedly
    if n_single > 1:
        flags.append(f"{n_single}x Exchange SinglePartition")
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from stream_spark.queries import QUERIES
    from stream_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    worst = 0
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            worst = 1
            continue
        flags = audit(name, plan)
        if flags:
            print(f"FLAG  {name}: {'; '.join(flags)}")
            worst = 1
        else:
            print(f"clean {name}")
    return worst


if __name__ == "__main__":
    raise SystemExit(main())
