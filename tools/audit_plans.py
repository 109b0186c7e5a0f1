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

#: queries where an all-pairs product is the documented algorithm.
#: ann_topk_bruteforce / ann_range_search are broadcasts of a
#: CONTRACT-BOUNDED query set over the corpus scan — the product is
#: the spec, not an accident.
PAIRWISE_OK = {
    "ann_topk_bruteforce",
    "ann_range_search",
    # broadcast of the contract-bounded query set over one corpus
    # scan with a label-inequality filter — same spec as bruteforce.
    "embeddings_hard_negatives",
    # recall measurement: the exact ground-truth side IS bruteforce on
    # the contract-bounded query sample (the one sanctioned exact scan).
    "ann_recall_at_k",
}

#: queries realizing an ANSI scalar subquery as a 1-row aggregate
#: broadcast-cross-joined onto the main plan (the DataFrame-API
#: equivalent of Catalyst's ScalarSubquery). The broadcast side is one
#: row BY CONSTRUCTION (a global aggregate), so the nested-loop join is
#: a constant-fold, not a pair blowup.
SCALAR_SUBQUERY_OK = {
    "tpch_q22_idle_balances",
    "tpch_q15_top_supplier",
    "tpch_q11_important_stock",
    "events_value_histogram",
    # bounded-grid joins: fixed-V vocabulary × source dimension for
    # zero-filled cells, plus a 1-row total-tokens scalar — both sides
    # bounded by construction (LIMIT / global aggregate), so the
    # nested loop is a constant-size fan-out, not a pair blowup.
    "corpus_token_drift",
    # each BPE merge rule is a 1-row top-1 aggregate broadcast back
    # onto the corpus for the application fold — a scalar subquery
    # per round by construction.
    "corpus_bpe_merges",
    "corpus_bpe_encode",
    # 1-row global scored-doc count broadcast for the tercile formula
    # floor((rn-1)*3/n) — scalar by construction.
    "documents_lm_quality_buckets",
    # 1-row fused T/R bigram totals + 1-row ranked-doc count, both
    # global aggregates broadcast by construction (DSIR weights).
    "documents_dsir_selection",
    # test-token fan-out over the ≤|classes|-row checkpointed class
    # table (one row per label by construction) — a bounded-dimension
    # nested loop, not a pair blowup.
    "documents_langid_classifier",
    # 1-row global max-timestamp anchor broadcast onto the scan —
    # scalar by construction.
    "events_decay_sample",
}


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan and name not in PAIRWISE_OK:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in PAIRWISE_OK | SCALAR_SUBQUERY_OK:
        flags.append("BroadcastNestedLoopJoin")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time Python UDF")
    n_single = len(re.findall(r"Exchange SinglePartition", plan))
    # one SinglePartition is legal for a global agg / final top-N;
    # more than one means an operator pipeline collapses repeatedly
    if n_single > 1:
        flags.append(f"{n_single}x Exchange SinglePartition")
    # a single-partition exchange FEEDING a WindowExec is the anti-scale
    # global-ordered-window pattern (all rows through one task) — never
    # legal, even once: global aggregates/top-N emit bounded rows, a
    # window emits every input row. r5: the last sanctioned use
    # (orders_daily_moving_avg) now runs the two-pass rownum primitive,
    # so this is a hard zero across the registry.
    if re.search(r"Window .*\n(?:[^\n]*\n)?\s*[+:]- Exchange SinglePartition", plan):
        flags.append("global-ordered WindowExec (Exchange SinglePartition under Window)")
    return flags


def audit_broadcast_hints(pkg_root: str) -> list[str]:
    """Source lint: every explicit ``F.broadcast(...)`` hint must carry
    a ``# broadcast-ok: <reason>`` marker on its line (or the line
    above) stating why the broadcast side is BOUNDED — a fixed-size
    dimension (region/nation), driver metadata, or a contract-bounded
    query set. Broadcasting a per-document / per-event / SF-scaled
    table is O(corpus): it works at test SF and OOMs the driver at
    100 TB, so unannotated hints are flagged. (AQE may still choose a
    broadcast join at runtime after measuring — that needs no hint.)
    """
    flags = []
    for dirpath, _dirs, files in os.walk(pkg_root):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            with open(path) as fh:
                lines = fh.readlines()
            for i, line in enumerate(lines):
                if "F.broadcast(" not in line:
                    continue
                prev = lines[i - 1] if i else ""
                if "broadcast-ok:" not in line and "broadcast-ok:" not in prev:
                    rel = os.path.relpath(path, os.path.dirname(pkg_root))
                    flags.append(f"{rel}:{i + 1}: unannotated F.broadcast hint")
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from stream_spark.queries import QUERIES
    from stream_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    worst = 0
    pkg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "stream_spark")
    for flag in audit_broadcast_hints(pkg):
        print(f"FLAG  {flag}")
        worst = 1
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
