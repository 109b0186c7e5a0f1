"""Physical-plan audit: flags scale anti-patterns in every registered
query. Run: python tools/audit_plans.py [sf_dir]

Checks:
- CartesianProduct / BroadcastNestedLoopJoin on non-tiny inputs
  (intentional for the brute-force pair ops, flagged elsewhere)
- Exchange SinglePartition outside a final global aggregate / top-N
- BatchEvalPython (row-at-a-time Python UDF) anywhere
- parquet scans with no pushed filters AND no column pruning

Frozen-plan regression gate (r6, VERDICT item 3): the same pass diffs
each query's NORMALIZED executedPlan (expr/plan/codegen ids, hex, temp
paths masked) against the committed snapshot in ``PLANS/``. Any
unacknowledged plan-shape change fails CI; acknowledge a deliberate
change by re-running with ``--update-plans`` and committing the diff.
The r4→r5 and r3→r4 bench-drift adjudications were done by hand with
exactly this normalization — now every future bench delta is
attributable in minutes (plan changed vs machine band).

Single-machine assumption: normalize_plan deliberately does NOT mask
the numeric partition count in Exchange hashpartitioning/
rangepartitioning nodes — with data-driven exchange sizing
(operators.rownum.sized_partitions / cpu_partitions) those counts are
a function of input bytes and defaultParallelism, so the committed
PLANS/ snapshots are specific to this host (32 cores, the driver's
testdata layout). A partition-count change on the SAME host is a real
plan regression worth flagging; a cross-machine run would need those
numerals masked the way expression ids are.
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
    "ann_recall_pq_paths",
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
    # 1-row BM25 corpus-stats aggregate (n_docs, total_toks) broadcast
    # onto the term-filtered tf table; hybrid additionally broadcasts
    # the 1-row dense query vector. Previously hidden behind the
    # rownum fallback's localCheckpoint; the r11 TakeOrderedAndProject
    # top-k exposes the full lineage to the audit.
    "documents_bm25_search",
    "documents_hybrid_search",
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
    # so this is a hard zero across the registry. r6: the check walks
    # the Window operator's whole indented subtree (any number of
    # intermediate Project/Sort lines), not a fixed 0-1 line lookahead.
    if _single_partition_under_window(plan):
        flags.append("global-ordered WindowExec (Exchange SinglePartition under Window)")
    return flags


def _plan_depth(line: str) -> int | None:
    """Column of the ``+-``/``:-`` branch marker, or None for a
    marker-less line (the plan root / header text)."""
    m = re.search(r"[+:]- ", line)
    return m.start() if m else None


def _single_partition_under_window(plan: str) -> bool:
    """True iff an ``Exchange SinglePartition`` appears anywhere INSIDE
    a Window operator's subtree. Indent-aware: children print with a
    strictly deeper branch marker, so the subtree is the maximal run of
    deeper-marked lines following the Window line — a fixed-lookahead
    regex misses Window -> Project -> Sort -> Exchange chains."""
    lines = plan.split("\n")
    for i, line in enumerate(lines):
        if not re.search(r"\bWindow\b|\bWindowGroupLimit\b", line):
            continue
        d = _plan_depth(line)
        if d is None:
            d = -1  # Window at the plan root: everything below is its subtree
        for j in range(i + 1, len(lines)):
            dj = _plan_depth(lines[j])
            if dj is None or dj <= d:
                break
            if "Exchange SinglePartition" in lines[j]:
                return True
    return False


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


def normalize_plan(plan: str) -> str:
    """Mask everything that varies run-to-run while preserving the plan
    SHAPE (operators, join strategies, exchanges, pushed filters,
    read schemas): expression ids, plan/stage ids, codegen spans,
    uuid/hex fragments, temp paths, statistics annotations. Two runs of
    the same code on the same data must produce byte-identical output —
    that's what makes the PLANS/ snapshot a usable regression artifact."""
    p = plan
    p = re.sub(r"#\d+", "#N", p)
    # HOF lambda variables are numbered by a session-GLOBAL counter
    # (lambda x_3906), so the same plan built later in a session (or
    # after a registry addition) renames every lambda var — mask the
    # counter, keep the var letter
    p = re.sub(r"lambda ([A-Za-z]+)_\d+", r"lambda \1_N", p)
    p = re.sub(r"plan_id=\d+", "plan_id=N", p)
    p = re.sub(r"\*\(\d+\)", "*(N)", p)
    p = re.sub(r"Statistics\([^)]*\)", "Statistics(MASKED)", p)
    # temp/scratch locations (uuid-suffixed dirs, /tmp, RAM-fs)
    p = re.sub(r"(/tmp|/dev/shm|\S*\.scratch|\S*spark-warehouse)[^\s,\]\)]*", "TMPPATH", p)
    # long hex runs (uuids, checkpoint ids, shuffle ids in file names).
    # require at least one a-f so big DECIMAL literals (window millis,
    # integer scales) stay visible — those are plan semantics.
    p = re.sub(r"\b(?=[0-9a-f]*[a-f])[0-9a-f]{8,}\b", "HEX", p)
    # truncated operator lists print "... N more fields" with N stable,
    # but InMemoryFileIndex previews N of M paths where M varies with
    # writer parallelism on staged inputs — mask the counts
    p = re.sub(r"\d+ paths", "N paths", p)
    # pid-suffixed staging table names (bucketed-index lifecycle tables
    # are saveAsTable'd per-pid so concurrent oracle shards don't
    # collide — the same isolation rule as the per-pid staging dirs)
    p = re.sub(r"(b_idx_\w+?)_\d+\b", r"\1_PID", p)
    # FileScan truncates the DataFilters string at a fixed CHAR budget
    # BEFORE our id masking runs, so sessions whose raw expression ids
    # have different widths truncate at different visible points (r10:
    # three snapshots flapped on `lower(` vs `lowe(` tails — the same
    # cross-session-flake class as the q21 gid order). DataFilters is
    # redundant with the Filter node (printed in full) + PushedFilters,
    # so mask the whole list rather than chase the cut point.
    # rownum boundary-layout bucket literals: approx-quantile
    # boundaries are merge-order-dependent run to run — they move
    # bucket edges, never results (pinned by
    # test_partition_independence) — so mask every numeric token on
    # those lines. Two markers: the `AS _pid#` projection line (the
    # binary-search CASE spelling, m <= 128) and the lambda var `_rnb`
    # (the two-level block-search spelling past 128 boundaries, plus
    # the `_rnb_off` offsets alias), including the n_parts-derived
    # block constants.
    p = "\n".join(
        re.sub(r"-?\d+(\.\d+)?([eE][+-]?\d+)?", "NUM", ln)
        if ("_rnb" in ln or "AS _pid#" in ln)
        else ln
        for ln in p.split("\n")
    )
    # fall back to end-of-line when the char budget cut the string
    # BEFORE the `, Format:` token — otherwise the flaky tail survives
    p = re.sub(
        r"DataFilters: \[[^\n]*?(?=, Format:|$)",
        "DataFilters: [MASKED]",
        p,
        flags=re.MULTILINE,
    )
    return p


def plans_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS")


def check_frozen(built: dict[str, str], update: bool, errored: set[str] | None = None) -> int:
    """Diff built normalized plans against PLANS/ snapshots (or rewrite
    them with --update-plans). Returns 0 when clean/updated.

    ``errored``: queries that failed to BUILD this run — their absence
    from ``built`` is transient, so --update-plans must neither delete
    their (good) frozen snapshot nor report it stale (the run still
    exits non-zero via the ERROR flag)."""
    errored = errored or set()
    d = plans_dir()
    if update:
        os.makedirs(d, exist_ok=True)
        for f in os.listdir(d):
            if f.endswith(".txt") and f[:-4] not in built and f[:-4] not in errored:
                os.remove(os.path.join(d, f))
                print(f"PLANS removed stale {f}")
        for name, plan in built.items():
            with open(os.path.join(d, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        print(f"PLANS updated: {len(built)} snapshots in PLANS/")
        return 0
    if not os.path.isdir(d):
        print("PLANS/ missing — run with --update-plans to create the baseline")
        return 1
    rc = 0
    frozen = {f[:-4] for f in os.listdir(d) if f.endswith(".txt")}
    for name in sorted(frozen - set(built) - errored):
        print(f"PLANDIFF {name}: snapshot exists but query not in registry (stale)")
        rc = 1
    for name, plan in built.items():
        path = os.path.join(d, f"{name}.txt")
        if not os.path.exists(path):
            print(f"PLANDIFF {name}: NEW query, no snapshot — acknowledge with --update-plans")
            rc = 1
            continue
        with open(path) as fh:
            want = fh.read()
        if want != plan:
            import difflib

            diff = list(
                difflib.unified_diff(
                    want.splitlines(), plan.splitlines(), "frozen", "built", lineterm="", n=1
                )
            )
            print(f"PLANDIFF {name}: plan shape changed ({len(diff)} diff lines)")
            for line in diff[:12]:
                print(f"    {line}")
            rc = 1
    return rc


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    update = "--update-plans" in sys.argv
    skip_frozen = "--no-frozen" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    from stream_spark.queries import QUERIES
    from stream_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    worst = 0
    pkg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "stream_spark")
    for flag in audit_broadcast_hints(pkg):
        print(f"FLAG  {flag}")
        worst = 1
    built: dict[str, str] = {}
    errored: set[str] = set()
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            worst = 1
            errored.add(name)
            continue
        built[name] = normalize_plan(plan)
        flags = audit(name, plan)
        if flags:
            print(f"FLAG  {name}: {'; '.join(flags)}")
            worst = 1
        else:
            print(f"clean {name}")
    if not skip_frozen:
        worst = max(worst, check_frozen(built, update, errored))
    return worst


if __name__ == "__main__":
    raise SystemExit(main())
