#!/usr/bin/env bash
# One command reproducing everything the per-round gate checks:
#   pytest suite -> full DuckDB oracle gate (sf0.01) -> plan audit -> bench.
# Artifacts land in .ci/: junit-style pytest output, oracle log, audit log,
# and the bench JSON line. Exit is non-zero if ANY stage fails.
#
# Every artifact is written to a .tmp and atomically renamed at stage end
# (r6's end-of-round snapshot committed a 2-line audit.log that tee was
# still writing — VERDICT r6 item 3). The oracle stage also emits the
# full-registry driver-format correctness JSON at the repo root
# (CORRECTNESS_full_r{N}.json, N = latest BENCH round + 1), so all ~250
# queries have committed per-query rows/schema/hash evidence, not just
# the driver's 50-query sample.
#
# Usage: tools/ci.sh [sf_dir]     (default /root/testdata/sf0.01 for the gate)
set -u
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT=.ci
mkdir -p "$OUT"
rc=0

# current round = newest driver bench artifact + 1 (BENCH_r{N} is written
# when round N closes, so during round N+1 the max is N)
N=$(ls BENCH_r*.json 2>/dev/null | sed 's/[^0-9]*//g; s/^0*//' | sort -n | tail -1)
ROUND=$(( ${N:-0} + 1 ))

echo "== pytest =="
python -m pytest tests/ -q >"$OUT/pytest.log.tmp" 2>&1
[ "$?" -eq 0 ] || rc=1
mv "$OUT/pytest.log.tmp" "$OUT/pytest.log"
tail -2 "$OUT/pytest.log"

echo "== oracle gate ($SF_DIR) =="
python tools/check_oracle.py "$SF_DIR" --json="CORRECTNESS_full_r${ROUND}.json" \
    >"$OUT/oracle.log.tmp" 2>"$OUT/oracle.stderr"
[ "$?" -eq 0 ] || rc=1
mv "$OUT/oracle.log.tmp" "$OUT/oracle.log"
tail -3 "$OUT/oracle.log"

echo "== plan audit =="
python tools/audit_plans.py >"$OUT/audit.log.tmp" 2>"$OUT/audit.stderr"
[ "$?" -eq 0 ] || rc=1
mv "$OUT/audit.log.tmp" "$OUT/audit.log"
grep -v '^clean' "$OUT/audit.log" | head

echo "== bench (sf0.1) =="
python bench.py >"$OUT/bench.json.tmp" 2>"$OUT/bench.stderr"
[ "$?" -eq 0 ] || rc=1
mv "$OUT/bench.json.tmp" "$OUT/bench.json"
cat "$OUT/bench.json"

echo "== ci exit: $rc =="
exit $rc
