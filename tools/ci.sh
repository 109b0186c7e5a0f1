#!/usr/bin/env bash
# One command reproducing everything the per-round gate checks:
#   pytest suite -> full DuckDB oracle gate (sf0.01) -> plan audit -> bench.
# Artifacts land in .ci/: junit-style pytest output, oracle log, audit log,
# and the bench JSON line. Exit is non-zero if ANY stage fails.
#
# Usage: tools/ci.sh [sf_dir]     (default /root/testdata/sf0.01 for the gate)
set -u
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT=.ci
mkdir -p "$OUT"
rc=0

echo "== pytest =="
python -m pytest tests/ -q 2>&1 | tee "$OUT/pytest.log" | tail -2
[ "${PIPESTATUS[0]}" -eq 0 ] || rc=1

echo "== oracle gate ($SF_DIR) =="
python tools/check_oracle.py "$SF_DIR" 2>"$OUT/oracle.stderr" | tee "$OUT/oracle.log" | tail -3
[ "${PIPESTATUS[0]}" -eq 0 ] || rc=1

echo "== plan audit =="
python tools/audit_plans.py 2>"$OUT/audit.stderr" | tee "$OUT/audit.log" | grep -v '^clean' | head
[ "${PIPESTATUS[0]}" -eq 0 ] || rc=1

echo "== bench (sf0.1) =="
python bench.py 2>"$OUT/bench.stderr" | tee "$OUT/bench.json"
[ "${PIPESTATUS[0]}" -eq 0 ] || rc=1

echo "== ci exit: $rc =="
exit $rc
