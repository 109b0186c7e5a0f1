#!/bin/bash
# Interleaved A/B ledger: N rounds of tools/ab_one.py across the given
# checkout roots (alternating per round so regime drift hits all arms).
# Usage: tools/ab_interleave.sh <sf_dir> <queries> <rounds> <root1> [root2 ...]
set -u
SF_DIR="$1"; QUERIES="$2"; ROUNDS="$3"; shift 3
for ((i=1; i<=ROUNDS; i++)); do
  for ROOT in "$@"; do
    LOAD=$(cut -d' ' -f1 /proc/loadavg)
    OUT=$(cd "$ROOT" && python /root/repo/tools/ab_one.py "$ROOT" "$SF_DIR" "$QUERIES" 2>/dev/null)
    echo "{\"round\": $i, \"load\": $LOAD, $(echo "$OUT" | sed 's/^{//')"
  done
done
