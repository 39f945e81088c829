#!/bin/bash
# Solo subset bench with artifact restore (the r7 gotcha): runs
# bench.py on the named queries, prints the JSON line, then restores
# BENCH_FULL.json and trims the appended BENCH_HISTORY.jsonl line so
# smoke runs never pollute the official artifacts.
# Usage: tools/solo_bench.sh [SF_DIR] QUERY [QUERY...]
set -u
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
shift
NLINES_BEFORE=$(wc -l < BENCH_HISTORY.jsonl)
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" python bench.py "$SF" "$@" 2>/dev/null
git checkout -- BENCH_FULL.json
NLINES_AFTER=$(wc -l < BENCH_HISTORY.jsonl)
if [ "$NLINES_AFTER" -gt "$NLINES_BEFORE" ]; then
  head -n "$NLINES_BEFORE" BENCH_HISTORY.jsonl > /tmp/bh_trim.jsonl
  mv /tmp/bh_trim.jsonl BENCH_HISTORY.jsonl
fi
