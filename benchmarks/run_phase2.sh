#!/bin/bash
# Phase-2 bench queue: warm-cache boot benches + the suites that failed to
# report in phase 1 (unbuffered so timeouts don't eat output).
cd "$(dirname "$0")/.." || exit 1
LOG="${1:-benchmarks/results_r2.log}"
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | grep -vE "WARNING:|E08|Loading XLA" | tee -a "$LOG"
  echo "--- done $name ---" | tee -a "$LOG"
}
run ntt2          1800 python -u benchmarks/bench_suite.py suite=ntt quick=1
run thinboot_tiny2 3600 python -u benchmarks/thinboot_bench.py tiny 2
run ckks2         2400 python -u benchmarks/bench_suite.py suite=ckks
run scaling       1200 python -u benchmarks/scaling.py
run thinboot_small2 6000 python -u benchmarks/thinboot_bench.py small 2
echo "PHASE2 DONE $(date -u)" | tee -a "$LOG"
