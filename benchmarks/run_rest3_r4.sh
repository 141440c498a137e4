#!/bin/bash
cd "$(dirname "$0")/.." || exit 1
LOG="benchmarks/results_r4.log"
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | stdbuf -oL grep -vE "WARNING:|E08|Loading XLA" | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "--- exit=$rc ---" | tee -a "$LOG"
}
run ckks           5400 python benchmarks/bench_suite.py suite=ckks
run thinboot_tiny  2400 python benchmarks/thinboot_bench.py tiny 2
run fatboot_tiny   4800 python benchmarks/fatboot_bench.py tiny 1
run thinboot_small 9000 python benchmarks/thinboot_bench.py small 2
run bgv_big        7200 env HELIB_BENCH_BIG=1 python benchmarks/bench_suite.py suite=bgv
run thinboot_big   10800 python benchmarks/thinboot_bench.py big 1
run fatboot_small  10800 python benchmarks/fatboot_bench.py small 1
echo "QUEUE DONE $(date -u)" | tee -a "$LOG"
