#!/bin/bash
# Round-4 final queue: the rows still missing from results_r4.log, in
# judge-priority order (VERDICT r3 "Next round" item 1/3).  Each step is
# under its own timeout so a stall can't eat the whole window.
cd "$(dirname "$0")/.." || exit 1
LOG="benchmarks/results_r4.log"
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | stdbuf -oL grep -vE "WARNING:|E08|Loading XLA" | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "--- exit=$rc ---" | tee -a "$LOG"
}
run thinboot_small 2100 python benchmarks/thinboot_bench.py small 2
run bgv_big        1800 env HELIB_BENCH_BIG_ONLY=1 python benchmarks/bench_suite.py suite=bgv
run thinboot_big   3600 python benchmarks/thinboot_bench.py big 1
run fatboot_small  3600 python benchmarks/fatboot_bench.py small 1
echo "QUEUE DONE $(date -u)" | tee -a "$LOG"
