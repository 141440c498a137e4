#!/bin/bash
# Round-5 master queue (VERDICT r4 item 1: warm-cache-then-measure, budgets
# sized from measured setup times; RESULT lines land incrementally so a
# closed window still banks every finished row).
#
# Order: cheap/certain rows first (headline, CKKS per-op), then the
# three-rounds-overdue big rows in decreasing value density:
#   thinboot m=31775 un-instrumented -> BGV big m=32003 + HEXL m=32768 ->
#   fatboot tiny steady-state -> thinboot m=35113 -> fatboot m=31775.
# Reference anchors: bgv_thinboot.cpp:104-145, bgv_fatboot.cpp:105-145,
# bgv_basic.cpp:236-246, ckks_basic.cpp:38-233.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG="benchmarks/results_r5.log"
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | stdbuf -oL grep -vE "WARNING:|E08|Loading XLA" | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "--- exit=$rc ($(date -u +%H:%M:%S)) ---" | tee -a "$LOG"
}

run headline        900   python bench.py
run ckks_ops        6000  python benchmarks/bench_suite.py suite=ckks_ops
run thinboot_small  10800 python benchmarks/thinboot_bench.py small 2
HELIB_BENCH_BIG_ONLY=1 run bgv_big 9000 python benchmarks/bench_suite.py suite=bgv
run fatboot_tiny    5400  python benchmarks/fatboot_bench.py tiny 2
run thinboot_big    10800 python benchmarks/thinboot_bench.py big 1
run fatboot_small   10800 python benchmarks/fatboot_bench.py small 1
echo "R5 QUEUE DONE $(date -u)" | tee -a "$LOG"
