#!/bin/bash
# Round-5 phase 2 (after thinboot_small): v2-kernel A/B first (short, gates
# the default-kernel decision), then the remaining VERDICT-priority rows.
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

run kernel_v2      2400  python benchmarks/kernel_v2_bench.py 1024 10
run headline_v2    1500  env HELIB_NTT_V2=1 python bench.py
HELIB_BENCH_BIG_ONLY=1 run bgv_big 9000 python benchmarks/bench_suite.py suite=bgv
run fatboot_tiny   5400  python benchmarks/fatboot_bench.py tiny 2
run thinboot_big   10800 python benchmarks/thinboot_bench.py big 1
run modswitch_ovh  1800  python benchmarks/modswitch_overhead.py 8009 380 20
# re-measure the tiny/small per-op rows in a quiet window: decrypt moved
# on-device since r4 (VERDICT item 4), and the r4 add/rotate numbers had
# an unexplained spread (weak 7) from host contention
run bgv_per_op     3600  python benchmarks/bench_suite.py suite=bgv
run fatboot_small  10800 python benchmarks/fatboot_bench.py small 1
echo "R5 PHASE2 DONE $(date -u)" | tee -a "$LOG"
