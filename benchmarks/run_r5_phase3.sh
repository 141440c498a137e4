#!/bin/bash
# Round-5 phase 3: the rows phase 2 didn't reach before the window closed
# (results_r5.log ends mid bgv_big setup).  Order = VERDICT r4 item-1
# priority: BGV big m=32003 + HEXL-analog m=32768 (never run in any round)
# -> per-op re-measure (decrypt moved on-device, r4 weak 8) -> fatboot tiny
# steady-state -> measured-mod-switch overhead.  thinboot m=35113 is
# launched separately so its budget can be sized from the remaining window.
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

# env(1) rather than a prefix assignment: `VAR=v run ...` does not reach
# the grandchild through the shell function in every bash mode (observed:
# the big gate silently off, the suite re-running tiny/small instead)
run bgv_big 7200 env HELIB_BENCH_BIG_ONLY=1 python benchmarks/bench_suite.py suite=bgv
run bgv_per_op     2700  python benchmarks/bench_suite.py suite=bgv
run fatboot_tiny   3600  python benchmarks/fatboot_bench.py tiny 2
run modswitch_ovh  1200  python benchmarks/modswitch_overhead.py 8009 380 20
echo "R5 PHASE3 DONE $(date -u)" | tee -a "$LOG"
