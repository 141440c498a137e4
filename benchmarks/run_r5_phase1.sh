#!/bin/bash
# Round-5 queue, phase 1: rows that need no new code, with warm-cache
# economics (the 16 GB persistent compile cache from rounds 3/4 makes the
# big-ring recompiles cheap; reps=2 separates any residual first-run
# compile from the steady-state number, which is what the reference's
# google-benchmark loop reports).
#
# VERDICT r4 item 1 anchors: bgv_thinboot.cpp:104-145, bgv_fatboot.cpp:105-145.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG="benchmarks/results_r5.log"
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | stdbuf -oL grep -vE "WARNING:|E08|Loading XLA" | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "--- exit=$rc ---" | tee -a "$LOG"
}

run headline       1200  python bench.py
run fatboot_tiny   7200  python benchmarks/fatboot_bench.py tiny 2
run thinboot_small 10800 python benchmarks/thinboot_bench.py small 2
echo "PHASE1 DONE $(date -u)" | tee -a "$LOG"
