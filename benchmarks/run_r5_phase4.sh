#!/bin/bash
# Round-5 phase 4 — after the jitutil constant-lifting fix (8d55273):
# the m=32003 keygen program's compile payload went 2.17 GB -> 0.3 MB, so
# the bgv_big row that 413'd is rerun first, then the last flagship gap
# (thinboot m=35113), then the kernel A/B + quiet per-op re-measure.
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

# kernel A/B + headline decision BEFORE the open-ended thinboot_big so the
# default-kernel pick for the driver's bench.py is always made
run bgv_big      5400 env HELIB_BENCH_BIG_ONLY=1 python benchmarks/bench_suite.py suite=bgv
run kernel_aux   1800 python benchmarks/kernel_aux_bench.py 16 10
run headline_aux 1200 env HELIB_NTT_AUXSHARED=1 python bench.py
run headline     1200 python bench.py
run thinboot_big 7200 python benchmarks/thinboot_bench.py big 2
run bgv_per_op   2700 python benchmarks/bench_suite.py suite=bgv
echo "R5 PHASE4 DONE $(date -u)" | tee -a "$LOG"
