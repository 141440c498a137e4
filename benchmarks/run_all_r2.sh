#!/bin/bash
# Round-2 benchmark queue: measures every reference-workload analog on the
# real TPU, sequentially (one TPU client at a time), with per-step timeouts.
# Results land in benchmarks/results_r2.log (JSON lines + setup notes).
cd "$(dirname "$0")/.." || exit 1
LOG="${1:-benchmarks/results_r2.log}"
: > "$LOG"
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | grep -vE "WARNING:|E08|Loading XLA" | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "--- exit=$rc ---" | tee -a "$LOG"
}

run headline      600  python bench.py
run ntt           1200 python benchmarks/bench_suite.py suite=ntt
run bgv_small     1200 python benchmarks/bench_suite.py suite=bgv
run thinboot_tiny 2400 python benchmarks/thinboot_bench.py tiny 2
run ckks          3000 python benchmarks/bench_suite.py suite=ckks
run thinboot_small 4800 python benchmarks/thinboot_bench.py small 2
run bgv_big       4800 env HELIB_BENCH_BIG=1 python benchmarks/bench_suite.py suite=bgv
run scaling       1800 python benchmarks/scaling.py
run thinboot_big  6000 python benchmarks/thinboot_bench.py big 1
run fatboot_tiny  4800 python benchmarks/fatboot_bench.py tiny 1
echo "QUEUE DONE $(date -u)" | tee -a "$LOG"
