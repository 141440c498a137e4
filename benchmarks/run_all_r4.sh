#!/bin/bash
# Round-4 benchmark queue: every reference-workload analog on the real TPU,
# sequentially (ONE TPU client at a time — concurrent clients have crashed
# the remote-compile tunnel), per-step timeouts, results to
# benchmarks/results_r4.log (JSON lines + setup notes).
#
# Reference workloads covered (VERDICT r3 Missing 1):
#   bgv        -> bgv_basic.cpp:167-269 tiny/small (mult,add,rotate,enc,dec,IO)
#   bgv_big    -> bgv_basic.cpp:236-246 big m=32003 + HEXL-analog m=32768
#   ckks       -> ckks_basic.cpp:239-263 m=1024/16384/65536
#   ntt        -> fft_bench.cpp:55-81
#   thinboot_* -> bgv_thinboot.cpp:104-145 tiny m=1271 / small m=31775 /
#                 big m=35113
#   fatboot_*  -> bgv_fatboot.cpp:105-145 tiny / small
cd "$(dirname "$0")/.." || exit 1
LOG="${1:-benchmarks/results_r4.log}"
: > "$LOG"
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | grep -vE "WARNING:|E08|Loading XLA" | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "--- exit=$rc ---" | tee -a "$LOG"
}

run headline       900  python bench.py
run ntt            1200 python benchmarks/bench_suite.py suite=ntt
run bgv            2400 python benchmarks/bench_suite.py suite=bgv
run ckks_quick     1200 python benchmarks/bench_suite.py suite=ckks quick=1
run ckks           3600 python benchmarks/bench_suite.py suite=ckks
run thinboot_tiny  2400 python benchmarks/thinboot_bench.py tiny 2
run fatboot_tiny   4800 python benchmarks/fatboot_bench.py tiny 1
run thinboot_small 9000 python benchmarks/thinboot_bench.py small 2
run bgv_big        7200 env HELIB_BENCH_BIG=1 python benchmarks/bench_suite.py suite=bgv
run thinboot_big   10800 python benchmarks/thinboot_bench.py big 1
run fatboot_small  10800 python benchmarks/fatboot_bench.py small 1
echo "QUEUE DONE $(date -u)" | tee -a "$LOG"
