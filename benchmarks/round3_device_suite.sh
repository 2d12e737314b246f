#!/bin/bash
# Round-3 device measurement session — run the moment the tunneled TPU
# is reachable.  Sequential (the chip is single-tenant; concurrent jobs
# contaminate each other's timings).  Each stage is bounded and logged;
# a stage failure does not stop the rest.
#
# Usage: bash benchmarks/round3_device_suite.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/round3_bench}
mkdir -p "$OUT"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" | tee -a "$OUT/suite.log"
  timeout "$t" "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  echo "=== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/suite.log"
}

# 0. kernel + cross-backend parity FIRST — asserts the exp2 softmax and
#    W8A8-static kernels lower and agree on real hardware before the
#    long benches spend an hour on a broken kernel
run device_parity       3600 python -u benchmarks/check_device_parity.py
# 1. headline (also primes the XLA cache for the driver's scored run)
run bench_headline      3600 python -u bench.py
# 2. static-calibrated W8A8, SD1.5 (the VERDICT-#2 lever)
run w8a8_sd15_static    4800 python -u benchmarks/bench_w8a8.py --static --repeats 3
# 3. static W8A8, linears only (isolates conv relayout cost)
run w8a8_sd15_lin_only  4800 python -u benchmarks/bench_w8a8.py --static --no-convs --repeats 3
# 4. SDXL bf16 it/s (exp2 flash softmax since round-3 trace)
run sdxl_bf16           4800 python -u benchmarks/bench_extra_configs.py sdxl
# 5. SDXL static W8A8
run w8a8_sdxl_static    6000 python -u benchmarks/bench_w8a8.py --model sdxl --static --repeats 3
# 6. ControlNet
run controlnet          4800 python -u benchmarks/bench_extra_configs.py controlnet
# 7. SVD-XT one real measured clip (25f @ 576x1024, 25 steps)
run svd_xt_fullsize     7200 python -u benchmarks/bench_svd_xt_fullsize.py
echo "=== suite done $(date +%H:%M:%S)" | tee -a "$OUT/suite.log"
grep -h "metric\|vs_baseline" "$OUT"/*.json 2>/dev/null | tail -20
