#!/bin/bash
# TPU measurement matrix: run when the axon tunnel is up.
# ONE TPU process at a time (two wedge the tunnel).
# Usage: bash tools/bench_matrix.sh
#
# Measured r2 results (NOTES_NEXT_ROUND.md):
#   Mamba B=8 K=8 (default):        52.8-52.9 samples/s/chip
#   Mamba B=16 (any K, bf16-mu):    OOM (by 20 MB at K=1)
#   GPT flash B=8 K=8:              86.9   (einsum path: 52.4)
#   GPT flash B=16 K=8 (default):   90.9
#   convergence smokes:             PASS (bf16-mu and gpt+flash)
set -u
cd "$(dirname "$0")/.."

run() {
    echo "=== $* ==="
    env "$@" timeout 3600 python bench.py
    echo
}

# 1. the two defaults (regression re-check)
run DEEPSENSE_BENCH_B=8 DEEPSENSE_BENCH_K=8
run DEEPSENSE_BENCH_ARCH=gpt DEEPSENSE_BENCH_K=8

# 2. flash vs einsum A/B on the GPT path
run DEEPSENSE_BENCH_ARCH=gpt DEEPSENSE_BENCH_FLASH=0 DEEPSENSE_BENCH_B=8 DEEPSENSE_BENCH_K=8

# 3. convergence smoke through the flash kernel + in-kernel dropout
timeout 3600 python tools/convergence_smoke.py --arch gpt

# 4. serving latency/throughput (framework-only capability; no reference analog)
timeout 3600 python tools/bench_serve.py --arch gpt
