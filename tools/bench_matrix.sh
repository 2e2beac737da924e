#!/bin/bash
# TPU measurement matrix: run when the axon tunnel is up.
# ONE TPU process at a time (two wedge the tunnel).
# Usage: bash tools/bench_matrix.sh
#
# Measured r2 results (NOTES_NEXT_ROUND.md):
#   Mamba B=8 K=8 (default):        52.8-52.9 samples/s/chip
#   Mamba B=16 (any K, bf16-mu):    OOM (by 20 MB at K=1)
#   GPT flash B=8 K=8:              86.9   (einsum path: 52.4)
#   GPT flash B=16 K=8 (default):   90.9 -> 96.1 (hw dropout) -> 100.9
#                                   (single-pass bwd); MFU 0.236
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

# 2. r3: grouped lidar+radar backbone A/B (config.merge_lidar_radar)
run DEEPSENSE_BENCH_ARCH=gpt DEEPSENSE_BENCH_K=8 DEEPSENSE_BENCH_MERGE_LR=1

# 3. r3: Mamba B=16 via 2 grad-accum microbatches (fits where plain B=16
#    OOMs; the update is exactly the full-batch gradient)
run DEEPSENSE_BENCH_B=16 DEEPSENSE_BENCH_K=8 DEEPSENSE_BENCH_GRAD_ACCUM=2

# 4. r3: mamba 1024-padded token stream (config.padded_token_stream)
run DEEPSENSE_BENCH_B=8 DEEPSENSE_BENCH_K=8 DEEPSENSE_BENCH_PADDED=1

# 5. r3: engine end-to-end (cache -> loader -> prefetch -> h2d -> step)
timeout 5400 python tools/bench_engine.py
DEEPSENSE_BENCH_LOADER=classic timeout 5400 python tools/bench_engine.py

# 6. flash vs einsum A/B on the GPT path
run DEEPSENSE_BENCH_ARCH=gpt DEEPSENSE_BENCH_FLASH=0 DEEPSENSE_BENCH_B=8 DEEPSENSE_BENCH_K=8

# 7. convergence smoke through the flash kernel + in-kernel dropout
timeout 3600 python tools/convergence_smoke.py --arch gpt

# 8. serving latency/throughput (framework-only capability; no reference analog)
timeout 3600 python tools/bench_serve.py --arch gpt
