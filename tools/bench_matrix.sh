#!/bin/bash
# TPU measurement matrix: run when the axon tunnel is up.
# ONE TPU process at a time (two wedge the tunnel).
# Usage: bash tools/bench_matrix.sh
#
# Measured results (NOTES_NEXT_ROUND.md):
#   r2  Mamba B=8 K=8:               52.8-52.9 samples/s/chip
#   r3  Mamba B=16 K=8 GA=2 (default): 53.705 (plain B=16 OOMs; GA fits)
#   r2  GPT flash B=16 K=8 (default): 90.9 -> 96.1 (hw dropout) -> 100.9
#       (single-pass bwd); r3 re-run 101.1, MFU 0.238
#   r3  GPT 30to5 B=8 K=8:           42.944, MFU 0.202
#   r3  merge_lidar_radar GPT:       91.0 (LOSES 10% -> off by default)
#   r3  padded_token_stream mamba B=8: 52.6 (neutral -> off by default)
#   r3  engine e2e GPT (uint8 cache): 16.72 = 97% of the tunnel's
#       transfer bound; loader 1261/s on one core
#   r3  conv autotune flags:         STRUCTURALLY BLOCKED (client-side
#       XLA_FLAGS rejects --xla_tpu_*; LIBTPU_INIT_ARGS never reaches the
#       remote libtpu across the tunnel)
#   convergence smokes:              PASS (bf16-mu and gpt+flash)
set -u
cd "$(dirname "$0")/.."

run() {
    echo "=== $* ==="
    env "$@" timeout 3600 python bench.py
    echo
}

# 1. the two defaults (regression re-check)
run DEEPSENSE_BENCH_ARCH=mamba
run DEEPSENSE_BENCH_ARCH=gpt

# 2. the 30to5 variant (1922 tokens, GRU decoder)
run DEEPSENSE_BENCH_30TO5=1 DEEPSENSE_BENCH_ARCH=gpt DEEPSENSE_BENCH_B=8

# 3. engine end-to-end (cache -> loader -> prefetch -> h2d -> step)
timeout 5400 python tools/bench_engine.py

# 4. flash vs einsum A/B on the GPT path
run DEEPSENSE_BENCH_ARCH=gpt DEEPSENSE_BENCH_FLASH=0 DEEPSENSE_BENCH_B=8

# 5. convergence smoke through the flash kernel + in-kernel dropout
timeout 3600 python tools/convergence_smoke.py --arch gpt

# 6. serving latency/throughput (framework-only capability; no reference analog)
timeout 3600 python tools/bench_serve.py --arch gpt

# 7. per-op breakdowns of both defaults
timeout 3600 python tools/profile_step.py
DEEPSENSE_BENCH_ARCH=mamba timeout 3600 python tools/profile_step.py
