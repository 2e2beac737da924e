#!/bin/bash
# Pending-TPU-measurement matrix (NOTES_NEXT_ROUND.md): run when the axon
# tunnel is up.  ONE TPU process at a time (two wedge the tunnel).
# Usage: bash tools/bench_matrix.sh
set -u
cd "$(dirname "$0")/.."

run() {
    echo "=== $* ==="
    env "$@" timeout 3600 python bench.py
    echo
}

# 1. clean default re-check (last good: 52.9 samples/s/chip)
run DEEPSENSE_BENCH_B=8 DEEPSENSE_BENCH_K=8

# 2. the pending A/B: B=16 no-remat + bf16 Adam mu (frees ~207 MB; r1 B=16
#    no-remat OOMed by 175 MB).  If it beats the default, flip engine/bench
#    defaults after a convergence smoke.
run DEEPSENSE_BENCH_B=16 DEEPSENSE_BENCH_K=8 DEEPSENSE_BENCH_MU_DTYPE=bfloat16

# 3. GPT TransFuser with the flash-attention kernel vs the einsum path
#    (r2 einsum number: 52.2 samples/s/chip at B=8 K=8)
run DEEPSENSE_BENCH_ARCH=gpt DEEPSENSE_BENCH_B=8 DEEPSENSE_BENCH_K=8
run DEEPSENSE_BENCH_ARCH=gpt DEEPSENSE_BENCH_FLASH=0 DEEPSENSE_BENCH_B=8 DEEPSENSE_BENCH_K=8

# 4. flash frees the 962^2 attention residuals -> retry a bigger GPT batch
run DEEPSENSE_BENCH_ARCH=gpt DEEPSENSE_BENCH_B=16 DEEPSENSE_BENCH_K=8

# 5. convergence smoke for the bf16-mu config (only needed if 2 wins)
timeout 3600 python tools/convergence_smoke.py --opt_mu_dtype bfloat16

# 6. convergence smoke through the flash kernel + in-kernel dropout
timeout 3600 python tools/convergence_smoke.py --arch gpt
