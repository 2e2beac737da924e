"""Benchmark: fused 4-modal samples/sec/chip on the flagship train step
(forward + backward + AdamW + EMA, batch sharded over all local devices).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Default arch is the GPT TransFuser — the model2_seq challenge winner
(DBA 0.6671) and the BASELINE.json north-star model — with the Pallas
flash-attention fusion stack.  DEEPSENSE_BENCH_ARCH=mamba benches the
MambaFuser fork instead.

Baselines are each arch's own best reference recipe (README_mine.md;
BASELINE.md "Throughput / cost"), so vs_baseline is apples-to-apples:
- GPT TransFuser retrain: 8 min/epoch, batch 24, 2392 (batch-6)
  batches/epoch on 6 GPUs == 598 * 24 / 480 s / 6 chips ~= 4.98
  samples/sec/chip.
- MambaFuser: 14 min/epoch, same split == 2.85 samples/sec/chip.
"""

import json
import os
import time
from typing import Optional

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np

from deepsense6g_tii_tpu.config import GlobalConfig, config_30to5
from deepsense6g_tii_tpu.models.fuser import BeamFuser
from deepsense6g_tii_tpu.parallel.mesh import (make_mesh, replicate,
                                               shard_batch,
                                               shard_stacked_batch)
from deepsense6g_tii_tpu.train.state import create_train_state, make_optimizer
from deepsense6g_tii_tpu.train.steps import (make_multi_train_step,
                                             make_train_step)
from deepsense6g_tii_tpu.utils.synth import make_synth_batch

BASELINES = {"gpt": 4.98, "mamba": 2.85}   # samples/sec/chip, see docstring


def _device_init_watchdog(timeout_s: float):
    """Backend init through the TPU tunnel either returns in seconds or
    hangs indefinitely when the tunnel is wedged (observed: >1 h).  A hung
    bench is worse than a failed one — fail loudly instead so the caller
    records rc!=0 rather than blocking forever.  Returns a cancel()."""
    import threading

    def _abort():
        import sys
        print(f"bench: device init did not complete within {timeout_s:.0f}s "
              "(TPU tunnel wedged?); aborting", file=sys.stderr, flush=True)
        os._exit(3)

    t = threading.Timer(timeout_s, _abort)
    t.daemon = True
    t.start()
    return t.cancel


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    cancel = _device_init_watchdog(
        float(os.environ.get("DEEPSENSE_BENCH_INIT_TIMEOUT", "600")))
    n_chips = len(jax.devices())
    cancel()
    on_tpu = jax.default_backend() == "tpu"
    # default: the GPT TransFuser (the 0.6671 challenge winner / north-star
    # model); DEEPSENSE_BENCH_ARCH=mamba benches the MambaFuser fork
    arch = os.environ.get("DEEPSENSE_BENCH_ARCH", "gpt")
    # measured per-chip batch optima on v5e (NOTES_NEXT_ROUND): GPT 16
    # (flash attention frees the attention residuals; 90.9 vs 86.9
    # samples/s/chip at 8; plain 32 loses 9%), Mamba 32 as 4 scanned
    # grad-accum microbatches of 8 (r5 frontier: 54.4 at B=32 GA=4 >
    # 53.7 at B=16 GA=2 > 53.2 at B=64 GA=8 > 52.9 at B=8 plain).
    default_b = 16 if on_tpu else 1
    if on_tpu and arch == "mamba":
        default_b = 32
    B = int(os.environ.get("DEEPSENSE_BENCH_B", default_b)) * n_chips
    # steps fused per dispatch (Engine steps_per_dispatch / lax.scan): takes
    # the tunneled host's ~30 ms/step dispatch+sync gap off the measurement,
    # exactly as the production engine runs (train/engine.py::_staged_train).
    K = int(os.environ.get("DEEPSENSE_BENCH_K", 8 if on_tpu else 1))
    # DEEPSENSE_BENCH_30TO5=1 benches the 30-to-5 multi-step variant
    # (10 input frames, 5 predicted beams, 1922 fused tokens + GRU decoder
    # — config_seq_30to5.py); the doubled token/frame count roughly doubles
    # activation memory, so B=16 runs as 2 accumulated microbatches.
    to5 = os.environ.get("DEEPSENSE_BENCH_30TO5", "0") == "1"
    # gradient-accumulation microbatches per optimizer step (activation
    # memory scales with B/GA; the update is exactly the full-B gradient).
    # Measured optima on one v5e (NOTES r5): mamba B=32 GA=4 (54.4);
    # 30to5 B=16 GA=2 beats B=8 plain (43.7 vs 42.9).
    default_ga = 1
    if on_tpu and arch == "mamba":
        default_ga = 4
    elif on_tpu and to5:
        default_ga = 2
    GA = int(os.environ.get("DEEPSENSE_BENCH_GRAD_ACCUM", default_ga))
    make_cfg = config_30to5 if to5 else GlobalConfig
    cfg = make_cfg(use_pallas_scan=on_tpu,
                       compute_dtype="bfloat16" if on_tpu else "float32",
                       remat=os.environ.get("DEEPSENSE_BENCH_REMAT", "none"),
                       opt_mu_dtype=os.environ.get("DEEPSENSE_BENCH_MU_DTYPE")
                       or None,
                       FFM=0 if arch == "gpt" else 1,
                       TFM=0 if arch == "gpt" else 1,
                       # flash attention for the GPT fusion stack; off via
                       # DEEPSENSE_BENCH_FLASH=0 for the einsum-path A/B
                       use_flash_attention=(
                           on_tpu and arch == "gpt"
                           and os.environ.get("DEEPSENSE_BENCH_FLASH",
                                              "1") != "0"),
                       # None = auto (hw PRNG on TPU); hash for the A/B
                       flash_dropout_impl=os.environ.get(
                           "DEEPSENSE_BENCH_FLASH_DROPOUT") or None,
                       # lidar+radar ResNet18s as one grouped-conv program
                       merge_lidar_radar=os.environ.get(
                           "DEEPSENSE_BENCH_MERGE_LR", "0") == "1",
                       # stage1-only grouped lidar+radar (the half-width
                       # 64-channel convs — config.merge_lr_stage1)
                       merge_lr_stage1=os.environ.get(
                           "DEEPSENSE_BENCH_MERGE_LR_S1", "0") == "1",
                       # mamba path: 1024-padded token stream (no per-scan
                       # pad/slice; exact — config.padded_token_stream)
                       padded_token_stream=os.environ.get(
                           "DEEPSENSE_BENCH_PADDED", "0") == "1",
                       # mamba path: reverse-direction backward branch
                       # (reversed-grid scan kernel, no whole-stream flip
                       # — config.reverse_scan_kernel)
                       reverse_scan_kernel=os.environ.get(
                           "DEEPSENSE_BENCH_REVERSE_SCAN", "0") == "1",
                       # mamba depthwise causal conv lowering: "conv"
                       # (default, grouped conv) vs "shift" (4 elementwise
                       # FMAs — measured r5 dead end, -1.6% e2e; see
                       # config.conv1d_impl)
                       conv1d_impl=os.environ.get(
                           "DEEPSENSE_BENCH_CONV1D", "conv"))
    model = BeamFuser(cfg)
    batch = make_synth_batch(cfg, B)

    mesh = make_mesh()
    tx = make_optimizer(mu_dtype=cfg.opt_mu_dtype)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch["image"][:1],
                           batch["lidar"][:1], batch["radar"][:1],
                           batch["gps"][:1]))()
    state = replicate(create_train_state(variables, tx), mesh)
    if K > 1:
        stacked = {k: np.broadcast_to(v, (K,) + v.shape).copy()
                   for k, v in batch.items()}
        dev_batch = shard_stacked_batch(stacked, mesh)
        step = make_multi_train_step(
            model, cfg, tx, use_ema=True, grad_accum=GA,
            unroll=int(os.environ.get("DEEPSENSE_BENCH_UNROLL", "1")),
            # A/B knobs for the K-over-GA scan nest (NOTES r5):
            # FLAT_ACCUM=1 flattens it into one scan over K*GA microbatches
            # (conditional update); GA_UNROLL=GA inlines the inner scan.
            flatten_accum=os.environ.get(
                "DEEPSENSE_BENCH_FLAT_ACCUM", "0") == "1",
            grad_accum_unroll=int(
                os.environ.get("DEEPSENSE_BENCH_GA_UNROLL", "1")))
    else:
        dev_batch = shard_batch(batch, mesh)
        step = make_train_step(model, cfg, tx, use_ema=True, grad_accum=GA)

    # AOT-compile the step ONCE and execute through the compiled object —
    # also the source of the FLOP count for the MFU line
    # (compiled.cost_analysis()); lowering twice (AOT + jit warmup) would
    # double the multi-minute full-model compile.
    step = step.lower(state, dev_batch, 1e-4).compile()
    flops_per_step = None
    try:
        cost = step.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        f = float(cost.get("flops", 0.0))
        if f > 0:
            # MEASURED (r3): cost_analysis counts each lax.scan body ONCE,
            # not x trip count — the K=8 multi-step program reports the same
            # flops as K=1 (ratio 1.0000) — so f already IS one optimizer
            # step; do NOT divide by K.  The grad-accum microbatch loop is
            # also a scan, so its body (one microbatch) is counted once:
            # scale by GA to recover the full step.
            flops_per_step = f * GA
    except Exception as e:              # noqa: BLE001 - MFU is best-effort
        import sys
        print(f"bench: cost_analysis unavailable ({type(e).__name__}: {e})",
              file=sys.stderr, flush=True)

    # warmup (executable is already compiled; this loads/initializes it)
    state, m = step(state, dev_batch, 1e-4)
    _ = float(np.asarray(m["loss"]).ravel()[-1])

    n_iter = 5 if K > 1 else 10     # K>1: 5 dispatches = 5K steps
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, m = step(state, dev_batch, 1e-4)
    _ = float(np.asarray(m["loss"]).ravel()[-1])   # completes the chain
    dt = (time.perf_counter() - t0) / (n_iter * K)

    sps_chip = B / dt / n_chips
    out = {
        "metric": "fused 4-modal train samples/sec/chip "
                  f"({'GPT TransFuser' if arch == 'gpt' else 'MambaFuser'}"
                  + (" 30to5" if to5 else "")
                  + f", bs {B}, {K} step(s)/dispatch"
                  + (f", grad_accum {GA}" if GA > 1 else "")
                  + f", {n_chips} chip(s))",
        "value": round(sps_chip, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(
            sps_chip / BASELINES.get(arch, BASELINES["mamba"]), 2),
    }
    if flops_per_step is not None:
        achieved = flops_per_step / dt / n_chips          # FLOP/s/chip
        out["tflops_per_chip"] = round(achieved / 1e12, 2)
        peak = _peak_flops(jax.devices()[0])
        if peak:
            out["mfu"] = round(achieved / peak, 4)
    print(json.dumps(out))


def _peak_flops(device) -> Optional[float]:
    """Per-chip peak bf16 FLOP/s by device kind (public TPU spec sheets);
    None when unknown so the bench prints raw TFLOP/s instead of a wrong
    denominator."""
    kind = getattr(device, "device_kind", "") or ""
    k = kind.lower().replace(" ", "")
    table = [
        ("v5lite", 197e12), ("v5e", 197e12),      # v5e: 197 bf16 TFLOP/s
        ("v5p", 459e12),
        ("v4", 275e12),
        ("v6e", 918e12), ("trillium", 918e12),
        ("v3", 123e12), ("v2", 46e12),
    ]
    for sub, peak in table:
        if sub in k:
            return peak
    return None


def _run_with_retry():
    # the axon tunnel occasionally throws transient INVALID_ARGUMENT after
    # heavy donation churn (CLAUDE.md); one retry keeps a flake from
    # recording as a benchmark failure
    try:
        main()
    except Exception as e:          # noqa: BLE001 - deliberate broad retry
        import sys
        import traceback
        # stderr: stdout must stay exactly ONE JSON line for consumers
        print(f"bench attempt 1 failed ({type(e).__name__}); retrying once",
              file=sys.stderr, flush=True)
        traceback.print_exc()
        main()


if __name__ == "__main__":
    _run_with_retry()
