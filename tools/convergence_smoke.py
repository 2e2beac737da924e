"""End-to-end TPU training convergence smoke.

Overfits the flagship MambaFuser (bf16, Pallas scan fwd+bwd, AdamW, EMA) on
one fixed synthetic batch and asserts the focal loss at least halves in 40
steps — the strongest available correctness signal for the full compiled
training path without the real dataset.

Measured on one v5e chip (2026-08-16): loss 0.147 -> 0.0073 in 40 steps,
75% top-1 memorization of the batch.

Usage: python tools/convergence_smoke.py [--steps 40] [--batch 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--opt_mu_dtype", default=None,
                    choices=["bfloat16", "float32"],
                    help="Adam first-moment dtype (A/B the bf16-mu config)")
    ap.add_argument("--arch", default="mamba", choices=["mamba", "gpt"],
                    help="gpt = GPT TransFuser (FFM=0/TFM=0) with flash "
                         "attention + in-kernel prob dropout on TPU")
    ap.add_argument("--flash", type=int, default=None,
                    help="override flash attention for --arch gpt "
                         "(default: on when on TPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from deepsense6g_tii_tpu.config import GlobalConfig
    from deepsense6g_tii_tpu.data.features import soft_beam_target_np
    from deepsense6g_tii_tpu.models.fuser import BeamFuser
    from deepsense6g_tii_tpu.train import steps as S
    from deepsense6g_tii_tpu.train.state import (create_train_state,
                                                 make_optimizer)

    from deepsense6g_tii_tpu.utils.synth import make_synth_batch

    on_tpu = jax.default_backend() == "tpu"
    mu_dtype = (None if args.opt_mu_dtype in (None, "float32")
                else args.opt_mu_dtype)
    flash = (on_tpu if args.flash is None else bool(args.flash))
    cfg = GlobalConfig(use_pallas_scan=on_tpu,
                       compute_dtype="bfloat16" if on_tpu else "float32",
                       opt_mu_dtype=mu_dtype,
                       FFM=0 if args.arch == "gpt" else 1,
                       TFM=0 if args.arch == "gpt" else 1,
                       use_flash_attention=args.arch == "gpt" and flash)
    rng = np.random.default_rng(0)
    B = args.batch
    idx = rng.integers(0, 64, B)
    batch = make_synth_batch(cfg, B)
    # overfitting target: REAL soft beam labels (fixed), not synth noise
    batch["beam"] = np.stack([soft_beam_target_np(i) for i in idx]
                             ).astype(np.float32)
    batch["beamidx"] = idx.astype(np.int32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = BeamFuser(cfg)
    v = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch["image"][:1], batch["lidar"][:1],
        batch["radar"][:1], batch["gps"][:1]))()
    tx = make_optimizer(mu_dtype=cfg.opt_mu_dtype)
    state = create_train_state(v, tx)
    step = S.make_train_step(model, cfg, tx, use_ema=True)

    first = None
    for i in range(args.steps):
        state, m = step(state, batch, args.lr)
        if i == 0:
            first = float(m["loss"])
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(m['loss']):.4f}")
    last = float(m["loss"])
    top1 = (np.asarray(m["ranks"])[:, 0] == idx).mean()
    print(f"top-1 on memorized batch: {top1:.2f}")
    assert last < first * 0.5, f"loss did not halve: {first} -> {last}"
    print("convergence smoke: PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
