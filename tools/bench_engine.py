"""End-to-end Engine benchmark: cache -> loader -> prefetch -> device -> step.

Measures what ``Engine.train`` actually sustains — loader gather, host
staging, host->device transfer and the fused multi-step dispatch together —
next to the step-only number bench.py reports, answering "does the input
pipeline keep the chip fed?" (the reference's baselines are wall-clock
epochs including its 8-worker DataLoader, train2_seq.py:94-156,531-533).

Prints ONE JSON line:
  {"metric", "value" (e2e samples/sec/chip), "unit", "vs_baseline",
   "loader_only_sps"  — host-side batch gather alone,
   "h2d_MBps"         — measured host->device bandwidth for batch staging,
   "transfer_bound_sps" — bandwidth ceiling implied by h2d_MBps,
   "pct_of_step"      — e2e as a fraction of the step-only number}

Env knobs mirror bench.py: DEEPSENSE_BENCH_ARCH (gpt|mamba), _B, _K,
_GRAD_ACCUM, plus DEEPSENSE_BENCH_N (samples/epoch, default 1024),
DEEPSENSE_BENCH_EPOCHS (timed epochs, default 2), DEEPSENSE_BENCH_LOADER
(fast|classic: CachedBatchLoader vs DataLoader(CachedDataset) A/B),
DEEPSENSE_BENCH_RADAR (float16|uint8: the cache's opt-in lossy radar
fixed-point storage, data/cache.py), DEEPSENSE_BENCH_STEP_SPS (step-only
samples/s/chip for pct_of_step, default: the arch's BENCH_r02-era number).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.data.cache import CachedBatchLoader, CachedDataset
from deepsense6g_tii_tpu.data.loader import DataLoader
from deepsense6g_tii_tpu.models.fuser import BeamFuser
from deepsense6g_tii_tpu.parallel.mesh import make_mesh, shard_stacked_batch
from deepsense6g_tii_tpu.train.engine import Engine, TrainOptions
from deepsense6g_tii_tpu.utils.synth import build_synth_cache

BASELINES = {"gpt": 4.98, "mamba": 2.85}       # see bench.py docstring
STEP_SPS = {"gpt": 101.2, "mamba": 52.9}       # step-only, BENCH_r02/NOTES


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    n_chips = len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    arch = os.environ.get("DEEPSENSE_BENCH_ARCH", "gpt")
    default_b = (16 if arch == "gpt" else 8) if on_tpu else 1
    B = int(os.environ.get("DEEPSENSE_BENCH_B", default_b)) * n_chips
    K = int(os.environ.get("DEEPSENSE_BENCH_K", 8 if on_tpu else 1))
    GA = int(os.environ.get("DEEPSENSE_BENCH_GRAD_ACCUM", "1"))
    N = int(os.environ.get("DEEPSENSE_BENCH_N", 1024 if on_tpu else 8))
    EPOCHS = int(os.environ.get("DEEPSENSE_BENCH_EPOCHS", "2"))
    loader_kind = os.environ.get("DEEPSENSE_BENCH_LOADER", "fast")

    radar_dtype = os.environ.get("DEEPSENSE_BENCH_RADAR", "float16")
    res = int(os.environ.get("DEEPSENSE_BENCH_RES", "256"))
    cfg = GlobalConfig(use_pallas_scan=on_tpu,
                       compute_dtype="bfloat16" if on_tpu else "float32",
                       FFM=0 if arch == "gpt" else 1,
                       TFM=0 if arch == "gpt" else 1,
                       use_flash_attention=on_tpu and arch == "gpt",
                       input_resolution=res,
                       # anchors scale with resolution so the x8/x4/x2/x1
                       # fusion upsample chain lands back on each stage's
                       # map size (8x8 at the production 256)
                       vert_anchors=max(res // 32, 1),
                       horz_anchors=max(res // 32, 1))

    suffix = "_ru8" if radar_dtype == "uint8" else ""
    cache_dir = os.environ.get(
        "DEEPSENSE_BENCH_CACHE",
        f"/tmp/ds6g_engine_cache_r{cfg.input_resolution}_n{N}{suffix}")
    t0 = time.perf_counter()
    build_synth_cache(cfg, N, cache_dir, radar_dtype=radar_dtype)
    print(f"cache: {cache_dir} ({N} samples, "
          f"{time.perf_counter() - t0:.1f}s)", file=sys.stderr)

    def make_loader():
        if loader_kind == "classic":
            return DataLoader(CachedDataset(cache_dir), B, shuffle=True,
                              num_workers=4, drop_last=True)
        return CachedBatchLoader(cache_dir, B, shuffle=True, drop_last=True)

    loader = make_loader()

    # -- loader-only: host batch assembly with no device in the loop
    t0 = time.perf_counter()
    nb = 0
    for batch in loader:
        nb += 1
    loader_dt = time.perf_counter() - t0
    loader_sps = nb * B / loader_dt

    # -- host->device bandwidth for the exact staged layout (a K-stacked
    # group, as _group_iter ships it); axon's block_until_ready is a no-op,
    # so force completion with a tiny readback per put
    mesh = make_mesh()
    one = next(iter(make_loader()))
    host_keys = ("image", "lidar", "radar", "gps", "beam", "beamidx")
    stacked = {k: np.broadcast_to(np.asarray(one[k]),
                                  (K,) + np.asarray(one[k]).shape).copy()
               for k in host_keys if k in one}
    nbytes = sum(v.nbytes for v in stacked.values())
    dev = shard_stacked_batch(stacked, mesh)            # warm the path
    _ = float(np.asarray(jax.tree_util.tree_leaves(dev)[0]).ravel()[0])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        dev = shard_stacked_batch(stacked, mesh)
        _ = float(np.asarray(
            jax.tree_util.tree_leaves(dev)[0]).ravel()[0])
    h2d_dt = (time.perf_counter() - t0) / reps
    h2d_mbps = nbytes / h2d_dt / 1e6
    transfer_bound_sps = K * B / h2d_dt / n_chips
    del dev

    # -- the real engine loop
    model = BeamFuser(cfg)
    opts = TrainOptions(logdir=f"/tmp/ds6g_bench_engine_log",
                        epochs=EPOCHS + 1, lr=1e-4, scheduler=False,
                        ema=True, steps_per_dispatch=K, grad_accum=GA,
                        prefetch=2, async_save=False)
    engine = Engine(model, cfg, opts, mesh=mesh)
    engine.init_state(next(iter(make_loader())))

    engine.train(loader)                    # warmup epoch (compile)
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        engine.train(loader)
    dt = time.perf_counter() - t0
    # drop_last=True: every loader batch is full-size and every batch is
    # trained (ragged groups fall back to single dispatches, none dropped)
    n_used = (N // B) * B
    sps_chip = EPOCHS * n_used / dt / n_chips

    step_sps = float(os.environ.get("DEEPSENSE_BENCH_STEP_SPS",
                                    STEP_SPS.get(arch, 0)) or 0)
    out = {
        "metric": "engine e2e train samples/sec/chip "
                  f"({'GPT TransFuser' if arch == 'gpt' else 'MambaFuser'}, "
                  f"bs {B}, {K} step(s)/dispatch, {loader_kind} loader, "
                  f"{N} samples/epoch, {n_chips} chip(s))",
        "value": round(sps_chip, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps_chip / BASELINES.get(arch, 2.85), 2),
        "loader_only_sps": round(loader_sps, 1),
        "h2d_MBps": round(h2d_mbps, 1),
        "transfer_bound_sps": round(transfer_bound_sps, 1),
    }
    if step_sps:
        out["pct_of_step"] = round(sps_chip / step_sps, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
