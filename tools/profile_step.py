"""Per-op device-time breakdown of the flagship train step (xprof).

Runs a few train steps on the default backend under jax.profiler, then
converts the XPlane trace with xprof's framework_op_stats tool and prints
the top device ops grouped by category.  The r1/r2 optimization loop was
driven by this breakdown (NOTES_NEXT_ROUND.md).

Usage: python tools/profile_step.py [B_per_chip]
(honors the same DEEPSENSE_BENCH_* env knobs as bench.py: B/K/ARCH/REMAT/
MU_DTYPE/UNROLL — keep them identical to the bench run being explained)
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.models.fuser import BeamFuser
from deepsense6g_tii_tpu.parallel.mesh import (make_mesh, replicate,
                                                shard_batch)
from deepsense6g_tii_tpu.train.state import create_train_state, make_optimizer
from deepsense6g_tii_tpu.train.steps import make_train_step
from deepsense6g_tii_tpu.utils.synth import make_synth_batch


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    n_chips = len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    # mirror bench.py EXACTLY — same env knobs, same config, same host-side
    # batch construction and init — so the breakdown describes the program
    # bench.py measures and the persistent jit cache is shared with it
    arch = os.environ.get("DEEPSENSE_BENCH_ARCH", "gpt")
    default_b = 16 if on_tpu else 1
    B = (int(sys.argv[1]) if len(sys.argv) > 1
         else int(os.environ.get("DEEPSENSE_BENCH_B",
                                 default_b))) * n_chips
    K = int(os.environ.get("DEEPSENSE_BENCH_K", "8" if on_tpu else "1"))
    default_ga = 2 if (on_tpu and arch == "mamba") else 1
    GA = int(os.environ.get("DEEPSENSE_BENCH_GRAD_ACCUM", default_ga))
    cfg = GlobalConfig(use_pallas_scan=on_tpu,
                       compute_dtype="bfloat16" if on_tpu else "float32",
                       remat=os.environ.get("DEEPSENSE_BENCH_REMAT", "none"),
                       opt_mu_dtype=os.environ.get("DEEPSENSE_BENCH_MU_DTYPE")
                       or None,
                       FFM=0 if arch == "gpt" else 1,
                       TFM=0 if arch == "gpt" else 1,
                       use_flash_attention=(
                           on_tpu and arch == "gpt"
                           and os.environ.get("DEEPSENSE_BENCH_FLASH",
                                              "1") != "0"),
                       flash_dropout_impl=os.environ.get(
                           "DEEPSENSE_BENCH_FLASH_DROPOUT") or None,
                       merge_lidar_radar=os.environ.get(
                           "DEEPSENSE_BENCH_MERGE_LR", "0") == "1",
                       merge_lr_stage1=os.environ.get(
                           "DEEPSENSE_BENCH_MERGE_LR_S1", "0") == "1",
                       padded_token_stream=os.environ.get(
                           "DEEPSENSE_BENCH_PADDED", "0") == "1",
                       reverse_scan_kernel=os.environ.get(
                           "DEEPSENSE_BENCH_REVERSE_SCAN", "0") == "1")
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
        from deepsense6g_tii_tpu.parallel.mesh import shard_stacked_batch
        from deepsense6g_tii_tpu.train.steps import make_multi_train_step
        stacked = {k: np.broadcast_to(v, (K,) + v.shape).copy()
                   for k, v in batch.items()}
        batch = shard_stacked_batch(stacked, mesh)
        unroll = int(os.environ.get("DEEPSENSE_BENCH_UNROLL", "1"))
        step = make_multi_train_step(model, cfg, tx, unroll=unroll,
                                     use_ema=True, grad_accum=GA)
    else:
        batch = shard_batch(batch, mesh)
        step = make_train_step(model, cfg, tx, use_ema=True, grad_accum=GA)
    state, m = step(state, batch, 1e-4)
    _ = float(np.asarray(m["loss"]).ravel()[-1])   # compile + sync

    n_disp = 3 if K == 1 else 1
    # per-config dir so successive A/B profile runs keep their traces
    tag = arch + ("_rev" if cfg.reverse_scan_kernel else "") \
        + ("_pad" if cfg.padded_token_stream else "")
    trace_dir = f"/tmp/xprof_step_{tag}"
    jax.profiler.start_trace(trace_dir)
    for _ in range(n_disp):
        state, m = step(state, batch, 1e-4)
        _ = float(np.asarray(m["loss"]).ravel()[-1])
    jax.profiler.stop_trace()

    summarize(trace_dir, n_steps=n_disp * K)


def summarize(trace_dir, n_steps=3, top=25):
    """Parse the gviz-JSON framework_op_stats table xprof emits (bytes)."""
    import collections
    import json

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [max(files, key=os.path.getmtime)], "framework_op_stats", {})
    tbl = json.loads(data.decode() if isinstance(data, bytes) else data)[0]
    cols = [c["id"] for c in tbl["cols"]]
    rows = [dict(zip(cols, [c["v"] for c in r["c"]])) for r in tbl["rows"]]
    dev = [r for r in rows if r["host_or_device"] == "Device"]
    total = sum(r["total_self_time"] for r in dev)
    print(f"device total: {total/n_steps/1e3:.2f} ms/step")
    agg = collections.defaultdict(float)
    for r in dev:
        agg[r["type"]] += r["total_self_time"]
    print("by category:")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {k:30s} {v/n_steps/1e3:8.2f} ms/step {100*v/total:5.1f}%")
    dev.sort(key=lambda r: -r["total_self_time"])
    print("top ops:")
    for r in dev[:top]:
        print(f"  {r['operation'][:70]:70s} "
              f"{r['total_self_time']/n_steps/1e3:8.2f} "
              f"{100*r['total_self_time']/total:5.1f}%")
    conv_attribution(dev, n_steps)


def conv_attribution(dev, n_steps):
    """Per-site conv table: the 'convolution' bucket split by backbone
    (image/lidar/radar/merged) x stage (stem/stage1-4/other) x direction
    (fwd vs the transpose backward), from the flax module paths in the op
    name stack (VERDICT r3 weak #3: which conv to attack)."""
    import collections
    import re

    conv = [r for r in dev if "conv" in r["type"]]
    if not conv:
        return
    total = sum(r["total_self_time"] for r in conv)
    agg = collections.defaultdict(float)
    for r in conv:
        op = r["operation"]
        mod = re.search(r"(image|lidar|radar|lr)_backbone", op)
        st = re.search(r"(stem|stage[1-4])", op)
        fus = re.search(r"(fusion[1-4]|mamba|time_mamba|join)", op)
        if st:                       # backbone conv; modality tag if present
            site = f"{mod.group(0) if mod else 'bb'}/{st.group(0)}"
        elif fus:
            site = fus.group(0)      # mamba depthwise conv1d
        else:
            site = "other"
        bwd = "transpose(" in op or "vjp" in op.lower()
        agg[(site, "bwd" if bwd else "fwd")] += r["total_self_time"]
    print(f"convolutions by site (total {total/n_steps/1e3:.2f} ms/step):")
    for (site, d), v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {site:28s} {d:3s} {v/n_steps/1e3:8.2f} ms/step "
              f"{100*v/total:5.1f}%")


if __name__ == "__main__":
    main()
