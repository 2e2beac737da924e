"""Per-op device-time breakdown of the flagship train step (xprof).

Runs a few train steps on the default backend under jax.profiler, then
converts the XPlane trace with xprof's framework_op_stats tool and prints
the top device ops grouped by category.  The r1/r2 optimization loop was
driven by this breakdown (NOTES_NEXT_ROUND.md).

Usage: python tools/profile_step.py [B]
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
from deepsense6g_tii_tpu.train.state import create_train_state, make_optimizer
from deepsense6g_tii_tpu.train.steps import make_train_step


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    on_tpu = jax.default_backend() == "tpu"
    cfg = GlobalConfig(use_pallas_scan=on_tpu,
                       compute_dtype="bfloat16" if on_tpu else "float32")
    model = BeamFuser(cfg)
    rng = np.random.default_rng(0)
    T = cfg.seq_len
    batch = {
        "image": rng.uniform(0, 255, (B, T, 256, 256, 3)).astype(np.float32),
        "lidar": rng.uniform(0, 1, (B, T, 256, 256, 1)).astype(np.float32),
        "radar": rng.uniform(0, 1, (B, T, 256, 256, 2)).astype(np.float32),
        "gps": rng.normal(size=(B, 2, 2)).astype(np.float32),
        "beam": np.eye(64, dtype=np.float32)[rng.integers(0, 64, B)],
        "beamidx": rng.integers(0, 64, B).astype(np.int32),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1],
                           batch["lidar"][:1], batch["radar"][:1],
                           batch["gps"][:1])
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    step = make_train_step(model, cfg, tx)
    state, m = step(state, batch, 1e-4)
    _ = float(m["loss"])                  # compile + sync

    trace_dir = "/tmp/xprof_step"
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, m = step(state, batch, 1e-4)
        _ = float(m["loss"])
    jax.profiler.stop_trace()

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [max(files, key=os.path.getmtime)], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    import csv as _csv
    import io
    rows = list(_csv.DictReader(io.StringIO(data)))
    dev = [r for r in rows if r.get("Host/device", "") == "Device"]
    total = sum(float(r["Total self-time (us)"]) for r in dev)
    print(f"device total (3 steps): {total/1e3:.1f} ms   "
          f"({total/3e3:.1f} ms/step)")
    dev.sort(key=lambda r: -float(r["Total self-time (us)"]))
    print(f"{'op':60s} {'ms/step':>8s} {'%':>6s}")
    for r in dev[:25]:
        t = float(r["Total self-time (us)"]) / 3e3
        print(f"{r['Operation'][:60]:60s} {t:8.2f} "
              f"{100*float(r['Total self-time (us)'])/total:6.1f}")


if __name__ == "__main__":
    main()
