"""Serving latency/throughput bench on the real TPU chip.

Builds a random-init :class:`~deepsense6g_tii_tpu.serve.Predictor` (no
checkpoint needed — serving perf is weight-independent) and reports p50/p90
latency per batch bucket plus steady-state throughput at the largest bucket.

The reference has no serving layer (SURVEY.md section 1); these numbers
document the production path this framework adds.  One TPU process at a
time — don't run while bench.py holds the tunnel.

Usage: python tools/bench_serve.py [--arch mamba|gpt] [--batches 1,8,16]
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.models.fuser import BeamFuser
from deepsense6g_tii_tpu.serve import Predictor


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="mamba", choices=["mamba", "gpt"])
    p.add_argument("--batches", default="1,8,16")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--exported", action="store_true",
                   help="also export the jax.export StableHLO artifact "
                        "(weights baked in), reload it cold, check its "
                        "predictions against the live Predictor and bench "
                        "its latency — the serving-artifact validation on "
                        "the real chip")
    a = p.parse_args()
    batches = [int(x) for x in a.batches.split(",")]

    on_tpu = jax.default_backend() == "tpu"
    ffm_tfm = 1 if a.arch == "mamba" else 0
    cfg = GlobalConfig(FFM=ffm_tfm, TFM=ffm_tfm,
                       use_pallas_scan=on_tpu, use_flash_attention=on_tpu,
                       compute_dtype="bfloat16" if on_tpu else "float32")

    model = BeamFuser(cfg)
    T, H = cfg.seq_len, cfg.crop
    rc = 2 if cfg.add_velocity else 1
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, T, H, H, 3)), jnp.zeros((1, T, H, H, 1)),
        jnp.zeros((1, T, H, H, rc)), jnp.zeros((1, cfg.gps_len, 2)))

    pred = Predictor(variables, cfg, batch_buckets=tuple(batches))
    results = {"arch": a.arch, "backend": jax.default_backend()}
    for b in batches:
        r = pred.latency_benchmark(batch=b, iters=a.iters)
        results[f"b{b}"] = r
        results[f"b{b}"]["samples_per_sec"] = round(b / (r["p50_ms"] / 1e3), 2)
        print(f"batch {b}: p50 {r['p50_ms']:.1f} ms  p90 {r['p90_ms']:.1f} ms"
              f"  -> {results[f'b{b}']['samples_per_sec']} samples/s",
              flush=True)

    # steady-state pipelined throughput at the largest bucket: submit a
    # window of requests before each sync, amortizing the tunnel latency
    b = batches[-1]
    args = (np.random.default_rng(0).uniform(0, 255, (b, T, H, H, 3))
            .astype(np.float32),
            np.zeros((b, T, H, H, 1), np.float32),
            np.zeros((b, T, H, H, rc), np.float32),
            np.zeros((b, cfg.gps_len, 2), np.float32))
    dev_args = tuple(jnp.asarray(x) for x in args)
    pred.predict(*args)  # compile
    n_calls = 40
    t0 = time.perf_counter()
    outs = [pred._fwd(pred.variables, *dev_args) for _ in range(n_calls)]
    _ = [np.asarray(o[0]) for o in outs]  # host sync at the end
    dt = time.perf_counter() - t0
    results["pipelined"] = {"batch": b, "calls": n_calls,
                            "samples_per_sec": round(b * n_calls / dt, 2)}
    print(f"pipelined batch {b}: {results['pipelined']['samples_per_sec']}"
          " samples/s", flush=True)

    if a.exported:
        # jax.export round-trip on this backend: serialize (weights baked
        # in), cold-reload, equivalence vs the live path, then latency.
        from deepsense6g_tii_tpu.serve import ExportedPredictor
        path = f"/tmp/ds6g_serve_{a.arch}.stablehlo"
        t0 = time.perf_counter()
        pred.export_artifact(path, batch_size=b)
        export_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        ep = ExportedPredictor(path)
        load_s = time.perf_counter() - t0
        beams_live, conf_live = pred.predict(*args)
        beams_exp, conf_exp = ep.predict(*args)
        # both contracts: (B, k) 1-indexed beams + (B,) top-1 confidence
        beams_ok = bool(np.array_equal(beams_live[:, 0], beams_exp[:, 0]))
        conf_err = float(np.abs(np.asarray(conf_live, np.float32)
                                - np.asarray(conf_exp, np.float32)).max())
        ep.predict(*args)                       # warm
        times = []
        for _ in range(a.iters):
            t0 = time.perf_counter()
            ep.predict(*args)
            times.append((time.perf_counter() - t0) * 1e3)
        t = np.asarray(times)
        # device-time estimate: pipeline exported calls (amortizes the
        # ~29 ms tunnel sync that dominates per-call latency here)
        dev_in = tuple(jnp.asarray(x) for x in args)
        t0 = time.perf_counter()
        outs = [ep._exported.call(*dev_in) for _ in range(n_calls)]
        _ = [np.asarray(o[0]) for o in outs]
        dt = time.perf_counter() - t0
        results["exported"] = {
            "path": path, "batch": b,
            "artifact_mb": round(os.path.getsize(path) / 1e6, 1),
            "export_s": round(export_s, 1), "load_s": round(load_s, 1),
            "top1_match": beams_ok, "conf_max_abs_err": conf_err,
            "p50_ms": float(np.percentile(t, 50)),
            "pipelined_samples_per_sec": round(b * n_calls / dt, 2),
            "device_ms_per_batch": round(dt / n_calls * 1e3, 1)}
        print(f"exported: top1_match={beams_ok} conf_err={conf_err:.2e} "
              f"p50 {results['exported']['p50_ms']:.1f} ms  device "
              f"{results['exported']['device_ms_per_batch']} ms/batch",
              flush=True)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
