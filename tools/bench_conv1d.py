"""Microbenchmark: depthwise causal conv1d lowerings (shift-FMA vs grouped
conv) at the Mamba fusion-stage shapes.

The reference's mamba_ssm layers run a width-4 depthwise causal conv over
every (B, L, d_inner) stream before the selective scan
(mambafuser_seq.py:83-90 — the library's causal_conv1d CUDA kernel).  On
TPU, XLA lowers ``feature_group_count=d_inner`` convs through the grouped
convolution path; ``ops/mamba.py::causal_depthwise_conv1d(impl="shift")``
reformulates the same math as 4 shifted elementwise FMAs (pure VPU,
fusable).  This A/Bs the two per shape, fwd and fwd+bwd, net of tunnel
sync (CLAUDE.md benchmarking rules).

Usage: python tools/bench_conv1d.py [d ...]   (default: 256 512 1024)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from deepsense6g_tii_tpu.ops.mamba import causal_depthwise_conv1d

B, L, K = 16, 962, 4
ITERS = 10
REPS = 5


def _sync_latency():
    one = jnp.ones(())
    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(one))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        _ = float(tiny(one))
        best = min(best, time.perf_counter() - t0)
    return best


_SYNC = None


def _time(fn, args):
    global _SYNC
    if _SYNC is None:
        _SYNC = _sync_latency()

    @jax.jit
    def chained(args):
        x, w, b = args
        acc = 0.0
        for _ in range(ITERS):
            r = fn(x, w, b)
            acc = acc + r
            x = x + 0.0 * r
        return acc

    r = chained(args)
    _ = float(r)  # compile + sync
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = chained(args)
        _ = float(r)
        best = min(best, time.perf_counter() - t0)
    return (best - _SYNC) / ITERS * 1e3


def main():
    ds = [int(a) for a in sys.argv[1:]] or [256, 512, 1024]
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    print(f"backend={jax.default_backend()} B={B} L={L} K={K} dtype={dtype}")
    rng = np.random.default_rng(0)
    for d in ds:
        x = jnp.asarray(rng.normal(size=(B, L, d)), dtype)
        w = jnp.asarray(rng.normal(size=(K, 1, d)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
        for impl in ("conv", "shift"):
            def fwd(x_, w_, b_, impl=impl):
                # silu folded in, as in Mamba.pre_scan — the fusion
                # opportunity is part of what is being measured
                return jax.nn.silu(causal_depthwise_conv1d(
                    x_, w_, b_, impl=impl)).sum()

            def fwdbwd(x_, w_, b_, impl=impl):
                g = jax.grad(lambda xx, ww: jax.nn.silu(
                    causal_depthwise_conv1d(xx, ww, b_, impl=impl)).sum(),
                    argnums=(0, 1))(x_, w_)
                return g[0].sum() + g[1].sum()

            t_f = _time(fwd, (x, w, b))
            t_fb = _time(fwdbwd, (x, w, b))
            print(f"d={d:5d} impl={impl:5s}  fwd {t_f:7.3f} ms   "
                  f"fwd+bwd {t_fb:7.3f} ms")


if __name__ == "__main__":
    main()
