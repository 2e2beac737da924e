"""Microbenchmark for the Pallas selective-scan kernels (fwd and fwd+bwd).

Shapes mirror the real fusion-stage use: b=8 instances, L=962 tokens
(padded to 1024 internally), n=16 states, d = 2*C inner channels.

Axon-tunnel benchmarking rules (CLAUDE.md): block_until_ready does not
block, so every iteration forces a host readback of a scalar that depends
on the result; the ~29 ms tunnel sync latency is amortized by chaining
``iters`` dependent calls per timing sample.

Usage: python tools/bench_scan.py [d ...]   (default: 256 1024)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from deepsense6g_tii_tpu.ops import selective_scan as ss

if "SCAN_SEG" in os.environ:        # A/B the in-chunk segment width
    ss.SEG = int(os.environ["SCAN_SEG"])

B, L, N = 8, 962, 16
ITERS = 10
REPS = 5


def _inputs(d, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(B, L, d)).astype(np.float32))
    dt = jnp.asarray(np.abs(rng.normal(size=(B, L, d))).astype(np.float32) * 0.1)
    A = jnp.asarray(-np.abs(rng.normal(size=(d, N))).astype(np.float32))
    Bm = jnp.asarray(rng.normal(size=(B, L, N)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(B, L, N)).astype(np.float32))
    return u, dt, A, Bm, C


def _sync_latency():
    """Measured dispatch+readback latency of a trivial program — ~29 ms on
    the axon tunnel, ~0 on CPU or a co-located TPU.  Subtracting the
    measured value (not a hardcoded tunnel constant) keeps the per-call
    numbers honest on every backend."""
    one = jnp.ones(())
    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(one))            # compile
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
    # chain: out feeds a scalar that the next call's input depends on
    @jax.jit
    def chained(args):
        u, dt, A, Bm, C = args
        acc = 0.0
        for _ in range(ITERS):
            r = fn(u, dt, A, Bm, C)
            acc = acc + r
            u = u + 0.0 * r
        return acc

    r = chained(args)
    _ = float(r)  # compile + sync
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = chained(args)
        _ = float(r)
        best = min(best, (time.perf_counter() - t0))
    return (best - _SYNC) / ITERS * 1e3  # ms per call, net of one sync


def main():
    ds = [int(a) for a in sys.argv[1:]] or [256, 1024]
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    print(f"backend={jax.default_backend()} B={B} L={L} n={N} SEG={ss.SEG}")
    for d in ds:
        args = _inputs(d)

        def fwd(u, dt, A, Bm, C):
            return ss.selective_scan(u, dt, A, Bm, C).sum()

        def fwdbwd(u, dt, A, Bm, C):
            g = jax.grad(
                lambda u_, dt_: ss.selective_scan(u_, dt_, A, Bm, C).sum(),
                argnums=(0, 1))(u, dt)
            return g[0].sum() + g[1].sum()

        t_f = _time(fwd, args)
        t_fb = _time(fwdbwd, args)
        print(f"d={d:5d}  fwd {t_f:7.2f} ms   fwd+bwd {t_fb:7.2f} ms   "
              f"bwd~{t_fb - t_f:7.2f} ms")


if __name__ == "__main__":
    main()
