"""Microbenchmark for the Pallas flash-attention kernel (fwd and fwd+bwd).

Shapes mirror the GPT fusion stages (models/fusion.py): B=16 per-chip batch,
H=4 heads, T=962 fused tokens (padded to 1024 in-kernel), head_dim D sweeps
the per-stage values 16/32/64/128 (n_embd 64/128/256/512 over n_head=4).

Diagnostic goal (xprof shows all four stages cost the same pallas time):
is the kernel MXU-bound with the D dimension lane-padded to 128, or
VPU-bound on T^2 elementwise work (softmax sweeps + the dropout hash)?
The dropout on/off delta isolates the hash cost; the D sweep isolates
lane padding.

Axon-tunnel rules (CLAUDE.md): block_until_ready does not block — every
sample forces a host readback and chains ITERS dependent calls to amortize
the ~29 ms sync latency, which is measured and subtracted.

Usage: python tools/bench_flash.py [D ...]   (default: 16 32 64 128)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from deepsense6g_tii_tpu.ops.flash_attention import flash_mha

B, H, T = 16, 4, 962
BLOCK = int(os.environ.get("FLASH_BLOCK", "512"))
ITERS = 10
REPS = 5
DTYPE = jnp.dtype(os.environ.get("FLASH_DTYPE", "bfloat16"))


def _inputs(d, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.normal(size=(B, H, T, d)).astype(np.float32), dtype=DTYPE)
    return mk(), mk(), mk()


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


def _time(make_fn, args):
    global _SYNC
    if _SYNC is None:
        _SYNC = _sync_latency()

    @jax.jit
    def chained(args):
        q, k, v = args
        acc = 0.0
        for _ in range(ITERS):
            r = make_fn(q, k, v)
            acc = acc + r
            q = q + jnp.asarray(0.0 * r, q.dtype)
        return acc

    r = chained(args)
    _ = float(r)  # compile + sync
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        _ = float(chained(args))
        best = min(best, time.perf_counter() - t0)
    return max(best - _SYNC, 0.0) / ITERS


def main():
    ds = [int(a) for a in sys.argv[1:]] or [16, 32, 64, 128]
    rng = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()} B={B} H={H} T={T} "
          f"block={BLOCK} dtype={DTYPE.name}")
    for d in ds:
        q, k, v = _inputs(d)
        row = [f"D={d:4d}"]
        for p in (0.0, 0.1):
            impl = os.environ.get("FLASH_DROPOUT_IMPL") or None

            def fwd(q, k, v, p=p):
                o = flash_mha(q, k, v, dropout_p=p,
                              rng=rng if p else None, block=BLOCK,
                              dropout_impl=impl)
                return jnp.sum(o.astype(jnp.float32))

            def fwdbwd(q, k, v, p=p):
                g = jax.grad(lambda q, k, v: fwd(q, k, v), argnums=(0, 1, 2))(
                    q, k, v)
                return sum(jnp.sum(x.astype(jnp.float32)) for x in g)

            tf = _time(fwd, (q, k, v))
            tb = _time(fwdbwd, (q, k, v))
            # fwd matmul FLOPs (qk + pv), padded T
            t_pad = -(-T // BLOCK) * BLOCK
            fl = 4 * B * H * t_pad * t_pad * d
            row.append(f"p={p}: fwd {tf * 1e3:7.3f} ms"
                       f" ({fl / tf / 1e12:5.1f} TF/s)"
                       f"  fwd+bwd {tb * 1e3:7.3f} ms")
        print("  ".join(row))


if __name__ == "__main__":
    main()
