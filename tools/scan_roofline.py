"""Issued-op roofline audit of the Pallas selective-scan kernels.

The r2/r3 "~2.6x of VPU speed-of-light" figure for ops/selective_scan.py was
a paper estimate (analytic ~9 VPU ops per (L, n, d) element against a
datasheet VPU rate).  This tool turns it into a measurement (VERDICT r3
weak #2): it first CALIBRATES the chip's effective VPU throughput with
Pallas kernels of known op count on the same shapes the scan uses — a
k-multiply elementwise chain, and a k-exp chain to price exp in multiply
units — then times the scan forward/backward at production geometry and
reports the implied issued-ops per element next to the analytic count.

    implied_ops = t_scan * calibrated_mul_rate / elements
    overhead    = implied_ops / analytic_ops     (1.0 == speed of light)

Everything is measured on-device with host readbacks (the axon tunnel's
block_until_ready is a no-op — CLAUDE.md); per-call overhead is removed by
differencing two iteration counts.

Usage: python tools/scan_roofline.py  (one TPU process at a time)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from deepsense6g_tii_tpu.ops.selective_scan import (BL, SEG, selective_scan)

# production scan geometry: MambaFuser stage-4 fusion blocks at bench
# default B=16 (d_inner = 2*512; 962 tokens padded to 1024 in-kernel)
B_, L_, D_, N_ = 16, 962, 1024, 16


REPS = 5


def _sync_latency():
    """Measured dispatch+readback latency of a trivial program (~29 ms on
    the axon tunnel) — subtracted from every sample (tools/bench_scan.py
    pattern; block_until_ready is a no-op here)."""
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


def _timed_net(chained_fn, args, iters):
    """Per-call time of one application, from a jitted chain of ``iters``
    DEPENDENT applications (amortizes dispatch), min over REPS samples,
    net of the measured sync latency."""
    global _SYNC
    if _SYNC is None:
        _SYNC = _sync_latency()
    r = chained_fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = chained_fn(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - _SYNC, 0.0) / iters


def _chain_kernel(k_ops, use_exp, x_ref, o_ref):
    x = x_ref[...]
    if use_exp:
        for _ in range(k_ops):
            x = jnp.exp(x * -0.41421)   # keep values bounded
    else:
        for _ in range(k_ops):
            x = x * 1.0000001
    o_ref[...] = x


def calibrate(shape=(4096, 8, 1024), k_lo=8, k_hi=72, use_exp=False,
              blk=32, iters=8):
    """Effective elementwise throughput (ops/s) from a known-op-count
    chain, differencing two chain lengths to cancel load/store cost.
    Gridded over the leading dim ((blk, 8, 1024) f32 blocks = 1 MB VMEM);
    ``iters`` dependent kernel applications per timing sample keep the
    measured span far above the tunnel sync noise."""
    x0 = jnp.ones(shape, jnp.float32) * 0.5

    def run(k):
        call = pl.pallas_call(
            functools.partial(_chain_kernel, k, use_exp),
            grid=(shape[0] // blk,),
            in_specs=[pl.BlockSpec((blk,) + shape[1:],
                                   lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((blk,) + shape[1:], lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))

        @jax.jit
        def chained(x):
            for _ in range(iters):
                x = call(x)
            return x

        return _timed_net(chained, (x0,), iters)

    t_lo, t_hi = run(k_lo), run(k_hi)
    n_el = int(np.prod(shape))
    rate = (k_hi - k_lo) * n_el / max(t_hi - t_lo, 1e-9)
    print(f"  calibrate(exp={use_exp}): t({k_lo})={t_lo*1e3:.3f} ms "
          f"t({k_hi})={t_hi*1e3:.3f} ms", file=sys.stderr, flush=True)
    return rate                          # ops/s (muls or exps)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    assert jax.default_backend() == "tpu", "roofline audit needs the chip"

    mul_rate = calibrate(use_exp=False)
    exp_rate = calibrate(use_exp=True, k_lo=4, k_hi=20)
    exp_cost = mul_rate / exp_rate       # exp price in multiply units
    print(f"calibrated: mul {mul_rate/1e12:.2f} Tops/s, "
          f"exp {exp_rate/1e12:.2f} Texp/s (= {exp_cost:.1f} muls)",
          flush=True)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(B_, L_, D_)), jnp.bfloat16)
    dt = jnp.asarray(rng.uniform(0.1, 0.9, (B_, L_, D_)), jnp.float32)
    A = jnp.asarray(-rng.uniform(0.5, 2.0, (D_, N_)), jnp.float32)
    Bm = jnp.asarray(rng.normal(size=(B_, L_, N_)), jnp.bfloat16)
    Cm = jnp.asarray(rng.normal(size=(B_, L_, N_)), jnp.bfloat16)

    SCAN_ITERS = 6

    @jax.jit
    def fwd_chain(u, dt, A, Bm, Cm):
        acc = 0.0
        for _ in range(SCAN_ITERS):
            r = selective_scan(u, dt, A, Bm, Cm)
            acc = acc + r
            u = u + (0.0 * r).astype(u.dtype)     # dependent chain
        return acc

    t_fwd = _timed_net(fwd_chain, (u, dt, A, Bm, Cm), SCAN_ITERS)

    def loss(u, dt, A, Bm, Cm):
        return jnp.sum(selective_scan(u, dt, A, Bm, Cm).astype(jnp.float32))

    grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    @jax.jit
    def bwd_chain(u, dt, A, Bm, Cm):
        acc = 0.0
        for _ in range(SCAN_ITERS):
            g = grad_fn(u, dt, A, Bm, Cm)
            acc = acc + g[1]
            u = u + (0.0 * g[0]).astype(u.dtype)
        return acc

    t_fwdbwd = _timed_net(bwd_chain, (u, dt, A, Bm, Cm), SCAN_ITERS)

    # analytic per-(L, n, d)-element op counts for the chunked kernels
    # (ops/selective_scan.py).  L is padded to the BL grid in-kernel.
    L_pad = (L_ + BL - 1) // BL * BL
    elements = B_ * L_pad * N_ * D_
    # forward: a1 = exp(dt*A) [1 mul + 1 exp]; bb = B*(dt*u) [1 mul; dt*u
    # amortized over n]; sweep1 h=b+a*h [2]; segment doubling [~2*log2(G)/SEG
    # ~ 1]; sweep2 [2]; y reduction h*C + add [2]  => ~9 muls + 1 exp
    fwd_ops = 9 + exp_cost
    # backward: a1 [1 mul + 1 exp]; bb [1]; phase-1 recon sweeps [2+2+1(dbl)]
    # + ah store [1] + dC h*dy+add [2]; phase-2 q=C*dy [1], p-recurrence
    # sweeps [2+2+1]; reductions: gb g*B+add [2], gsa g*ah [1],
    # ddt gsa*A+add & gb*u+add [3], dB g*dtu+add [2], dA gsa*dt+add [2]
    # => ~25 muls + 1 exp
    bwd_ops = 25 + exp_cost

    implied_fwd = t_fwd * mul_rate / elements
    t_bwd = t_fwdbwd - t_fwd
    implied_bwd = t_bwd * mul_rate / elements
    out = {
        "geometry": {"B": B_, "L": L_, "L_pad": L_pad, "d": D_, "n": N_,
                     "BL": BL, "SEG": SEG},
        "calibration": {"mul_Tops": round(mul_rate / 1e12, 3),
                        "exp_Texp": round(exp_rate / 1e12, 3),
                        "exp_cost_muls": round(exp_cost, 2)},
        "fwd": {"ms": round(t_fwd * 1e3, 3),
                "implied_ops_per_element": round(implied_fwd, 2),
                "analytic_ops_per_element": round(fwd_ops, 2),
                "overhead_x": round(implied_fwd / fwd_ops, 2)},
        "bwd": {"ms": round(t_bwd * 1e3, 3),
                "implied_ops_per_element": round(implied_bwd, 2),
                "analytic_ops_per_element": round(bwd_ops, 2),
                "overhead_x": round(implied_bwd / bwd_ops, 2)},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
