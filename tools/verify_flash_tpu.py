"""E2E verify driver: flash_mha on the REAL TPU vs the jnp oracle.

Covers the Mosaic blockspec fix (lane-replicated lse/dvec): fwd logits,
all three gradients, with and without dropout, at the production geometry
(B=2, H=4, T=962, D=128 — same T/D as the GPT fusion stack) and at an
uneven tail geometry.

Both dropout implementations are verified: "hash" against the exact jnp
:func:`dropout_scale_reference`, and "hw" (the hardware PRNG, unobservable
off-chip) against the mask exported by :func:`dropout_mask`, which runs the
same in-kernel code path over the same per-tile seeding — the only oracle
for the hardware stream.  A distribution check pins the hw keep rate.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from deepsense6g_tii_tpu.ops.flash_attention import (
    flash_mha, dropout_scale_reference, dropout_mask, derive_seed)

assert jax.default_backend() == "tpu", jax.default_backend()


def oracle(q, k, v, sm_scale, drop=None):
    # the oracle runs its matmuls at full f32 MXU precision; the kernel dots
    # run at the production default (bf16 passes), so the f32 comparison
    # bottoms out around ~2e-4 — that band is MXU pass precision, not math.
    s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32), precision="highest") * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    if drop is not None:
        b, h = q.shape[:2]
        p = p * drop.reshape(b, h, *drop.shape[1:])
    return jnp.einsum("bhts,bhsd->bhtd", p, v.astype(jnp.float32),
                      precision="highest").astype(q.dtype)


def check(B, H, T, D, dropout_p, dtype, tol, impl="hash"):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32) * 0.3,
                           dtype=dtype) for _ in range(3))
    sm_scale = D ** -0.5
    key = jax.random.PRNGKey(7)

    if dropout_p > 0.0:
        seed = derive_seed(key)
        if impl == "hash":
            drop = dropout_scale_reference(seed, B * H, T, dropout_p)
        else:
            # the hw stream is unobservable off-chip: the oracle mask is
            # exported by the same in-kernel code path + per-tile seeding
            drop = dropout_mask(seed, B * H, T, dropout_p,
                                dropout_impl="hw", interpret=False)
            keep = float(jnp.mean(jnp.asarray(drop > 0, jnp.float32)))
            assert abs(keep - (1 - dropout_p)) < 5e-3, keep
    else:
        drop = None

    f_flash = jax.jit(lambda q, k, v: flash_mha(
        q, k, v, sm_scale=sm_scale, dropout_p=dropout_p,
        rng=key if dropout_p else None, interpret=False, dropout_impl=impl))
    f_oracle = jax.jit(lambda q, k, v: oracle(q, k, v, sm_scale, drop))

    o1, o2 = f_flash(q, k, v), f_oracle(q, k, v)
    err_f = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, sm_scale=sm_scale,
                                 dropout_p=dropout_p,
                                 rng=key if dropout_p else None,
                                 interpret=False,
                                 dropout_impl=impl).astype(jnp.float32) ** 2)

    def loss_oracle(q, k, v):
        return jnp.sum(oracle(q, k, v, sm_scale, drop).astype(jnp.float32) ** 2)

    g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2)))(q, k, v)
    errs_g = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
              for a, b in zip(g1, g2)]
    status = "OK" if err_f < tol and max(errs_g) < tol * 20 else "FAIL"
    print(f"{status} B={B} H={H} T={T} D={D} p={dropout_p} {dtype} {impl}: "
          f"fwd maxerr={err_f:.2e} grads maxerr={errs_g}")
    return status == "OK"


def check_mask_export():
    """dropout_mask(hash) on-chip == the exact jnp oracle (ties the export
    kernel to the tested formula, making the hw export trustworthy)."""
    seed = derive_seed(jax.random.PRNGKey(3))
    m_kernel = dropout_mask(seed, 4, 962, 0.1, dropout_impl="hash",
                            interpret=False)
    m_ref = dropout_scale_reference(seed, 4, 962, 0.1)
    same = bool(jnp.all(m_kernel == m_ref))
    print(("OK" if same else "FAIL"), "mask export (hash) == jnp oracle")
    return same


ok = True
ok &= check(2, 4, 962, 128, 0.0, jnp.float32, 5e-4)
ok &= check(2, 4, 962, 128, 0.1, jnp.float32, 5e-4)
ok &= check(2, 4, 962, 128, 0.0, jnp.bfloat16, 3e-2)
ok &= check(1, 2, 512, 128, 0.0, jnp.float32, 5e-4)   # no padded tail
ok &= check_mask_export()
ok &= check(2, 4, 962, 128, 0.1, jnp.float32, 5e-4, impl="hw")
ok &= check(2, 4, 962, 16, 0.1, jnp.float32, 5e-4, impl="hw")  # small D
ok &= check(1, 2, 512, 128, 0.1, jnp.float32, 5e-4, impl="hw")  # no tail
ok &= check(1, 4, 1922, 128, 0.1, jnp.float32, 5e-4, impl="hw")  # 30to5 T
print("VERIFY", "PASS" if ok else "FAIL")
raise SystemExit(0 if ok else 1)
