"""E2E verify driver: flash_mha on the REAL TPU vs the jnp oracle.

Covers the Mosaic blockspec fix (lane-replicated lse/dvec): fwd logits,
all three gradients, with and without dropout, at the production geometry
(B=2, H=4, T=962, D=128 — same T/D as the GPT fusion stack) and at an
uneven tail geometry.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from deepsense6g_tii_tpu.ops.flash_attention import (
    flash_mha, dropout_scale_reference, derive_seed)

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


def check(B, H, T, D, dropout_p, dtype, tol):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32) * 0.3,
                           dtype=dtype) for _ in range(3))
    sm_scale = D ** -0.5
    key = jax.random.PRNGKey(7)

    if dropout_p > 0.0:
        seed = derive_seed(key)
        drop = dropout_scale_reference(seed, B * H, T, dropout_p)
    else:
        drop = None

    f_flash = jax.jit(lambda q, k, v: flash_mha(
        q, k, v, sm_scale=sm_scale, dropout_p=dropout_p,
        rng=key if dropout_p else None, interpret=False))
    f_oracle = jax.jit(lambda q, k, v: oracle(q, k, v, sm_scale, drop))

    o1, o2 = f_flash(q, k, v), f_oracle(q, k, v)
    err_f = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, sm_scale=sm_scale,
                                 dropout_p=dropout_p,
                                 rng=key if dropout_p else None,
                                 interpret=False).astype(jnp.float32) ** 2)

    def loss_oracle(q, k, v):
        return jnp.sum(oracle(q, k, v, sm_scale, drop).astype(jnp.float32) ** 2)

    g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2)))(q, k, v)
    errs_g = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
              for a, b in zip(g1, g2)]
    status = "OK" if err_f < tol and max(errs_g) < tol * 20 else "FAIL"
    print(f"{status} B={B} H={H} T={T} D={D} p={dropout_p} {dtype}: "
          f"fwd maxerr={err_f:.2e} grads maxerr={errs_g}")
    return status == "OK"


ok = True
ok &= check(2, 4, 962, 128, 0.0, jnp.float32, 5e-4)
ok &= check(2, 4, 962, 128, 0.1, jnp.float32, 5e-4)
ok &= check(2, 4, 962, 128, 0.0, jnp.bfloat16, 3e-2)
ok &= check(1, 2, 512, 128, 0.0, jnp.float32, 5e-4)   # no padded tail
print("VERIFY", "PASS" if ok else "FAIL")
raise SystemExit(0 if ok else 1)
