"""Functional train state.

Carries everything the reference keeps as Python-object mutable state —
model params, BatchNorm running stats, AdamW optimizer state, the EMA shadow
weights (train2_seq.py:303-334) and the step counter — as one device-resident
PyTree, so a whole optimization step is a single jitted, donated function and
EMA never round-trips to host (SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any          # EMA shadow (== params when EMA disabled)
    step: jnp.ndarray


def flatten_transform(
        inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """optax.flatten equivalent with a TPU-safe unflatten.

    Flattening turns the ~580 small per-leaf Adam kernels into a handful of
    fused ops over one concatenated 103M-element f32 buffer (identical math —
    Adam is elementwise with global hyperparams).  optax.flatten's
    ravel_pytree unflatten lowers to one giant ``split`` whose output XLA
    lays out as f32[N/2, 2]{T(8,128)} on this TPU backend — a 64x padding
    blow-up that OOMs HBM — so the unflatten here is per-leaf
    ``dynamic_slice`` instead (fast to compile, no layout pathology)."""

    def _ravel(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.concatenate(
            [l.reshape(-1).astype(jnp.float32) for l in leaves])

    def _unravel(flat, like):
        leaves, treedef = jax.tree_util.tree_flatten(like)
        out, off = [], 0
        for l in leaves:
            seg = jax.lax.dynamic_slice(flat, (off,), (l.size,))
            # barrier: without it XLA layout assignment canonicalizes the
            # whole flat buffer to f32[N/2,2]{T(8,128)} (64x padding -> OOM)
            # to match small (..., 2)-shaped leaf reshapes downstream
            seg = jax.lax.optimization_barrier(seg)
            out.append(seg.reshape(l.shape).astype(l.dtype))
            off += l.size
        return jax.tree_util.tree_unflatten(treedef, out)

    def init_fn(params):
        return inner.init(_ravel(params))

    def update_fn(updates, state, params=None):
        flat_updates = _ravel(updates)
        flat_params = _ravel(params) if params is not None else None
        flat_out, state = inner.update(flat_updates, state, flat_params)
        return _unravel(flat_out, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(weight_decay: float = 0.01,
                   flatten: bool = False,
                   mu_dtype: Optional[str] = None
                   ) -> optax.GradientTransformation:
    """AdamW with injectable learning rate (torch AdamW defaults: betas
    (0.9, 0.999), eps 1e-8, wd 0.01, applied to all params — the reference's
    decay/no-decay split is dead code, SURVEY.md section 2a #19).

    ``flatten`` applies :func:`flatten_transform`; trajectory equality with
    the per-leaf optimizer is pinned in tests/test_engine.py.  MEASURED on
    one v5e (r2): standalone the flattened update wins (77 vs 91 ms incl
    sync), but inside the full train step it LOSES (40.3 vs 42.7
    samples/s/chip) — the optimization_barrier serializes the update against
    the backward, while per-leaf updates overlap with it.  Default off.

    ``mu_dtype`` ("bfloat16") stores Adam's first moment in reduced
    precision (GlobalConfig.opt_mu_dtype): mu is a smoothed gradient average
    whose bf16 rounding perturbs the update direction by ~2^-9 relative —
    negligible against gradient noise — while nu (inside rsqrt) and the
    params stay f32.  Saves 2 bytes/param of HBM (207 MB at 103M params)."""
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=weight_decay,
        mu_dtype=jnp.dtype(mu_dtype) if mu_dtype else None)
    return flatten_transform(tx) if flatten else tx


def create_train_state(variables: dict,
                       tx: Optional[optax.GradientTransformation] = None
                       ) -> TrainState:
    tx = tx or make_optimizer()
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.zeros((), jnp.int32),
    )


def set_learning_rate(opt_state, lr):
    """Returns opt_state with the injected learning rate replaced (works
    inside jit: hyperparams live in the state PyTree)."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)
