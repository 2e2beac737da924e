"""Jitted train / eval / test steps.

One compiled XLA program per step covering forward, focal loss on soft
targets, backward, AdamW update, EMA shadow update and the cross-replica
gradient all-reduce (replacing the reference's eager loop + DataParallel
scatter/gather, train2_seq.py:94-156).  The batch arrives sharded over the
('data',) mesh axis; parameters are replicated; XLA/GSPMD inserts the
collectives.  BatchNorm statistics are computed over the global batch (the
batch mean/var reductions cross shards automatically).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import GlobalConfig
from .losses import cross_entropy_loss, focal_loss
from .state import TrainState, set_learning_rate


def _model_inputs(batch: Dict[str, jnp.ndarray]):
    return (batch["image"], batch["lidar"], batch["radar"], batch["gps"])


def _compute_loss(cfg: GlobalConfig, loss_name: str, temp_coef: bool,
                  logits, batch):
    """Loss dispatch mirroring train2_seq.py:89-92,121-124.

    pred_len > 1: logits (B, P, C) and targets (B, P[, C]) are flattened so
    the per-class loss matches the 30to5 trainer (train2_seq_30to5.py:107-120).
    """
    target = batch["beam"] if temp_coef else batch["beamidx"]
    weight = batch.get("valid")          # (B,) 1.0 real / 0.0 padded rows
    if logits.ndim == 3:
        if weight is not None:
            weight = jnp.repeat(weight, logits.shape[1])
        logits = logits.reshape(-1, logits.shape[-1])
        target = target.reshape((-1, target.shape[-1])
                                if temp_coef else (-1,))
    if loss_name == "focal":
        return focal_loss(logits, target, num_classes=cfg.num_beams,
                          sample_weight=weight)
    return cross_entropy_loss(logits, target, sample_weight=weight)


def _make_step_body(model, cfg: GlobalConfig, tx,
                    loss_name: str = "focal",
                    temp_coef: bool = True,
                    use_ema: bool = False,
                    ema_decay: float = 0.999,
                    clip_grad_norm: Optional[float] = None,
                    rng_seed: int = 100):
    """Unjitted (state, batch, lr) -> (state, metrics) train-step body,
    shared by the single-step and multi-step (scan) wrappers."""

    base_rng = jax.random.PRNGKey(rng_seed)

    def loss_fn(params, batch_stats, batch, rngs):
        variables = {"params": params, "batch_stats": batch_stats}
        # the mask kwarg is only threaded when the engine padded the batch,
        # so unpadded steps keep their exact compiled program
        mask_kw = ({"sample_mask": batch["valid"]} if "valid" in batch else {})
        (logits, aux) = model.apply(
            variables, *_model_inputs(batch),
            rebuild_feats=batch.get("rebuild_feats"),
            train=True, rngs=rngs, mutable=["batch_stats"], **mask_kw)
        loss = _compute_loss(cfg, loss_name, temp_coef, logits, batch)
        return loss, (logits, aux["batch_stats"])

    def train_step(state: TrainState, batch, lr):
        rngs = {"dropout": jax.random.fold_in(base_rng, state.step)}
        if cfg.modality_missing is not None \
                and cfg.modality_missing_type == "randlike":
            rngs["missing"] = jax.random.fold_in(base_rng, state.step + 1)
        if "rebuild_feats" in batch:
            rngs["rebuild"] = jax.random.fold_in(base_rng, state.step + 2)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rngs)
        if clip_grad_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip_grad_norm / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

        opt_state = set_learning_rate(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        if use_ema:
            ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params, params)
        else:
            ema = params

        new_state = state.replace(
            params=params, batch_stats=new_stats, opt_state=opt_state,
            ema_params=ema, step=state.step + 1)
        ranks = jnp.argsort(logits, axis=-1, descending=True)
        return new_state, {"loss": loss, "ranks": ranks}

    return train_step


def make_train_step(model, cfg: GlobalConfig, tx, **kw):
    """Returns jitted (state, batch, lr) -> (state, metrics)."""
    return jax.jit(_make_step_body(model, cfg, tx, **kw), donate_argnums=(0,))


def make_multi_train_step(model, cfg: GlobalConfig, tx, unroll: int = 1,
                          **kw):
    """Returns jitted (state, batches, lr) -> (state, metrics) running one
    optimizer step per leading-axis slice of ``batches`` inside a single
    ``lax.scan`` dispatch.  ``unroll`` inlines that many step bodies per
    loop iteration (less while-loop/slicing overhead, larger program).

    TPU-native replacement for the reference's step-at-a-time eager loop
    (train2_seq.py:94-156): K steps leave the host entirely — one dispatch,
    one compiled program, no host round-trip between steps.  On a tunneled
    host this removes the ~30 ms/step dispatch gap; on a co-located host it
    still shrinks the loop's host work K-fold.  Per-step math is identical
    to ``make_train_step`` (the dropout streams fold from ``state.step``,
    which increments inside the scan), pinned by
    tests/test_engine.py::TestMultiStep.

    ``batches``: the same pytree a single step takes, with a leading K axis
    on every leaf (stack K loader batches).  Metrics come back stacked:
    loss (K,), ranks (K, B, num_beams).
    """
    body = _make_step_body(model, cfg, tx, **kw)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, batches, lr):
        def f(s, b):
            return body(s, b, lr)

        return jax.lax.scan(f, state, batches, unroll=unroll)

    return multi_step


def make_eval_step(model, cfg: GlobalConfig,
                   loss_name: str = "focal",
                   temp_coef: bool = True,
                   use_ema: bool = False,
                   rng_seed: int = 100):
    """Returns jitted (state, batch) -> metrics (loss, ranks, confidence).

    With ``use_ema`` the EMA shadow weights are applied for the forward,
    mirroring ema.apply_shadow()/restore() around validation
    (train2_seq.py:159-160,220-221) — functionally, just a different leaf of
    the state, no copying.
    """

    base_rng = jax.random.PRNGKey(rng_seed)

    @jax.jit
    def eval_step(state: TrainState, batch, batch_idx=0):
        params = state.ema_params if use_ema else state.params
        variables = {"params": params, "batch_stats": state.batch_stats}
        rngs = None
        if cfg.modality_missing is not None \
                and cfg.modality_missing_type == "randlike":
            # randlike missing substitutes random tensors at eval too
            # (mambafuser_seq.py:361-391 under --Val).  Fold in the caller's
            # batch counter so each eval batch draws fresh noise — state.step
            # is constant across a validation epoch and would otherwise reuse
            # one fixed realization (the reference draws fresh torch.rand_like
            # per forward).
            key = jax.random.fold_in(base_rng, state.step)
            rngs = {"missing": jax.random.fold_in(key, batch_idx)}
        logits = model.apply(variables, *_model_inputs(batch),
                             rebuild_feats=batch.get("rebuild_feats"),
                             train=False, rngs=rngs)
        out = {
            "ranks": jnp.argsort(logits, axis=-1, descending=True),
            "confidence": jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1).max(axis=-1),
        }
        if "beam" in batch:
            out["loss"] = _compute_loss(cfg, loss_name, temp_coef, logits, batch)
        return out

    return eval_step
