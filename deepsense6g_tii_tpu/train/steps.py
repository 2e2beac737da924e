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
from ..data.cache import RADAR_UINT8_SCALE
from ..data.features import HIST_MAX_PER_PIXEL
from .losses import cross_entropy_loss, focal_loss
from .state import TrainState, set_learning_rate


def _model_inputs(batch: Dict[str, jnp.ndarray]):
    return (batch["image"], batch["lidar"], batch["radar"], batch["gps"])


def _upcast_f16(batch):
    """Compactly-stored batches (data/cache.py::CachedBatchLoader) -> float32
    on device.  f16 -> f32 and uint8 -> f32 (the image modality's exact
    storage dtype: camera frames — original AND reference-augmented — are
    uint8-valued) are value-exact, so the step math is identical to a
    host-upcast batch while the host copies and the host->device transfer
    run at half / a quarter of the bytes.  A uint8 *lidar* leaf is the
    cache's raw BEV clip-count storage (0..5 levels, data/cache.py): the
    float32 division by HIST_MAX_PER_PIXEL here reconstructs
    features.py::lidar_to_bev_np's hist/5 map bit-exactly on device.  A
    uint8 *radar* leaf is the cache's opt-in lossy fixed-point storage of
    the [0, 1] minmax maps (scale 255, data/cache.py::RADAR_UINT8_SCALE).
    int32 labels pass through; no-op for float32 batches (same compiled
    program as before for them)."""
    def up(key, v):
        if v.dtype == jnp.uint8 and key == "lidar":
            return v.astype(jnp.float32) / jnp.float32(HIST_MAX_PER_PIXEL)
        if v.dtype == jnp.uint8 and key == "radar":
            return v.astype(jnp.float32) / jnp.float32(RADAR_UINT8_SCALE)
        if v.dtype in (jnp.float16, jnp.uint8):
            return v.astype(jnp.float32)
        return v

    return {k: jax.tree_util.tree_map(functools.partial(up, k), v)
            for k, v in batch.items()}


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


def _make_step_parts(model, cfg: GlobalConfig, tx,
                     loss_name: str = "focal",
                     temp_coef: bool = True,
                     use_ema: bool = False,
                     ema_decay: float = 0.999,
                     clip_grad_norm: Optional[float] = None,
                     rng_seed: int = 100):
    """Shared building blocks for every train-step variant: the
    value_and_grad-able ``loss_fn`` and the optimizer/EMA ``apply_update``.
    Factored out so the nested (K-dispatch scan over a grad-accum scan) and
    flattened (one scan over K*GA microbatches) step programs are built
    from literally the same math."""

    base_rng = jax.random.PRNGKey(rng_seed)

    def loss_fn(params, batch_stats, batch, rngs):
        batch = _upcast_f16(batch)
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

    def apply_update(state, grads, new_stats, lr):
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

        return state.replace(
            params=params, batch_stats=new_stats, opt_state=opt_state,
            ema_params=ema, step=state.step + 1)

    return base_rng, loss_fn, apply_update


def _make_step_body(model, cfg: GlobalConfig, tx,
                    loss_name: str = "focal",
                    temp_coef: bool = True,
                    use_ema: bool = False,
                    ema_decay: float = 0.999,
                    clip_grad_norm: Optional[float] = None,
                    rng_seed: int = 100,
                    grad_accum: int = 1,
                    grad_accum_unroll: int = 1):
    """Unjitted (state, batch, lr) -> (state, metrics) train-step body,
    shared by the single-step and multi-step (scan) wrappers.

    ``grad_accum`` K > 1 runs the forward/backward over K microbatches
    (``lax.scan``) and applies ONE optimizer/EMA update on the exactly
    combined gradient — activation memory scales with B/K, enabling
    effective batches that do not fit at once.  Exactness: each
    microbatch's loss is a weighted mean (losses.py ``_weighted_mean``),
    so the full-batch gradient is the d_i-weighted average of microbatch
    gradients, d_i = that microbatch's weight total (its row count when
    unpadded — equal d_i then reduce to a plain average).
    ``grad_accum_unroll`` inlines that many microbatch bodies per scan
    iteration (identical math; trades while-loop overhead for program
    size — at unroll == K the inner loop disappears entirely, at the risk
    of XLA co-scheduling microbatch activations and losing the memory
    saving that motivated grad-accum).  BatchNorm
    statistics chain through the K microbatches (K sequential
    momentum-0.9 updates; batch mean/var are per-microbatch, the standard
    grad-accum BN semantics).  Microbatch i takes batch rows [i::K], so
    each one stays evenly sharded over the ('data',) mesh axis — requires
    batch % (K * n_devices) == 0.  Dropout draws a fresh stream per
    microbatch (fold_in(step, i)).
    """

    base_rng, loss_fn, apply_update = _make_step_parts(
        model, cfg, tx, loss_name=loss_name, temp_coef=temp_coef,
        use_ema=use_ema, ema_decay=ema_decay,
        clip_grad_norm=clip_grad_norm, rng_seed=rng_seed)

    def _apply_update(state, grads, new_stats, loss, logits, lr):
        new_state = apply_update(state, grads, new_stats, lr)
        ranks = jnp.argsort(logits, axis=-1, descending=True)
        return new_state, {"loss": loss, "ranks": ranks}

    def train_step(state: TrainState, batch, lr):
        rngs = {"dropout": jax.random.fold_in(base_rng, state.step)}
        if cfg.modality_missing is not None \
                and cfg.modality_missing_type == "randlike":
            rngs["missing"] = jax.random.fold_in(base_rng, state.step + 1)
        if "rebuild_feats" in batch:
            rngs["rebuild"] = jax.random.fold_in(base_rng, state.step + 2)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rngs)
        return _apply_update(state, grads, new_stats, loss, logits, lr)

    if grad_accum <= 1:
        return train_step

    K = int(grad_accum)

    def train_step_accum(state: TrainState, batch, lr):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if b % K:
            raise ValueError(
                f"grad_accum={K} requires the batch ({b}) to split evenly")

        def split(x):
            # rows [i::K] per microbatch: the sharded batch axis factors as
            # (b//K, K) with the sharding on the major dim, so every device
            # keeps b/(K*n_dev) rows of every microbatch (no resharding)
            return x.reshape(b // K, K, *x.shape[1:]).swapaxes(0, 1)

        micro = jax.tree_util.tree_map(split, batch)
        drop_rng = jax.random.fold_in(base_rng, state.step)
        miss_rng = jax.random.fold_in(base_rng, state.step + 1)
        reb_rng = jax.random.fold_in(base_rng, state.step + 2)

        def f(carry, xs):
            stats, gsum, wsum, lsum = carry
            mb, i = xs
            rngs = {"dropout": jax.random.fold_in(drop_rng, i)}
            if cfg.modality_missing is not None \
                    and cfg.modality_missing_type == "randlike":
                rngs["missing"] = jax.random.fold_in(miss_rng, i)
            if "rebuild_feats" in mb:
                rngs["rebuild"] = jax.random.fold_in(reb_rng, i)
            (loss, (logits, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, stats, mb, rngs)
            # d = the microbatch's _weighted_mean denominator, up to a
            # constant factor shared by all microbatches (equal row counts;
            # the pred_len flatten multiplies every d equally) — so the
            # d-weighted average below equals the full-batch gradient
            d = (jnp.maximum(mb["valid"].astype(jnp.float32).sum(), 0.0)
                 if "valid" in mb else jnp.asarray(1.0, jnp.float32))
            gsum = jax.tree_util.tree_map(lambda a, g: a + d * g, gsum, grads)
            return (stats, gsum, wsum + d, lsum + d * loss), logits

        gzero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        carry0 = (state.batch_stats, gzero, jnp.asarray(0.0, jnp.float32),
                  jnp.asarray(0.0, jnp.float32))
        (new_stats, gsum, wsum, lsum), logits_k = jax.lax.scan(
            f, carry0, (micro, jnp.arange(K)),
            unroll=min(int(grad_accum_unroll), K))
        denom = jnp.maximum(wsum, 1e-9)
        grads = jax.tree_util.tree_map(lambda g: g / denom, gsum)
        loss = lsum / denom
        # inverse of split: (K, b//K, ...)[i, j] is batch row j*K + i
        logits = jnp.swapaxes(logits_k, 0, 1).reshape(
            b, *logits_k.shape[2:])
        return _apply_update(state, grads, new_stats, loss, logits, lr)

    return train_step_accum


def make_train_step(model, cfg: GlobalConfig, tx, **kw):
    """Returns jitted (state, batch, lr) -> (state, metrics)."""
    return jax.jit(_make_step_body(model, cfg, tx, **kw), donate_argnums=(0,))


def _make_flat_multi_step(model, cfg: GlobalConfig, tx, unroll: int = 1,
                          grad_accum: int = 2, **kw):
    """One ``lax.scan`` over all K*GA microbatches of a K-step dispatch,
    applying the optimizer/EMA update under ``lax.cond`` on every GA-th
    iteration — the flattened form of make_multi_train_step(grad_accum=GA),
    which nests a GA-microbatch scan inside the K-step scan.

    Motivation (measured, NOTES r3/r4): each scan level costs a ~9-12 ms
    while-loop floor per optimizer step for the ~1.6 GB train-state carry;
    the nested Mamba default (K=8, GA=2) pays it at both levels (xprof
    `while` 22.4 ms/step).  Flattening runs one loop of K*GA iterations —
    same math, one carry.

    Exactness vs the nested form (pinned by tests/test_engine.py):
    - identical RNG streams: microbatch i of optimizer step s draws
      fold_in(fold_in(base_rng, step_s), i), where step_s is the
      pre-update ``state.step`` carried through the scan;
    - identical gradient combine: d-weighted gsum accumulated in the carry,
      divided by the group's weight total at the update;
    - BatchNorm statistics chain through every microbatch in order.

    Metrics match make_multi_train_step: loss (K,), ranks (K, B, beams) —
    microbatch logits are emitted as scan outputs and reassembled outside
    (batch row j of step s lives at microbatch s*GA + j%GA, row j//GA).
    """
    GA = int(grad_accum)
    if GA <= 1:
        raise ValueError("flattened dispatch requires grad_accum > 1")
    base_rng, loss_fn, apply_update = _make_step_parts(model, cfg, tx, **kw)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, batches, lr):
        K = jax.tree_util.tree_leaves(batches)[0].shape[0]
        b = jax.tree_util.tree_leaves(batches)[0].shape[1]
        if b % GA:
            raise ValueError(
                f"grad_accum={GA} requires the batch ({b}) to split evenly")

        def split(x):
            # microbatch s*GA+i = batches[s][i::GA] (rows [i::GA], exactly
            # train_step_accum's split — every device keeps b/(GA*n_dev)
            # rows of every microbatch, no resharding)
            return (x.reshape(K, b // GA, GA, *x.shape[2:])
                     .swapaxes(1, 2)
                     .reshape(K * GA, b // GA, *x.shape[2:]))

        micro = jax.tree_util.tree_map(split, batches)
        gzero = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def f(carry, xs):
            st, gsum, wsum = carry
            mb, i = xs
            drop_rng = jax.random.fold_in(base_rng, st.step)
            rngs = {"dropout": jax.random.fold_in(drop_rng, i)}
            if cfg.modality_missing is not None \
                    and cfg.modality_missing_type == "randlike":
                rngs["missing"] = jax.random.fold_in(
                    jax.random.fold_in(base_rng, st.step + 1), i)
            if "rebuild_feats" in mb:
                rngs["rebuild"] = jax.random.fold_in(
                    jax.random.fold_in(base_rng, st.step + 2), i)
            (loss, (logits, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params, st.batch_stats, mb, rngs)
            d = (jnp.maximum(mb["valid"].astype(jnp.float32).sum(), 0.0)
                 if "valid" in mb else jnp.asarray(1.0, jnp.float32))
            gsum = jax.tree_util.tree_map(
                lambda a, g: a + d * g, gsum, grads)
            wsum = wsum + d
            st = st.replace(batch_stats=stats)

            def upd(args):
                st_, gsum_, wsum_ = args
                denom = jnp.maximum(wsum_, 1e-9)
                gavg = jax.tree_util.tree_map(
                    lambda g: g / denom, gsum_)
                new_st = apply_update(st_, gavg, st_.batch_stats, lr)
                return (new_st, gzero, jnp.asarray(0.0, jnp.float32))

            carry = jax.lax.cond(i == GA - 1, upd, lambda a: a,
                                 (st, gsum, wsum))
            return carry, (logits, d, d * loss)

        carry0 = (state, gzero, jnp.asarray(0.0, jnp.float32))
        (final_state, _, _), (logits_all, d_all, dl_all) = jax.lax.scan(
            f, carry0, (micro, jnp.tile(jnp.arange(GA), K)), unroll=unroll)

        # reassemble: (K*GA, b//GA, ...) -> (K, b, ...) with row j*GA+i of
        # step s coming from microbatch s*GA+i row j (inverse of split)
        logits = (logits_all
                  .reshape(K, GA, b // GA, *logits_all.shape[2:])
                  .swapaxes(1, 2)
                  .reshape(K, b, *logits_all.shape[2:]))
        d_k = d_all.reshape(K, GA).sum(axis=1)
        loss = dl_all.reshape(K, GA).sum(axis=1) / jnp.maximum(d_k, 1e-9)
        ranks = jnp.argsort(logits, axis=-1, descending=True)
        return final_state, {"loss": loss, "ranks": ranks}

    return multi_step


def make_multi_train_step(model, cfg: GlobalConfig, tx, unroll: int = 1,
                          flatten_accum: bool = False, **kw):
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

    ``flatten_accum`` (requires grad_accum > 1): build the dispatch as ONE
    scan over K*GA microbatches with a conditional update instead of the
    K-over-GA scan nest — see _make_flat_multi_step.
    """
    if flatten_accum and int(kw.get("grad_accum", 1)) > 1:
        kw.pop("grad_accum_unroll", None)
        return _make_flat_multi_step(model, cfg, tx, unroll=unroll, **kw)
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
        batch = _upcast_f16(batch)
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
