"""Numeric torch parity for the optimizer (the reference trains with
torch.optim.AdamW at its defaults, train2_seq.py:539) — pins learning-rate
injection, bias correction, eps placement and decoupled weight decay.
"""

import os

import numpy as np
import jax.numpy as jnp
import torch

from deepsense6g_tii_tpu.train.state import make_optimizer, set_learning_rate


def test_adamw_matches_torch_trajectory():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(64,)).astype(np.float32)
    grads = [rng.normal(size=(64,)).astype(np.float32) for _ in range(5)]
    lr = 1e-3

    # torch reference
    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.AdamW([tp], lr=lr)      # defaults: betas (0.9, 0.999),
    for g in grads:                           # eps 1e-8, weight_decay 0.01
        opt.zero_grad(set_to_none=True)
        tp.grad = torch.tensor(g)
        opt.step()

    # ours (the exact transformation the train step uses)
    tx = make_optimizer()
    params = {"w": jnp.asarray(p0)}
    opt_state = tx.init(params)
    for g in grads:
        opt_state = set_learning_rate(opt_state, lr)
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = {"w": params["w"] + updates["w"]}

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), rtol=0, atol=2e-6)


def test_adamw_lr_injection_per_step():
    """set_learning_rate changes the step size mid-run exactly like
    rebuilding a torch optimizer with a new lr (the cyclic scheduler path,
    scheduler.py / train2_seq.py:540-547)."""
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(16,)).astype(np.float32)
    grads = [rng.normal(size=(16,)).astype(np.float32) for _ in range(4)]
    lrs = [1e-3, 1e-3, 2.5e-4, 2.5e-4]

    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.AdamW([tp], lr=lrs[0])
    for g, lr in zip(grads, lrs):
        for group in opt.param_groups:
            group["lr"] = lr
        opt.zero_grad(set_to_none=True)
        tp.grad = torch.tensor(g)
        opt.step()

    tx = make_optimizer()
    params = {"w": jnp.asarray(p0)}
    opt_state = tx.init(params)
    for g, lr in zip(grads, lrs):
        opt_state = set_learning_rate(opt_state, lr)
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = {"w": params["w"] + updates["w"]}

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), rtol=0, atol=2e-6)


class TestGradAccum:
    """grad_accum K: scanned microbatch grads, one exactly-combined update
    (train/steps.py _make_step_body grad_accum).  With no batch-dependent
    layers the result must equal the full-batch step exactly; with
    BatchNorm + padded rows it must equal the manual sequential oracle
    (per-microbatch BN stats, d_i-weighted gradient average)."""

    @staticmethod
    def _linear_model():
        import flax.linen as nn

        class LinearTiny(nn.Module):
            """BeamFuser call signature, no BN/dropout — grad accumulation
            is mathematically exact vs the full batch for this model."""

            @nn.compact
            def __call__(self, image, lidar, radar, gps, rebuild_feats=None,
                         train=False, sample_mask=None):
                del rebuild_feats, sample_mask
                B = image.shape[0]
                z = jnp.concatenate(
                    [x.reshape(B, -1) for x in
                     (image[:, :, ::16, ::16], lidar[:, :, ::16, ::16],
                      radar[:, :, ::16, ::16], gps)], axis=-1)
                # keep a batch_stats collection so the step's mutable
                # handling stays on its normal path
                self.variable("batch_stats", "noop",
                              lambda: jnp.zeros(()))
                return nn.Dense(64, name="out")(z / 255.0)

        return LinearTiny()

    def test_equals_full_batch_without_bn_dropout(self):
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from synthetic_data import make_batch
        from deepsense6g_tii_tpu.config import GlobalConfig
        from deepsense6g_tii_tpu.train.state import create_train_state
        from deepsense6g_tii_tpu.train.steps import make_train_step

        cfg = GlobalConfig(seq_len=2, use_pallas_scan=False,
                           compute_dtype="float32")
        model = self._linear_model()
        rng = np.random.default_rng(3)
        batch = {k: jnp.asarray(v) for k, v in make_batch(rng, B=8).items()
                 if k != "scenario"}
        variables = model.init(
            __import__("jax").random.PRNGKey(0), batch["image"],
            batch["lidar"], batch["radar"], batch["gps"])

        jax = __import__("jax")
        copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
        tx = make_optimizer()
        step1 = make_train_step(model, cfg, tx, use_ema=True)
        stepK = make_train_step(model, cfg, tx, use_ema=True, grad_accum=4)
        # the steps donate their state argument -> independent copies
        s1 = create_train_state(copy(variables), tx)
        sK = create_train_state(copy(variables), tx)
        for _ in range(3):
            s1, m1 = step1(s1, batch, 1e-3)
            sK, mK = stepK(sK, batch, 1e-3)
            np.testing.assert_allclose(float(m1["loss"]), float(mK["loss"]),
                                       rtol=1e-5)
            np.testing.assert_array_equal(np.asarray(m1["ranks"]),
                                          np.asarray(mK["ranks"]))
        for a, b in zip(__import__("jax").tree_util.tree_leaves(s1.params),
                        __import__("jax").tree_util.tree_leaves(sK.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    def test_matches_manual_oracle_with_bn_and_padding(self):
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import jax
        import optax
        from synthetic_data import TinyFuser, make_batch
        from deepsense6g_tii_tpu.config import GlobalConfig
        from deepsense6g_tii_tpu.train.losses import focal_loss
        from deepsense6g_tii_tpu.train.state import (create_train_state,
                                                     set_learning_rate)
        from deepsense6g_tii_tpu.train.steps import make_train_step

        cfg = GlobalConfig(seq_len=2, use_pallas_scan=False,
                           compute_dtype="float32")
        model = TinyFuser(cfg)
        rng = np.random.default_rng(7)
        K, B = 2, 8
        batch = {k: jnp.asarray(v) for k, v in make_batch(rng, B=B).items()
                 if k != "scenario"}
        # asymmetric padding: microbatch [0::2] keeps 4 valid rows,
        # microbatch [1::2] keeps 3 -> d-weighted (not plain) average
        batch["valid"] = jnp.asarray([1, 1, 1, 1, 1, 1, 1, 0], jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), batch["image"],
                               batch["lidar"], batch["radar"], batch["gps"])

        copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
        tx = make_optimizer()
        stepK = make_train_step(model, cfg, tx, use_ema=True, grad_accum=K)
        state = create_train_state(copy(variables), tx)
        # the step donates its state argument; keep an undonated twin for
        # the manual oracle below
        oracle_state = create_train_state(copy(variables), tx)
        new_state, metrics = stepK(state, batch, 1e-3)
        state = oracle_state

        # -- manual oracle: sequential microbatches, chained BN stats -----
        from deepsense6g_tii_tpu.models.resnet import bn_sample_mask

        def loss_fn(params, stats, mb, rngs):
            out, aux = model.apply(
                {"params": params, "batch_stats": stats},
                mb["image"], mb["lidar"], mb["radar"], mb["gps"],
                train=True, rngs=rngs, mutable=["batch_stats"],
                sample_mask=mb["valid"])
            loss = focal_loss(out, mb["beam"], num_classes=64,
                              sample_weight=mb["valid"])
            return loss, (out, aux["batch_stats"])

        base = jax.random.PRNGKey(100)
        drop = jax.random.fold_in(base, 0)     # state.step == 0
        stats = state.batch_stats
        gsum = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        wsum = lsum = 0.0
        logits_full = np.zeros((B, 64), np.float32)
        for i in range(K):
            mb = {k: v[i::K] for k, v in batch.items()}
            rngs = {"dropout": jax.random.fold_in(drop, i)}
            (li, (out, stats)), gi = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, stats, mb, rngs)
            d = float(np.asarray(mb["valid"]).sum())
            gsum = jax.tree_util.tree_map(lambda a, g: a + d * g, gsum, gi)
            wsum += d
            lsum += d * float(li)
            logits_full[i::K] = np.asarray(out, np.float32)
        grads = jax.tree_util.tree_map(lambda g: g / wsum, gsum)

        np.testing.assert_allclose(float(metrics["loss"]), lsum / wsum,
                                   rtol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(metrics["ranks"]),
            np.asarray(jnp.argsort(jnp.asarray(logits_full), axis=-1,
                                   descending=True)))
        opt_state = set_learning_rate(state.opt_state, 1e-3)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # f32 reduction-order noise through AdamW's rsqrt costs a few e-5
        # relative; a weighting bug (plain vs d-weighted average, 4-vs-3
        # rows here) would shift gradients ~15% -> far outside this band
        for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                        jax.tree_util.tree_leaves(stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_indivisible_batch_raises(self):
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import jax
        import pytest
        from synthetic_data import TinyFuser, make_batch
        from deepsense6g_tii_tpu.config import GlobalConfig
        from deepsense6g_tii_tpu.train.state import create_train_state
        from deepsense6g_tii_tpu.train.steps import make_train_step

        cfg = GlobalConfig(seq_len=2, use_pallas_scan=False,
                           compute_dtype="float32")
        model = TinyFuser(cfg)
        rng = np.random.default_rng(5)
        batch = {k: jnp.asarray(v) for k, v in make_batch(rng, B=6).items()
                 if k != "scenario"}
        variables = model.init(jax.random.PRNGKey(0), batch["image"],
                               batch["lidar"], batch["radar"], batch["gps"])
        tx = make_optimizer()
        step = make_train_step(model, cfg, tx, grad_accum=4)
        state = create_train_state(variables, tx)
        with pytest.raises(ValueError, match="grad_accum"):
            step(state, batch, 1e-3)
