"""Numeric torch parity for the optimizer (the reference trains with
torch.optim.AdamW at its defaults, train2_seq.py:539) — pins learning-rate
injection, bias correction, eps placement and decoupled weight decay.
"""

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
