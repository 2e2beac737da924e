"""Scheduler and metric parity tests (SURVEY.md section 2a #15-16)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from deepsense6g_tii_tpu.train import metrics as M
from deepsense6g_tii_tpu.train.scheduler import (cyclic_cosine_decay_lr,
                                                 reference_recipe_lr)


def reference_torch_semantics(epoch):
    """Hand-evaluated CyclicCosineDecayLR(init_decay=15, min=2.5e-6,
    restart_interval=10, restart_lr=12.5e-5, warmup=10, warmup_start=2.5e-6),
    base lr 1e-4 (scheduler.py:82-119 with train2_seq.py:540-547 args)."""
    base, ws, mn, rl = 1e-4, 2.5e-6, 2.5e-6, 12.5e-5

    def calc(t, T, lr, mlr):
        return mlr + (lr - mlr) * (1 + math.cos(math.pi * t / T)) / 2

    if epoch < 10:
        return calc(epoch, 10, ws, base)
    if epoch < 25:
        return calc(epoch - 10, 15, base, mn)
    return calc((epoch - 25) % 10, 10, rl, mn)


class TestScheduler:
    def test_reference_recipe_parity(self):
        for e in range(0, 80):
            assert reference_recipe_lr(e) == pytest.approx(
                reference_torch_semantics(e), rel=1e-12), e

    def test_warmup_endpoints(self):
        assert reference_recipe_lr(0) == pytest.approx(2.5e-6)
        # one epoch past warmup starts at base lr
        assert reference_recipe_lr(10) == pytest.approx(1e-4)

    def test_restart(self):
        assert reference_recipe_lr(25) == pytest.approx(12.5e-5)
        assert reference_recipe_lr(35) == pytest.approx(12.5e-5)

    def test_no_restart_floors(self):
        lr = cyclic_cosine_decay_lr(100, base_lr=1e-4, init_decay_epochs=5,
                                    min_decay_lr=1e-6)
        assert lr == 1e-6

    def test_geometric_cycles(self):
        lrs = [cyclic_cosine_decay_lr(e, base_lr=1e-4, init_decay_epochs=5,
                                      min_decay_lr=1e-6, restart_interval=4,
                                      restart_interval_multiplier=2.0)
               for e in range(5, 30)]
        assert all(l > 0 for l in lrs)
        # cycle restarts happen at epochs 5, 9, 17 (intervals 4, 8, 16)
        assert lrs[0] == pytest.approx(1e-4)
        assert lrs[4] == pytest.approx(1e-4)
        assert lrs[12] == pytest.approx(1e-4)

    def test_validation(self):
        with pytest.raises(ValueError):
            cyclic_cosine_decay_lr(0, 1e-4, 0, 1e-6)
        with pytest.raises(ValueError):
            cyclic_cosine_decay_lr(0, 1e-4, 5, 1e-6, warmup_epochs=3)


def reference_compute_acc(y_pred, y_true, top_k=(1, 2, 3)):
    """Loop version, verbatim reference semantics (train2_seq.py:347-360)."""
    total_hits = np.zeros(len(top_k))
    for i in range(len(y_true)):
        for k_idx, k in enumerate(top_k):
            total_hits[k_idx] += np.any(y_pred[i, :k] == y_true[i])
    return np.round(total_hits / len(y_true) * 100, 4)


def reference_dba(y_pred, y_true, max_k=3, delta=5):
    """Loop version, verbatim reference semantics (train2_seq.py:363-383)."""
    n = y_pred.shape[0]
    yk = np.zeros(max_k)
    for k in range(max_k):
        acc = 0.0
        for i in range(n):
            aux1 = np.abs(y_pred[i, : k + 1] - y_true[i]) / delta
            acc += np.min(np.minimum(aux1, 1.0))
        yk[k] = 1 - acc / n
    return float(np.mean(yk))


class TestMetrics:
    def test_acc_parity(self, rng):
        y_true = rng.integers(0, 64, size=200)
        y_pred = np.stack([rng.permutation(64) for _ in range(200)])
        np.testing.assert_allclose(M.compute_acc(y_pred, y_true),
                                   reference_compute_acc(y_pred, y_true))

    def test_dba_parity(self, rng):
        y_true = rng.integers(0, 64, size=200)
        y_pred = np.stack([rng.permutation(64) for _ in range(200)])
        assert M.compute_dba_score(y_pred, y_true) == pytest.approx(
            reference_dba(y_pred, y_true), rel=1e-12)

    def test_dba_jnp_matches_np(self, rng):
        y_true = rng.integers(0, 64, size=100)
        y_pred = np.stack([rng.permutation(64) for _ in range(100)])
        j = float(M.compute_dba_score_jnp(jnp.asarray(y_pred), jnp.asarray(y_true)))
        assert j == pytest.approx(M.compute_dba_score(y_pred, y_true), rel=1e-5)

    def test_perfect_prediction(self):
        y_true = np.arange(10)
        y_pred = np.tile(np.arange(64), (10, 1))
        y_pred = np.stack([np.roll(np.arange(64), -i) for i in range(10)])
        assert M.compute_dba_score(y_pred, y_true) == pytest.approx(1.0)
        np.testing.assert_allclose(M.compute_acc(y_pred, y_true), [100, 100, 100])

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            M.compute_acc(np.zeros((3, 64)), np.zeros(4))

    def test_multistep_flatten(self, rng):
        y_pred = rng.integers(0, 64, size=(7, 5, 64))
        y_true = rng.integers(0, 64, size=(7, 5))
        fp, ft = M.flatten_multistep(y_pred, y_true)
        assert fp.shape == (35, 64) and ft.shape == (35,)
