"""Focal / cross-entropy loss parity tests (SURVEY.md section 2a #13)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepsense6g_tii_tpu.train import losses as L


def reference_sigmoid_focal(inputs, targets, alpha=0.25, gamma=2.0):
    """NumPy port of torchvision.ops.sigmoid_focal_loss semantics."""
    p = 1 / (1 + np.exp(-inputs))
    ce = np.maximum(inputs, 0) - inputs * targets + np.log1p(np.exp(-np.abs(inputs)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss.mean()


class TestFocal:
    def test_soft_target_parity(self, rng):
        logits = rng.normal(size=(8, 64)).astype(np.float32)
        targets = rng.uniform(0, 1, size=(8, 64)).astype(np.float32)
        got = float(L.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
        assert got == pytest.approx(reference_sigmoid_focal(logits, targets), rel=1e-5)

    def test_integer_targets_one_hotted(self, rng):
        logits = rng.normal(size=(8, 64)).astype(np.float32)
        idx = rng.integers(0, 64, size=(8,))
        onehot = np.eye(64, dtype=np.float32)[idx]
        a = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(idx)))
        b = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(onehot)))
        assert a == pytest.approx(b, rel=1e-6)

    def test_extreme_logits_stable(self):
        logits = jnp.asarray([[100.0, -100.0]])
        targets = jnp.asarray([[1.0, 0.0]])
        v = float(L.sigmoid_focal_loss(logits, targets))
        assert np.isfinite(v) and v == pytest.approx(0.0, abs=1e-6)


class TestCrossEntropy:
    def test_integer_matches_soft(self, rng):
        logits = rng.normal(size=(4, 64)).astype(np.float32)
        idx = rng.integers(0, 64, size=(4,))
        onehot = np.eye(64, dtype=np.float32)[idx]
        a = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(idx)))
        b = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(onehot)))
        assert a == pytest.approx(b, rel=1e-5)

    def test_uniform_logits(self):
        logits = jnp.zeros((2, 64))
        idx = jnp.asarray([0, 63])
        assert float(L.cross_entropy_loss(logits, idx)) == pytest.approx(
            np.log(64), rel=1e-6)


class TestSampleWeight:
    """Padded rows (weight 0) must contribute nothing to value or gradient."""

    def test_weighted_equals_subset(self, rng):
        logits = rng.normal(size=(5, 64)).astype(np.float32)
        targets = rng.uniform(size=(5, 64)).astype(np.float32)
        w = np.array([1, 1, 1, 0, 0], np.float32)
        for fn in (L.sigmoid_focal_loss, L.cross_entropy_loss):
            full = float(fn(jnp.asarray(logits[:3]), jnp.asarray(targets[:3])))
            masked = float(fn(jnp.asarray(logits), jnp.asarray(targets),
                              sample_weight=jnp.asarray(w)))
            assert masked == pytest.approx(full, rel=1e-6)

    def test_focal_integer_targets_weighted(self, rng):
        logits = rng.normal(size=(4, 64)).astype(np.float32)
        idx = rng.integers(0, 64, size=(4,)).astype(np.int32)
        w = np.array([1, 1, 0, 0], np.float32)
        full = float(L.focal_loss(jnp.asarray(logits[:2]), jnp.asarray(idx[:2])))
        masked = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(idx),
                                    sample_weight=jnp.asarray(w)))
        assert masked == pytest.approx(full, rel=1e-6)
