"""Video/flow/audio SimMMDG trainer (SURVEY.md section 2a #29).

The reference script is unrunnable (missing imports/backbones), so these
tests pin the trainable recipe itself: SupCon numerics against a NumPy
oracle, loss composition, convergence on separable synthetic features, and
modality-subset combinations (--use_video/--use_flow/--use_audio)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsense6g_tii_tpu.rebuild.video_flow_audio import (
    VFAOptions, VFATrainer, feature_split_loss, normalized_translation_loss,
    supcon_loss)

# tiny dims so every test runs in seconds on CPU
TINY = dict(emd_dims=(32, 24, 16), hidden_dim=16, trans_hidden=16,
            proj_dim=8, n_classes=4)


def _feats(rng, B=8, dims=(10, 12, 6), modalities=("video", "flow", "audio")):
    return {m: jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
            for m, d in zip(modalities, dims)}


def np_supcon(features, labels, temperature, base_temperature=0.07):
    """NumPy oracle for Khosla et al. SupConLoss (all-views anchors),
    including the canonical temperature/base_temperature scale."""
    B, V, D = features.shape
    f = features / np.maximum(
        np.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    f = f.reshape(B * V, D)
    lab = np.repeat(labels, V)
    logits = f @ f.T / temperature
    logits -= logits.max(axis=1, keepdims=True)
    eye = np.eye(B * V, dtype=bool)
    exp = np.where(eye, 0.0, np.exp(logits))
    log_prob = logits - np.log(exp.sum(axis=1, keepdims=True))
    pos = (lab[:, None] == lab[None, :]) & ~eye
    mean_lpp = (pos * log_prob).sum(1) / np.maximum(pos.sum(1), 1)
    return -(temperature / base_temperature) * mean_lpp.mean()


class TestLosses:
    def test_supcon_matches_numpy_oracle(self, rng):
        feats = rng.normal(size=(6, 3, 8)).astype(np.float32)
        labels = rng.integers(0, 3, size=(6,))
        got = float(supcon_loss(jnp.asarray(feats), jnp.asarray(labels), 0.1))
        want = np_supcon(feats, labels, 0.1)
        assert got == pytest.approx(want, rel=1e-5)

    def test_supcon_prefers_aligned_views(self):
        labels = jnp.arange(4)
        aligned = jnp.tile(jnp.eye(4)[:, None, :], (1, 2, 1))
        rng = np.random.default_rng(0)
        random = jnp.asarray(rng.normal(size=(4, 2, 4)).astype(np.float32))
        assert float(supcon_loss(aligned, labels)) < \
            float(supcon_loss(random, labels))

    def test_translation_loss_zero_at_match(self, rng):
        x = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
        assert float(normalized_translation_loss(x, 3.0 * x)) == \
            pytest.approx(0.0, abs=1e-6)
        y = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
        assert float(normalized_translation_loss(x, y)) > 0.1

    def test_split_loss_is_negative_mse(self, rng):
        e = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
        want = -float(jnp.mean((e[:, :5] - e[:, 5:]) ** 2))
        assert float(feature_split_loss(e)) == pytest.approx(want, rel=1e-6)


class TestTrainer:
    def test_loss_decreases_and_classifies(self, rng):
        """Separable synthetic features: per-class mean offsets + noise."""
        opts = VFAOptions(lr=3e-3, **TINY)
        trainer = VFATrainer(opts)
        B = 16
        labels = jnp.asarray(np.arange(B) % 4)
        centers = [rng.normal(size=(4, d)).astype(np.float32) * 3
                   for d in (10, 12, 6)]
        feats = {m: jnp.asarray(c[np.asarray(labels)] +
                                rng.normal(size=(B, c.shape[1])) * 0.1)
                 for m, c in zip(("video", "flow", "audio"), centers)}
        state = trainer.init_state(feats)
        losses = []
        for _ in range(40):
            state, aux = trainer.train_step(state, feats, labels)
            losses.append(float(aux["loss"]))
        assert losses[-1] < losses[0]
        assert float(aux["ce"]) < 0.2
        pred = trainer.eval_step(state, feats)
        assert (np.asarray(pred) == np.asarray(labels)).mean() == 1.0

    @pytest.mark.parametrize("mods,dims", [
        (("video", "flow"), (10, 12)),
        (("video", "audio"), (10, 6)),
        (("flow", "audio"), (12, 6)),
    ])
    def test_modality_subsets(self, rng, mods, dims):
        """--use_video/--use_flow/--use_audio pair combinations
        (train_video_flow_audio.py:42-52,76-103)."""
        opts = VFAOptions(modalities=mods,
                          emd_dims=TINY["emd_dims"][:2],
                          hidden_dim=16, trans_hidden=16, proj_dim=8,
                          n_classes=4)
        trainer = VFATrainer(opts)
        feats = _feats(rng, B=4, dims=dims, modalities=mods)
        labels = jnp.asarray(rng.integers(0, 4, size=(4,)))
        state = trainer.init_state(feats)
        state, aux = trainer.train_step(state, feats, labels)
        assert np.isfinite(float(aux["loss"]))
        assert int(state.step) == 1
