"""Modality-rebuild subsystem tests (SURVEY.md section 2a #28, #30)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.models.fuser import BeamFuser
from deepsense6g_tii_tpu.rebuild.heads import FeatureTrans, ProjectHead
from deepsense6g_tii_tpu.rebuild.losses import (contrastive_loss,
                                                distance_loss,
                                                translation_loss)
from deepsense6g_tii_tpu.rebuild.trainer import (RebuildOptions,
                                                 RebuildTrainer,
                                                 split_encoder_checkpoint)

from synthetic_data import jinit, make_batch

# 64px / 2x2-anchor geometry (same stage-map ratios as the reference
# 256px/8x8, ~16x less CPU conv work — see tests/test_models.py; this file
# compiles the heaviest jitted programs of the suite: the dual-LR
# multi_transform rebuild step).
CFG = GlobalConfig(seq_len=2, n_layer=1, use_pallas_scan=False,
                   compute_dtype="float32", modality_missing="image",
                   vert_anchors=2, horz_anchors=2,
                   input_resolution=64, crop=64,
                   backbone_blocks=(1, 1, 1, 1))


class TestHeads:
    def test_project_head_unit_norm(self, rng):
        ph = ProjectHead()
        x = jnp.asarray(rng.normal(size=(4, 16, 64)).astype(np.float32))
        v = ph.init(jax.random.PRNGKey(0), x)
        y = ph.apply(v, x)
        assert y.shape == (4, 16, 128)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                                   1.0, rtol=1e-5)

    def test_feature_trans_shapes(self, rng):
        ft = FeatureTrans()
        x = jnp.asarray(rng.normal(size=(4, 16, 128)).astype(np.float32))
        v = ft.init(jax.random.PRNGKey(0), x)
        assert ft.apply(v, x).shape == (4, 16, 64)


def reference_contrastive(x1, x2, temperature=0.1, seq=5):
    """NumPy port of the reference NT-Xent (lines 93-123)."""
    x1 = x1.sum(-2) if x1.ndim == 3 else x1
    x2 = x2.sum(-2)
    B = x1.shape[0] // seq
    z_i = x1.reshape(B, -1)
    z_j = x2.reshape(B, -1)
    z_i = z_i / np.linalg.norm(z_i, axis=1, keepdims=True)
    z_j = z_j / np.linalg.norm(z_j, axis=1, keepdims=True)
    reps = np.concatenate([z_i, z_j], 0)
    sim = reps @ reps.T
    pos = np.concatenate([np.diagonal(sim, B), np.diagonal(sim, -B)])
    mask = 1 - np.eye(2 * B)
    denom = (mask * np.exp(sim / temperature)).sum(1)
    return float((-np.log(np.exp(pos / temperature) / denom)).sum() / (2 * B))


class TestLosses:
    def test_contrastive_matches_reference(self, rng):
        x1 = rng.normal(size=(10, 7, 16)).astype(np.float32)
        x2 = rng.normal(size=(10, 7, 16)).astype(np.float32)
        got = float(contrastive_loss(jnp.asarray(x1), jnp.asarray(x2),
                                     seq_len=5))
        assert got == pytest.approx(reference_contrastive(x1, x2), rel=1e-4)

    def test_contrastive_identical_pairs_low(self, rng):
        x = rng.normal(size=(10, 7, 16)).astype(np.float32)
        same = float(contrastive_loss(jnp.asarray(x), jnp.asarray(x)))
        other = float(contrastive_loss(
            jnp.asarray(x), jnp.asarray(rng.normal(size=(10, 7, 16)).astype(np.float32))))
        assert same < other

    def test_distance_negative_mse(self, rng):
        a = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        assert float(distance_loss(a, b)) == pytest.approx(
            -float(((a - b) ** 2).mean()), rel=1e-6)
        assert float(translation_loss(a, b)) == pytest.approx(
            float(((a - b) ** 2).mean()), rel=1e-6)


class TestRebuildTrainer:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(0)
        model = BeamFuser(CFG)
        batch = make_batch(rng, B=2, T=2, H=64, W=64)
        dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "scenario"}
        variables = jinit(model, dev["image"], dev["lidar"],
                          dev["radar"], dev["gps"])
        opts = RebuildOptions(source_domain=("lidar", "radar"),
                              target_domain="image")
        trainer = RebuildTrainer(model, CFG, opts)
        state = trainer.init_state(variables, dev)
        return trainer, state, dev

    def test_randlike_missing_runs(self):
        """randlike modality-missing draws substitute noise inside the
        fusion forward (mambafuser_seq.py:361-391) — train/eval/init must
        all supply the 'missing' rng stream."""
        cfg = CFG.replace(modality_missing_type="randlike")
        rng = np.random.default_rng(1)
        model = BeamFuser(cfg)
        batch = make_batch(rng, B=2, T=2, H=64, W=64)
        dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "scenario"}
        variables = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "missing": jax.random.PRNGKey(1)},
            dev["image"], dev["lidar"], dev["radar"], dev["gps"]))()
        trainer = RebuildTrainer(model, cfg, RebuildOptions(
            source_domain=("lidar", "radar"), target_domain="image"))
        state = trainer.init_state(variables, dev)
        state, aux = trainer.train_step(state, dev, 1e-4)
        assert np.isfinite(float(aux["loss"]))
        # at eval the rebuilt features fully replace the missing modality,
        # so the substitute noise is traced but cannot reach the logits —
        # this pins only that the 'missing' rng stream is supplied
        m0 = trainer.eval_step(state, dev, 0)
        assert m0["ranks"].shape == (2, 64)
        assert np.isfinite(float(m0["loss"]))

    def test_requires_matching_missing_config(self):
        model = BeamFuser(CFG.replace(modality_missing=None))
        with pytest.raises(ValueError):
            RebuildTrainer(model, CFG.replace(modality_missing=None),
                           RebuildOptions())

    def test_train_step_runs_and_updates(self, setup):
        trainer, state, dev = setup
        s1, aux = trainer.train_step(state, dev, 1e-4)
        for k in ("loss", "trans", "contrast", "distance", "fusion"):
            assert np.isfinite(float(aux[k])), k
        # heads moved
        moved = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.head_params, s1.head_params)
        assert max(jax.tree_util.tree_leaves(moved)) > 0
        # fusion moved much less (lr 1e-6 vs 1e-4)
        fus = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.fusion_params, s1.fusion_params)
        assert max(jax.tree_util.tree_leaves(fus)) < 1e-4

    def test_rebuild_feature_shapes(self, setup):
        trainer, state, dev = setup
        rb = trainer.rebuild_features(state, dev)
        assert rb.shape == (2 * 2, 16, 16, 64)   # (B*T, H/4, W/4, C)

    def test_eval_injection_changes_logits(self, setup):
        trainer, state, dev = setup
        with_rb = trainer.eval_step(state, dev)["ranks"]
        assert with_rb.shape == (2, 64)

    def test_translation_trains_toward_target(self, setup):
        trainer, state, dev = setup
        aux0 = None
        for i in range(8):
            state, aux = trainer.train_step(state, dev, 1e-3)
            if aux0 is None:
                aux0 = aux
        assert float(aux["trans"]) < float(aux0["trans"])

    def test_frozen_tap_constant_under_training(self, setup):
        """The stage-1 translation/contrastive targets come from the FROZEN
        stem+stage1 copies in RebuildState, so they must be bit-identical
        before and after fusion-param updates (the reference's frozen
        split-checkpoint encoders, train_image_radar_lidar_rebuild.py)."""
        trainer, state, dev = setup
        tap = jax.jit(lambda s, b: trainer._frozen_stage1(
            s.fusion_params, s.fusion_stats, b,
            s.frozen_params, s.frozen_stats))
        before = tap(state, dev)
        s1 = state
        for _ in range(3):
            s1, _ = trainer.train_step(s1, dev, 1e-2)
        # fusion params genuinely moved under the large lr
        fus = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.fusion_params, s1.fusion_params)
        assert max(jax.tree_util.tree_leaves(fus)) > 0
        after = tap(s1, dev)
        for m in before:
            np.testing.assert_array_equal(np.asarray(before[m]),
                                          np.asarray(after[m]))

    def test_split_checkpoint(self, setup):
        trainer, state, dev = setup
        parts = split_encoder_checkpoint(state.fusion_params)
        assert set(parts) == {"image_encoder", "lidar_encoder",
                              "radar_encoder"}
        assert "stem" in parts["image_encoder"]
        assert "stage1" in parts["lidar_encoder"]


class TestRebuildCliEndToEnd:
    def test_main_trains_validates_checkpoints(self, tmp_path):
        """cli.rebuild.main end-to-end with the REAL fuser at debug geometry
        and randlike modality-missing: dataset assembly -> init (with the
        'missing' rng) -> dual-LR training -> injected validation -> 5-way
        checkpoints + run record."""
        import json
        import os

        from synthetic_data import make_fake_dataset_tree
        from deepsense6g_tii_tpu.cli import rebuild as rebuild_cli

        root = tmp_path / "ds"
        mm, ad = root / "Multi_Modal", root / "Adaptation_dataset_multi_modal"
        c1 = make_fake_dataset_tree(str(mm) + "/", n_samples=3, seq_len=2)
        os.rename(mm / c1, mm / "ml_challenge_dev_multi_modal.csv")
        c2 = make_fake_dataset_tree(str(ad) + "/", n_samples=2, seq_len=2)
        os.rename(ad / c2, ad / "ml_challenge_data_adaptation_multi_modal.csv")

        logdir = str(tmp_path / "rb")
        rc = rebuild_cli.main([
            "-s", "lidar", "radar", "-t", "image",
            "--modality_missing_type", "randlike",
            "--data_root", str(root), "--logdir", logdir,
            "--epochs", "1", "--batch_size", "1", "--seq_len", "2",
            "--scheduler", "0", "--num_workers", "2",
            "--compute_dtype", "float32",
            "--input_resolution", "64", "--vert_anchors", "2",
            "--horz_anchors", "2", "--n_layer", "1",
            "--backbone_blocks", "1,1,1,1"])
        assert rc == 0
        rec = json.load(open(os.path.join(logdir, "recent.log")))
        assert rec["epoch"] == 1 and len(rec["DBA"]) == 1
        for f in ("final_fusion_model.msgpack", "best_fusion_model.msgpack",
                  "best_optim.msgpack"):
            assert os.path.exists(os.path.join(logdir, f)), f


class TestRebuildDataParallel:
    def test_sharded_trajectory_matches_single_device(self):
        """RebuildTrainer(mesh=...) shards batches over a device mesh (the
        reference rebuild-trains under DataParallel,
        train_image_radar_lidar_rebuild.py:721-728); the training trajectory
        and eval rankings must match single-device execution.  (4-device
        mesh / B=4 keeps the 1-core execution cost down; the sharding math
        is device-count independent.)"""
        from deepsense6g_tii_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(7)
        model = BeamFuser(CFG)
        batch = make_batch(rng, B=4, T=2, H=64, W=64)
        host = {k: v for k, v in batch.items() if k != "scenario"}
        dev = {k: jnp.asarray(v) for k, v in host.items()}
        variables = jinit(model, dev["image"][:1], dev["lidar"][:1],
                          dev["radar"][:1], dev["gps"][:1])
        opts = RebuildOptions(source_domain=("lidar", "radar"),
                              target_domain="image")

        single = RebuildTrainer(model, CFG, opts)
        sharded = RebuildTrainer(model, CFG, opts, mesh=make_mesh(4))
        s1 = single.init_state(variables, single.shard(host))
        s2 = sharded.init_state(variables, sharded.shard(host))

        for _ in range(2):
            s1, a1 = single.train_step(s1, single.shard(host), 1e-4)
            s2, a2 = sharded.train_step(s2, sharded.shard(host), 1e-4)
            np.testing.assert_allclose(float(a1["loss"]), float(a2["loss"]),
                                       rtol=2e-5)
        m1 = single.eval_step(s1, single.shard(host), 0)
        m2 = sharded.eval_step(s2, sharded.shard(host), 0)
        assert (np.asarray(m1["ranks"])[:, 0]
                == np.asarray(m2["ranks"])[:, 0]).all()
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=2e-5)

    def test_ragged_batch_falls_back_to_replicated(self):
        from deepsense6g_tii_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(8)
        model = BeamFuser(CFG)
        batch = make_batch(rng, B=1, T=2, H=64, W=64)   # 1 % 2 != 0
        host = {k: v for k, v in batch.items() if k != "scenario"}
        opts = RebuildOptions(source_domain=("lidar", "radar"),
                              target_domain="image")
        trainer = RebuildTrainer(model, CFG, opts, mesh=make_mesh(2))
        dev = trainer.shard(host)
        assert dev["image"].sharding.is_fully_replicated
        variables = jinit(model, dev["image"][:1], dev["lidar"][:1],
                          dev["radar"][:1], dev["gps"][:1])
        state = trainer.init_state(variables, dev)
        state, aux = trainer.train_step(state, dev, 1e-4)
        assert np.isfinite(float(aux["loss"]))
