"""Reference torch-checkpoint import/export roundtrip tests.

export(params) emits the reference naming (module.encoder.mambafusionN...,
torchvision ResNet, mamba_ssm fields); import maps it back.  The roundtrip
must reproduce the exact tree with no unused torch keys, for both the
MambaFuser and GPT TransFuser layouts and the 30to5 GRU decoder.
"""

import numpy as np
import jax
import pytest

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.models.checkpoint_import import (
    export_reference_checkpoint, import_reference_checkpoint)
from deepsense6g_tii_tpu.models.fuser import BeamFuser


def _materialize(shapes, seed=0):
    """ShapeDtypeStruct tree -> random numpy tree (distinct values so any
    mis-mapping shows up as a mismatch, not a silent equality)."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    rng = np.random.default_rng(seed)
    vals = [rng.normal(size=l.shape).astype(np.float32) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, vals)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for k, v in la:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(lb[ks]),
                                      err_msg=ks)


def _roundtrip(cfg, B=1, radar_ch=2):
    import jax.numpy as jnp
    model = BeamFuser(cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((B, cfg.seq_len, 256, 256, 3)),
        jnp.zeros((B, cfg.seq_len, 256, 256, 1)),
        jnp.zeros((B, cfg.seq_len, 256, 256, radar_ch)),
        jnp.zeros((B, 2, 2)))
    variables = _materialize(shapes)
    sd = export_reference_checkpoint(variables["params"],
                                     variables["batch_stats"], cfg)
    params, stats, unused = import_reference_checkpoint(sd, cfg)
    assert unused == set(), f"unused torch keys: {sorted(unused)[:5]}"
    _tree_equal(variables["params"], params)
    _tree_equal(variables["batch_stats"], stats)
    return sd


SMALL = GlobalConfig(seq_len=2, n_layer=2, use_pallas_scan=False,
                     compute_dtype="float32")


class TestCheckpointInterop:
    def test_mambafuser_roundtrip(self):
        sd = _roundtrip(SMALL)
        # spot-check reference naming and torch layouts
        assert "module.encoder.mambafusion1.mambablocks.0.forward_mamba." \
               "in_proj.weight" in sd
        assert sd["module.encoder.image_encoder.features.conv1.weight"
                  ].shape == (64, 3, 7, 7)
        assert "module.encoder.time_mamba.mamba.A_log" in sd
        assert "module.join.4.weight" in sd
        # torch Linear weight is (out, in)
        assert sd["module.join.0.weight"].shape == (256, 512)

    def test_gpt_transfuser_roundtrip(self):
        sd = _roundtrip(SMALL.replace(FFM=0, TFM=0))
        assert "module.encoder.transformer1.blocks.0.attn.query.weight" in sd
        assert "module.encoder.transformer4.pos_emb" in sd
        assert not any("time_mamba" in k for k in sd)

    def test_30to5_gru_roundtrip(self):
        sd = _roundtrip(SMALL.replace(pred_len=3))
        assert sd["module.decoder.weight_ih"].shape == (192, 64)
        assert "module.output.weight" in sd

    def test_mamba_layer_shapes(self):
        sd = _roundtrip(SMALL)
        # mamba_ssm conv1d layout (d_inner, 1, d_conv)
        w = sd["module.encoder.mambafusion1.mambablocks.0.forward_mamba."
               "conv1d.weight"]
        assert w.shape == (128, 1, 4)
        dt = sd["module.encoder.mambafusion1.mambablocks.0.forward_mamba."
                "dt_proj.weight"]
        assert dt.shape == (128, 4)   # (d_inner, dt_rank)

    def test_importer_rejects_nothing_silently(self):
        """An extra unknown key must surface in `unused`."""
        sd = _roundtrip(SMALL)
        sd["module.bogus.weight"] = np.zeros((1,))
        _, _, unused = import_reference_checkpoint(sd, SMALL)
        assert "bogus.weight" in unused

    def test_pth_file_roundtrip(self, tmp_path):
        """torch.save/torch.load path (the actual .pth interop surface)."""
        import torch
        from deepsense6g_tii_tpu.models.checkpoint_import import (
            load_reference_checkpoint)
        sd = _roundtrip(SMALL)
        tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in sd.items()}
        path = str(tmp_path / "best_model.pth")
        torch.save(tensors, path)
        params, stats, unused = load_reference_checkpoint(path, SMALL)
        assert unused == set()
        np.testing.assert_array_equal(
            np.asarray(params["join_fc1"]["kernel"]),
            sd["module.join.0.weight"].T)
