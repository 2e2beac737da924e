"""Grouped lidar+radar backbone (config.merge_lidar_radar): one
feature_group_count=2 conv program over channel-concatenated streams must
equal the two separate ResNet18s exactly — block-diagonal weights, and
per-channel BatchNorm over the concatenation is exactly two separate
BatchNorms (models/resnet.py::BasicBlock groups).

Capability parity target: the reference's two torchvision ResNet18 lidar /
radar encoders (mambafuser_seq.py:42-72) — merged here purely as a TPU
dispatch-count/MXU-utilization optimization.
"""

import numpy as np
import jax
import jax.numpy as jnp

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.models.encoder import FusionEncoder
from deepsense6g_tii_tpu.models.resnet import (RESNET18_BLOCKS,
                                               ResNetBackbone,
                                               merge_backbone_trees)

BLOCKS = (1, 1, 1, 1)   # same stages/strides/widths, 3x smaller graphs


def tol(**kw):
    # grouped convs reassociate the channel contraction; through six
    # conv+BN+ReLU layers a ~1e-6 drift can flip a near-zero ReLU, so the
    # absolute tolerance must absorb that (measured max diff ~8e-7).
    return dict(rtol=5e-5, atol=1e-4, **kw)


class TestGroupedBackbone:
    def test_grouped_equals_two_separate(self, rng):
        lid = jnp.asarray(rng.normal(size=(4, 64, 64, 1)), jnp.float32)
        rad = jnp.asarray(rng.normal(size=(4, 64, 64, 2)), jnp.float32)

        sep_l = ResNetBackbone(BLOCKS)
        sep_r = ResNetBackbone(BLOCKS)
        grouped = ResNetBackbone(BLOCKS, groups=2)

        vl = sep_l.init(jax.random.PRNGKey(0), lid)
        vr = sep_r.init(jax.random.PRNGKey(1), rad)
        vg = {k: merge_backbone_trees(vl[k], vr[k]) for k in vl}

        # grouped input: zero-pad lidar to radar's channel count
        lid_p = jnp.pad(lid, ((0, 0), (0, 0), (0, 0), (0, 1)))
        x = jnp.concatenate([lid_p, rad], axis=-1)

        # eval mode (running stats)
        yl = sep_l.apply(vl, lid)
        yr = sep_r.apply(vr, rad)
        yg = grouped.apply(vg, x)
        c = yg.shape[-1] // 2
        np.testing.assert_allclose(yg[..., :c], yl, **tol())
        np.testing.assert_allclose(yg[..., c:], yr, **tol())

        # train mode: batch statistics + running-stat updates
        yl, ml = sep_l.apply(vl, lid, True, mutable=["batch_stats"])
        yr, mr = sep_r.apply(vr, rad, True, mutable=["batch_stats"])
        yg, mg = grouped.apply(vg, x, True, mutable=["batch_stats"])
        np.testing.assert_allclose(yg[..., :c], yl, **tol())
        np.testing.assert_allclose(yg[..., c:], yr, **tol())
        want = merge_backbone_trees(ml["batch_stats"], mr["batch_stats"])
        for a, b in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(mg["batch_stats"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol())

    def test_encoder_merged_equals_separate(self, rng):
        base = dict(seq_len=2, input_resolution=64, vert_anchors=2,
                    horz_anchors=2, n_layer=1, backbone_blocks=BLOCKS,
                    use_pallas_scan=False, compute_dtype="float32",
                    embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
        cfg_sep = GlobalConfig(**base)
        cfg_mrg = GlobalConfig(merge_lidar_radar=True, **base)

        B, T, H = 2, 2, 64
        image = jnp.asarray(rng.uniform(0, 255, (B, T, H, H, 3)), jnp.float32)
        lidar = jnp.asarray(rng.uniform(0, 1, (B, T, H, H, 1)), jnp.float32)
        radar = jnp.asarray(rng.uniform(0, 1, (B, T, H, H, 2)), jnp.float32)
        gps = jnp.asarray(rng.normal(size=(B, 2, 2)), jnp.float32)

        enc_sep = FusionEncoder(cfg_sep)
        enc_mrg = FusionEncoder(cfg_mrg)
        v = enc_sep.init(jax.random.PRNGKey(0), image, lidar, radar, gps)
        vm = {
            col: {
                **{k: t for k, t in v[col].items()
                   if k not in ("lidar_encoder", "radar_encoder")},
                "lidar_radar_encoder": merge_backbone_trees(
                    v[col]["lidar_encoder"], v[col]["radar_encoder"]),
            }
            for col in v
        }

        ys = enc_sep.apply(v, image, lidar, radar, gps)
        ym = enc_mrg.apply(vm, image, lidar, radar, gps)
        np.testing.assert_allclose(np.asarray(ym), np.asarray(ys), **tol())

        # train mode, BN stat mutation included
        ys, ms = enc_sep.apply(v, image, lidar, radar, gps, train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(7)})
        ym, mm = enc_mrg.apply(vm, image, lidar, radar, gps, train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(7)})
        np.testing.assert_allclose(np.asarray(ym), np.asarray(ys), **tol())

    def test_encoder_stage1_merge_equals_separate(self, rng):
        """config.merge_lr_stage1: ONLY stem+stage1 grouped (the half-width
        64-channel convs), stages 2-4 on the separate backbones — output
        must equal the fully-separate encoder exactly."""
        base = dict(seq_len=2, input_resolution=64, vert_anchors=2,
                    horz_anchors=2, n_layer=1, backbone_blocks=BLOCKS,
                    use_pallas_scan=False, compute_dtype="float32",
                    embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
        cfg_sep = GlobalConfig(**base)
        cfg_s1 = GlobalConfig(merge_lr_stage1=True, **base)

        B, T, H = 2, 2, 64
        image = jnp.asarray(rng.uniform(0, 255, (B, T, H, H, 3)), jnp.float32)
        lidar = jnp.asarray(rng.uniform(0, 1, (B, T, H, H, 1)), jnp.float32)
        radar = jnp.asarray(rng.uniform(0, 1, (B, T, H, H, 2)), jnp.float32)
        gps = jnp.asarray(rng.normal(size=(B, 2, 2)), jnp.float32)

        enc_sep = FusionEncoder(cfg_sep)
        enc_s1 = FusionEncoder(cfg_s1)
        v = enc_sep.init(jax.random.PRNGKey(0), image, lidar, radar, gps)

        def rearrange(col):
            ss = {}
            out = {}
            for name in ("lidar_encoder", "radar_encoder"):
                t = v[col][name]
                ss[name] = {k: s for k, s in t.items()
                            if k in ("stem", "stage1")}
                out[name] = {k: s for k, s in t.items()
                             if k not in ("stem", "stage1")}
            out["lidar_radar_stage1"] = merge_backbone_trees(
                ss["lidar_encoder"], ss["radar_encoder"])
            out.update({k: t for k, t in v[col].items()
                        if k not in ("lidar_encoder", "radar_encoder")})
            return out

        vm = {col: rearrange(col) for col in v}
        ys = enc_sep.apply(v, image, lidar, radar, gps)
        ym = enc_s1.apply(vm, image, lidar, radar, gps)
        np.testing.assert_allclose(np.asarray(ym), np.asarray(ys), **tol())

        ys, _ = enc_sep.apply(v, image, lidar, radar, gps, train=True,
                              mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(7)})
        ym, _ = enc_s1.apply(vm, image, lidar, radar, gps, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(7)})
        np.testing.assert_allclose(np.asarray(ym), np.asarray(ys), **tol())
