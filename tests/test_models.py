"""Model-zoo tests: ResNet torch parity, fusion blocks, encoder/fuser
shapes and the exact reference parameter count (SURVEY.md section 2a #17-25)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.models.fuser import BeamFuser
from deepsense6g_tii_tpu.models.fusion import MambaBlock, TimeMamba, TokenFusion
from deepsense6g_tii_tpu.models.resnet import (RESNET18_BLOCKS, ResNetBackbone)
from deepsense6g_tii_tpu.models.torch_port import (convert_resnet_state_dict,
                                                   graft_backbone)

from synthetic_data import jinit


def _build_torch_resnet18(in_ch=3):
    """Minimal torchvision-compatible ResNet18 (BasicBlock) in raw torch,
    used as the numeric oracle for the Flax backbone."""
    import torch
    import torch.nn as tnn

    class Block(tnn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idn)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            cfg = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
            for i, (cin, cout, s) in enumerate(cfg, start=1):
                setattr(self, f"layer{i}", tnn.Sequential(
                    Block(cin, cout, s), Block(cout, cout, 1)))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for i in range(1, 5):
                x = getattr(self, f"layer{i}")(x)
            return x

    return Net()


class TestResNetTorchParity:
    def test_resnet18_forward_matches_torch(self, rng):
        import torch
        net = _build_torch_resnet18()
        net.eval()
        # randomize BN stats so the test is not trivially mean-0/var-1
        with torch.no_grad():
            for m in net.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.5, 0.5)
                    m.running_var.uniform_(0.5, 1.5)
        x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = net(torch.from_numpy(x).permute(0, 3, 1, 2))
        want = want.permute(0, 2, 3, 1).numpy()

        flax_model = ResNetBackbone(RESNET18_BLOCKS)
        params, stats = convert_resnet_state_dict(net.state_dict())
        out = flax_model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)

    def test_port_skips_conv1_when_asked(self):
        import torch
        net = _build_torch_resnet18()
        params, _ = convert_resnet_state_dict(net.state_dict(),
                                              port_conv1=False)
        assert "conv1" not in params["stem"]
        assert "bn1" in params["stem"]


# Tiny geometry for full-model tests on the 1-core CPU host: 128px inputs
# with 4x4 anchors keep the exact stage-map/anchor/upsample ratios of the
# reference 256px/8x8 geometry (input_res/32 == vert_anchors) at ~4x less
# conv work.  Parity-critical tests (test_encoder_oracle, param count) stay
# at the reference geometry.
SMALL = GlobalConfig(seq_len=2, n_layer=1, use_pallas_scan=False,
                     compute_dtype="float32", vert_anchors=4, horz_anchors=4,
                     input_resolution=128, crop=128,
                     backbone_blocks=(1, 1, 1, 1))


def _inputs(B=1, T=2, radar_ch=2, H=128):
    return (jnp.zeros((B, T, H, H, 3)), jnp.zeros((B, T, H, H, 1)),
            jnp.zeros((B, T, H, H, radar_ch)), jnp.zeros((B, 2, 2)))


class TestFusionBlocks:
    def test_token_fusion_roundtrip_shapes(self, rng):
        tf = TokenFusion(n_embd=64, n_layer=1, seq_len=2, n_views=1,
                         anchors=64, gps_tokens=2, embd_pdrop=0.1,
                         fusion_type="mamba", use_pallas=False)
        maps = jnp.asarray(rng.normal(size=(2, 2, 8, 8, 64)).astype(np.float32))
        gps = jnp.asarray(rng.normal(size=(2, 2, 64)).astype(np.float32))
        v = jax.jit(lambda: tf.init(jax.random.PRNGKey(0), maps, maps,
                                    maps, gps))()
        io, lo, ro, go = jax.jit(tf.apply)(v, maps, maps, maps, gps)
        assert io.shape == lo.shape == ro.shape == (2, 2, 8, 8, 64)
        assert go.shape == (2, 2, 64)
        assert v["params"]["pos_emb"].shape == (1, 3 * 2 * 64 + 2, 64)

    def test_gpt_fusion(self, rng):
        tf = TokenFusion(n_embd=64, n_layer=2, seq_len=2, n_views=1,
                         anchors=64, gps_tokens=2, embd_pdrop=0.1,
                         fusion_type="gpt", n_head=4)
        maps = jnp.asarray(rng.normal(size=(1, 2, 8, 8, 64)).astype(np.float32))
        gps = jnp.zeros((1, 2, 64))
        v = jax.jit(lambda: tf.init(jax.random.PRNGKey(0), maps, maps,
                                    maps, gps))()
        io, *_ = jax.jit(tf.apply)(v, maps, maps, maps, gps)
        assert io.shape == (1, 2, 8, 8, 64)
        assert "attn" in v["params"]["block0"]

    def test_channel_swap_changes_output(self, rng):
        common = dict(n_embd=66, n_layer=1, seq_len=1, n_views=1, anchors=64,
                      gps_tokens=2, embd_pdrop=0.0, fusion_type="mamba",
                      use_pallas=False)
        a = TokenFusion(channel_swap=True, **common)
        b = TokenFusion(channel_swap=False, **common)
        img = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 66)).astype(np.float32))
        lid = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 66)).astype(np.float32))
        rad = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 66)).astype(np.float32))
        gps = jnp.zeros((1, 2, 66))
        v = jax.jit(lambda: a.init(jax.random.PRNGKey(0), img, lid, rad,
                                   gps))()
        ya = jax.jit(a.apply)(v, img, lid, rad, gps)[0]
        yb = jax.jit(b.apply)(v, img, lid, rad, gps)[0]
        assert float(jnp.abs(ya - yb).max()) > 1e-6

    def test_token_fusion_multiview(self, rng):
        """n_views=2: the image track carries n_views*T frames
        (model2_seq.py:248-287 tokenizes num_views camera maps per step);
        the output split must hand back n_views*T image maps and T
        lidar/radar maps."""
        tf = TokenFusion(n_embd=64, n_layer=1, seq_len=2, n_views=2,
                         anchors=64, gps_tokens=2, embd_pdrop=0.0,
                         fusion_type="gpt", n_head=4, channel_swap=False)
        img = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 64)).astype(np.float32))
        lid = jnp.asarray(rng.normal(size=(1, 2, 8, 8, 64)).astype(np.float32))
        gps = jnp.zeros((1, 2, 64))
        v = jax.jit(lambda: tf.init(jax.random.PRNGKey(0), img, lid, lid,
                                    gps))()
        io, lo, ro, go = jax.jit(tf.apply)(v, img, lid, lid, gps)
        assert io.shape == (1, 4, 8, 8, 64)
        assert lo.shape == ro.shape == (1, 2, 8, 8, 64)
        assert go.shape == (1, 2, 64)
        assert v["params"]["pos_emb"].shape == (1, (2 + 2) * 2 * 64 + 2, 64)

    def test_channel_swap_rejects_multiview(self):
        """cs-bimamba rotates channel thirds across same-shape tracks;
        a wider image track must fail loudly, not mis-slice."""
        tf = TokenFusion(n_embd=66, n_layer=1, seq_len=1, n_views=2,
                         anchors=64, gps_tokens=2, embd_pdrop=0.0,
                         fusion_type="mamba", use_pallas=False)
        img = jnp.zeros((1, 2, 8, 8, 66))
        lid = jnp.zeros((1, 1, 8, 8, 66))
        gps = jnp.zeros((1, 2, 66))
        with pytest.raises(ValueError, match="n_views=1"):
            tf.init(jax.random.PRNGKey(0), img, lid, lid, gps)

    def test_time_mamba(self, rng):
        tm = TimeMamba(d_model=32, seq_len=5)
        f = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(2, 2, 32)).astype(np.float32))
        v = jax.jit(lambda: tm.init(jax.random.PRNGKey(0), f, f, f, g))()
        out = jax.jit(tm.apply)(v, f, f, f, g)
        assert out.shape == (2, 32)


class TestBackboneBlocksKnob:
    def test_json_roundtrip_keeps_tuple(self):
        cfg = GlobalConfig(backbone_blocks=(1, 1, 1, 1))
        back = GlobalConfig.from_json(cfg.to_json())
        assert back.backbone_blocks == (1, 1, 1, 1)
        assert isinstance(back.backbone_blocks, tuple)   # hashable/static

    def test_validation(self):
        with pytest.raises(ValueError):
            GlobalConfig(backbone_blocks=(1, 1))

    def test_depth_changes_params_not_interface(self):
        tiny = jax.eval_shape(
            BeamFuser(SMALL).init, jax.random.PRNGKey(0), *_inputs())
        deep = jax.eval_shape(
            BeamFuser(SMALL.replace(backbone_blocks=None)).init,
            jax.random.PRNGKey(0), *_inputs())
        count = lambda s: sum(int(np.prod(p.shape)) for p in
                              jax.tree_util.tree_leaves(s["params"]))
        assert count(tiny) < count(deep)
        stages = deep["params"]["encoder"]["image_encoder"]
        assert "block2" in stages["stage4"]              # ResNet34 depth 3
        assert "block1" not in tiny["params"]["encoder"]["image_encoder"]["stage1"]


class TestBeamFuser:
    def test_param_count_matches_reference(self):
        """MambaFuser I+L+R+G = 103,461,924 params (README_mine.md Table I)."""
        cfg = GlobalConfig(use_pallas_scan=False, compute_dtype="float32")
        model = BeamFuser(cfg)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                *_inputs(T=5, H=256))
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(shapes["params"]))
        assert n == 103_461_924

    def test_forward_small(self, rng):
        model = BeamFuser(SMALL)
        inp = _inputs()
        v = jinit(model, *inp)
        # jitted: eager op-by-op apply costs ~20s on this 1-core host; the
        # compiled program persists in the suite's compile cache
        logits = jax.jit(lambda v_, *a: model.apply(v_, *a, train=False))(
            v, *inp)
        assert logits.shape == (1, 64)
        assert np.isfinite(np.asarray(logits)).all()

    def test_gpt_notfm_variant(self):
        cfg = SMALL.replace(FFM=0, TFM=0)
        model = BeamFuser(cfg)
        inp = _inputs()
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *inp)
        assert "time_mamba" not in shapes["params"]["encoder"]
        assert "attn" in str(jax.tree_util.tree_structure(shapes["params"]))

    def test_radar_single_channel(self):
        model = BeamFuser(SMALL.replace(add_velocity=0))
        inp = _inputs(radar_ch=1)
        v = jinit(model, *inp)
        assert jax.jit(model.apply)(v, *inp).shape == (1, 64)

    def test_multistep_decoder(self):
        cfg = SMALL.replace(pred_len=3)
        model = BeamFuser(cfg)
        inp = _inputs()
        v = jinit(model, *inp)
        out = jax.jit(model.apply)(v, *inp)
        assert out.shape == (1, 3, 64)

    def test_modality_missing_zerolike(self, rng):
        """Zeroing the image must change logits vs intact input."""
        base = BeamFuser(SMALL)
        miss = BeamFuser(SMALL.replace(modality_missing="image"))
        img = jnp.asarray(rng.uniform(0, 255, (1, 2, 128, 128, 3)).astype(np.float32))
        rest = _inputs()[1:]
        v = jinit(base, img, *rest)
        a = jax.jit(base.apply)(v, img, *rest)
        b = jax.jit(miss.apply)(v, img, *rest)
        assert float(jnp.abs(a - b).max()) > 1e-6

    def test_modality_missing_randlike_needs_rng(self):
        model = BeamFuser(SMALL.replace(modality_missing="radar",
                                        modality_missing_type="randlike"))
        inp = _inputs()
        v = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "missing": jax.random.PRNGKey(1)}, *inp))()
        out = jax.jit(lambda v_: model.apply(
            v_, *inp, rngs={"missing": jax.random.PRNGKey(2)}))(v)
        assert out.shape == (1, 64)

    def test_eval_randlike_fresh_per_batch(self):
        """eval_step folds the caller's batch counter into the missing-
        modality rng: with identical state and batch, a different batch_idx
        must substitute different noise (the reference draws a fresh
        torch.rand_like per forward, mambafuser_seq.py:361-391), while the
        same batch_idx reproduces bit-identically."""
        from deepsense6g_tii_tpu.train.state import (create_train_state,
                                                     make_optimizer)
        from deepsense6g_tii_tpu.train.steps import make_eval_step
        cfg = SMALL.replace(modality_missing="radar",
                            modality_missing_type="randlike")
        model = BeamFuser(cfg)
        inp = _inputs()
        v = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "missing": jax.random.PRNGKey(1)}, *inp))()
        state = create_train_state(v, make_optimizer())
        batch = dict(zip(("image", "lidar", "radar", "gps"), inp))
        step = make_eval_step(model, cfg)
        c0 = np.asarray(step(state, batch, 0)["confidence"])
        c1 = np.asarray(step(state, batch, 1)["confidence"])
        c0b = np.asarray(step(state, batch, 0)["confidence"])
        assert not np.array_equal(c0, c1)
        np.testing.assert_array_equal(c0, c0b)

    def test_stage1_feature_tap(self):
        model = BeamFuser(SMALL)
        inp = _inputs()
        v = jinit(model, *inp)
        fused, feats = jax.jit(lambda v_, *a: model.apply(
            v_, *a, method=model.encode_stage1))(v, *inp)
        assert fused.shape == (1, 512)
        assert len(feats) == 3
        assert feats[0].shape == (2, 32, 32, 64)   # (B*T, H/4, W/4, 64)


class TestGraft:
    def test_graft_backbone(self):
        import torch
        # real ResNet18 depths: the graft targets torchvision layer naming
        model = BeamFuser(SMALL.replace(backbone_blocks=(2, 2, 2, 2)))
        inp = _inputs()
        v = jinit(model, *inp)
        net = _build_torch_resnet18()
        p, s = convert_resnet_state_dict(net.state_dict(), port_conv1=False)
        v2 = graft_backbone(v, "lidar_encoder", p, s)
        k_new = v2["params"]["encoder"]["lidar_encoder"]["stage1"]["block0"]["conv1"]["kernel"]
        want = net.state_dict()["layer1.0.conv1.weight"].numpy().transpose(2, 3, 1, 0)
        np.testing.assert_allclose(np.asarray(k_new), want)
        # conv1 untouched
        np.testing.assert_allclose(
            np.asarray(v2["params"]["encoder"]["lidar_encoder"]["stem"]["conv1"]["kernel"]),
            np.asarray(v["params"]["encoder"]["lidar_encoder"]["stem"]["conv1"]["kernel"]))


class TestSampleMask:
    def test_padded_train_forward_equals_unpadded(self, rng):
        """sample_mask keeps engine-padded rows out of the BN batch stats:
        the padded batch's real rows produce bit-identical train-mode logits
        and batch_stats to the unpadded batch (dropout rates zeroed so the
        only cross-sample coupling is BatchNorm)."""
        # 64px/2x2: this test runs three full-model train-mode forwards
        cfg = SMALL.replace(embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
                            vert_anchors=2, horz_anchors=2,
                            input_resolution=64, crop=64)
        model = BeamFuser(cfg)
        inp = [jnp.asarray(rng.uniform(0, 255, (2, 2, 64, 64, 3)).astype(np.float32)),
               jnp.asarray(rng.uniform(0, 1, (2, 2, 64, 64, 1)).astype(np.float32)),
               jnp.asarray(rng.uniform(0, 1, (2, 2, 64, 64, 2)).astype(np.float32))]
        gps = jnp.asarray(rng.normal(size=(2, 2, 2)).astype(np.float32))
        v = jinit(model, *inp, gps)

        pad = [jnp.concatenate([x, x[-1:]], axis=0) for x in inp]
        gps_pad = jnp.concatenate([gps, gps[-1:]], axis=0)
        mask = jnp.array([1.0, 1.0, 0.0], jnp.float32)

        japply = jax.jit(
            lambda v_, im, li, ra, g, m: model.apply(
                v_, im, li, ra, g, train=True, mutable=["batch_stats"],
                sample_mask=m))
        exact, ex_stats = jax.jit(
            lambda v_, im, li, ra, g: model.apply(
                v_, im, li, ra, g, train=True,
                mutable=["batch_stats"]))(v, *inp, gps)
        padded, pad_stats = japply(v, *pad, gps_pad, mask)
        # rtol 1e-4: the two jitted programs fuse/reassociate differently
        # (mask path vs plain path); the failure mode guarded here — padded
        # rows entering the BN batch statistics — shows up at O(1e-2).
        np.testing.assert_allclose(np.asarray(padded[:2]), np.asarray(exact),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ex_stats),
                        jax.tree_util.tree_leaves(pad_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestMultiViewSampleMask:
    def test_padded_forward_with_n_views_2(self, rng):
        """The image stream carries n_views*seq_len frames per sample while
        lidar/radar carry seq_len — the BN sample mask must be sized per
        stream (regression: a single mask sized off the image stream crashed
        every n_views>1 ragged batch)."""
        cfg = SMALL.replace(n_views=2, embd_pdrop=0.0, resid_pdrop=0.0,
                            attn_pdrop=0.0, vert_anchors=2, horz_anchors=2,
                            input_resolution=64, crop=64, FFM=0, TFM=0)
        model = BeamFuser(cfg)
        T = cfg.seq_len
        img = jnp.asarray(rng.uniform(
            0, 255, (3, cfg.n_views * T, 64, 64, 3)).astype(np.float32))
        lid = jnp.asarray(rng.uniform(0, 1, (3, T, 64, 64, 1)).astype(np.float32))
        rad = jnp.asarray(rng.uniform(0, 1, (3, T, 64, 64, 2)).astype(np.float32))
        gps = jnp.asarray(rng.normal(size=(3, 2, 2)).astype(np.float32))
        v = jinit(model, img, lid, rad, gps)
        mask = jnp.array([1.0, 1.0, 0.0], jnp.float32)
        logits, _ = jax.jit(
            lambda v_, im, li, ra, g, m: model.apply(
                v_, im, li, ra, g, train=True, mutable=["batch_stats"],
                sample_mask=m))(v, img, lid, rad, gps, mask)
        assert logits.shape == (3, 64)
        assert np.isfinite(np.asarray(logits)).all()


class TestMambaInitStyles:
    def test_fusion_mambas_use_gpt2_clobber_timemamba_keeps_mamba_ssm(self):
        """The reference MambaFusion/GPT applies _init_weights over its block
        stack, overwriting every inner Linear of the fusion Mambas with
        N(0, 0.02) and ZERO biases — dt_proj.bias included, so fusion blocks
        start at dt = softplus(0) (mambafuser_seq.py:138,143-147).  TimeMamba's
        Mamba is not under that apply and keeps mamba_ssm's inverse-softplus
        dt-bias init (mambafuser_seq.py:240)."""
        blk = MambaBlock(n_embd=64, n_tokens=8, use_pallas=False)
        v = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 64)))
        for branch in ("forward_mamba", "backward_mamba"):
            p = v["params"][branch]
            np.testing.assert_array_equal(np.asarray(p["dt_proj_bias"]), 0.0)
            k = np.asarray(p["in_proj"]["kernel"])
            assert 0.01 < k.std() < 0.03       # N(0, 0.02) weights
            assert abs(np.asarray(p["dt_proj_weight"]).std() - 0.02) < 0.01

        tm = TimeMamba(d_model=64, seq_len=2, gps_tokens=2)
        tracks = [jnp.zeros((1, 2, 64))] * 3
        vt = tm.init(jax.random.PRNGKey(0), *tracks, jnp.zeros((1, 2, 64)))
        dt_bias = np.asarray(vt["params"]["mamba"]["dt_proj_bias"])
        assert np.abs(dt_bias).min() > 0       # inverse-softplus init, not 0

    def test_unknown_style_rejected(self):
        from deepsense6g_tii_tpu.ops.mamba import Mamba
        with pytest.raises(ValueError):
            Mamba(d_model=16, init_style="xavier").init(
                jax.random.PRNGKey(0), jnp.zeros((1, 4, 16)))


class TestRematPolicies:
    def test_remat_grads_match_none(self, rng):
        """jax.checkpoint is semantically identity: gradients under each
        remat policy equal the unrematerialized gradients (up to recompute
        float reassociation, hence the loose rtol)."""
        inp = (jnp.asarray(rng.uniform(0, 255, (1, 1, 64, 64, 3)).astype(np.float32)),
               jnp.asarray(rng.uniform(0, 1, (1, 1, 64, 64, 1)).astype(np.float32)),
               jnp.asarray(rng.uniform(0, 1, (1, 1, 64, 64, 2)).astype(np.float32)),
               jnp.asarray(rng.normal(size=(1, 2, 2)).astype(np.float32)))

        def grads_for(remat):
            # 64px/2x2 anchors: smallest geometry with the reference's
            # stage-map/anchor ratios (input_res/32 == vert_anchors) —
            # this test compiles three full grad graphs on one CPU core.
            cfg = GlobalConfig(seq_len=1, n_layer=1, use_pallas_scan=False,
                               compute_dtype="float32", remat=remat,
                               vert_anchors=2, horz_anchors=2,
                               input_resolution=64, crop=64,
                               backbone_blocks=(1, 1, 1, 1))
            model = BeamFuser(cfg)
            variables = jinit(model, *inp)

            def loss(params):
                out = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]}, *inp,
                    train=False)
                return (out ** 2).sum()

            # jitted: the eager backward costs ~45s/policy on one core; the
            # compiled grad program is served by the persistent cache
            return jax.jit(jax.grad(loss))(variables["params"])

        g0 = grads_for("none")
        for policy in ("fusion", "conv", "stem"):
            g1 = grads_for(policy)
            for a, b in zip(jax.tree_util.tree_leaves(g0),
                            jax.tree_util.tree_leaves(g1)):
                a, b = np.asarray(a), np.asarray(b)
                # recompute reassociation perturbs near-zero elements of
                # large-magnitude leaves: scale the atol to the leaf
                np.testing.assert_allclose(
                    a, b, rtol=2e-2, atol=1e-3 * max(np.abs(a).max(), 1e-3))
