"""Whole-encoder numeric parity oracle for the GPT TransFuser (VERDICT r1 #2).

Recreates the reference ``Encoder`` + ``TransFuser``
(/root/reference/model2_seq.py:406-597,850-894, GPT fusion path) in raw
torch inside the test — no torchvision or mamba_ssm needed — loads random
Flax ``BeamFuser(FFM=0, TFM=0)`` weights into it via the existing export
path (``export_reference_checkpoint`` with strict=True, which also pins the
naming parity), and asserts the composed forward logits match: the 4-stage
CNN-fusion interleave, pos-emb token layout, vel_emb chain, bilinear
upsample residuals, token-sum head and join MLP all have to agree for this
to pass.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.models.checkpoint_import import (
    export_reference_checkpoint, import_reference_checkpoint)
from deepsense6g_tii_tpu.models.fuser import BeamFuser

torch = pytest.importorskip("torch")
import torch.nn as tnn                     # noqa: E402
import torch.nn.functional as tF           # noqa: E402

CFG = GlobalConfig(seq_len=2, n_layer=2, FFM=0, TFM=0,
                   use_pallas_scan=False, compute_dtype="float32")


# -- raw-torch recreation of the reference modules ----------------------------

class _BasicBlock(tnn.Module):
    """torchvision BasicBlock naming (conv1/bn1/conv2/bn2/downsample)."""

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


class _ResNet(tnn.Module):
    """torchvision-compatible ResNet (stage-separable, fc stripped like
    ImageCNN/LidarEncoder do, model2_seq.py:24,60)."""

    def __init__(self, blocks, in_ch):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        feats = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        cin = 64
        for i, (n, cout, s) in enumerate(zip(blocks, feats, strides), 1):
            layers = []
            for b in range(n):
                layers.append(_BasicBlock(cin, cout, s if b == 0 else 1))
                cin = cout
            setattr(self, f"layer{i}", tnn.Sequential(*layers))
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))


class _ImageCNN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.features = _ResNet((3, 4, 6, 3), 3)
        self.normalize = True


class _LidarEncoder(tnn.Module):
    def __init__(self, in_channels):
        super().__init__()
        self._model = _ResNet((2, 2, 2, 2), in_channels)


class _SelfAttention(tnn.Module):
    """model2_seq.py:74-112 (unmasked MHA)."""

    def __init__(self, n_embd, n_head):
        super().__init__()
        self.key = tnn.Linear(n_embd, n_embd)
        self.query = tnn.Linear(n_embd, n_embd)
        self.value = tnn.Linear(n_embd, n_embd)
        self.proj = tnn.Linear(n_embd, n_embd)
        self.n_head = n_head

    def forward(self, x):
        B, T, C = x.size()
        k = self.key(x).view(B, T, self.n_head, C // self.n_head) \
            .transpose(1, 2)
        q = self.query(x).view(B, T, self.n_head, C // self.n_head) \
            .transpose(1, 2)
        v = self.value(x).view(B, T, self.n_head, C // self.n_head) \
            .transpose(1, 2)
        att = tF.softmax(q @ k.transpose(-2, -1) / np.sqrt(k.size(-1)), -1)
        y = (att @ v).transpose(1, 2).contiguous().view(B, T, C)
        return self.proj(y)


class _Block(tnn.Module):
    """pre-LN transformer block, ReLU MLP (model2_seq.py:114-134)."""

    def __init__(self, n_embd, n_head, block_exp):
        super().__init__()
        self.ln1 = tnn.LayerNorm(n_embd)
        self.ln2 = tnn.LayerNorm(n_embd)
        self.attn = _SelfAttention(n_embd, n_head)
        self.mlp = tnn.Sequential(
            tnn.Linear(n_embd, block_exp * n_embd), tnn.ReLU(True),
            tnn.Linear(block_exp * n_embd, n_embd), tnn.Dropout(0.0))

    def forward(self, x):
        x = x + self.attn(self.ln1(x))
        return x + self.mlp(self.ln2(x))


class _GPT(tnn.Module):
    """model2_seq.py:175-287 token fusion (gps rows appended)."""

    def __init__(self, n_embd, cfg):
        super().__init__()
        self.n_embd = n_embd
        self.cfg = cfg
        n_tok = 3 * cfg.seq_len * cfg.vert_anchors * cfg.horz_anchors + 2
        self.pos_emb = tnn.Parameter(torch.zeros(1, n_tok, n_embd))
        self.blocks = tnn.Sequential(*[
            _Block(n_embd, cfg.n_head, cfg.block_exp)
            for _ in range(cfg.n_layer)])
        self.ln_f = tnn.LayerNorm(n_embd)

    def forward(self, img, lid, rad, gps):
        cfg = self.cfg
        T = cfg.seq_len
        bz = lid.shape[0] // T
        h, w = lid.shape[2:4]
        toks = torch.cat([img.view(bz, T, -1, h, w),
                          lid.view(bz, T, -1, h, w),
                          rad.view(bz, T, -1, h, w)], dim=1) \
            .permute(0, 1, 3, 4, 2).contiguous().view(bz, -1, self.n_embd)
        x = torch.cat([toks, gps], dim=1) + self.pos_emb
        x = self.ln_f(self.blocks(x))
        n_map = 3 * T * cfg.vert_anchors * cfg.horz_anchors
        gps_out = x[:, n_map:, :]
        x = x[:, :n_map, :].view(bz, 3 * T, cfg.vert_anchors,
                                 cfg.horz_anchors, self.n_embd) \
            .permute(0, 1, 4, 2, 3).contiguous()
        img_o = x[:, :T].reshape(bz * T, -1, h, w)
        lid_o = x[:, T:2 * T].reshape(bz * T, -1, h, w)
        rad_o = x[:, 2 * T:].reshape(bz * T, -1, h, w)
        return img_o, lid_o, rad_o, gps_out


def _normalize_imagenet(x):
    x = x.clone()
    x[:, 0] = (x[:, 0] / 255.0 - 0.485) / 0.229
    x[:, 1] = (x[:, 1] / 255.0 - 0.456) / 0.224
    x[:, 2] = (x[:, 2] / 255.0 - 0.406) / 0.225
    return x


class _RefEncoder(tnn.Module):
    """model2_seq.py:406-597 — the 4-stage interleave."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.avgpool = tnn.AdaptiveAvgPool2d((cfg.vert_anchors,
                                              cfg.horz_anchors))
        self.image_encoder = _ImageCNN()
        self.lidar_encoder = _LidarEncoder(1)
        self.radar_encoder = _LidarEncoder(2)
        for i, d in enumerate((2, 64, 128, 256), 1):
            setattr(self, f"vel_emb{i}", tnn.Linear(d, [64, 128, 256, 512][i - 1]))
        for i, n in enumerate((64, 128, 256, 512), 1):
            setattr(self, f"transformer{i}", _GPT(n, cfg))

    def forward(self, image_list, lidar_list, radar_list, gps):
        cfg = self.cfg
        image_list = [_normalize_imagenet(x) for x in image_list]
        bz, _, h, w = lidar_list[0].shape
        img = torch.stack(image_list, 1).view(bz * cfg.seq_len, -1, h, w)
        lid = torch.stack(lidar_list, 1).view(bz * cfg.seq_len, -1, h, w)
        rad = torch.stack(radar_list, 1).view(bz * cfg.seq_len, -1, h, w)

        nets = (self.image_encoder.features, self.lidar_encoder._model,
                self.radar_encoder._model)
        feats = []
        for net, x in zip(nets, (img, lid, rad)):
            x = net.maxpool(net.relu(net.bn1(net.conv1(x))))
            feats.append(net.layer1(x))

        gps_f = gps
        for i in range(1, 5):
            emb = [self.avgpool(f) for f in feats]
            gps_e = getattr(self, f"vel_emb{i}")(gps_f)
            io, lo, ro, gps_f = getattr(self, f"transformer{i}")(
                emb[0], emb[1], emb[2], gps_e)
            outs = [io, lo, ro]
            scale = (8, 4, 2, 1)[i - 1]
            if scale > 1:
                outs = [tF.interpolate(o, scale_factor=scale,
                                       mode="bilinear") for o in outs]
            feats = [f + o for f, o in zip(feats, outs)]
            if i < 4:
                feats = [getattr(net, f"layer{i + 1}")(f)
                         for net, f in zip(nets, feats)]

        tracks = []
        for net, f in zip(nets, feats):
            t = torch.flatten(net.avgpool(f), 1).view(bz, cfg.seq_len, -1)
            tracks.append(t)
        fused = torch.cat(tracks + [gps_f], dim=1)
        return torch.sum(fused, dim=1)


class _RefTransFuser(tnn.Module):
    """model2_seq.py:850-894 (GPT encoder variant)."""

    def __init__(self, cfg):
        super().__init__()
        self.encoder = _RefEncoder(cfg)
        self.join = tnn.Sequential(
            tnn.Linear(512, 256), tnn.ReLU(True),
            tnn.Linear(256, 128), tnn.ReLU(True), tnn.Linear(128, 64))

    def forward(self, image_list, lidar_list, radar_list, gps):
        return self.join(self.encoder(image_list, lidar_list, radar_list,
                                      gps))


# -- the oracle test ----------------------------------------------------------

def _randomized_variables(model, inp, seed=0):
    """Random params + non-trivial BN stats (zeros/ones would hide bugs in
    the pos_emb and BN-stat mappings)."""
    from synthetic_data import jinit
    variables = jinit(model, *inp, key=seed)
    rng = np.random.default_rng(seed)

    def perturb(x):
        x = np.asarray(x)
        return jnp.asarray(
            rng.normal(scale=0.02, size=x.shape).astype(np.float32))

    params = jax.tree_util.tree_map(perturb, variables["params"])

    def rand_stats(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        x = np.asarray(x)
        if name == "var":
            return jnp.asarray(
                rng.uniform(0.5, 1.5, x.shape).astype(np.float32))
        return jnp.asarray(
            rng.uniform(-0.5, 0.5, x.shape).astype(np.float32))

    stats = jax.tree_util.tree_map_with_path(rand_stats,
                                             variables["batch_stats"])
    return {"params": params, "batch_stats": stats}


class TestGptTransFuserOracle:
    def test_composed_forward_matches_torch(self, rng):
        model = BeamFuser(CFG)
        B, T = 1, CFG.seq_len
        image = rng.uniform(0, 255, (B, T, 256, 256, 3)).astype(np.float32)
        lidar = rng.uniform(0, 1, (B, T, 256, 256, 1)).astype(np.float32)
        radar = rng.uniform(0, 1, (B, T, 256, 256, 2)).astype(np.float32)
        gps = rng.normal(size=(B, 2, 2)).astype(np.float32)
        inp = tuple(jnp.asarray(x) for x in (image, lidar, radar, gps))

        variables = _randomized_variables(model, inp)
        got = np.asarray(jax.jit(
            lambda v, *a: model.apply(v, *a, train=False))(variables, *inp))

        # export to the reference naming, load strict into the recreation
        sd = export_reference_checkpoint(
            variables["params"], variables["batch_stats"], CFG)
        net = _RefTransFuser(CFG)
        net.load_state_dict(
            {k[len("module."):]: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in sd.items()}, strict=True)
        net.eval()

        to_t = lambda x, t: torch.from_numpy(x[:, t]).permute(0, 3, 1, 2)
        with torch.no_grad():
            want = net([to_t(image, t) for t in range(T)],
                       [to_t(lidar, t) for t in range(T)],
                       [to_t(radar, t) for t in range(T)],
                       torch.from_numpy(gps)).numpy()

        assert got.shape == want.shape == (B, 64)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_roundtrip_import(self, rng):
        """export -> import returns the identical Flax tree (and consumes
        every torch key), closing the interop loop both ways."""
        model = BeamFuser(CFG)
        inp = (jnp.zeros((1, CFG.seq_len, 256, 256, 3)),
               jnp.zeros((1, CFG.seq_len, 256, 256, 1)),
               jnp.zeros((1, CFG.seq_len, 256, 256, 2)),
               jnp.zeros((1, 2, 2)))
        variables = _randomized_variables(model, inp, seed=1)
        sd = export_reference_checkpoint(
            variables["params"], variables["batch_stats"], CFG)
        params, stats, unused = import_reference_checkpoint(sd, CFG)
        assert unused == set()
        for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(variables["batch_stats"]),
                        jax.tree_util.tree_leaves(stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -- bi-Mamba flagship oracle ---------------------------------------------------

class _Mamba(tnn.Module):
    """mamba_ssm.Mamba recreated in raw torch (sequential scan): the exact
    layer the reference imports (mambafuser_seq.py:9,83-90).  Parameter names
    match mamba_ssm so the export path loads strict."""

    def __init__(self, d_model, d_state=16, d_conv=4, expand=2):
        super().__init__()
        import math
        d_inner = expand * d_model
        self.d_state, self.d_conv = d_state, d_conv
        self.dt_rank = math.ceil(d_model / 16)
        self.in_proj = tnn.Linear(d_model, 2 * d_inner, bias=False)
        self.conv1d = tnn.Conv1d(d_inner, d_inner, d_conv, groups=d_inner,
                                 padding=d_conv - 1)
        self.x_proj = tnn.Linear(d_inner, self.dt_rank + 2 * d_state,
                                 bias=False)
        self.dt_proj = tnn.Linear(self.dt_rank, d_inner, bias=True)
        self.A_log = tnn.Parameter(torch.zeros(d_inner, d_state))
        self.D = tnn.Parameter(torch.ones(d_inner))
        self.out_proj = tnn.Linear(d_inner, d_model, bias=False)

    def forward(self, h):
        bz, L, _ = h.shape
        x, z = self.in_proj(h).chunk(2, dim=-1)
        x = self.conv1d(x.transpose(1, 2))[:, :, :L].transpose(1, 2)
        x = tF.silu(x)
        dt, B, C = torch.split(
            self.x_proj(x), [self.dt_rank, self.d_state, self.d_state], -1)
        dt = tF.softplus(self.dt_proj(dt))                 # (bz, L, d_inner)
        A = -torch.exp(self.A_log)                         # (d_inner, n)
        state = torch.zeros(bz, A.shape[0], A.shape[1])
        ys = []
        for t in range(L):
            dA = torch.exp(dt[:, t, :, None] * A)
            dBx = (dt[:, t] * x[:, t])[..., None] * B[:, t, None, :]
            state = dA * state + dBx
            ys.append(torch.einsum("bdn,bn->bd", state, C[:, t]))
        y = torch.stack(ys, dim=1) + self.D * x
        return self.out_proj(y * tF.silu(z))


class _MambaBlock(tnn.Module):
    """bi-branch block incl. the flipped-order combine quirk
    (mambafuser_seq.py:137-173)."""

    def __init__(self, n_embd, ln_size):
        super().__init__()
        self.ln1 = tnn.LayerNorm(ln_size)
        self.fc1 = tnn.Linear(n_embd, n_embd)
        self.fc2 = tnn.Linear(n_embd, n_embd)
        self.forward_mamba = _Mamba(n_embd)
        self.backward_mamba = _Mamba(n_embd)

    def forward(self, x):
        x_fc1 = self.fc1(self.ln1(x))
        x_fm = self.forward_mamba(x_fc1)
        x_fc1 = torch.flip(x_fc1, dims=[1])
        x_bm = self.backward_mamba(x_fc1)
        x_relu = tF.leaky_relu(self.fc2(x_fc1), 0.2)
        return x_bm * x_relu + x_fm * x_bm


class _MambaFusion(tnn.Module):
    """mambafuser_seq.py:111-231 — GPT-like shell + channel swap."""

    def __init__(self, n_embd, cfg):
        super().__init__()
        self.n_embd = n_embd
        self.cfg = cfg
        n_tok = 3 * cfg.seq_len * cfg.vert_anchors * cfg.horz_anchors + 2
        self.pos_emb = tnn.Parameter(torch.zeros(1, n_tok, n_embd))
        self.mambablocks = tnn.Sequential(*[
            _MambaBlock(n_embd, (n_tok, n_embd))
            for _ in range(cfg.n_layer)])
        self.ln_f = tnn.LayerNorm(n_embd)

    def forward(self, img, lid, rad, gps):
        cfg = self.cfg
        T = cfg.seq_len
        bz = lid.shape[0] // T
        h, w = lid.shape[2:4]
        img = img.view(bz, T, -1, h, w)
        lid = lid.view(bz, T, -1, h, w)
        rad = rad.view(bz, T, -1, h, w)
        s1, s2 = self.n_embd // 3, self.n_embd // 3 * 2
        cs_img = torch.cat((img[:, :, :s1], lid[:, :, s1:s2],
                            rad[:, :, s2:]), dim=2)
        cs_lid = torch.cat((lid[:, :, :s1], rad[:, :, s1:s2],
                            img[:, :, s2:]), dim=2)
        cs_rad = torch.cat((rad[:, :, :s1], img[:, :, s1:s2],
                            lid[:, :, s2:]), dim=2)
        toks = torch.cat([cs_img, cs_lid, cs_rad], dim=1) \
            .permute(0, 1, 3, 4, 2).contiguous().view(bz, -1, self.n_embd)
        x = torch.cat([toks, gps], dim=1) + self.pos_emb
        x = self.ln_f(self.mambablocks(x))
        n_map = 3 * T * cfg.vert_anchors * cfg.horz_anchors
        gps_out = x[:, n_map:, :]
        x = x[:, :n_map, :].view(bz, 3 * T, cfg.vert_anchors,
                                 cfg.horz_anchors, self.n_embd) \
            .permute(0, 1, 4, 2, 3).contiguous()
        return (x[:, :T].reshape(bz * T, -1, h, w),
                x[:, T:2 * T].reshape(bz * T, -1, h, w),
                x[:, 2 * T:].reshape(bz * T, -1, h, w), gps_out)


class _TimeMamba(tnn.Module):
    """mambafuser_seq.py:233-284 (shared Mamba + pooled time attention)."""

    def __init__(self, seq_len):
        super().__init__()
        self.mamba = _Mamba(512)
        self.maxpool = tnn.MaxPool1d(kernel_size=512)
        self.avgpool = tnn.AvgPool1d(kernel_size=512)
        self.mlp = tnn.Sequential(tnn.Linear(seq_len, seq_len),
                                  tnn.Softmax(dim=-1))
        self.mlp_gps = tnn.Sequential(tnn.Linear(2, 2), tnn.Softmax(dim=-1))

    def _attend(self, feats, mlp):
        att = self.maxpool(feats) + self.avgpool(feats)
        att = mlp(att.squeeze(-1)).unsqueeze(-1).expand(-1, -1, 512)
        return (feats * att).sum(dim=1, keepdim=True)

    def forward(self, img, lid, rad, gps):
        outs = [self._attend(self.mamba(f), self.mlp)
                for f in (img, lid, rad)]
        outs.append(self._attend(gps, self.mlp_gps))
        return torch.cat(outs, dim=1).sum(dim=1)


class _RefEncoderWithMamba(tnn.Module):
    """mambafuser_seq.py:286-550 (miss=None, no rebuild injection)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.avgpool = tnn.AdaptiveAvgPool2d((cfg.vert_anchors,
                                              cfg.horz_anchors))
        self.image_encoder = _ImageCNN()
        self.lidar_encoder = _LidarEncoder(1)
        self.radar_encoder = _LidarEncoder(2)
        for i, d in enumerate((2, 64, 128, 256), 1):
            setattr(self, f"vel_emb{i}",
                    tnn.Linear(d, [64, 128, 256, 512][i - 1]))
        for i, n in enumerate((64, 128, 256, 512), 1):
            setattr(self, f"mambafusion{i}", _MambaFusion(n, cfg))
        self.time_mamba = _TimeMamba(cfg.seq_len)

    def forward(self, image_list, lidar_list, radar_list, gps):
        cfg = self.cfg
        image_list = [_normalize_imagenet(x) for x in image_list]
        bz, _, h, w = lidar_list[0].shape
        img = torch.stack(image_list, 1).view(bz * cfg.seq_len, -1, h, w)
        lid = torch.stack(lidar_list, 1).view(bz * cfg.seq_len, -1, h, w)
        rad = torch.stack(radar_list, 1).view(bz * cfg.seq_len, -1, h, w)

        nets = (self.image_encoder.features, self.lidar_encoder._model,
                self.radar_encoder._model)
        feats = []
        for net, x in zip(nets, (img, lid, rad)):
            x = net.maxpool(net.relu(net.bn1(net.conv1(x))))
            feats.append(net.layer1(x))

        gps_f = gps
        for i in range(1, 5):
            emb = [self.avgpool(f) for f in feats]
            gps_e = getattr(self, f"vel_emb{i}")(gps_f)
            io, lo, ro, gps_f = getattr(self, f"mambafusion{i}")(
                emb[0], emb[1], emb[2], gps_e)
            outs = [io, lo, ro]
            scale = (8, 4, 2, 1)[i - 1]
            if scale > 1:
                outs = [tF.interpolate(o, scale_factor=scale,
                                       mode="bilinear") for o in outs]
            feats = [f + o for f, o in zip(feats, outs)]
            if i < 4:
                feats = [getattr(net, f"layer{i + 1}")(f)
                         for net, f in zip(nets, feats)]

        tracks = [torch.flatten(net.avgpool(f), 1).view(bz, cfg.seq_len, -1)
                  for net, f in zip(nets, feats)]
        return self.time_mamba(tracks[0], tracks[1], tracks[2], gps_f)


class _RefMambaFuser(tnn.Module):
    """mambafuser_seq.py:553-597."""

    def __init__(self, cfg):
        super().__init__()
        self.encoder = _RefEncoderWithMamba(cfg)
        self.join = tnn.Sequential(
            tnn.Linear(512, 256), tnn.ReLU(True),
            tnn.Linear(256, 128), tnn.ReLU(True), tnn.Linear(128, 64))

    def forward(self, image_list, lidar_list, radar_list, gps):
        return self.join(self.encoder(image_list, lidar_list, radar_list,
                                      gps))


class TestMambaFuserOracle:
    def test_composed_forward_matches_torch(self, rng):
        cfg = GlobalConfig(seq_len=2, n_layer=1, FFM=1, TFM=1,
                           use_pallas_scan=False, compute_dtype="float32")
        model = BeamFuser(cfg)
        B, T = 1, cfg.seq_len
        image = rng.uniform(0, 255, (B, T, 256, 256, 3)).astype(np.float32)
        lidar = rng.uniform(0, 1, (B, T, 256, 256, 1)).astype(np.float32)
        radar = rng.uniform(0, 1, (B, T, 256, 256, 2)).astype(np.float32)
        gps = rng.normal(size=(B, 2, 2)).astype(np.float32)
        inp = tuple(jnp.asarray(x) for x in (image, lidar, radar, gps))

        variables = _randomized_variables(model, inp, seed=2)
        got = np.asarray(jax.jit(
            lambda v, *a: model.apply(v, *a, train=False))(variables, *inp))

        sd = export_reference_checkpoint(
            variables["params"], variables["batch_stats"], cfg)
        net = _RefMambaFuser(cfg)
        net.load_state_dict(
            {k[len("module."):]: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in sd.items()}, strict=True)
        net.eval()

        to_t = lambda x, t: torch.from_numpy(x[:, t]).permute(0, 3, 1, 2)
        with torch.no_grad():
            want = net([to_t(image, t) for t in range(T)],
                       [to_t(lidar, t) for t in range(T)],
                       [to_t(radar, t) for t in range(T)],
                       torch.from_numpy(gps)).numpy()

        assert got.shape == want.shape == (B, 64)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


# -- 30to5 GRU multi-step decoder oracle --------------------------------------

class TestMultiStepDecoderOracle:
    def test_decode_matches_torch_grucell(self, rng):
        """model2_seq_30to5.py:831-862: z = GRUCell(x, z); x += Linear(z),
        stacked over pred_len.  Pins flax/torch GRU gate-convention parity
        (r,z,n ordering, the n-gate's r-scaled hidden bias) and the residual
        accumulation, isolated from the (already oracle-tested) encoder."""
        cfg = GlobalConfig(seq_len=10, pred_len=5, use_pallas_scan=False,
                           compute_dtype="float32")
        model = BeamFuser(cfg)
        B, H = 3, cfg.num_beams
        z0 = rng.normal(size=(B, H)).astype(np.float32)

        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(z0),
                               method="decode_multistep")
        # non-trivial weights everywhere (init biases are zero)
        variables = jax.tree_util.tree_map(
            lambda x: jnp.asarray(rng.normal(
                scale=0.5, size=np.shape(x)).astype(np.float32)), variables)
        got = np.asarray(model.apply(variables, jnp.asarray(z0),
                                     method="decode_multistep"))

        d = variables["params"]["decoder"]
        t = lambda a: torch.from_numpy(np.ascontiguousarray(np.asarray(a)))
        gru = tnn.GRUCell(H, H)
        with torch.no_grad():
            gru.weight_ih.copy_(torch.cat(
                [t(d[k]["kernel"]).T for k in ("ir", "iz", "in")], 0))
            gru.weight_hh.copy_(torch.cat(
                [t(d[k]["kernel"]).T for k in ("hr", "hz", "hn")], 0))
            # flax folds the torch r/z hidden biases into ir/iz (it has
            # none); only the n gate keeps a separate hidden bias
            gru.bias_ih.copy_(torch.cat(
                [t(d[k]["bias"]) for k in ("ir", "iz", "in")]))
            gru.bias_hh.copy_(torch.cat(
                [torch.zeros(H), torch.zeros(H), t(d["hn"]["bias"])]))
        out = tnn.Linear(H, H)
        with torch.no_grad():
            out.weight.copy_(t(variables["params"]["output"]["kernel"]).T)
            out.bias.copy_(t(variables["params"]["output"]["bias"]))

        zt = torch.from_numpy(z0)
        x = torch.zeros(B, H)
        outs = []
        with torch.no_grad():
            for _ in range(cfg.pred_len):
                zt = gru(x, zt)
                x = x + out(zt)
                outs.append(x)
            want = torch.stack(outs, dim=1).numpy()

        assert got.shape == want.shape == (B, cfg.pred_len, H)
        # f32 accumulation noise over 5 recurrent steps at |x|~40 is ~7e-5;
        # a gate-convention bug would be O(1)
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
