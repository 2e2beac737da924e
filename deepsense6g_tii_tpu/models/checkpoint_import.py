"""Import reference PyTorch checkpoints into BeamFuser variables.

Maps a torch state dict in the reference's naming scheme — a
``MambaFuser``/``TransFuser`` saved via DataParallel (``module.`` prefix,
train2_seq.py:276,283: best_model.pth / final_model.pth) — onto this
framework's Flax parameter tree, so a user of the reference can bring a
trained checkpoint directly.

Key layout translations:
  torch Linear weight (out, in)        -> Dense kernel (in, out)
  torch Conv2d weight (O, I, H, W)     -> Conv kernel (H, W, I, O)
  mamba conv1d weight (d_inner, 1, k)  -> (k, 1, d_inner)
  mamba dt_proj weight (d_inner, rank) -> (rank, d_inner)
  BatchNorm weight/bias + running_mean/var -> scale/bias + batch_stats
  LayerNorm(962, C) weight/bias        -> scale/bias (same shape)

Naming sources: mambafuser_seq.py (MambaFuser/EncoderWithMamba/MambaFusion/
MambaBlock/TimeMamba), model2_seq.py (GPT Encoder), torchvision ResNet, and
mamba_ssm.Mamba.
"""

from __future__ import annotations

from typing import Dict, Set, Tuple

import numpy as np

from .torch_port import convert_resnet_state_dict


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


class _Importer:
    def __init__(self, sd: Dict[str, np.ndarray]):
        # strip the DataParallel prefix (my_test.py:1-33 does the same)
        self.sd = {k[len("module."):] if k.startswith("module.") else k: v
                   for k, v in sd.items()}
        self.used: Set[str] = set()

    def take(self, key: str) -> np.ndarray:
        self.used.add(key)
        return _np(self.sd[key])

    def linear(self, prefix: str, bias: bool = True) -> dict:
        out = {"kernel": self.take(prefix + ".weight").T}
        if bias:
            out["bias"] = self.take(prefix + ".bias")
        return out

    def layernorm(self, prefix: str) -> dict:
        return {"scale": self.take(prefix + ".weight"),
                "bias": self.take(prefix + ".bias")}

    def mamba(self, prefix: str) -> dict:
        return {
            "in_proj": {"kernel": self.take(prefix + ".in_proj.weight").T},
            "conv1d_weight": self.take(prefix + ".conv1d.weight")
                                 .transpose(2, 1, 0),
            "conv1d_bias": self.take(prefix + ".conv1d.bias"),
            "x_proj": {"kernel": self.take(prefix + ".x_proj.weight").T},
            "dt_proj_weight": self.take(prefix + ".dt_proj.weight").T,
            "dt_proj_bias": self.take(prefix + ".dt_proj.bias"),
            "A_log": self.take(prefix + ".A_log"),
            "D": self.take(prefix + ".D"),
            "out_proj": {"kernel": self.take(prefix + ".out_proj.weight").T},
        }

    def mamba_block(self, prefix: str) -> dict:
        return {
            "ln1": self.layernorm(prefix + ".ln1"),
            "fc1": self.linear(prefix + ".fc1"),
            "fc2": self.linear(prefix + ".fc2"),
            "forward_mamba": self.mamba(prefix + ".forward_mamba"),
            "backward_mamba": self.mamba(prefix + ".backward_mamba"),
        }

    def gpt_block(self, prefix: str) -> dict:
        return {
            "ln1": self.layernorm(prefix + ".ln1"),
            "ln2": self.layernorm(prefix + ".ln2"),
            "attn": {
                "query": self.linear(prefix + ".attn.query"),
                "key": self.linear(prefix + ".attn.key"),
                "value": self.linear(prefix + ".attn.value"),
                "proj": self.linear(prefix + ".attn.proj"),
            },
            "mlp_fc": self.linear(prefix + ".mlp.0"),
            "mlp_proj": self.linear(prefix + ".mlp.2"),
        }

    def fusion(self, prefix: str, n_layer: int, kind: str) -> dict:
        """MambaFusion (mambafuser_seq.py:111-231) or GPT
        (model2_seq.py:175-287)."""
        out = {"pos_emb": self.take(prefix + ".pos_emb"),
               "ln_f": self.layernorm(prefix + ".ln_f")}
        inner = "mambablocks" if kind == "mamba" else "blocks"
        make = self.mamba_block if kind == "mamba" else self.gpt_block
        for i in range(n_layer):
            out[f"block{i}"] = make(f"{prefix}.{inner}.{i}")
        return out

    def resnet(self, prefix: str) -> Tuple[dict, dict]:
        sub = {k[len(prefix) + 1:]: v for k, v in self.sd.items()
               if k.startswith(prefix + ".")}
        blocks = (3, 4, 6, 3) if any(k.startswith("layer1.2") for k in sub) \
            else (2, 2, 2, 2)
        self.used.update(prefix + "." + k for k in sub
                         if not k.startswith("fc."))
        return convert_resnet_state_dict(sub, blocks=blocks)

    def time_mamba(self, prefix: str) -> dict:
        return {
            "mamba": self.mamba(prefix + ".mamba"),
            "mlp": self.linear(prefix + ".mlp.0"),
            "mlp_gps": self.linear(prefix + ".mlp_gps.0"),
        }


def import_reference_checkpoint(sd: Dict, config) -> Tuple[dict, dict, Set[str]]:
    """torch state dict -> (params, batch_stats, unused_torch_keys) for
    ``BeamFuser(config)``.

    ``config.FFM`` selects the mamba vs GPT fusion naming
    (mambafusionN vs transformerN); ``config.TFM`` expects time_mamba.
    """
    imp = _Importer(sd)
    enc = "encoder"
    params: dict = {}
    stats: dict = {}

    img_p, img_s = imp.resnet(f"{enc}.image_encoder.features")
    lid_p, lid_s = imp.resnet(f"{enc}.lidar_encoder._model")
    rad_p, rad_s = imp.resnet(f"{enc}.radar_encoder._model")
    enc_p = {"image_encoder": img_p, "lidar_encoder": lid_p,
             "radar_encoder": rad_p}
    enc_s = {"image_encoder": img_s, "lidar_encoder": lid_s,
             "radar_encoder": rad_s}

    for i in range(1, 5):
        enc_p[f"vel_emb{i}"] = imp.linear(f"{enc}.vel_emb{i}")

    kind = "mamba" if config.FFM else "gpt"
    torch_name = "mambafusion" if config.FFM else "transformer"
    for i in range(1, 5):
        enc_p[f"fusion{i}"] = imp.fusion(f"{enc}.{torch_name}{i}",
                                         config.n_layer, kind)

    if config.TFM:
        enc_p["time_mamba"] = imp.time_mamba(f"{enc}.time_mamba")

    params["encoder"] = enc_p
    stats["encoder"] = enc_s
    params["join_fc1"] = imp.linear("join.0")
    params["join_fc2"] = imp.linear("join.2")
    params["join_fc3"] = imp.linear("join.4")
    if config.pred_len > 1:
        # GRU decoder (model2_seq_30to5.py:831-833): torch GRUCell packs
        # gates as (r, z, n); flax GRUCell splits into ir/iz/in + hr/hz/hn
        w_ih = imp.take("decoder.weight_ih")      # (3H, in)
        w_hh = imp.take("decoder.weight_hh")      # (3H, H)
        b_ih = imp.take("decoder.bias_ih")
        b_hh = imp.take("decoder.bias_hh")
        H = w_hh.shape[1]
        def g(mat, k):
            return mat[k * H:(k + 1) * H].T
        # flax has no hr/hz biases: fold torch b_hh r/z parts into ir/iz
        params["decoder"] = {
            "ir": {"kernel": g(w_ih, 0), "bias": b_ih[:H] + b_hh[:H]},
            "iz": {"kernel": g(w_ih, 1),
                   "bias": b_ih[H:2 * H] + b_hh[H:2 * H]},
            "in": {"kernel": g(w_ih, 2), "bias": b_ih[2 * H:3 * H]},
            "hr": {"kernel": g(w_hh, 0)},
            "hz": {"kernel": g(w_hh, 1)},
            "hn": {"kernel": g(w_hh, 2), "bias": b_hh[2 * H:3 * H]},
        }
        params["output"] = imp.linear("output")

    unused = set(imp.sd) - imp.used
    unused = {k for k in unused if not k.endswith("num_batches_tracked")}
    return params, stats, unused


def load_reference_checkpoint(path: str, config):
    """Loads a reference .pth file (requires torch on the host)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return import_reference_checkpoint(sd, config)


# ---------------------------------------------------------------------------
# export (Flax -> reference torch naming)
# ---------------------------------------------------------------------------

def _exp_linear(sd, prefix, tree):
    sd[prefix + ".weight"] = np.asarray(tree["kernel"]).T
    if "bias" in tree:
        sd[prefix + ".bias"] = np.asarray(tree["bias"])


def _exp_layernorm(sd, prefix, tree):
    sd[prefix + ".weight"] = np.asarray(tree["scale"])
    sd[prefix + ".bias"] = np.asarray(tree["bias"])


def _exp_mamba(sd, prefix, t):
    sd[prefix + ".in_proj.weight"] = np.asarray(t["in_proj"]["kernel"]).T
    sd[prefix + ".conv1d.weight"] = np.asarray(t["conv1d_weight"]) \
        .transpose(2, 1, 0)
    sd[prefix + ".conv1d.bias"] = np.asarray(t["conv1d_bias"])
    sd[prefix + ".x_proj.weight"] = np.asarray(t["x_proj"]["kernel"]).T
    sd[prefix + ".dt_proj.weight"] = np.asarray(t["dt_proj_weight"]).T
    sd[prefix + ".dt_proj.bias"] = np.asarray(t["dt_proj_bias"])
    sd[prefix + ".A_log"] = np.asarray(t["A_log"])
    sd[prefix + ".D"] = np.asarray(t["D"])
    sd[prefix + ".out_proj.weight"] = np.asarray(t["out_proj"]["kernel"]).T


def _exp_bn(sd, prefix, p, s):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])
    sd[prefix + ".running_mean"] = np.asarray(s["mean"])
    sd[prefix + ".running_var"] = np.asarray(s["var"])


def _exp_resnet(sd, prefix, p, s):
    sd[prefix + ".conv1.weight"] = np.asarray(
        p["stem"]["conv1"]["kernel"]).transpose(3, 2, 0, 1)
    _exp_bn(sd, prefix + ".bn1", p["stem"]["bn1"], s["stem"]["bn1"])
    for si in range(1, 5):
        stage_p, stage_s = p[f"stage{si}"], s[f"stage{si}"]
        for bname in stage_p:
            bi = int(bname.replace("block", ""))
            t = f"{prefix}.layer{si}.{bi}"
            bp, bs = stage_p[bname], stage_s[bname]
            for ci in (1, 2):
                sd[f"{t}.conv{ci}.weight"] = np.asarray(
                    bp[f"conv{ci}"]["kernel"]).transpose(3, 2, 0, 1)
                _exp_bn(sd, f"{t}.bn{ci}", bp[f"bn{ci}"], bs[f"bn{ci}"])
            if "downsample_conv" in bp:
                sd[f"{t}.downsample.0.weight"] = np.asarray(
                    bp["downsample_conv"]["kernel"]).transpose(3, 2, 0, 1)
                _exp_bn(sd, f"{t}.downsample.1", bp["downsample_bn"],
                        bs["downsample_bn"])


def export_reference_checkpoint(params: dict, batch_stats: dict,
                                config) -> Dict[str, np.ndarray]:
    """BeamFuser variables -> torch state dict in the reference naming
    (``module.``-prefixed, loadable by the reference after torch.save)."""
    sd: Dict[str, np.ndarray] = {}
    enc_p, enc_s = params["encoder"], batch_stats["encoder"]
    _exp_resnet(sd, "encoder.image_encoder.features",
                enc_p["image_encoder"], enc_s["image_encoder"])
    _exp_resnet(sd, "encoder.lidar_encoder._model",
                enc_p["lidar_encoder"], enc_s["lidar_encoder"])
    _exp_resnet(sd, "encoder.radar_encoder._model",
                enc_p["radar_encoder"], enc_s["radar_encoder"])
    for i in range(1, 5):
        _exp_linear(sd, f"encoder.vel_emb{i}", enc_p[f"vel_emb{i}"])

    torch_name = "mambafusion" if config.FFM else "transformer"
    inner = "mambablocks" if config.FFM else "blocks"
    for i in range(1, 5):
        f = enc_p[f"fusion{i}"]
        pre = f"encoder.{torch_name}{i}"
        sd[pre + ".pos_emb"] = np.asarray(f["pos_emb"])
        _exp_layernorm(sd, pre + ".ln_f", f["ln_f"])
        for bname in f:
            if not bname.startswith("block"):
                continue
            bi = int(bname.replace("block", ""))
            b = f[bname]
            t = f"{pre}.{inner}.{bi}"
            if config.FFM:
                _exp_layernorm(sd, t + ".ln1", b["ln1"])
                _exp_linear(sd, t + ".fc1", b["fc1"])
                _exp_linear(sd, t + ".fc2", b["fc2"])
                _exp_mamba(sd, t + ".forward_mamba", b["forward_mamba"])
                _exp_mamba(sd, t + ".backward_mamba", b["backward_mamba"])
            else:
                _exp_layernorm(sd, t + ".ln1", b["ln1"])
                _exp_layernorm(sd, t + ".ln2", b["ln2"])
                for name in ("query", "key", "value", "proj"):
                    _exp_linear(sd, f"{t}.attn.{name}", b["attn"][name])
                _exp_linear(sd, t + ".mlp.0", b["mlp_fc"])
                _exp_linear(sd, t + ".mlp.2", b["mlp_proj"])

    if config.TFM:
        tm = enc_p["time_mamba"]
        _exp_mamba(sd, "encoder.time_mamba.mamba", tm["mamba"])
        _exp_linear(sd, "encoder.time_mamba.mlp.0", tm["mlp"])
        _exp_linear(sd, "encoder.time_mamba.mlp_gps.0", tm["mlp_gps"])

    _exp_linear(sd, "join.0", params["join_fc1"])
    _exp_linear(sd, "join.2", params["join_fc2"])
    _exp_linear(sd, "join.4", params["join_fc3"])

    if config.pred_len > 1 and "decoder" in params:
        d = params["decoder"]
        H = np.asarray(d["hr"]["kernel"]).shape[0]
        sd["decoder.weight_ih"] = np.concatenate(
            [np.asarray(d[k]["kernel"]).T for k in ("ir", "iz", "in")], 0)
        sd["decoder.weight_hh"] = np.concatenate(
            [np.asarray(d[k]["kernel"]).T for k in ("hr", "hz", "hn")], 0)
        sd["decoder.bias_ih"] = np.concatenate(
            [np.asarray(d[k]["bias"]) for k in ("ir", "iz", "in")])
        sd["decoder.bias_hh"] = np.concatenate(
            [np.zeros(H), np.zeros(H), np.asarray(d["hn"]["bias"])])
        _exp_linear(sd, "output", params["output"])

    return {"module." + k: v for k, v in sd.items()}
