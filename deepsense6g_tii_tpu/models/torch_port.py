"""Torch -> Flax weight porting for the ResNet backbones.

The reference initializes its encoders from torchvision ImageNet checkpoints
(mambafuser_seq.py:23,59: ``models.resnet34(weights=True)`` /
``models.resnet18(weights=True)``, with conv1 swapped for the 1/2-channel
LiDAR/radar inputs — the swapped conv1 stays randomly initialized).  This
module converts a torchvision-format state dict (tensors or numpy arrays,
standard key names: conv1.weight, layerX.Y.bn1.running_mean, ...) into the
Flax param/batch_stats trees of ``models.resnet.ResNetBackbone``.

No torch import is required unless the input contains torch tensors; loading
a ``.pth`` file goes through ``torch.load`` only if torch is available.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv(sd, key) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return _to_np(sd[key]).transpose(2, 3, 1, 0)


def _bn(sd, prefix) -> Tuple[dict, dict]:
    params = {"scale": _to_np(sd[prefix + ".weight"]),
              "bias": _to_np(sd[prefix + ".bias"])}
    stats = {"mean": _to_np(sd[prefix + ".running_mean"]),
             "var": _to_np(sd[prefix + ".running_var"])}
    return params, stats


def convert_resnet_state_dict(sd: Dict[str, np.ndarray],
                              blocks=(2, 2, 2, 2),
                              port_conv1: bool = True):
    """Returns (params, batch_stats) for ``ResNetBackbone``.

    ``port_conv1=False`` skips the stem conv (the reference's swapped
    1/2-channel conv1 for LiDAR/radar keeps its random init).
    """
    params: dict = {"stem": {}}
    stats: dict = {"stem": {}}
    if port_conv1:
        params["stem"]["conv1"] = {"kernel": _conv(sd, "conv1.weight")}
    bn_p, bn_s = _bn(sd, "bn1")
    params["stem"]["bn1"] = bn_p
    stats["stem"]["bn1"] = bn_s

    for si, nb in enumerate(blocks, start=1):
        sp: dict = {}
        ss: dict = {}
        for bi in range(nb):
            t = f"layer{si}.{bi}"
            bp: dict = {}
            bs: dict = {}
            for ci in (1, 2):
                bp[f"conv{ci}"] = {"kernel": _conv(sd, f"{t}.conv{ci}.weight")}
                p, s = _bn(sd, f"{t}.bn{ci}")
                bp[f"bn{ci}"] = p
                bs[f"bn{ci}"] = s
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(sd, f"{t}.downsample.0.weight")}
                p, s = _bn(sd, f"{t}.downsample.1")
                bp["downsample_bn"] = p
                bs["downsample_bn"] = s
            sp[f"block{bi}"] = bp
            ss[f"block{bi}"] = bs
        params[f"stage{si}"] = sp
        stats[f"stage{si}"] = ss
    return params, stats


def load_torchvision_checkpoint(path: str, blocks=(2, 2, 2, 2),
                                port_conv1: bool = True):
    """Loads a torchvision ResNet .pth checkpoint file."""
    import torch  # torch-cpu is an allowed host-side dependency
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_resnet_state_dict(sd, blocks=blocks, port_conv1=port_conv1)


def graft_backbone(variables: dict, backbone_name: str,
                   ported_params: dict, ported_stats: dict) -> dict:
    """Returns a copy of a model's ``variables`` with one encoder backbone's
    params/batch_stats replaced by ported weights (missing leaves — e.g. a
    skipped conv1 — keep their current values)."""
    import jax

    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            out[k] = merge(dst[k], v) if isinstance(v, dict) else v
        return out

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    new_params = merge(variables["params"]["encoder"][backbone_name],
                       ported_params)
    new_stats = merge(variables["batch_stats"]["encoder"][backbone_name],
                      ported_stats)
    params = dict(variables["params"])
    enc = dict(params["encoder"])
    enc[backbone_name] = new_params
    params["encoder"] = enc
    bstats = dict(variables["batch_stats"])
    benc = dict(bstats["encoder"])
    benc[backbone_name] = new_stats
    bstats["encoder"] = benc
    return {**variables, "params": params, "batch_stats": bstats}
