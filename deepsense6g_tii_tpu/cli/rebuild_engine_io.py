"""Rebuild-state checkpoint IO: the reference's 5-module file layout.

The reference saves {image,lidar,radar}_projection, feat_trans and the
fusion model as separate best_/final_ .pth files
(train_image_radar_lidar_rebuild.py:585-611); here each group is a msgpack
of the corresponding subtree so individual modules stay independently
loadable (e.g. a best projection head with a final translator).
"""

from __future__ import annotations

import os
from typing import Any

import flax.serialization
import jax

_HEAD_KEYS = ("image_projection_l1", "lidar_projection_l1",
              "radar_projection_l1", "feat_trans_l1")


def _write(path: str, tree: Any) -> None:
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(
            jax.tree_util.tree_map(jax.device_get, tree)))


def _read(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(target, f.read())


def save_rebuild_state(logdir: str, state, best: bool = False) -> None:
    prefixes = ["final"] + (["best"] if best else [])
    for prefix in prefixes:
        for key in _HEAD_KEYS:
            _write(os.path.join(logdir, f"{prefix}_{key}.msgpack"),
                   {"params": state.head_params[key],
                    "batch_stats": state.head_stats.get(key, {})})
        _write(os.path.join(logdir, f"{prefix}_fusion_model.msgpack"),
               {"params": state.fusion_params,
                "batch_stats": state.fusion_stats})
    if best:
        _write(os.path.join(logdir, "best_optim.msgpack"),
               {"opt_state": state.opt_state})


def load_rebuild_state(logdir: str, state, best: bool = True):
    prefix = "best" if best else "final"
    head_params = dict(state.head_params)
    head_stats = dict(state.head_stats)
    for key in _HEAD_KEYS:
        out = _read(os.path.join(logdir, f"{prefix}_{key}.msgpack"),
                    {"params": state.head_params[key],
                     "batch_stats": state.head_stats.get(key, {})})
        head_params[key] = out["params"]
        if out["batch_stats"]:
            head_stats[key] = out["batch_stats"]
    fus = _read(os.path.join(logdir, f"{prefix}_fusion_model.msgpack"),
                {"params": state.fusion_params,
                 "batch_stats": state.fusion_stats})
    opt_state = state.opt_state
    opt_path = os.path.join(logdir, "best_optim.msgpack")
    if best and os.path.exists(opt_path):
        opt_state = _read(opt_path, {"opt_state": state.opt_state})["opt_state"]
    return state.replace(head_params=head_params, head_stats=head_stats,
                         fusion_params=fus["params"],
                         fusion_stats=fus["batch_stats"],
                         opt_state=opt_state)
