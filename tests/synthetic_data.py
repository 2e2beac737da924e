"""Synthetic data + tiny stand-in model for fast engine/pipeline tests.

The real DeepSense6G dataset is not available in CI; these helpers generate
(a) in-memory batches with the exact batch contract of the data pipeline and
(b) an on-disk fake dataset tree matching the reference layout
(camera jpgs, LiDAR .ply, radar .npy, GPS .txt, index CSVs) so the dataset /
preprocessing code paths run end-to-end.
"""

import os

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.data.features import soft_beam_target_np
from deepsense6g_tii_tpu.models.resnet import bn_sample_mask


def make_batch(rng, B=2, T=2, H=128, W=128, radar_ch=2, num_beams=64,
               pred_len=1):
    idx = rng.integers(0, num_beams, size=(B,) if pred_len == 1 else (B, pred_len))
    if pred_len == 1:
        beam = np.stack([soft_beam_target_np(i) for i in idx]).astype(np.float32)
    else:
        beam = np.stack([[soft_beam_target_np(i) for i in row] for row in idx]
                        ).astype(np.float32)
    return {
        "image": rng.uniform(0, 255, (B, T, H, W, 3)).astype(np.float32),
        "lidar": rng.uniform(0, 1, (B, T, H, W, 1)).astype(np.float32),
        "radar": rng.uniform(0, 1, (B, T, H, W, radar_ch)).astype(np.float32),
        "gps": rng.normal(size=(B, 2, 2)).astype(np.float32),
        "beam": beam,
        "beamidx": idx.astype(np.int32),
        "scenario": np.asarray(
            [f"scenario{31 + i % 4}" for i in range(B)]),
    }


class TinyFuser(nn.Module):
    """Same call signature as BeamFuser, two conv layers deep — engine tests
    exercise every step/checkpoint/metric path in seconds instead of minutes.
    """

    config: GlobalConfig

    @nn.compact
    def __call__(self, image, lidar, radar, gps, rebuild_feats=None,
                 train: bool = False, sample_mask=None):
        del rebuild_feats
        B, T = image.shape[:2]
        bn_mask = (None if sample_mask is None
                   else bn_sample_mask(sample_mask, T))

        def enc(x, name):
            x = x.reshape((-1,) + x.shape[2:])
            x = nn.Conv(8, (7, 7), strides=(8, 8), name=name + "_c1")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=name + "_bn")(x, mask=bn_mask)
            x = nn.Conv(16, (3, 3), strides=(8, 8), name=name + "_c2")(x)
            return x.mean(axis=(1, 2)).reshape(B, -1)

        z = jnp.concatenate([
            enc(image / 255.0, "img"), enc(lidar, "lid"), enc(radar, "rad"),
            gps.reshape(B, -1)], axis=-1)
        z = nn.Dense(64, name="h")(z)
        z = nn.relu(z)
        z = nn.Dropout(0.1)(z, deterministic=not train)
        logits = nn.Dense(self.config.num_beams, name="out")(z)
        if self.config.pred_len > 1:
            logits = jnp.stack([logits] * self.config.pred_len, axis=1)
        return logits


# make_fake_dataset_tree moved to the package (it is user-facing demo
# tooling, shared with examples/quickstart.py); re-exported for tests.
from deepsense6g_tii_tpu.utils.demo_data import (  # noqa: E402,F401
    make_demo_root, make_fake_dataset_tree)


def jinit(model, *args, key=0, **kw):
    """jit-compiled model.init: eager init executes thousands of tiny ops
    (~10-25 s per full-model init on this 1-core host) and is uncacheable;
    the jitted version lands in the persistent compile cache, so repeat
    suite runs pay ~1 s."""
    import jax as _jax
    return _jax.jit(
        lambda: model.init(_jax.random.PRNGKey(key), *args, **kw))()
