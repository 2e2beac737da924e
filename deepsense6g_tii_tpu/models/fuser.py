"""Top-level beam-prediction models.

``BeamFuser`` covers both reference top modules — ``TransFuser``
(model2_seq.py:850-894, GPT fusion) and ``MambaFuser``
(mambafuser_seq.py:553-597, Mamba fusion) — the choice is config.FFM/TFM.
Encoder output goes through the ``join`` MLP 512->256->128->64 to beam
logits.

For the 30to5 multi-step variant (pred_len > 1) an autoregressive GRU
decoder unrolls pred_len steps (model2_seq_30to5.py:831-862): each step feeds
the previous step's 64-d logits through a GRUCell whose initial hidden state
is the join output, followed by a shared linear head.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import GlobalConfig
from .encoder import FusionEncoder


class BeamFuser(nn.Module):
    config: GlobalConfig

    def setup(self):
        cfg = self.config
        self.encoder = FusionEncoder(cfg, name="encoder")
        self.join = [
            nn.Dense(256, name="join_fc1"),
            nn.Dense(128, name="join_fc2"),
            nn.Dense(cfg.num_beams, name="join_fc3"),
        ]
        if cfg.pred_len > 1:
            self.decoder = nn.GRUCell(features=cfg.num_beams, name="decoder")
            self.output = nn.Dense(cfg.num_beams, name="output")

    def _join(self, z: jnp.ndarray) -> jnp.ndarray:
        z = nn.relu(self.join[0](z))
        z = nn.relu(self.join[1](z))
        return self.join[2](z)

    def __call__(self, image, lidar, radar, gps,
                 rebuild_feats: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 sample_mask: Optional[jnp.ndarray] = None):
        """Returns (B, num_beams) logits, or (B, pred_len, num_beams) when
        pred_len > 1.  ``sample_mask`` masks engine-padded rows out of the
        BatchNorm statistics (see FusionEncoder)."""
        fused = self.encoder(image, lidar, radar, gps,
                             rebuild_feats=rebuild_feats, train=train,
                             sample_mask=sample_mask)
        z = self._join(fused.astype(jnp.float32))
        if self.config.pred_len <= 1:
            return z
        return self.decode_multistep(z)

    def decode_multistep(self, z: jnp.ndarray) -> jnp.ndarray:
        """Autoregressive multi-step decode (model2_seq_30to5.py:843-862):
        GRU hidden state initialized from the join output ``z``, input is the
        running prediction ``x`` (starts at zero), and each step's linear head
        output is accumulated residually into ``x``.  (B, 64) -> (B, pred_len,
        64)."""
        h = z
        x = jnp.zeros_like(z)
        outs = []
        for _ in range(self.config.pred_len):
            h, _ = self.decoder(h, x)
            x = x + self.output(h)
            outs.append(x)
        return jnp.stack(outs, axis=1)

    def encode_stage1(self, image, lidar, radar, gps, train: bool = False):
        """Exposes the stage-1 per-modality features for the rebuild
        subsystem (my_test.py checkpoint-split equivalent).  The missing-
        modality zeroing is bypassed: the rebuild trainer needs the real
        target-modality features as its translation label
        (train_image_radar_lidar_rebuild.py:325-343)."""
        return self.encoder(image, lidar, radar, gps, train=train,
                            return_stage1=True, apply_missing=False)
