"""Projection / translation heads of the modality-rebuild subsystem.

Reference: modality_rebuild/train_image_radar_lidar_rebuild.py:232-266,
instantiated with input_dim=64, hidden 64, out_dim=128 (ProjectHead) and
input 128 -> 64 (FeatureTrans) at lines 709-713.  The torch Conv1d(k=1) over
the channel dim of (N, C, spatial) is a per-position Dense over channels in
our (N, spatial, C) layout; BatchNorm1d(C) maps to feature-axis BatchNorm.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ProjectHead(nn.Module):
    """64 -> hidden -> hidden -> out channels, L2-normalized over channels.

    Output convention mirrors the reference split: the first out_dim/2
    channels are the *shared* embedding, the rest the *specific* embedding.
    """

    hidden_dim: int = 64
    out_dim: int = 128

    @nn.compact
    def __call__(self, feat: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(N, spatial, C_in) -> (N, spatial, out_dim), unit-norm channels."""
        x = nn.Dense(self.hidden_dim, name="fc1")(feat)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden_dim, name="fc2")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, name="fc3")(x)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-12)


class FeatureTrans(nn.Module):
    """Source-shared -> target-feature translator (128 -> 64 channels)."""

    hidden: int = 128
    out_dim: int = 64
    dropout: float = 0.5

    @nn.compact
    def __call__(self, feat: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden, name="fc1")(feat)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = nn.Dense(self.hidden, name="fc2")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn2")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.out_dim, name="fc3")(x)
