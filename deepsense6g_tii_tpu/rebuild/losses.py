"""Losses of the modality-rebuild (SimMMDG-style) subsystem.

Reference: modality_rebuild/train_image_radar_lidar_rebuild.py:93-123
(ContrastiveLoss, NT-Xent over frame-grouped embeddings, temperature 0.1),
372-376 (negative-MSE distance loss) and 394-397 (translation MSE).
"""

from __future__ import annotations

import jax.numpy as jnp


def contrastive_loss(x1: jnp.ndarray, x2: jnp.ndarray, seq_len: int = 5,
                     temperature: float = 0.1) -> jnp.ndarray:
    """NT-Xent between two modalities' shared embeddings.

    x1, x2: (B*seq_len, spatial, C).  As in the reference: sum over spatial,
    regroup seq_len consecutive frames into one row, L2-normalize, and treat
    (x1_i, x2_i) as the positive pair among 2B samples.
    """
    a = x1.sum(axis=1)                       # (B*T, C)
    b = x2.sum(axis=1)
    B = a.shape[0] // seq_len
    a = a.reshape(B, -1)
    b = b.reshape(B, -1)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    reps = jnp.concatenate([a, b], axis=0)   # (2B, D)
    sim = reps @ reps.T                      # cosine (rows unit-norm)
    pos = jnp.concatenate([jnp.diagonal(sim, offset=B),
                           jnp.diagonal(sim, offset=-B)])
    numer = jnp.exp(pos / temperature)
    mask = 1.0 - jnp.eye(2 * B)
    denom = (mask * jnp.exp(sim / temperature)).sum(axis=1)
    return (-jnp.log(numer / denom)).sum() / (2 * B)


def distance_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Negative MSE — pushes modality-specific embeddings apart."""
    return -jnp.mean((a - b) ** 2)


def translation_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)
