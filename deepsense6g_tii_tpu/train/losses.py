"""Classification losses for beam prediction.

Sigmoid focal loss matching torchvision.ops.sigmoid_focal_loss
(alpha=0.25, gamma=2, reduction='mean'; used via FocalLoss at
/root/reference/train2_seq.py:291-301) and the cross-entropy alternative
(train2_seq.py:89-92).  Pure jnp — lives inside the jitted train step, where
XLA fuses it into the final matmul's epilogue.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _weighted_mean(per_sample: jnp.ndarray,
                   sample_weight: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over the leading sample axis, optionally weighted (0-weight rows
    are padding and contribute nothing to the value or the gradient)."""
    if sample_weight is None:
        return per_sample.mean()
    w = sample_weight.astype(per_sample.dtype)
    return (per_sample * w).sum() / jnp.maximum(w.sum(), 1.0)


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       alpha: float = 0.25, gamma: float = 2.0,
                       sample_weight: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """Mean sigmoid focal loss over all (sample, class) entries.

    logits, targets: (..., num_classes); targets may be soft (Gaussian beams).
    ``sample_weight`` (leading-dim,) masks padded rows out of the mean.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    # numerically-stable BCE with logits
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return _weighted_mean(loss.mean(axis=-1), sample_weight)


def focal_loss(logits: jnp.ndarray, target: jnp.ndarray,
               num_classes: int = 64, alpha: float = 0.25,
               gamma: float = 2.0,
               sample_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """FocalLoss semantics (train2_seq.py:296-301): integer targets are
    one-hotted; soft (..., C) targets are used as-is."""
    if target.ndim == logits.ndim - 1:
        target = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    return sigmoid_focal_loss(logits, target, alpha=alpha, gamma=gamma,
                              sample_weight=sample_weight)


def cross_entropy_loss(logits: jnp.ndarray, target: jnp.ndarray,
                       sample_weight: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss(reduction='mean'): integer or soft targets."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if target.ndim == logits.ndim - 1:
        nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                                   axis=-1)[..., 0]
        return _weighted_mean(nll, sample_weight)
    # soft targets: torch computes -sum(target * logp) per sample, mean over batch
    return _weighted_mean(
        (-(target.astype(jnp.float32) * logp)).sum(axis=-1), sample_weight)
