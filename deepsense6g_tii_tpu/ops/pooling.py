"""Pooling primitives (NHWC).

- ``adaptive_avg_pool``: torch AdaptiveAvgPool2d for divisible sizes — the
  8x8 anchor pooling (mambafuser_seq.py:296) and the final global pool
  (mambafuser_seq.py:527-535).  A reshape-mean, which XLA fuses.
- ``max_pool_3x3s2``: the ResNet stem max-pool (kernel 3, stride 2, pad 1).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    n, h, w, c = x.shape
    if h % out_h or w % out_w:
        raise ValueError(f"adaptive_avg_pool requires divisible sizes, "
                         f"got {(h, w)} -> {(out_h, out_w)}")
    kh, kw = h // out_h, w // out_w
    x = x.reshape(n, out_h, kh, out_w, kw, c)
    return x.mean(axis=(2, 4))


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> NC."""
    return x.mean(axis=(1, 2))


def max_pool_3x3s2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))
