"""Bilinear upsampling matching torch.nn.functional.interpolate(
mode='bilinear', align_corners=False), used for the fusion-output
re-broadcast (mambafuser_seq.py:465-467,484-486,504-506).

Implemented as an explicit separable gather/linear-combination so the
semantics (half-pixel centers, edge clamping) are pinned independently of
jax.image internals; for integer scale factors the weights are static and XLA
turns the whole thing into two small matmuls that fuse with the surrounding
ops.  Layout NHWC.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) sparse interpolation matrix, half-pixel centers, clamped."""
    x = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    x0 = np.floor(x).astype(np.int64)
    w1 = x - x0
    x0c = np.clip(x0, 0, src - 1)
    x1c = np.clip(x0 + 1, 0, src - 1)
    m = np.zeros((dst, src), dtype=np.float32)
    m[np.arange(dst), x0c] += 1.0 - w1
    m[np.arange(dst), x1c] += w1
    return m


def interpolate_bilinear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC -> NH'W'C with H' = H*scale (align_corners=False)."""
    if scale == 1:
        return x
    n, h, w, c = x.shape
    mh = jnp.asarray(_interp_matrix(h, h * scale), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix(w, w * scale), dtype=x.dtype)
    x = jnp.einsum("Hh,nhwc->nHwc", mh, x)
    x = jnp.einsum("Ww,nhwc->nhWc", mw, x)
    return x
