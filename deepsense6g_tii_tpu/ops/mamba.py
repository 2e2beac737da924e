"""The full Mamba layer (projections + causal conv + selective scan + gate).

Equivalent of ``mamba_ssm.Mamba(d_model, d_state=16, d_conv=4, expand=2)`` as
used by the reference (mambafuser_seq.py:83-90,240; model2_seq.py:146-153):

    x, z = split(in_proj(h))                  # (B, L, 2*d_inner)
    x = silu(causal_depthwise_conv1d(x))
    dt, B, C = split(x_proj(x))               # dt_rank + 2*d_state
    dt = softplus(dt_proj(dt) + dt_bias)
    y = selective_scan(x, dt, A=-exp(A_log), B, C) + D * x
    out = out_proj(y * silu(z))

TPU mapping: all projections are MXU matmuls (bf16-friendly), the conv is a
tiny depthwise conv XLA fuses, and the scan is the Pallas kernel from
``selective_scan.py`` (reference associative scan on non-TPU backends).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .selective_scan import selective_scan, selective_scan_ref


def _dt_proj_bias_init(dt_min=0.001, dt_max=0.1, dt_init_floor=1e-4):
    """mamba_ssm dt bias init: softplus^-1 of log-uniform[dt_min, dt_max]."""
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.maximum(dt, dt_init_floor)
        # inverse softplus
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)
    return init


def _a_log_init(d_state):
    def init(key, shape, dtype=jnp.float32):
        d_inner = shape[0]
        a = jnp.tile(jnp.arange(1, d_state + 1, dtype=jnp.float32)[None],
                     (d_inner, 1))
        return jnp.log(a).astype(dtype)
    return init


class Mamba(nn.Module):
    """Selective-state-space sequence layer over (B, L, d_model)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None        # default ceil(d_model / 16)
    use_pallas: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @property
    def _d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def _dt_rank(self) -> int:
        return self.dt_rank or math.ceil(self.d_model / 16)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, L, _ = x.shape
        d_inner = self._d_inner
        dt_rank = self._dt_rank
        cdt = self.compute_dtype

        xz = nn.Dense(2 * d_inner, use_bias=False, name="in_proj",
                      dtype=cdt)(x.astype(cdt))
        xs, z = jnp.split(xz, 2, axis=-1)

        # causal depthwise conv over time: (B, L, d_inner), left-pad d_conv-1
        conv_w = self.param(
            "conv1d_weight",
            nn.initializers.lecun_normal(),
            (self.d_conv, 1, d_inner))          # (width, in/groups=1, features)
        conv_b = self.param("conv1d_bias", nn.initializers.zeros, (d_inner,))
        xs = jax.lax.conv_general_dilated(
            xs.astype(cdt), conv_w.astype(cdt),
            window_strides=(1,),
            padding=[(self.d_conv - 1, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=d_inner,
        ) + conv_b.astype(cdt)
        xs = jax.nn.silu(xs)

        x_dbl = nn.Dense(dt_rank + 2 * self.d_state, use_bias=False,
                         name="x_proj", dtype=cdt)(xs)
        dt, B, C = jnp.split(x_dbl, [dt_rank, dt_rank + self.d_state], axis=-1)

        def _dt_w_init(key, shape, dtype=jnp.float32):
            std = dt_rank**-0.5
            return jax.random.uniform(key, shape, dtype, -std, std)

        dt_w = self.param("dt_proj_weight", _dt_w_init, (dt_rank, d_inner))
        dt_b = self.param("dt_proj_bias", _dt_proj_bias_init(), (d_inner,))
        dt = jax.nn.softplus(
            dt.astype(jnp.float32) @ dt_w.astype(jnp.float32) + dt_b)

        A_log = self.param("A_log", _a_log_init(self.d_state),
                           (d_inner, self.d_state))
        D = self.param("D", nn.initializers.ones, (d_inner,))
        A = -jnp.exp(A_log.astype(jnp.float32))

        if self.use_pallas and xs.shape[-1] % 128 == 0 and \
                jax.default_backend() == "tpu":
            y = selective_scan(xs, dt, A, B, C)
        else:
            y = selective_scan_ref(xs, dt, A, B, C)
        y = y + D.astype(jnp.float32) * xs.astype(jnp.float32)
        y = y * jax.nn.silu(z.astype(jnp.float32))

        return nn.Dense(self.d_model, use_bias=False, name="out_proj",
                        dtype=cdt)(y.astype(cdt)).astype(x.dtype)
