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

The layer is split into ``pre_scan`` (everything up to the scan) and
``post_scan`` (D skip + gate + out_proj) so a bi-directional MambaBlock can
stack both of its direction branches on the batch axis and run ONE grouped
selective-scan kernel launch for the pair (:func:`bidirectional_scan`),
halving the per-step pallas call count.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

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


def causal_depthwise_conv1d(x: jnp.ndarray, w: jnp.ndarray,
                            bias: jnp.ndarray, reverse: bool = False,
                            impl: str = "conv") -> jnp.ndarray:
    """Depthwise width-K causal conv over time, two selectable lowerings.

    The mamba_ssm layer's conv (d_conv=4, groups=d_inner) is
    ``y[b,t,c] = bias[c] + sum_j w[j,c] * x[b, t-(K-1)+j, c]``.
    ``impl="conv"`` (default) is XLA's ``feature_group_count=d_inner``
    grouped-conv lowering; ``impl="shift"`` computes the same j-ordered sum
    as K shifted elementwise FMAs.  MEASURED DEAD END (r5): "shift" is
    -1.6% e2e on the mamba bench (52.82 vs 53.69 samples/s/chip, same-
    session A/B) — the grouped-conv backward's weight-grad beats the shift
    form's per-tap reduction chain on v5e.  Kept as a tested A/B knob
    (config.conv1d_impl / DEEPSENSE_BENCH_CONV1D).

    ``reverse=True`` computes the anticausal mirror
    ``y[b,t,c] = bias[c] + sum_j w[j,c] * x[b, t+(K-1)-j, c]`` — the same
    j-ordered sum flip(causal(flip(x))) produces, so the bi-directional
    flip-equivalence (``Mamba(reverse=True)(x) == flip(Mamba(flip(x)))``)
    is bit-exact.

    Shapes: x (B, L, d), w (K, 1, d) [the flax conv1d layout], bias (d,).
    """
    K = w.shape[0]
    L = x.shape[1]
    wj = w.reshape(K, -1).astype(x.dtype)          # (K, d)
    if impl == "conv":
        wc, pad_lr = w, (K - 1, 0)
        if reverse:
            wc, pad_lr = jnp.flip(w, axis=0), (0, K - 1)
        return jax.lax.conv_general_dilated(
            x, wc.astype(x.dtype), window_strides=(1,), padding=[pad_lr],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=x.shape[-1]) + bias.astype(x.dtype)
    if impl != "shift":
        raise ValueError(f"unknown conv1d impl {impl!r}")
    acc = None
    for j in range(K):
        s = K - 1 - j                               # shift magnitude
        if s >= L:
            continue        # this tap only ever sees the zero padding
        if s == 0:
            term = x * wj[j]
        elif not reverse:
            term = jnp.pad(x[:, :L - s], ((0, 0), (s, 0), (0, 0))) * wj[j]
        else:
            term = jnp.pad(x[:, s:], ((0, 0), (0, s), (0, 0))) * wj[j]
        acc = term if acc is None else acc + term
    if acc is None:                                 # degenerate L < 1 tap
        acc = jnp.zeros_like(x)
    return acc + bias.astype(x.dtype)


class ScanInputs(NamedTuple):
    """Everything :func:`Mamba.post_scan` / the scan itself needs."""

    xs: jnp.ndarray       # (B, L, d_inner) conv+silu activations
    dt: jnp.ndarray       # (B, L, d_inner) f32 softplus'd step sizes
    B: jnp.ndarray        # (B, L, d_state)
    C: jnp.ndarray        # (B, L, d_state)
    z: jnp.ndarray        # (B, L, d_inner) gate branch
    A: jnp.ndarray        # (d_inner, d_state) f32, -exp(A_log)


class Mamba(nn.Module):
    """Selective-state-space sequence layer over (B, L, d_model)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None        # default ceil(d_model / 16)
    use_pallas: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    # "mamba_ssm": the library's own inits (dt bias = softplus^-1 of
    #   log-uniform, scaled-uniform dt kernel, lecun projections) — what the
    #   reference's TimeMamba gets (mambafuser_seq.py:240).
    # "gpt2": the reference's MambaFusion/GPT ``_init_weights`` recurses into
    #   every nn.Linear of its fusion-block Mambas and clobbers them with
    #   N(0, 0.02) weights and ZERO biases — including dt_proj, so fusion
    #   blocks start at dt = softplus(~0) ~= 0.69
    #   (mambafuser_seq.py:138,143-147; model2_seq.py:190,195-201).
    init_style: str = "mamba_ssm"
    # Right-to-left layer over NATURAL-order input: anticausal conv
    # (width-flipped weights, right padding) + reverse selective scan.
    # Mamba(reverse=True)(x) == flip(Mamba(flip(x))) with the same
    # parameters (up to conv-window float reduction order) and ZERO
    # materialized flips of the (B, L, d) stream — the bi-directional
    # MambaBlock's backward branch (models/fusion.py:216-231) uses it to
    # drop its whole-stream jnp.flip before in_proj.
    reverse: bool = False
    # "conv" (default): XLA's grouped-conv lowering; "shift": d_conv
    # shifted elementwise FMAs — measured r5 dead end, -1.6% e2e (see
    # causal_depthwise_conv1d).
    conv1d_impl: str = "conv"

    @property
    def _d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def _dt_rank(self) -> int:
        return self.dt_rank or math.ceil(self.d_model / 16)

    def setup(self):
        if self.init_style not in ("mamba_ssm", "gpt2"):
            raise ValueError(f"unknown init_style {self.init_style!r}")
        gpt2 = self.init_style == "gpt2"
        d_inner = self._d_inner
        cdt = self.compute_dtype
        dense_init = (nn.initializers.normal(stddev=0.02) if gpt2
                      else nn.initializers.lecun_normal())
        # submodule names come from the attribute names (flax setup rule)
        # and must stay "in_proj"/"x_proj"/"out_proj" for checkpoint parity.
        self.in_proj = nn.Dense(2 * d_inner, use_bias=False, dtype=cdt,
                                kernel_init=dense_init)
        self.x_proj = nn.Dense(self._dt_rank + 2 * self.d_state,
                               use_bias=False, dtype=cdt,
                               kernel_init=dense_init)
        self.out_proj = nn.Dense(self.d_model, use_bias=False, dtype=cdt,
                                 kernel_init=dense_init)
        self.conv1d_weight = self.param(
            "conv1d_weight", nn.initializers.lecun_normal(),
            (self.d_conv, 1, d_inner))          # (width, in/groups=1, features)
        self.conv1d_bias = self.param("conv1d_bias", nn.initializers.zeros,
                                      (d_inner,))
        self.dt_proj_weight = self.param(
            "dt_proj_weight",
            (nn.initializers.normal(stddev=0.02) if gpt2 else
             lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                 key, shape, dtype, -self._dt_rank**-0.5,
                 self._dt_rank**-0.5)),
            (self._dt_rank, self._d_inner))
        self.dt_proj_bias = self.param(
            "dt_proj_bias",
            nn.initializers.zeros if gpt2 else _dt_proj_bias_init(),
            (d_inner,))
        self.A_log = self.param("A_log", _a_log_init(self.d_state),
                                (d_inner, self.d_state))
        self.D = self.param("D", nn.initializers.ones, (d_inner,))

    def kernel_eligible(self) -> bool:
        """True when __call__ would take the Pallas kernel path."""
        return (self.use_pallas and self._d_inner % 128 == 0
                and jax.default_backend() == "tpu")

    def pre_scan(self, x: jnp.ndarray) -> ScanInputs:
        """Projections + causal conv: everything up to the selective scan."""
        cdt = self.compute_dtype
        dt_rank = self._dt_rank

        xz = self.in_proj(x.astype(cdt))
        xs, z = jnp.split(xz, 2, axis=-1)

        # causal depthwise conv over time: (B, L, d_inner), left-pad d_conv-1.
        # reverse mode: anticausal — conv(flip(x), w)[t] at flipped position
        # L-1-t equals correlation of x with the width-flipped kernel over
        # [t, t+d_conv-1], i.e. flipped weights + right padding.
        xs = causal_depthwise_conv1d(
            xs.astype(cdt), self.conv1d_weight, self.conv1d_bias,
            reverse=self.reverse, impl=self.conv1d_impl)
        xs = jax.nn.silu(xs)

        x_dbl = self.x_proj(xs)
        dt, B, C = jnp.split(x_dbl, [dt_rank, dt_rank + self.d_state],
                             axis=-1)
        dt = jax.nn.softplus(
            dt.astype(jnp.float32) @ self.dt_proj_weight.astype(jnp.float32)
            + self.dt_proj_bias)
        A = -jnp.exp(self.A_log.astype(jnp.float32))
        return ScanInputs(xs=xs, dt=dt, B=B, C=C, z=z, A=A)

    def post_scan(self, y: jnp.ndarray, pre: ScanInputs) -> jnp.ndarray:
        """D skip + silu(z) gate + out_proj (y is the f32 scan output)."""
        y = y + self.D.astype(jnp.float32) * pre.xs.astype(jnp.float32)
        y = y * jax.nn.silu(pre.z.astype(jnp.float32))
        return self.out_proj(y.astype(self.compute_dtype))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pre = self.pre_scan(x)
        if self.kernel_eligible():
            y = selective_scan(pre.xs, pre.dt, pre.A, pre.B, pre.C,
                               reverse=self.reverse)
        else:
            y = selective_scan_ref(pre.xs, pre.dt, pre.A, pre.B, pre.C,
                                   reverse=self.reverse)
        return self.post_scan(y, pre).astype(x.dtype)


def bidirectional_scan(pre_f: ScanInputs, pre_b: ScanInputs,
                       use_kernel: bool, interpret: bool = False):
    """Run two direction branches' selective scans in ONE kernel launch.

    Stacks the branches on the batch axis and passes their (different) A
    params as a (2, d, n) group to the grouped-A kernel
    (selective_scan.py).  Returns (y_forward, y_backward), each f32
    (B, L, d_inner).  With ``use_kernel=False`` falls back to two
    associative-scan reference calls (non-TPU backends) — batch-stacking
    the O(L log L) reference buys nothing and the grouped form needs the
    Pallas layout anyway.
    """
    if not use_kernel:
        return (selective_scan_ref(pre_f.xs, pre_f.dt, pre_f.A, pre_f.B,
                                   pre_f.C),
                selective_scan_ref(pre_b.xs, pre_b.dt, pre_b.A, pre_b.B,
                                   pre_b.C))
    b = pre_f.xs.shape[0]
    u2 = jnp.concatenate([pre_f.xs, pre_b.xs], axis=0)
    dt2 = jnp.concatenate([pre_f.dt, pre_b.dt], axis=0)
    B2 = jnp.concatenate([pre_f.B, pre_b.B], axis=0)
    C2 = jnp.concatenate([pre_f.C, pre_b.C], axis=0)
    A2 = jnp.stack([pre_f.A, pre_b.A])
    y2 = selective_scan(u2, dt2, A2, B2, C2, interpret=interpret)
    return y2[:b], y2[b:]
