"""Cross-modal fusion blocks over the fused token sequence.

The reference fuses 3 modalities x seq_len x 8x8 anchor tokens + 2 GPS tokens
(= 962 tokens for the 5-frame task) at four scales, either with a GPT
transformer stack (model2_seq.py:74-287) or with bi-directional Mamba blocks
(mambafuser_seq.py:74-231), plus a temporal TimeMamba head
(mambafuser_seq.py:233-284).

Token layout (identical to the reference reshape chain,
model2_seq.py:267-270): [(modality-major, time, 8x8 anchors row-major) x 3,
gps x 2] — a static shape derived from config so one jitted graph serves both
the 962- and 1922-token (30to5) variants.

Note on MambaBlock parity: the reference combines the forward-order Mamba
output with the *flipped-order* backward branch without un-flipping
(mambafuser_seq.py:100-107) — x_fused = x_bm*relu(fc2(flip(x_fc1))) +
x_fm*x_bm where x_bm is in reversed token order.  We reproduce exactly that.
"""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.flash_attention import flash_mha
from ..ops.mamba import Mamba

_DENSE_INIT = nn.initializers.normal(stddev=0.02)  # GPT _init_weights


class _LinearParams(nn.Module):
    """Declares an nn.Dense-shaped {kernel, bias} param pair WITHOUT applying
    it, so callers can concatenate several projections into one fused matmul.

    Same scope naming, shapes, and initializers as
    ``nn.Dense(features, kernel_init=_DENSE_INIT)`` — checkpoints and the
    torch import/export (models/checkpoint_import.py:85-89) see an identical
    tree, and init draws are identical (param RNG folds over the scope path).
    """

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _DENSE_INIT,
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class SelfAttention(nn.Module):
    """Unmasked multi-head self-attention (model2_seq.py:74-110).

    ``use_flash``: run the Pallas flash-attention kernel
    (ops/flash_attention.py) instead of materializing the (B, heads, T, T)
    attention matrix.  Same math; attention-prob dropout is drawn in-kernel
    from a counter-based hash PRNG instead of the flax stream, so trained
    trajectories differ from the einsum path in the same way any two dropout
    RNGs do.
    """

    n_embd: int
    n_head: int
    attn_pdrop: float
    resid_pdrop: float
    use_flash: bool = False
    flash_dropout_impl: str | None = None   # None | "hash" | "hw" (see ops)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, T, C = x.shape
        hs = C // self.n_head
        # q/k/v as ONE fused [C, 3C] matmul: the per-stage widths (64..512)
        # leave MXU lanes idle at N=C, and one dot also consolidates the
        # backward dgrad/wgrad dots 3->1.  Params stay three separate
        # {kernel, bias} pairs (reference/torch-port layout, model2_seq.py
        # 74-110); concatenation happens at apply time, so numerics per
        # output column are identical to three separate dots.
        wq, bq = _LinearParams(C, C, name="query")()
        wk, bk = _LinearParams(C, C, name="key")()
        wv, bv = _LinearParams(C, C, name="value")()
        w_qkv = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
        b_qkv = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
        qkv = x.astype(self.dtype) @ w_qkv + b_qkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.n_head, hs).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.n_head, hs).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, self.n_head, hs).transpose(0, 2, 1, 3)
        if self.use_flash:
            drop = 0.0 if deterministic else self.attn_pdrop
            rng = self.make_rng("dropout") if drop > 0.0 else None
            y = flash_mha(q, k, v, sm_scale=hs ** -0.5, dropout_p=drop,
                          rng=rng, dropout_impl=self.flash_dropout_impl)
        else:
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hs ** -0.5)
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
            att = nn.Dropout(self.attn_pdrop)(att, deterministic=deterministic)
            y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, C)
        y = nn.Dense(C, kernel_init=_DENSE_INIT, dtype=self.dtype,
                     name="proj")(y)
        return nn.Dropout(self.resid_pdrop)(y, deterministic=deterministic)


class GPTBlock(nn.Module):
    """Pre-LN attention + ReLU MLP block (model2_seq.py:113-134)."""

    n_embd: int
    n_head: int
    block_exp: int
    attn_pdrop: float
    resid_pdrop: float
    use_flash: bool = False
    flash_dropout_impl: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x + SelfAttention(self.n_embd, self.n_head, self.attn_pdrop,
                              self.resid_pdrop, use_flash=self.use_flash,
                              flash_dropout_impl=self.flash_dropout_impl,
                              dtype=self.dtype, name="attn")(
            nn.LayerNorm(name="ln1")(x), deterministic)
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(self.block_exp * self.n_embd, kernel_init=_DENSE_INIT,
                     dtype=self.dtype, name="mlp_fc")(h)
        h = nn.relu(h)
        h = nn.Dense(self.n_embd, kernel_init=_DENSE_INIT, dtype=self.dtype,
                     name="mlp_proj")(h)
        h = nn.Dropout(self.resid_pdrop)(h, deterministic=deterministic)
        return x + h


class _PrefixLayerNorm2D(nn.Module):
    """LayerNorm over the (n_real, C) trailing shape of a padded
    (B, T_pad, C) stream: statistics and affine come from the REAL token
    prefix only, exactly matching
    ``nn.LayerNorm(reduction_axes=(-2, -1), feature_axes=(-2, -1))`` applied
    to the unpadded (B, n_real, C) input (same fast-variance formula, f32
    stats, epsilon, and multiply order).  Pad rows are normalized with the
    real stats and get identity affine — bounded values, never read back by
    a real position.  Param tree is identical to nn.LayerNorm's
    ({scale, bias} of shape (n_real, C)) for checkpoint parity.
    """

    n_real: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (self.n_real, C))
        bias = self.param("bias", nn.initializers.zeros, (self.n_real, C))
        xf = x[:, :self.n_real].astype(jnp.float32)
        mean = jnp.mean(xf, axis=(-2, -1), keepdims=True)
        mean2 = jnp.mean(xf * xf, axis=(-2, -1), keepdims=True)
        var = jnp.maximum(0.0, mean2 - mean * mean)
        pad = x.shape[1] - self.n_real
        mul = jax.lax.rsqrt(var + self.epsilon) * jnp.pad(
            scale, ((0, pad), (0, 0)), constant_values=1.0)
        return (x.astype(jnp.float32) - mean) * mul + jnp.pad(
            bias, ((0, pad), (0, 0)))


class MambaBlock(nn.Module):
    """Bi-branch Mamba block (mambafuser_seq.py:74-109).

    LayerNorm is over the full (n_tokens, C) trailing shape with a
    per-(token, channel) affine — torch nn.LayerNorm(ln_size) parity.

    ``n_real``: when set (< the stream length), the input carries
    ``x.shape[1] - n_real`` trailing pad tokens (config.padded_token_stream):
    LN statistics come from the real prefix and the backward branch reverses
    ONLY the real prefix (pads stay trailing), so both direction scans are
    causal-exact for real positions with no per-scan pad/slice.
    """

    n_embd: int
    n_tokens: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    use_pallas: bool = True
    n_real: int | None = None
    # Run the backward branch as a REVERSE-direction Mamba over the
    # natural-order stream (anticausal conv + reversed-grid scan kernel,
    # ops/mamba.py::Mamba(reverse=True)) instead of materializing
    # jnp.flip(x_fc1) before in_proj/fc2.  The combine then flips the two
    # branch OUTPUTS — elementwise-fusible reverses XLA folds into the
    # combine, where the input flip feeds matmuls and must materialize.
    # Same parameter tree and math (conv-window reduction order aside).
    # Dense streams only: with a padded stream (n_real set) the trailing
    # pads would be scanned FIRST by the reverse scan and their garbage
    # would reach real tokens, so the flip path is kept there.
    reverse_kernel: bool = False
    conv1d_impl: str = "conv"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        padded = self.n_real is not None and self.n_real < x.shape[1]
        if padded:
            x_ln = _PrefixLayerNorm2D(self.n_real, name="ln1")(x)
        else:
            x_ln = nn.LayerNorm(reduction_axes=(-2, -1),
                                feature_axes=(-2, -1), name="ln1")(x)
        x_fc1 = nn.Dense(self.n_embd, kernel_init=_DENSE_INIT,
                         dtype=self.dtype, name="fc1")(x_ln)
        # init_style="gpt2": the reference MambaFusion/GPT applies
        # _init_weights over the whole block stack, clobbering every inner
        # Linear of these Mambas with N(0, 0.02) / zero bias
        # (mambafuser_seq.py:138,143-147) — TimeMamba's Mamba is NOT under
        # that apply and keeps mamba_ssm inits
        mamba = lambda name, rev=False: Mamba(
            d_model=self.n_embd, d_state=self.d_state, d_conv=self.d_conv,
            expand=self.expand, use_pallas=self.use_pallas, reverse=rev,
            conv1d_impl=self.conv1d_impl,
            compute_dtype=self.dtype, init_style="gpt2", name=name)
        # NOTE: merging the two direction scans into one grouped-A pallas
        # launch (ops/mamba.py bidirectional_scan) measured SLOWER e2e on
        # v5e (51.1 vs 52.3 samples/s/chip, B=8 K=8): the batch-axis
        # concats of u/dt/B/C cost more HBM traffic than the halved kernel
        # launches save.  Two separate calls stay the default.
        x_fm = mamba("forward_mamba")(x_fc1)
        if self.reverse_kernel and not padded:
            # reverse-direction branch over the natural-order stream; the
            # whole-stream input flip becomes two OUTPUT flips that fuse
            # into the combine (see field docstring).  Identical params.
            y_bm = mamba("backward_mamba", rev=True)(x_fc1)
            y_fc2 = nn.Dense(self.n_embd, kernel_init=_DENSE_INIT,
                             dtype=self.dtype, name="fc2")(x_fc1)
            y_relu = nn.leaky_relu(y_fc2, negative_slope=0.2)
            x_bm = jnp.flip(y_bm, axis=1)
            x_relu = jnp.flip(y_relu, axis=1)
            return x_bm * x_relu + x_fm * x_bm
        if padded:
            # reverse the real prefix, keep pads TRAILING: position i holds
            # token t_{n_real-1-i} exactly as the dense flip, and no pad
            # precedes a real token in either causal branch
            x_flip = jnp.concatenate(
                [jnp.flip(x_fc1[:, :self.n_real], axis=1),
                 x_fc1[:, self.n_real:]], axis=1)
        else:
            x_flip = jnp.flip(x_fc1, axis=1)
        x_bm = mamba("backward_mamba")(x_flip)
        x_fc2 = nn.Dense(self.n_embd, kernel_init=_DENSE_INIT,
                         dtype=self.dtype, name="fc2")(x_flip)
        x_relu = nn.leaky_relu(x_fc2, negative_slope=0.2)
        # parity: x_bm / x_relu stay in flipped order (see module docstring)
        return x_bm * x_relu + x_fm * x_bm


class TokenFusion(nn.Module):
    """Shared shell for GPT/Mamba fusion at one scale.

    Tokenizes the three (B, T_frames, 8, 8, C) anchor maps + (B, 2, C) GPS,
    adds a learnable positional embedding, runs ``n_layer`` fusion blocks,
    and splits back (model2_seq.py:248-287; mambafuser_seq.py:183-231).

    ``channel_swap`` rotates channel thirds between modalities before
    tokenization — the "cs-bimamba" variant (mambafuser_seq.py:200-205).
    """

    n_embd: int
    n_layer: int
    seq_len: int
    n_views: int
    anchors: int            # vert*horz
    gps_tokens: int
    embd_pdrop: float
    fusion_type: str = "mamba"       # "gpt" | "mamba"
    channel_swap: bool = True
    # gpt params
    n_head: int = 4
    block_exp: int = 4
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    use_flash: bool = False
    flash_dropout_impl: str | None = None
    # mamba params
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    use_pallas: bool = True
    # carry the stream padded to the next 128-multiple through the mamba
    # blocks (config.padded_token_stream) — no per-scan pad/slice; exact
    padded_stream: bool = False
    # reverse-direction backward branch (MambaBlock.reverse_kernel)
    reverse_scan_kernel: bool = False
    conv1d_impl: str = "conv"
    dtype: jnp.dtype = jnp.float32

    @property
    def n_tokens(self) -> int:
        return (self.n_views + 2) * self.seq_len * self.anchors + self.gps_tokens

    @nn.compact
    def __call__(self, image, lidar, radar, gps, deterministic: bool = True):
        """image: (B, n_views*T, vh, hz, C); lidar/radar: (B, T, vh, hz, C);
        gps: (B, gps_tokens, C)."""
        B, Ti, vh, hz, C = image.shape     # Ti = n_views * T
        T = lidar.shape[1]                 # true seq_len (image may be wider)

        if self.channel_swap and self.fusion_type == "mamba":
            if Ti != T:
                raise ValueError(
                    "channel_swap rotates channel thirds across same-shape "
                    f"modality tracks; image has {Ti} frames vs {T} — "
                    "cs-bimamba requires n_views=1 (mambafuser_seq.py:200-205)")
            s1, s2 = C // 3, C // 3 * 2
            cs_image = jnp.concatenate(
                [image[..., :s1], lidar[..., s1:s2], radar[..., s2:]], axis=-1)
            cs_lidar = jnp.concatenate(
                [lidar[..., :s1], radar[..., s1:s2], image[..., s2:]], axis=-1)
            cs_radar = jnp.concatenate(
                [radar[..., :s1], image[..., s1:s2], lidar[..., s2:]], axis=-1)
            image, lidar, radar = cs_image, cs_lidar, cs_radar

        tokens = jnp.concatenate([image, lidar, radar], axis=1)   # (B, 3T, vh, hz, C)
        tokens = tokens.reshape(B, -1, C)
        tokens = jnp.concatenate([tokens, gps.astype(tokens.dtype)], axis=1)

        pos_emb = self.param("pos_emb", nn.initializers.zeros,
                             (1, self.n_tokens, self.n_embd))
        x = tokens + pos_emb.astype(tokens.dtype)
        x = nn.Dropout(self.embd_pdrop)(x, deterministic=deterministic)

        # pad ONCE here (after pos_emb: param shapes stay (n_tokens, C))
        # instead of around each of the 2*n_layer selective-scan calls;
        # mamba path only — see config.padded_token_stream
        n_real = None
        if self.padded_stream and self.fusion_type == "mamba":
            t_pad = -self.n_tokens % 128
            if t_pad:
                n_real = self.n_tokens
                x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0)))

        if self.fusion_type == "gpt":
            for i in range(self.n_layer):
                x = GPTBlock(self.n_embd, self.n_head, self.block_exp,
                             self.attn_pdrop, self.resid_pdrop,
                             use_flash=self.use_flash,
                             flash_dropout_impl=self.flash_dropout_impl,
                             dtype=self.dtype,
                             name=f"block{i}")(
                    x, deterministic)
        elif self.fusion_type == "mamba":
            for i in range(self.n_layer):
                x = MambaBlock(self.n_embd, self.n_tokens, self.d_state,
                               self.d_conv, self.expand,
                               use_pallas=self.use_pallas, n_real=n_real,
                               reverse_kernel=self.reverse_scan_kernel,
                               conv1d_impl=self.conv1d_impl,
                               dtype=self.dtype,
                               name=f"block{i}")(x)
        else:
            raise ValueError(f"unknown fusion_type {self.fusion_type!r}")

        if n_real is not None:
            x = x[:, :n_real]     # drop pads; ln_f is per-token, so exact
        x = nn.LayerNorm(name="ln_f")(x)

        n_map = (Ti + 2 * T) * self.anchors
        gps_out = x[:, n_map:, :]
        maps = x[:, :n_map, :].reshape(B, Ti + 2 * T, vh, hz, C)
        img_out = maps[:, :Ti]
        lidar_out = maps[:, Ti: Ti + T]
        radar_out = maps[:, Ti + T:]
        return img_out, lidar_out, radar_out, gps_out


class TimeMamba(nn.Module):
    """Temporal fusion head (mambafuser_seq.py:233-284).

    One shared Mamba over each modality's (B, T, 512) track; per-modality
    attention over time from (maxpool+avgpool over channels) -> MLP+softmax;
    weighted-sum to one token each; concat + sum -> (B, 512).
    """

    d_model: int = 512
    seq_len: int = 5
    gps_tokens: int = 2
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    conv1d_impl: str = "conv"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, lidar, radar, gps):
        # No use_pallas knob here on purpose: the temporal scan is L=seq_len
        # (5) long, and the kernel's BL=128 chunk would pad 5 -> 128 (25x
        # wasted VPU work) — the associative_scan reference path is always
        # the right choice at this length.
        mamba = Mamba(d_model=self.d_model, d_state=self.d_state,
                      d_conv=self.d_conv, expand=self.expand,
                      use_pallas=False, conv1d_impl=self.conv1d_impl,
                      compute_dtype=self.dtype, name="mamba")
        mlp = nn.Dense(self.seq_len, name="mlp")
        mlp_gps = nn.Dense(self.gps_tokens, name="mlp_gps")

        def pool_attend(feats, dense):
            att = feats.max(axis=-1) + feats.mean(axis=-1)       # (B, T)
            att = jax.nn.softmax(dense(att), axis=-1)            # (B, T)
            return (feats * att[..., None]).sum(axis=1)          # (B, C)

        outs = []
        for feats in (image, lidar, radar):
            outs.append(pool_attend(mamba(feats), mlp))
        outs.append(pool_attend(gps, mlp_gps))
        return sum(outs)                                          # (B, C)
