"""1024-padded token stream (config.padded_token_stream, mamba path).

The stream is padded once to the next 128-multiple and carried through all
fusion blocks (no per-scan pad/slice).  Exactness contract: every real-token
output — and every parameter gradient — is IDENTICAL to the dense path,
because pads always trail both causal direction branches (the backward
branch flips only the real prefix) and the (tokens, C) LayerNorm takes its
statistics from the real prefix (fusion.py::_PrefixLayerNorm2D).

Perf capability target: the reference's mamba_ssm CUDA scan path
(mambafuser_seq.py:83-90) — this is purely a TPU pad-traffic optimization.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.models.encoder import FusionEncoder
from deepsense6g_tii_tpu.models.fusion import MambaBlock, _PrefixLayerNorm2D

BLOCKS = (1, 1, 1, 1)


class TestPrefixLayerNorm:
    def test_matches_dense_layernorm_on_prefix(self, rng):
        B, n_real, t_pad, C = 3, 26, 128, 8
        x = jnp.asarray(rng.normal(size=(B, t_pad, C)), jnp.float32)

        dense = nn.LayerNorm(reduction_axes=(-2, -1), feature_axes=(-2, -1))
        pref = _PrefixLayerNorm2D(n_real)
        vd = dense.init(jax.random.PRNGKey(0), x[:, :n_real])
        # non-trivial affine so the padded-identity-affine path is exercised
        vd = jax.tree_util.tree_map(
            lambda t: jnp.asarray(rng.normal(size=t.shape), t.dtype), vd)
        y_dense = dense.apply(vd, x[:, :n_real])
        y_pref = pref.apply(vd, x)
        np.testing.assert_allclose(np.asarray(y_pref[:, :n_real]),
                                   np.asarray(y_dense), rtol=1e-6, atol=1e-6)
        assert np.isfinite(np.asarray(y_pref)).all()

    def test_param_tree_matches_layernorm(self):
        x = jnp.zeros((1, 40, 4))
        vd = nn.LayerNorm(reduction_axes=(-2, -1),
                          feature_axes=(-2, -1)).init(jax.random.PRNGKey(0),
                                                      x[:, :26])
        vp = _PrefixLayerNorm2D(26).init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(vd) == \
            jax.tree_util.tree_structure(vp)
        for a, b in zip(jax.tree_util.tree_leaves(vd),
                        jax.tree_util.tree_leaves(vp)):
            assert a.shape == b.shape and a.dtype == b.dtype


class TestPaddedMambaBlock:
    def test_real_outputs_independent_of_pad_values(self, rng):
        """Pad rows are filled with GARBAGE: real-position outputs must still
        equal the dense block bit-for-bit modulo float noise — proves no pad
        ever leaks into a real position through LN, conv, or either scan."""
        B, n_real, t_pad, C = 2, 26, 128, 16
        x_real = jnp.asarray(rng.normal(size=(B, n_real, C)), jnp.float32)
        garbage = jnp.asarray(10.0 * rng.normal(size=(B, t_pad - n_real, C)),
                              jnp.float32)
        x_pad = jnp.concatenate([x_real, garbage], axis=1)

        dense = MambaBlock(n_embd=C, n_tokens=n_real, use_pallas=False)
        padded = MambaBlock(n_embd=C, n_tokens=n_real, use_pallas=False,
                            n_real=n_real)
        v = dense.init(jax.random.PRNGKey(0), x_real)
        y_dense = dense.apply(v, x_real)
        y_pad = padded.apply(v, x_pad)
        np.testing.assert_allclose(np.asarray(y_pad[:, :n_real]),
                                   np.asarray(y_dense), rtol=2e-5, atol=1e-5)
        assert np.isfinite(np.asarray(y_pad)).all()


class TestPaddedEncoder:
    def _setup(self, rng):
        base = dict(seq_len=2, input_resolution=64, vert_anchors=2,
                    horz_anchors=2, n_layer=1, backbone_blocks=BLOCKS,
                    FFM=1, TFM=1, use_pallas_scan=False,
                    compute_dtype="float32")
        cfg_dense = GlobalConfig(**base)
        cfg_pad = GlobalConfig(padded_token_stream=True, **base)
        B, T, H = 2, 2, 64
        batch = (
            jnp.asarray(rng.uniform(0, 255, (B, T, H, H, 3)), jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (B, T, H, H, 1)), jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (B, T, H, H, 2)), jnp.float32),
            jnp.asarray(rng.normal(size=(B, 2, 2)), jnp.float32),
        )
        return cfg_dense, cfg_pad, batch

    def test_forward_and_grads_equal_dense(self, rng):
        cfg_dense, cfg_pad, batch = self._setup(rng)
        enc_d = FusionEncoder(cfg_dense)
        enc_p = FusionEncoder(cfg_pad)
        v = enc_d.init(jax.random.PRNGKey(0), *batch)
        # identical param trees: padded-stream is a pure compute-layout knob
        vp = enc_p.init(jax.random.PRNGKey(0), *batch)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(vp))

        y_d = enc_d.apply(v, *batch)
        y_p = enc_p.apply(v, *batch)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_d),
                                   rtol=2e-5, atol=1e-5)

        def loss(params, enc):
            y, mut = enc.apply({**v, "params": params}, *batch, train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(7)})
            return (y * y).mean()

        g_d = jax.grad(loss)(v["params"], enc_d)
        g_p = jax.grad(loss)(v["params"], enc_p)
        for (kd, a), (kp, b) in zip(
                jax.tree_util.tree_leaves_with_path(g_d),
                jax.tree_util.tree_leaves_with_path(g_p)):
            assert kd == kp
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=5e-4, atol=2e-5,
                err_msg=jax.tree_util.keystr(kd))
