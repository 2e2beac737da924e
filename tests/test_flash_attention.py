"""Flash-attention kernel tests (interpret mode on CPU).

Oracle: the plain materialized softmax-attention expression — the same math
the einsum path of models/fusion.py::SelfAttention computes
(/root/reference/model2_seq.py:94-103).  Dropout is pinned exactly via
ops/flash_attention.py::dropout_scale_reference, the jnp replica of the
in-kernel counter-based hash mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsense6g_tii_tpu.ops.flash_attention import (
    derive_seed, dropout_scale_reference, flash_mha)


def _ref_mha(q, k, v, sm_scale, scale_mask=None):
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm_scale
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1)
    if scale_mask is not None:
        att = att * scale_mask
    return jnp.einsum("bhqk,bhkd->bhqd", att, v.astype(jnp.float32)
                      ).astype(q.dtype)


def _qkv(rng, b=1, h=2, t=70, d=64, dtype=jnp.float32):
    def mk(seed_off):
        return jnp.asarray(
            rng.normal(size=(b, h, t, d)), dtype) * 0.3
    return mk(0), mk(1), mk(2)


class TestForward:
    @pytest.mark.parametrize("t", [70, 200, 256])
    def test_matches_reference(self, rng, t):
        q, k, v = _qkv(rng, t=t)
        sm = q.shape[-1] ** -0.5
        out = flash_mha(q, k, v, sm_scale=sm, block=128, interpret=True)
        ref = _ref_mha(q, k, v, sm)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_default_scale_is_rsqrt_d(self, rng):
        q, k, v = _qkv(rng, t=40)
        out = flash_mha(q, k, v, block=128, interpret=True)
        ref = _ref_mha(q, k, v, q.shape[-1] ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)


class TestBackward:
    @pytest.mark.parametrize("t", [70, 200])
    def test_grads_match_reference(self, rng, t):
        q, k, v = _qkv(rng, t=t)
        sm = q.shape[-1] ** -0.5
        w = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.sum(flash_mha(q, k, v, sm_scale=sm,
                                     block=128, interpret=True) * w)

        def loss_ref(q, k, v):
            return jnp.sum(_ref_mha(q, k, v, sm) * w)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6,
                err_msg=f"d{name} mismatch")


class TestBwdImpl:
    """The merged single-pass backward must equal the split two-kernel
    backward — same dot_generals in the same order, so tolerances are
    tight (f32, interpret mode)."""

    @pytest.mark.parametrize("t,drop", [(70, 0.0), (200, 0.3), (256, 0.1)])
    def test_merged_equals_split(self, rng, t, drop, monkeypatch):
        q, k, v = _qkv(rng, t=t)
        sm = q.shape[-1] ** -0.5
        w = jnp.asarray(rng.normal(size=q.shape), jnp.float32)
        key = jax.random.PRNGKey(3)

        def loss(q, k, v):
            return jnp.sum(flash_mha(q, k, v, sm_scale=sm, dropout_p=drop,
                                     rng=key if drop else None,
                                     block=128, interpret=True) * w)

        grads = {}
        for mode in ("merged", "split"):
            monkeypatch.setenv("DEEPSENSE_FLASH_BWD", mode)
            grads[mode] = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(grads["merged"], grads["split"], "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"d{name} mismatch")

    def test_bad_mode_rejected(self, rng, monkeypatch):
        monkeypatch.setenv("DEEPSENSE_FLASH_BWD", "bogus")
        q, k, v = _qkv(rng, t=64)
        w = jnp.ones_like(q)
        with pytest.raises(ValueError, match="DEEPSENSE_FLASH_BWD"):
            jax.grad(lambda q: jnp.sum(
                flash_mha(q, k, v, block=128, interpret=True) * w))(q)


class TestDropout:
    def test_forward_matches_masked_reference(self, rng):
        b, h, t, p = 1, 2, 200, 0.3
        q, k, v = _qkv(rng, b=b, h=h, t=t)
        sm = q.shape[-1] ** -0.5
        key = jax.random.PRNGKey(7)
        out = flash_mha(q, k, v, sm_scale=sm, dropout_p=p, rng=key,
                        block=128, interpret=True)
        seed = derive_seed(key)
        mask = dropout_scale_reference(seed, b * h, t, p,
                                       block=128).reshape(b, h, t, t)
        ref = _ref_mha(q, k, v, sm, scale_mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_grads_match_masked_reference(self, rng):
        b, h, t, p = 1, 1, 130, 0.25
        q, k, v = _qkv(rng, b=b, h=h, t=t)
        sm = q.shape[-1] ** -0.5
        key = jax.random.PRNGKey(3)
        seed = derive_seed(key)
        mask = dropout_scale_reference(seed, b * h, t, p,
                                       block=128).reshape(b, h, t, t)
        w = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.sum(flash_mha(q, k, v, sm_scale=sm, dropout_p=p,
                                     rng=key, block=128, interpret=True) * w)

        def loss_ref(q, k, v):
            return jnp.sum(_ref_mha(q, k, v, sm, scale_mask=mask) * w)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=3e-5, atol=3e-6,
                err_msg=f"d{name} mismatch")

    def test_deterministic_given_key(self, rng):
        q, k, v = _qkv(rng, t=140)
        key = jax.random.PRNGKey(11)
        o1 = flash_mha(q, k, v, dropout_p=0.1, rng=key, block=128,
                       interpret=True)
        o2 = flash_mha(q, k, v, dropout_p=0.1, rng=key, block=128,
                       interpret=True)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        o3 = flash_mha(q, k, v, dropout_p=0.1, rng=jax.random.PRNGKey(12),
                       block=128, interpret=True)
        assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 0

    def test_keep_rate(self):
        mask = dropout_scale_reference(jnp.zeros((1,), jnp.int32),
                                       4, 256, 0.1, block=128)
        keep_frac = float((np.asarray(mask) > 0).mean())
        assert abs(keep_frac - 0.9) < 0.01

    def test_requires_rng(self, rng):
        q, k, v = _qkv(rng, t=40)
        with pytest.raises(ValueError, match="requires rng"):
            flash_mha(q, k, v, dropout_p=0.1, interpret=True)

    def test_default_block_multiblock(self, rng):
        """Production tile size (512): T=600 spans 2x2 blocks w/ masking."""
        q, k, v = _qkv(rng, t=600, d=32)
        sm = q.shape[-1] ** -0.5
        w = jnp.asarray(rng.normal(size=q.shape), jnp.float32)
        out = flash_mha(q, k, v, sm_scale=sm, interpret=True)
        ref = _ref_mha(q, k, v, sm)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)
        gf = jax.grad(lambda q, k, v: jnp.sum(
            flash_mha(q, k, v, sm_scale=sm, interpret=True) * w),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda q, k, v: jnp.sum(_ref_mha(q, k, v, sm) * w),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=3e-5, atol=3e-6,
                err_msg=f"d{name} mismatch")


class TestBfloat16:
    def test_bf16_forward_and_grads(self, rng):
        """bf16 boundary: outputs/grads keep input dtype, f32 accumulation
        stays close to the f32 reference (production runs bf16 on TPU)."""
        qf, kf, vf = _qkv(rng, t=200, d=64)
        q, k, v = (x.astype(jnp.bfloat16) for x in (qf, kf, vf))
        sm = qf.shape[-1] ** -0.5
        out = flash_mha(q, k, v, sm_scale=sm, block=128, interpret=True)
        assert out.dtype == jnp.bfloat16
        ref = _ref_mha(qf, kf, vf, sm)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), rtol=0, atol=3e-2)

        w = jnp.asarray(rng.normal(size=qf.shape), jnp.float32)
        gf = jax.grad(lambda q, k, v: jnp.sum(
            flash_mha(q, k, v, sm_scale=sm, block=128,
                      interpret=True).astype(jnp.float32) * w),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda q, k, v: jnp.sum(
            _ref_mha(q, k, v, sm).astype(jnp.float32) * w),
            argnums=(0, 1, 2))(qf, kf, vf)
        for a, b_, name in zip(gf, gr, "qkv"):
            assert a.dtype == jnp.bfloat16, name
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_), rtol=0, atol=5e-2,
                err_msg=f"d{name} mismatch")


class TestModuleIntegration:
    def test_self_attention_flash_equals_einsum(self, rng):
        from deepsense6g_tii_tpu.models.fusion import SelfAttention
        x = jnp.asarray(rng.normal(size=(2, 30, 64)), jnp.float32)
        kw = dict(n_embd=64, n_head=4, attn_pdrop=0.1, resid_pdrop=0.1)
        m_ein = SelfAttention(use_flash=False, **kw)
        m_fla = SelfAttention(use_flash=True, **kw)
        variables = m_ein.init(jax.random.PRNGKey(0), x)
        y_ein = m_ein.apply(variables, x, deterministic=True)
        y_fla = m_fla.apply(variables, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(y_fla), np.asarray(y_ein),
                                   rtol=2e-5, atol=2e-6)

    def test_gpt_token_fusion_flash_train_step(self, rng):
        """Flash-enabled GPT TokenFusion: grads flow, dropout rng consumed."""
        from deepsense6g_tii_tpu.models.fusion import TokenFusion
        B, T, a, C = 2, 1, 4, 64
        tf = TokenFusion(n_embd=C, n_layer=1, seq_len=T, n_views=1,
                         anchors=a, gps_tokens=2, embd_pdrop=0.1,
                         fusion_type="gpt", channel_swap=False,
                         use_flash=True)
        img = jnp.asarray(rng.normal(size=(B, T, 2, 2, C)), jnp.float32)
        gps = jnp.asarray(rng.normal(size=(B, 2, C)), jnp.float32)
        variables = tf.init(jax.random.PRNGKey(0), img, img, img, gps)

        def loss(params):
            outs = tf.apply({"params": params}, img, img, img, gps,
                            deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

        val, grads = jax.value_and_grad(loss)(variables["params"])
        assert np.isfinite(float(val))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


class TestDropoutImpl:
    """dropout_impl selection + the mask-export kernel.

    The "hw" implementation (TPU hardware PRNG) cannot run in interpret
    mode (the Pallas interpreter has no PRNG), so its numerics are pinned
    on the real chip by tools/verify_flash_tpu.py via dropout_mask — here
    we pin everything pinnable off-chip: the export kernel reproduces the
    exact jnp oracle for "hash" (same code path the attention kernels
    call), and the resolver picks "hash" off-TPU.
    """

    def test_mask_export_matches_reference(self):
        from deepsense6g_tii_tpu.ops.flash_attention import dropout_mask
        seed = derive_seed(jax.random.PRNGKey(5))
        t, bh, p, block = 300, 3, 0.1, 128
        m_kernel = dropout_mask(seed, bh, t, p, block=block,
                                dropout_impl="hash", interpret=True)
        m_ref = dropout_scale_reference(seed, bh, t, p, block=block)
        np.testing.assert_array_equal(np.asarray(m_kernel), np.asarray(m_ref))

    def test_resolver_auto_is_hash_off_tpu(self):
        from deepsense6g_tii_tpu.ops.flash_attention import (
            resolve_dropout_impl)
        assert resolve_dropout_impl(None, True) == "hash"
        if jax.default_backend() != "tpu":
            assert resolve_dropout_impl(None, False) == "hash"
        assert resolve_dropout_impl("hw", True) == "hw"
        with pytest.raises(ValueError):
            resolve_dropout_impl("bogus", True)

    def test_explicit_hash_equals_default_off_tpu(self, rng):
        q, k, v = _qkv(rng, t=70)
        key = jax.random.PRNGKey(11)
        o_default = flash_mha(q, k, v, dropout_p=0.2, rng=key, block=128)
        o_hash = flash_mha(q, k, v, dropout_p=0.2, rng=key, block=128,
                           dropout_impl="hash")
        np.testing.assert_array_equal(np.asarray(o_default),
                                      np.asarray(o_hash))
