"""Ops-layer tests: selective scan (Pallas interpret vs reference), Mamba
layer, bilinear resize and pooling vs torch-CPU oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsense6g_tii_tpu.ops.selective_scan import (selective_scan,
                                                    selective_scan_ref)
from deepsense6g_tii_tpu.ops.mamba import (Mamba, ScanInputs,
                                           bidirectional_scan)
from deepsense6g_tii_tpu.ops.pooling import (adaptive_avg_pool,
                                             global_avg_pool, max_pool_3x3s2)
from deepsense6g_tii_tpu.ops.resize import interpolate_bilinear


def _scan_inputs(rng, b=2, L=300, d=128, n=16):
    u = jnp.asarray(rng.normal(size=(b, L, d)).astype(np.float32))
    dt = jnp.asarray(np.abs(rng.normal(size=(b, L, d))).astype(np.float32) * 0.1)
    A = jnp.asarray(-np.abs(rng.normal(size=(d, n))).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(b, L, n)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(b, L, n)).astype(np.float32))
    return u, dt, A, B, C


class TestSelectiveScanRef:
    def test_matches_naive_loop(self, rng):
        u, dt, A, B, C = _scan_inputs(rng, b=1, L=20, d=4, n=3)
        y = np.asarray(selective_scan_ref(u, dt, A, B, C))
        h = np.zeros((4, 3))
        un, dtn, An, Bn, Cn = (np.asarray(v) for v in (u, dt, A, B, C))
        for t in range(20):
            h = np.exp(dtn[0, t][:, None] * An) * h \
                + (dtn[0, t] * un[0, t])[:, None] * Bn[0, t][None]
            np.testing.assert_allclose(y[0, t], h @ Cn[0, t], rtol=2e-5, atol=1e-5)


class TestSelectiveScanPallas:
    @pytest.mark.parametrize("variant", ["chunked", "sequential"])
    def test_forward_matches_ref(self, rng, variant):
        u, dt, A, B, C = _scan_inputs(rng)
        y_ref = selective_scan_ref(u, dt, A, B, C)
        y = selective_scan(u, dt, A, B, C, True, variant)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_match_ref(self, rng):
        args = _scan_inputs(rng)
        g_ref = jax.grad(lambda *a: (selective_scan_ref(*a) ** 2).sum(),
                         argnums=(0, 1, 2, 3, 4))(*args)
        g_pal = jax.grad(lambda *a: (selective_scan(*a, True) ** 2).sum(),
                         argnums=(0, 1, 2, 3, 4))(*args)
        for gr, gp in zip(g_ref, g_pal):
            scale = max(float(jnp.abs(gr).max()), 1e-6)
            np.testing.assert_allclose(np.asarray(gp) / scale,
                                       np.asarray(gr) / scale,
                                       rtol=2e-4, atol=2e-5)

    def test_rejects_untiled_channel_dim(self, rng):
        """d not a multiple of the 128-lane channel tile would leave the
        tail channels unwritten by the grid — must be a loud error."""
        u, dt, A, B, C = _scan_inputs(rng, d=192)
        with pytest.raises(ValueError, match="multiple"):
            selective_scan(u, dt, A, B, C, True)

    def test_rejects_bad_group_batch(self, rng):
        """Grouped A: the batch must split evenly across parameter groups."""
        u, dt, A, B, C = _scan_inputs(rng, b=3)
        with pytest.raises(ValueError, match="groups"):
            selective_scan(u, dt, jnp.stack([A, A]), B, C, True)

    def test_bf16_activations(self, rng):
        """bf16 u/B/C flow straight into the kernels (no f32 HBM copies);
        y stays f32, grads come back in the input dtype and match the f32
        path at bf16 resolution."""
        u, dt, A, B, C = _scan_inputs(rng)
        ub, Bb, Cb = (x.astype(jnp.bfloat16) for x in (u, B, C))
        y32 = selective_scan(ub.astype(jnp.float32), dt, A,
                             Bb.astype(jnp.float32), Cb.astype(jnp.float32),
                             True)
        y16 = selective_scan(ub, dt, A, Bb, Cb, True)
        assert y16.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                                   rtol=1e-5, atol=1e-5)

        g = jax.grad(lambda u_, B_, C_: (selective_scan(
            u_, dt, A, B_, C_, True) ** 2).sum(), argnums=(0, 1, 2))(
                ub, Bb, Cb)
        g32 = jax.grad(lambda u_, B_, C_: (selective_scan(
            u_, dt, A, B_, C_, True) ** 2).sum(), argnums=(0, 1, 2))(
                ub.astype(jnp.float32), Bb.astype(jnp.float32),
                Cb.astype(jnp.float32))
        for a, r in zip(g, g32):
            assert a.dtype == jnp.bfloat16
            scale = max(float(jnp.abs(r).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(a, np.float32) / scale,
                np.asarray(r) / scale, rtol=0.05, atol=0.02)

    def test_exact_chunk_multiple_length(self, rng):
        u, dt, A, B, C = _scan_inputs(rng, L=256)
        y_ref = selective_scan_ref(u, dt, A, B, C)
        y = selective_scan(u, dt, A, B, C, True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_grouped_A_matches_per_group_ref(self, rng):
        """A of shape (2, d, n): batch halves scan under different A params
        (the merged bi-directional MambaBlock call, one kernel launch)."""
        u, dt, A0, B, C = _scan_inputs(rng, b=4, L=300)
        A1 = jnp.asarray(
            -np.abs(rng.normal(size=A0.shape)).astype(np.float32))
        A = jnp.stack([A0, A1])
        y = selective_scan(u, dt, A, B, C, True)
        y0 = selective_scan_ref(u[:2], dt[:2], A0, B[:2], C[:2])
        y1 = selective_scan_ref(u[2:], dt[2:], A1, B[2:], C[2:])
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(jnp.concatenate([y0, y1])),
                                   rtol=1e-4, atol=1e-4)

    def test_grouped_A_gradients(self, rng):
        u, dt, A0, B, C = _scan_inputs(rng, b=2, L=256)
        A1 = jnp.asarray(
            -np.abs(rng.normal(size=A0.shape)).astype(np.float32))
        A = jnp.stack([A0, A1])

        def loss_grouped(u_, dt_, A_, B_, C_):
            return (selective_scan(u_, dt_, A_, B_, C_, True) ** 2).sum()

        def loss_ref(u_, dt_, A_, B_, C_):
            y0 = selective_scan_ref(u_[:1], dt_[:1], A_[0], B_[:1], C_[:1])
            y1 = selective_scan_ref(u_[1:], dt_[1:], A_[1], B_[1:], C_[1:])
            return (y0 ** 2).sum() + (y1 ** 2).sum()

        g_pal = jax.grad(loss_grouped, argnums=(0, 1, 2, 3, 4))(u, dt, A, B, C)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(u, dt, A, B, C)
        assert g_pal[2].shape == (2,) + A0.shape
        for gp, gr in zip(g_pal, g_ref):
            scale = max(float(jnp.abs(gr).max()), 1e-6)
            np.testing.assert_allclose(np.asarray(gp) / scale,
                                       np.asarray(gr) / scale,
                                       rtol=2e-4, atol=2e-5)


class TestReverseScan:
    """Right-to-left scan over natural-order tensors (reverse=True) — the
    kernel that replaces the bi-directional MambaBlock's whole-stream
    jnp.flip (models/fusion.py; VERDICT r3 #3b)."""

    def test_ref_reverse_equals_flip_formulation(self, rng):
        u, dt, A, B, C = _scan_inputs(rng, L=40, d=8, n=4)
        flip = lambda x: jnp.flip(x, axis=1)
        a = selective_scan_ref(u, dt, A, B, C, reverse=True)
        b = flip(selective_scan_ref(flip(u), flip(dt), A, flip(B), flip(C)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    def test_forward_matches_ref(self, rng):
        # L=300 is not a BL multiple: exercises the trailing zero-pad,
        # which the reverse scan visits FIRST (dt=0 -> exact identity)
        u, dt, A, B, C = _scan_inputs(rng)
        y_ref = selective_scan_ref(u, dt, A, B, C, reverse=True)
        y = selective_scan(u, dt, A, B, C, True, reverse=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_match_ref(self, rng):
        args = _scan_inputs(rng)
        g_ref = jax.grad(
            lambda *a: (selective_scan_ref(*a, reverse=True) ** 2).sum(),
            argnums=(0, 1, 2, 3, 4))(*args)
        g_pal = jax.grad(
            lambda *a: (selective_scan(*a, True, reverse=True) ** 2).sum(),
            argnums=(0, 1, 2, 3, 4))(*args)
        for gr, gp in zip(g_ref, g_pal):
            scale = max(float(jnp.abs(gr).max()), 1e-6)
            np.testing.assert_allclose(np.asarray(gp) / scale,
                                       np.asarray(gr) / scale,
                                       rtol=2e-4, atol=2e-5)

    def test_sequential_variant_rejected(self, rng):
        u, dt, A, B, C = _scan_inputs(rng, L=128)
        with pytest.raises(ValueError, match="chunked"):
            selective_scan(u, dt, A, B, C, True, "sequential", reverse=True)

    def test_mamba_reverse_layer_equals_flip(self, rng):
        """Mamba(reverse=True)(x) == flip(Mamba(flip(x))) with identical
        parameters: anticausal conv + reverse scan compose to exactly the
        flip formulation (bit-exact on this CPU backend)."""
        x = jnp.asarray(rng.normal(size=(2, 70, 64)).astype(np.float32))
        fwd = Mamba(d_model=64, use_pallas=False)
        rev = Mamba(d_model=64, use_pallas=False, reverse=True)
        v = fwd.init(jax.random.PRNGKey(0), x)
        a = rev.apply(v, x)
        b = jnp.flip(fwd.apply(v, jnp.flip(x, 1)), 1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    def test_mamba_block_reverse_kernel_equals_flip_path(self, rng):
        """MambaBlock(reverse_kernel=True) keeps the same parameter tree
        and outputs/grads as the flip path (config.reverse_scan_kernel is
        a pure dataflow change)."""
        from deepsense6g_tii_tpu.models.fusion import MambaBlock
        x = jnp.asarray(rng.normal(size=(2, 70, 64)).astype(np.float32))
        blk = MambaBlock(n_embd=64, n_tokens=70, use_pallas=False)
        blk_r = MambaBlock(n_embd=64, n_tokens=70, use_pallas=False,
                           reverse_kernel=True)
        v = blk.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(blk_r.apply(v, x)),
                                   np.asarray(blk.apply(v, x)),
                                   rtol=1e-5, atol=1e-6)
        ga = jax.grad(lambda vv: jnp.sum(blk.apply(vv, x) ** 2))(v)
        gb = jax.grad(lambda vv: jnp.sum(blk_r.apply(vv, x) ** 2))(v)
        for la, lb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            scale = max(float(jnp.abs(la).max()), 1e-6)
            np.testing.assert_allclose(np.asarray(lb) / scale,
                                       np.asarray(la) / scale,
                                       rtol=1e-4, atol=1e-5)


class TestBidirectionalScan:
    def _pres(self, rng):
        pres = []
        for _ in range(2):
            u, dt, A, B, C = _scan_inputs(rng, b=2, L=300)
            z = jnp.asarray(rng.normal(size=u.shape).astype(np.float32))
            pres.append(ScanInputs(xs=u, dt=dt, B=B, C=C, z=z, A=A))
        return pres

    def test_merged_kernel_equals_separate(self, rng):
        """The MambaBlock merge bookkeeping (batch stacking + (2,d,n) A
        group + split) reproduces two independent scans exactly."""
        pre_f, pre_b = self._pres(rng)
        y_f, y_b = bidirectional_scan(pre_f, pre_b, use_kernel=True,
                                      interpret=True)
        w_f = selective_scan_ref(pre_f.xs, pre_f.dt, pre_f.A, pre_f.B, pre_f.C)
        w_b = selective_scan_ref(pre_b.xs, pre_b.dt, pre_b.A, pre_b.B, pre_b.C)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(w_f),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y_b), np.asarray(w_b),
                                   rtol=1e-4, atol=1e-4)

    def test_fallback_path(self, rng):
        pre_f, pre_b = self._pres(rng)
        y_f, y_b = bidirectional_scan(pre_f, pre_b, use_kernel=False)
        w_f = selective_scan_ref(pre_f.xs, pre_f.dt, pre_f.A, pre_f.B, pre_f.C)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(w_f))


class TestMambaLayer:
    def test_shapes_and_grad(self, rng):
        m = Mamba(d_model=64, use_pallas=False)
        x = jnp.asarray(rng.normal(size=(2, 10, 64)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (2, 10, 64)
        g = jax.grad(lambda p: (m.apply(p, x) ** 2).sum())(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_causality(self, rng):
        """Output at time t must not depend on inputs at t' > t."""
        m = Mamba(d_model=32, use_pallas=False)
        x = jnp.asarray(rng.normal(size=(1, 12, 32)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        y1 = m.apply(params, x)
        x2 = x.at[0, 8:].set(99.0)
        y2 = m.apply(params, x2)
        np.testing.assert_allclose(np.asarray(y1[0, :8]), np.asarray(y2[0, :8]),
                                   rtol=1e-5, atol=1e-5)

    def test_conv1d_shift_matches_grouped_conv(self, rng):
        """The shift-FMA lowering of the depthwise causal conv (the default,
        ops/mamba.py::causal_depthwise_conv1d) computes the same values as
        XLA's grouped-conv lowering — causal and anticausal, including
        tracks shorter than the window (GPS: L=2 < d_conv) — and the
        reverse form keeps the flip-equivalence bit-exact."""
        from deepsense6g_tii_tpu.ops.mamba import causal_depthwise_conv1d
        w = jnp.asarray(rng.normal(size=(4, 1, 8)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        for L in (1, 2, 3, 4, 5, 19):
            x = jnp.asarray(rng.normal(size=(2, L, 8)).astype(np.float32))
            for rev in (False, True):
                a = causal_depthwise_conv1d(x, w, b, reverse=rev,
                                            impl="conv")
                s = causal_depthwise_conv1d(x, w, b, reverse=rev,
                                            impl="shift")
                np.testing.assert_allclose(np.asarray(a), np.asarray(s),
                                           rtol=1e-5, atol=1e-6)
            f = jnp.flip(causal_depthwise_conv1d(
                jnp.flip(x, 1), w, b, impl="shift"), 1)
            r = causal_depthwise_conv1d(x, w, b, reverse=True, impl="shift")
            np.testing.assert_array_equal(np.asarray(f), np.asarray(r))
        # gradients agree between the lowerings
        x = jnp.asarray(rng.normal(size=(2, 19, 8)).astype(np.float32))
        for arg in (0, 1):
            gc = jax.grad(lambda *a: causal_depthwise_conv1d(
                *a, b, impl="conv").sum(), argnums=arg)(x, w)
            gs = jax.grad(lambda *a: causal_depthwise_conv1d(
                *a, b, impl="shift").sum(), argnums=arg)(x, w)
            np.testing.assert_allclose(np.asarray(gc), np.asarray(gs),
                                       rtol=1e-5, atol=1e-6)

    def test_mamba_layer_conv_impls_agree(self, rng):
        """Full Mamba layer: shift vs grouped-conv lowering, same params."""
        x = jnp.asarray(rng.normal(size=(2, 10, 64)).astype(np.float32))
        m_s = Mamba(d_model=64, use_pallas=False, conv1d_impl="shift")
        m_c = Mamba(d_model=64, use_pallas=False, conv1d_impl="conv")
        v = m_s.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(m_s.apply(v, x)),
                                   np.asarray(m_c.apply(v, x)),
                                   rtol=1e-5, atol=1e-6)

    def test_param_structure(self):
        m = Mamba(d_model=64)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 64)))["params"]
        assert params["in_proj"]["kernel"].shape == (64, 256)
        assert params["x_proj"]["kernel"].shape == (128, 4 + 32)
        assert params["A_log"].shape == (128, 16)
        assert params["conv1d_weight"].shape == (4, 1, 128)
        # A = -exp(A_log) negative and spanning 1..d_state
        a = -np.exp(np.asarray(params["A_log"]))
        assert a.max() <= -1.0 + 1e-6 and a.min() >= -16.0 - 1e-5


class TestResize:
    @pytest.mark.parametrize("scale", [2, 4, 8])
    def test_matches_torch_bilinear(self, rng, scale):
        import torch
        import torch.nn.functional as TF
        x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        want = TF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                              scale_factor=scale, mode="bilinear",
                              align_corners=False)
        want = want.permute(0, 2, 3, 1).numpy()
        got = np.asarray(interpolate_bilinear(jnp.asarray(x), scale))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_identity_scale(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
        assert interpolate_bilinear(x, 1) is x


class TestPooling:
    def test_adaptive_avg_pool_matches_torch(self, rng):
        import torch
        x = rng.normal(size=(2, 64, 64, 5)).astype(np.float32)
        want = torch.nn.AdaptiveAvgPool2d((8, 8))(
            torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        got = np.asarray(adaptive_avg_pool(jnp.asarray(x), 8, 8))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_max_pool_matches_torch(self, rng):
        import torch
        import torch.nn.functional as TF
        x = rng.normal(size=(2, 128, 128, 4)).astype(np.float32)
        want = TF.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                             kernel_size=3, stride=2, padding=1)
        want = want.permute(0, 2, 3, 1).numpy()
        got = np.asarray(max_pool_3x3s2(jnp.asarray(x)))
        np.testing.assert_allclose(got, want)

    def test_global(self, rng):
        x = rng.normal(size=(3, 8, 8, 16)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(global_avg_pool(jnp.asarray(x))),
                                   x.mean(axis=(1, 2)), rtol=1e-6)

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            adaptive_avg_pool(jnp.zeros((1, 10, 10, 1)), 8, 8)


class TestMambaLayerNumericOracle:
    def test_full_layer_matches_numpy_reference(self, rng):
        """End-to-end oracle: the Flax Mamba layer vs a step-by-step NumPy
        implementation of mamba_ssm semantics (in_proj -> causal depthwise
        conv -> silu -> x_proj -> softplus dt -> recurrence -> D skip ->
        silu(z) gate -> out_proj)."""
        d_model, d_state, d_conv, L = 16, 4, 4, 12
        m = Mamba(d_model=d_model, d_state=d_state, d_conv=d_conv,
                  use_pallas=False)
        x = rng.normal(size=(1, L, d_model)).astype(np.float32)
        variables = m.init(jax.random.PRNGKey(3), jnp.asarray(x))
        got = np.asarray(m.apply(variables, jnp.asarray(x)))[0]

        p = jax.tree_util.tree_map(np.asarray, variables["params"])
        d_inner = 2 * d_model
        dt_rank = int(np.ceil(d_model / 16))

        def silu(v):
            return v / (1 + np.exp(-v))

        xz = x[0] @ p["in_proj"]["kernel"]          # (L, 2*d_inner)
        xs, z = xz[:, :d_inner], xz[:, d_inner:]
        # causal depthwise conv, left pad d_conv-1
        w = p["conv1d_weight"][:, 0, :]             # (d_conv, d_inner)
        padded = np.vstack([np.zeros((d_conv - 1, d_inner)), xs])
        conv = np.stack([
            sum(padded[t + k] * w[k] for k in range(d_conv))
            for t in range(L)]) + p["conv1d_bias"]
        xs = silu(conv)
        dbc = xs @ p["x_proj"]["kernel"]
        dt = np.log1p(np.exp(dbc[:, :dt_rank] @ p["dt_proj_weight"]
                             + p["dt_proj_bias"]))
        Bv = dbc[:, dt_rank:dt_rank + d_state]
        Cv = dbc[:, dt_rank + d_state:]
        A = -np.exp(p["A_log"])                     # (d_inner, d_state)
        h = np.zeros((d_inner, d_state))
        ys = []
        for t in range(L):
            h = np.exp(dt[t][:, None] * A) * h \
                + (dt[t] * xs[t])[:, None] * Bv[t][None]
            ys.append(h @ Cv[t])
        y = np.stack(ys) + p["D"] * xs
        y = y * silu(z)
        want = y @ p["out_proj"]["kernel"]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
