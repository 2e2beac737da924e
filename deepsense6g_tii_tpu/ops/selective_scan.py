"""Selective state-space scan (the Mamba recurrence) for TPU.

Replaces the ``mamba_ssm`` CUDA selective-scan kernel the reference depends on
(/root/reference/mambafuser_seq.py:9,83-90).  Semantics, per channel d and
state n:

    h_t = exp(dt_t * A[d,n]) * h_{t-1} + (dt_t * u_t) * B_t[n]
    y_t = sum_n h_t[d,n] * C_t[n]            (+ D[d] * u_t, applied by caller)

Implementations:

* ``selective_scan_ref`` — ``jax.lax.associative_scan``.  O(L log L) HBM
  traffic but runs anywhere and is automatically differentiable; the golden
  reference for tests.
* ``selective_scan`` — Pallas TPU kernels (forward + fused backward) with
  O(L) HBM traffic.  The hidden state lives in VMEM scratch and is carried
  across sequence chunks by the sequential TPU grid; the backward recomputes
  in-chunk states from chunk-boundary states saved by the forward (no
  O(L*d*n) residuals) and runs the gradient recurrence
  g_t = dy_t (x) C_t + exp(dt_{t+1} A) * g_{t+1} in reverse.

  Two kernel variants share the wrapper:
    - ``chunked`` (default): within each VMEM-resident chunk the scan runs as
      a two-level work-efficient scan (sequential sweeps inside SEG-wide
      segments, vectorized across the BL/SEG segments, plus a tiny doubling
      over the segment carries).  In the backward, the gradient seed
      C (x) dy is constructed on the fly, the reverse scan runs in
      p = a1*g space (removes the a1[t+1] shift), ah = a1*h_prev is stored
      instead of the states (a free sweep-2 intermediate, and exactly the
      factor the dt/A gradients need), and all five gradient reductions
      happen inside the sweeps while g/h are hot.  The forward deliberately
      materializes a1/bb/h as full (BL, n, BD) arrays: Mosaic keeps the
      sweep chains in registers, so the same fusion applied to the forward
      measured SLOWER (per-op overhead on small slices dominates, not VMEM
      passes — see _chunk_scan).
    - ``sequential``: a fori_loop over time steps; simpler, used as a
      cross-check and for very small batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# chunk length along the sequence axis / channel block widths.
# BL defines the chunk-boundary states shared by forward and backward; the
# channel block width can differ per direction (the backward holds more
# live VMEM arrays, so it prefers a narrower block).
BL = 128
FWD_BD = 128
BWD_BD = 128


def selective_scan_ref(u: jnp.ndarray, dt: jnp.ndarray, A: jnp.ndarray,
                       B: jnp.ndarray, C: jnp.ndarray,
                       reverse: bool = False) -> jnp.ndarray:
    """Associative-scan reference.

    u, dt: (b, L, d);  A: (d, n);  B, C: (b, L, n).  Returns (b, L, d) f32.

    ``reverse=True`` runs the recurrence right-to-left —
    ``flip(scan(flip(inputs)))`` — so a bi-directional MambaBlock's backward
    branch can consume natural-order tensors (models/fusion.py).
    """
    if reverse:
        flip = functools.partial(jnp.flip, axis=1)
        return flip(selective_scan_ref(flip(u), flip(dt), A,
                                       flip(B), flip(C)))
    u = u.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)
    dA = jnp.exp(dt[..., None] * A)                       # (b, L, d, n)
    dBu = (dt * u)[..., None] * B[:, :, None, :]          # (b, L, d, n)

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (dA, dBu), axis=1)
    return jnp.einsum("bldn,bln->bld", h, C)


# ---------------------------------------------------------------------------
# in-chunk scan bodies
# ---------------------------------------------------------------------------

SEG = 8    # segment width of the two-level in-chunk scan (A/B-tuned on v5e)


def _shift_down_ax(x: jnp.ndarray, s: int, fill: float, axis: int = 0):
    """x[t] -> x[t-s] along ``axis``, first s rows = fill."""
    pad_shape = list(x.shape)
    pad_shape[axis] = s
    pad = jnp.full(pad_shape, fill, x.dtype)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, x.shape[axis] - s)
    return jnp.concatenate([pad, x[tuple(idx)]], axis=axis)


def _shift_up_ax(x: jnp.ndarray, s: int, fill: float, axis: int = 0):
    """x[t] -> x[t+s] along ``axis``, last s rows = fill."""
    pad_shape = list(x.shape)
    pad_shape[axis] = s
    pad = jnp.full(pad_shape, fill, x.dtype)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(s, None)
    return jnp.concatenate([x[tuple(idx)], pad], axis=axis)


def _segment_prefix(aa, carry, h_in):
    """Inclusive doubling scan over the G segment carries (1/SEG-sized
    arrays), then the per-segment *entry* states with the chunk entry
    ``h_in`` folded in.  Shared by the forward and (mirrored) backward."""
    G = aa.shape[0]
    s = 1
    while s < G:
        carry = carry + aa * _shift_down_ax(carry, s, 0.0)
        aa = aa * _shift_down_ax(aa, s, 1.0)
        s *= 2
    return (_shift_down_ax(carry, 1, 0.0)
            + _shift_down_ax(aa, 1, 1.0) * h_in[None])


def _segment_suffix(aa, carry, g_in):
    """Reverse-direction counterpart of :func:`_segment_prefix`: per-segment
    *exit* states (the value entering each segment from the right)."""
    G = aa.shape[0]
    s = 1
    while s < G:
        carry = carry + aa * _shift_up_ax(carry, s, 0.0)
        aa = aa * _shift_up_ax(aa, s, 1.0)
        s *= 2
    return (_shift_up_ax(carry, 1, 0.0)
            + _shift_up_ax(aa, 1, 1.0) * g_in[None])


# ---------------------------------------------------------------------------
# Pallas forward
# ---------------------------------------------------------------------------

def _chunk_scan(a1, bb, h_in):
    """All in-chunk states from per-step decays a1, updates bb, entry state.

    Work-efficient two-level scan: *sequential* recurrences inside each
    SEG-wide segment (vectorized across the G = BL/SEG segments), plus the
    tiny doubling over segment carries (:func:`_segment_prefix`).  Measured
    on v5e (r2): Mosaic keeps the sweep data in registers, so further
    fusing the bb construction / output reduction into the sweeps is
    SLOWER (1.51 vs 1.25 ms fwd at d=1024) — the kernels are per-op-
    overhead-bound on the (G, n, BD) slices, not VMEM-pass-bound.
    """
    T = a1.shape[0]
    G = T // SEG
    a4 = a1.reshape((G, SEG) + a1.shape[1:])
    b4 = bb.reshape((G, SEG) + bb.shape[1:])
    # sweep 1: per-segment carry (decay product, zero-entry end state)
    aa, t = a4[:, 0], b4[:, 0]
    for s in range(1, SEG):
        t = b4[:, s] + a4[:, s] * t
        aa = aa * a4[:, s]
    h_in_seg = _segment_prefix(aa, t, h_in)
    # sweep 2: in-segment states with the entry folded in
    h = b4[:, 0] + a4[:, 0] * h_in_seg
    hs = [h]
    for s in range(1, SEG):
        h = b4[:, s] + a4[:, s] * h
        hs.append(h)
    return jnp.stack(hs, axis=1).reshape((T,) + bb.shape[1:])


def _chunk_scan_rev(a1, bb, g_in):
    """Right-to-left mirror of :func:`_chunk_scan`:
    h[t] = a1[t] * h[t+1] + bb[t], entry state ``g_in`` from the right.

    Same two-level structure (sequential sweeps inside SEG-wide segments +
    doubling over segment carries) with every loop direction mirrored — no
    in-VMEM data reversal, so the Mosaic lowering is identical to the
    forward body's."""
    T = a1.shape[0]
    G = T // SEG
    a4 = a1.reshape((G, SEG) + a1.shape[1:])
    b4 = bb.reshape((G, SEG) + bb.shape[1:])
    # sweep 1: per-segment carry (decay product, zero-entry LEFT-end state)
    aa, t = a4[:, SEG - 1], b4[:, SEG - 1]
    for s in range(SEG - 2, -1, -1):
        t = b4[:, s] + a4[:, s] * t
        aa = aa * a4[:, s]
    r_in_seg = _segment_suffix(aa, t, g_in)
    # sweep 2: in-segment states descending with the right entry folded in
    hs = [None] * SEG
    h = b4[:, SEG - 1] + a4[:, SEG - 1] * r_in_seg
    hs[SEG - 1] = h
    for s in range(SEG - 2, -1, -1):
        h = b4[:, s] + a4[:, s] * h
        hs[s] = h
    return jnp.stack(hs, axis=1).reshape((T,) + bb.shape[1:])


def _fwd_kernel_chunked(u_ref, dt_ref, b_ref, c_ref, at_ref,
                        y_ref, hin_ref, hout_ref, h_scr):
    lc = pl.program_id(2)

    @pl.when(lc == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    hin_ref[0, 0] = h_scr[...]

    A_t = at_ref[0]                                        # (n, BD)
    dt = dt_ref[0].astype(jnp.float32)                     # (BL, BD)
    u = u_ref[0].astype(jnp.float32)
    Bv = b_ref[0].astype(jnp.float32)                      # (BL, n)
    Cv = c_ref[0].astype(jnp.float32)

    a1 = jnp.exp(dt[:, None, :] * A_t[None])               # (BL, n, BD)
    bb = Bv[:, :, None] * (dt * u)[:, None, :]             # (BL, n, BD)
    h = _chunk_scan(a1, bb, h_scr[...])                    # (BL, n, BD)

    y_ref[0] = jnp.sum(h * Cv[:, :, None], axis=1).astype(y_ref.dtype)
    h_scr[...] = h[BL - 1]

    @pl.when(lc == pl.num_programs(2) - 1)
    def _():
        hout_ref[0] = h[BL - 1]


def _fwd_kernel_chunked_rev(u_ref, dt_ref, b_ref, c_ref, at_ref,
                            y_ref, hin_ref, hout_ref, h_scr):
    """Reverse-direction forward: chunks are visited last-to-first (the
    wrapper's index maps) and the in-chunk recurrence runs right-to-left,
    so the kernel consumes NATURAL-order inputs and emits natural-order
    outputs — the caller's ``jnp.flip`` of the whole stream disappears.
    ``hin`` stores the state entering each chunk from the RIGHT (keyed by
    chunk index, not visit order) for the backward's reconstruction."""
    lc = pl.program_id(2)

    @pl.when(lc == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    hin_ref[0, 0] = h_scr[...]

    A_t = at_ref[0]                                        # (n, BD)
    dt = dt_ref[0].astype(jnp.float32)                     # (BL, BD)
    u = u_ref[0].astype(jnp.float32)
    Bv = b_ref[0].astype(jnp.float32)                      # (BL, n)
    Cv = c_ref[0].astype(jnp.float32)

    a1 = jnp.exp(dt[:, None, :] * A_t[None])               # (BL, n, BD)
    bb = Bv[:, :, None] * (dt * u)[:, None, :]             # (BL, n, BD)
    h = _chunk_scan_rev(a1, bb, h_scr[...])                # (BL, n, BD)

    y_ref[0] = jnp.sum(h * Cv[:, :, None], axis=1).astype(y_ref.dtype)
    h_scr[...] = h[0]

    @pl.when(lc == pl.num_programs(2) - 1)
    def _():
        hout_ref[0] = h[0]


def _fwd_kernel_sequential(u_ref, dt_ref, b_ref, c_ref, at_ref,
                           y_ref, hin_ref, hout_ref, h_scr):
    lc = pl.program_id(2)

    @pl.when(lc == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    a_t_full = at_ref[0]                                   # (n, BD)
    hin_ref[0, 0] = h_scr[...]

    def step(t, h):
        dt_t = dt_ref[0, t, :].astype(jnp.float32)
        u_t = u_ref[0, t, :].astype(jnp.float32)
        b_t = b_ref[0, t, :].astype(jnp.float32)
        c_t = c_ref[0, t, :].astype(jnp.float32)
        a = jnp.exp(a_t_full * dt_t[None, :])
        h = a * h + b_t[:, None] * (dt_t * u_t)[None, :]
        y_ref[0, t, :] = jnp.sum(h * c_t[:, None], axis=0).astype(y_ref.dtype)
        return h

    h = jax.lax.fori_loop(0, u_ref.shape[1], step, h_scr[...])
    h_scr[...] = h

    @pl.when(lc == pl.num_programs(2) - 1)
    def _():
        hout_ref[0] = h


def _scan_fwd_pallas(u, dt, B, C, A_t, variant, interpret=False,
                     reverse=False):
    """A_t: (G, n, d) — G parameter groups over equal batch slices (G=1 is
    the plain shared-A scan; G=2 is the merged bi-directional MambaBlock
    call, both direction branches in one kernel launch).

    ``reverse=True`` (chunked only): right-to-left recurrence over natural-
    order inputs — grid steps visit chunks last-to-first via the index maps,
    the in-chunk sweeps run mirrored (:func:`_chunk_scan_rev`)."""
    b, L, d = u.shape
    n = B.shape[-1]
    BD = min(FWD_BD, d)
    nc = L // BL
    nd = d // BD
    grid = (b, nd, nc)
    bg = b // A_t.shape[0]          # batch rows per parameter group
    if reverse:
        if variant != "chunked":
            raise ValueError("reverse scan supports only variant='chunked'")
        kernel = _fwd_kernel_chunked_rev
        ck = lambda k: nc - 1 - k   # chunk visited at grid step k
    else:
        kernel = (_fwd_kernel_chunked if variant == "chunked"
                  else _fwd_kernel_sequential)
        ck = lambda k: k

    y, h_in, h_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BL, BD), lambda i, j, k: (i, ck(k), j)),   # u
            pl.BlockSpec((1, BL, BD), lambda i, j, k: (i, ck(k), j)),   # dt
            pl.BlockSpec((1, BL, n), lambda i, j, k: (i, ck(k), 0)),    # B
            pl.BlockSpec((1, BL, n), lambda i, j, k: (i, ck(k), 0)),    # C
            pl.BlockSpec((1, n, BD), lambda i, j, k: (i // bg, 0, j)),  # A.T
        ],
        out_specs=[
            pl.BlockSpec((1, BL, BD), lambda i, j, k: (i, ck(k), j)),     # y
            pl.BlockSpec((1, 1, n, BD),
                         lambda i, j, k: (i, ck(k), 0, j)),             # h_in
            pl.BlockSpec((1, n, BD), lambda i, j, k: (i, 0, j)),        # h_out
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, L, d), jnp.float32),
            jax.ShapeDtypeStruct((b, nc, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((n, BD), jnp.float32)],
        interpret=interpret,
    )(u, dt, B, C, A_t)
    return y, h_in, h_out


# ---------------------------------------------------------------------------
# Pallas backward
# ---------------------------------------------------------------------------

def _bwd_kernel_chunked(u_ref, dt_ref, b_ref, c_ref, at_ref, hin_ref, dy_ref,
                        du_ref, ddt_ref, db_ref, dc_ref, da_ref,
                        g_scr):
    """Fused backward chunk.  Two (BL, n, BD) arrays are materialized: the
    decay a1 and ah_t = a1_t * h_{t-1} (a free intermediate of the state
    reconstruction sweep, and exactly the factor the dt/A gradients need:
    d a1 terms = g_t * ah_t).  The reverse gradient recurrence runs in
    p_t = a1_t * g_t space — p_t = a1_t (q_t + p_{t+1}) — which removes the
    a1[t+1] shift; all five gradient reductions (du, ddt, dB, dC, dA)
    happen inside the sweeps while g_t / h_t are hot."""
    lc = pl.program_id(2)

    @pl.when(lc == 0)   # reverse order: first grid step is the LAST chunk
    def _():
        g_scr[...] = jnp.zeros_like(g_scr)

    A_t = at_ref[0]                                        # (n, BD)
    dt = dt_ref[0].astype(jnp.float32)                     # (BL, BD)
    u = u_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)                     # (BL, BD)
    h_in = hin_ref[0, 0]                                   # (n, BD)
    n = b_ref.shape[-1]
    G = BL // SEG

    a1 = jnp.exp(dt[:, None, :] * A_t[None])               # (BL, n, BD)
    a4 = a1.reshape((G, SEG) + a1.shape[1:])
    B4 = b_ref[0].astype(jnp.float32).reshape(G, SEG, n)
    C4 = c_ref[0].astype(jnp.float32).reshape(G, SEG, n)
    dt4 = dt.reshape(G, SEG, -1)
    u4 = u.reshape(G, SEG, -1)
    dtu4 = (dt * u).reshape(G, SEG, -1)
    dy4 = dy.reshape(G, SEG, -1)

    def bb(s):                                             # (G, n, BD)
        return B4[:, s][:, :, None] * dtu4[:, s][:, None, :]

    # --- phase 1: reconstruct states from the chunk-entry state; store
    # ah_t = a1_t h_{t-1}; dC_t = sum_d h_t dy_t fused into sweep 2.
    aa, t = a4[:, 0], bb(0)
    for s in range(1, SEG):
        t = bb(s) + a4[:, s] * t
        aa = aa * a4[:, s]
    h = _segment_prefix(aa, t, h_in)
    ahs, dcs = [], []
    for s in range(SEG):
        ah = a4[:, s] * h
        h = bb(s) + ah
        ahs.append(ah)
        dcs.append(jnp.sum(h * dy4[:, s][:, None, :], axis=2))   # (G, n)
    ah4 = jnp.stack(ahs, axis=1)                           # (G, SEG, n, BD)
    dc_ref[0, 0] = jnp.stack(dcs, axis=1).reshape(BL, n).astype(dc_ref.dtype)

    # --- phase 2: reverse scan in p = a1*g space.  q_t = C_t (x) dy_t is
    # built on the fly; g_t = q_t + p_{t+1}; p_t = a1_t g_t.  Carried state
    # g_scr is p[first element of the later chunk].
    def q(s):                                              # (G, n, BD)
        return C4[:, s][:, :, None] * dy4[:, s][:, None, :]

    aa = a4[:, SEG - 1]
    p = a4[:, SEG - 1] * q(SEG - 1)
    for s in range(SEG - 2, -1, -1):
        p = a4[:, s] * (q(s) + p)
        aa = aa * a4[:, s]
    p_in_seg = _segment_suffix(aa, p, g_scr[...])
    # sweep 2 (descending t): g / p live per step; all gradient reductions
    # fused here.
    p = p_in_seg
    dus = [None] * SEG
    ddts = [None] * SEG
    dbs = [None] * SEG
    da_acc = jnp.zeros_like(A_t)
    for s in range(SEG - 1, -1, -1):
        g = q(s) + p                                       # (G, n, BD)
        p = a4[:, s] * g
        gb = jnp.sum(g * B4[:, s][:, :, None], axis=1)     # (G, BD)
        gsa = g * ah4[:, s]                                # (G, n, BD)
        dus[s] = dt4[:, s] * gb
        ddts[s] = gb * u4[:, s] + jnp.sum(gsa * A_t[None], axis=1)
        dbs[s] = jnp.sum(g * dtu4[:, s][:, None, :], axis=2)   # (G, n)
        da_acc = da_acc + jnp.sum(gsa * dt4[:, s][:, None, :], axis=0)
    g_scr[...] = p[0]                                      # carry for chunk-1

    du_ref[0] = jnp.stack(dus, axis=1).reshape(BL, -1).astype(du_ref.dtype)
    ddt_ref[0] = jnp.stack(ddts, axis=1).reshape(BL, -1).astype(ddt_ref.dtype)
    db_ref[0, 0] = jnp.stack(dbs, axis=1).reshape(BL, n).astype(db_ref.dtype)

    @pl.when(lc == 0)
    def _():
        da_ref[0] = da_acc

    @pl.when(lc > 0)
    def _():
        da_ref[0] = da_ref[0] + da_acc


def _bwd_kernel_chunked_rev(u_ref, dt_ref, b_ref, c_ref, at_ref, hin_ref,
                            dy_ref, du_ref, ddt_ref, db_ref, dc_ref, da_ref,
                            g_scr):
    """Backward of the REVERSE scan — every direction mirrored vs
    :func:`_bwd_kernel_chunked`.  The primal h[t] = a1[t] h[t+1] + bb[t]
    flows right-to-left, so its gradient recurrence
    g[t] = q[t] + a1[t-1] g[t-1] flows LEFT-to-right: chunks are visited
    in natural order, phase 1 reconstructs states descending from the
    chunk's right-entry state (saved by the forward), phase 2 runs the
    ascending p = a1*g recurrence with ah_t = a1_t * h_{t+1} in place of
    the forward-direction kernel's a1_t * h_{t-1}."""
    lc = pl.program_id(2)

    @pl.when(lc == 0)   # natural order: first grid step is chunk 0
    def _():
        g_scr[...] = jnp.zeros_like(g_scr)

    A_t = at_ref[0]                                        # (n, BD)
    dt = dt_ref[0].astype(jnp.float32)                     # (BL, BD)
    u = u_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)                     # (BL, BD)
    h_in = hin_ref[0, 0]                                   # (n, BD)
    n = b_ref.shape[-1]
    G = BL // SEG

    a1 = jnp.exp(dt[:, None, :] * A_t[None])               # (BL, n, BD)
    a4 = a1.reshape((G, SEG) + a1.shape[1:])
    B4 = b_ref[0].astype(jnp.float32).reshape(G, SEG, n)
    C4 = c_ref[0].astype(jnp.float32).reshape(G, SEG, n)
    dt4 = dt.reshape(G, SEG, -1)
    u4 = u.reshape(G, SEG, -1)
    dtu4 = (dt * u).reshape(G, SEG, -1)
    dy4 = dy.reshape(G, SEG, -1)

    def bb(s):                                             # (G, n, BD)
        return B4[:, s][:, :, None] * dtu4[:, s][:, None, :]

    # --- phase 1: reconstruct states right-to-left from the chunk's
    # right-entry state; store ah_t = a1_t h_{t+1}; dC fused into sweep 2.
    aa, t = a4[:, SEG - 1], bb(SEG - 1)
    for s in range(SEG - 2, -1, -1):
        t = bb(s) + a4[:, s] * t
        aa = aa * a4[:, s]
    h = _segment_suffix(aa, t, h_in)
    ahs = [None] * SEG
    dcs = [None] * SEG
    for s in range(SEG - 1, -1, -1):
        ah = a4[:, s] * h
        h = bb(s) + ah
        ahs[s] = ah
        dcs[s] = jnp.sum(h * dy4[:, s][:, None, :], axis=2)    # (G, n)
    ah4 = jnp.stack(ahs, axis=1)                           # (G, SEG, n, BD)
    dc_ref[0, 0] = jnp.stack(dcs, axis=1).reshape(BL, n).astype(dc_ref.dtype)

    # --- phase 2: ASCENDING scan in p = a1*g space; q_t = C_t (x) dy_t on
    # the fly; g_t = q_t + p_{t-1}; p_t = a1_t g_t.  Carried g_scr is
    # p[last element of the earlier chunk].
    def q(s):                                              # (G, n, BD)
        return C4[:, s][:, :, None] * dy4[:, s][:, None, :]

    aa = a4[:, 0]
    p = a4[:, 0] * q(0)
    for s in range(1, SEG):
        p = a4[:, s] * (q(s) + p)
        aa = aa * a4[:, s]
    p_in_seg = _segment_prefix(aa, p, g_scr[...])
    # sweep 2 (ascending t): all gradient reductions fused while g/p hot.
    p = p_in_seg
    dus = [None] * SEG
    ddts = [None] * SEG
    dbs = [None] * SEG
    da_acc = jnp.zeros_like(A_t)
    for s in range(SEG):
        g = q(s) + p                                       # (G, n, BD)
        p = a4[:, s] * g
        gb = jnp.sum(g * B4[:, s][:, :, None], axis=1)     # (G, BD)
        gsa = g * ah4[:, s]                                # (G, n, BD)
        dus[s] = dt4[:, s] * gb
        ddts[s] = gb * u4[:, s] + jnp.sum(gsa * A_t[None], axis=1)
        dbs[s] = jnp.sum(g * dtu4[:, s][:, None, :], axis=2)   # (G, n)
        da_acc = da_acc + jnp.sum(gsa * dt4[:, s][:, None, :], axis=0)
    g_scr[...] = p[G - 1]                                  # carry for chunk+1

    du_ref[0] = jnp.stack(dus, axis=1).reshape(BL, -1).astype(du_ref.dtype)
    ddt_ref[0] = jnp.stack(ddts, axis=1).reshape(BL, -1).astype(ddt_ref.dtype)
    db_ref[0, 0] = jnp.stack(dbs, axis=1).reshape(BL, n).astype(db_ref.dtype)

    @pl.when(lc == 0)
    def _():
        da_ref[0] = da_acc

    @pl.when(lc > 0)
    def _():
        da_ref[0] = da_ref[0] + da_acc


def _scan_bwd_pallas(u, dt, B, C, A_t, h_in, dy, interpret=False,
                     reverse=False):
    b, L, d = u.shape
    n = B.shape[-1]
    BD = min(BWD_BD, d)
    nc = L // BL
    nd = d // BD
    grid = (b, nd, nc)
    bg = b // A_t.shape[0]          # batch rows per parameter group

    if reverse:
        # gradient of the right-to-left scan flows left-to-right: visit
        # chunks in natural order
        kernel = _bwd_kernel_chunked_rev
        ck = lambda k: k
    else:
        kernel = _bwd_kernel_chunked
        ck = lambda k: nc - 1 - k

    def rev(i, j, k):
        return (i, ck(k), j)

    du, ddt, dB_p, dC_p, dA_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BL, BD), rev),                            # u
            pl.BlockSpec((1, BL, BD), rev),                            # dt
            pl.BlockSpec((1, BL, n), lambda i, j, k: (i, ck(k), 0)),
            pl.BlockSpec((1, BL, n), lambda i, j, k: (i, ck(k), 0)),
            pl.BlockSpec((1, n, BD), lambda i, j, k: (i // bg, 0, j)),  # A.T
            pl.BlockSpec((1, 1, n, BD),
                         lambda i, j, k: (i, ck(k), 0, j)),            # h_in
            pl.BlockSpec((1, BL, BD), rev),                            # dy
        ],
        out_specs=[
            pl.BlockSpec((1, BL, BD), rev),                            # du
            pl.BlockSpec((1, BL, BD), rev),                            # ddt
            pl.BlockSpec((1, 1, BL, n),
                         lambda i, j, k: (i, j, ck(k), 0)),            # dB part
            pl.BlockSpec((1, 1, BL, n),
                         lambda i, j, k: (i, j, ck(k), 0)),            # dC part
            pl.BlockSpec((1, n, BD), lambda i, j, k: (i, 0, j)),       # dA part
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, L, d), u.dtype),     # du in input dtype
            jax.ShapeDtypeStruct((b, L, d), jnp.float32),
            jax.ShapeDtypeStruct((b, nd, L, n), jnp.float32),
            jax.ShapeDtypeStruct((b, nd, L, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, BD), jnp.float32),        # g carry
        ],
        interpret=interpret,
    )(u, dt, B, C, A_t, h_in, dy)

    dB = dB_p.sum(axis=1)                           # (b, L, n)
    dC = dC_p.sum(axis=1)
    G = A_t.shape[0]
    dA = dA_p.reshape(G, bg, n, d).sum(axis=1)      # (G, n, d)
    return du, ddt, dB, dC, dA.transpose(0, 2, 1)   # dA: (G, d, n)


# ---------------------------------------------------------------------------
# public custom-vjp op
# ---------------------------------------------------------------------------

def _pad_len(L: int) -> int:
    return (BL - L % BL) % BL


def _pad_seq(x, pad):
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


def selective_scan(u, dt, A, B, C, interpret=False, variant="chunked",
                   reverse=False):
    """Pallas selective scan.  Same contract as ``selective_scan_ref``.

    d must be a multiple of 128; L is padded internally to a multiple of BL.
    ``interpret=True`` runs the kernels in interpreter mode (CPU tests).

    ``reverse=True`` runs the recurrence right-to-left over NATURAL-order
    inputs and outputs (``flip(scan(flip(inputs)))`` semantics with zero
    flips): the grid visits chunks last-to-first and the in-chunk sweeps
    are mirrored.  The internal zero-padding of L stays at the sequence
    END — for the reverse scan those pads are scanned first, and dt=0
    makes each one an exact identity step (decay 1, update 0), so real
    outputs are untouched.  Chunked variant only.

    A may be (d, n) — shared over the batch — or (G, d, n) with G parameter
    groups over equal slices of the batch: rows ``u[g*b//G:(g+1)*b//G]``
    scan under ``A[g]``.  The grouped form lets a bi-directional MambaBlock
    run both of its direction branches (different A params) in ONE kernel
    launch by stacking them on the batch axis (models/fusion.py).

    u/B/C may be bfloat16: the kernels cast per-chunk in VMEM (all compute
    and carries are f32, y is f32) and return du/dB/dC in the input dtype —
    exactly what the caller's mixed-precision boundary would do anyway,
    without materializing f32 copies of the big activations in HBM.  dt and
    A are always promoted to f32 (they pass through exp; the callers keep
    them f32 already, ops/mamba.py).
    """
    b, _, d = u.shape
    bd = min(FWD_BD, d)
    if d % bd != 0:
        raise ValueError(
            f"selective_scan: d={d} must be a multiple of {bd} "
            f"(the kernel channel tile) — the grid would silently leave the "
            f"channel tail unwritten.  Pad d or use selective_scan_ref.")
    if A.ndim == 3 and b % A.shape[0] != 0:
        raise ValueError(
            f"selective_scan: batch {b} must divide evenly into the "
            f"{A.shape[0]} parameter groups of grouped A.")
    return _scan_core(u, dt.astype(jnp.float32), A.astype(jnp.float32),
                      B, C, interpret, variant, reverse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _scan_core(u, dt, A, B, C, interpret, variant, reverse):
    y, _ = _fwd_impl(u, dt, A, B, C, interpret, variant, reverse)
    return y


def _fwd_impl(u, dt, A, B, C, interpret, variant, reverse):
    b, L, d = u.shape
    pad = _pad_len(L)
    up, dtp, Bp, Cp = (_pad_seq(x, pad) for x in (u, dt, B, C))
    grouped = A.ndim == 3
    A_t = (A if grouped else A[None]).transpose(0, 2, 1)   # (G, n, d)
    y, h_in, _ = _scan_fwd_pallas(up, dtp, Bp, Cp, A_t, variant,
                                  interpret=interpret, reverse=reverse)
    return y[:, :L], (up, dtp, Bp, Cp, A_t, h_in, L, grouped)


def _fwd_rule(u, dt, A, B, C, interpret, variant, reverse):
    y, res = _fwd_impl(u, dt, A, B, C, interpret, variant, reverse)
    return y, res


def _bwd_rule(interpret, variant, reverse, res, dy):
    del variant  # backward is always chunked
    up, dtp, Bp, Cp, A_t, h_in, L, grouped = res
    pad = up.shape[1] - L
    dyp = _pad_seq(dy.astype(jnp.float32), pad)
    du, ddt, dB, dC, dA = _scan_bwd_pallas(
        up, dtp, Bp, Cp, A_t, h_in, dyp, interpret=interpret,
        reverse=reverse)
    # grads must match primal dtypes; dB/dC partials are summed in f32
    # across channel blocks first, then rounded once.
    return (du[:, :L], ddt[:, :L], dA if grouped else dA[0],
            dB[:, :L].astype(Bp.dtype), dC[:, :L].astype(Cp.dtype))


_scan_core.defvjp(_fwd_rule, _bwd_rule)
