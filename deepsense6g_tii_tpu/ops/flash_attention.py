"""Flash multi-head attention for TPU (Pallas), with in-kernel dropout.

The reference's GPT fusion stack (/root/reference/model2_seq.py:74-110) runs
unmasked self-attention over the fused 962-token sequence and materializes the
(B, heads, 962, 962) attention matrix in f32 *including* an attention-prob
dropout (attn_pdrop=0.1) during training.  At the model's sizes that matrix is
pure HBM traffic (~118 MB per block fwd at B=8) while the matmuls are tiny —
the classic flash-attention regime.

This kernel computes softmax(q kᵀ·scale) v with the standard running-max /
running-sum streaming reduction (O(T·D) HBM traffic, never materializing the
T×T matrix) and a fused backward that recomputes the probability blocks.

Attention-prob dropout cannot be applied outside a flash kernel (it acts on
the normalized probabilities), so it is drawn *inside*, with two
implementations selected by ``dropout_impl``:

- ``"hash"`` — a counter-based murmur3-fmix32 hash: every (row, col)
  element's keep decision is a pure function of (global position, seed), so
  the backward regenerates bit-identical masks with zero residual storage,
  and the same function evaluated in plain jnp
  (:func:`dropout_scale_reference`) gives tests an exact oracle on any
  backend.  Cost: ~11 VPU ops per T² element — measured 40-85% overhead on
  the whole kernel (tools/bench_flash.py), because the kernel is VPU-bound
  on T² elementwise work, not MXU-bound.
- ``"hw"`` — the TPU's hardware PRNG (``pltpu.prng_seed`` /
  ``prng_random_bits``), re-seeded per (bh, q-block, k-block) tile so the
  forward and both backward kernels regenerate identical masks from their
  own grid coordinates.  Same keep probability to 2^-24 resolution as the
  hash path, at ~4 VPU ops per element.  Real-TPU only: the Pallas
  interpreter has no PRNG, so correctness is pinned on the chip by
  :func:`dropout_mask` (a kernel that exports the exact mask the attention
  kernels draw) + the jnp oracle in tools/verify_flash_tpu.py.

The default (``dropout_impl=None``) picks "hw" on a real TPU backend and
"hash" elsewhere.  Either way, following the flash-attention dropout
algebra, the mask (scaled by 1/(1-p)) applies to the un-normalized exp terms
of the accumulator while the softmax denominator accumulates the *undropped*
sums — elementwise mask and the final row division commute.

Layout: q, k, v are (B, heads, T, head_dim).  T is padded to a multiple of
``block`` (default 512 — at the model's BH=32, T≈1k, D=128 sizes this keeps
the sequential grid at 128 steps per layer call instead of 2048 with 128-wide
tiles, where per-step grid overhead would dominate the tiny matmuls).  Padded
key columns are masked to -1e30 *and* their probabilities zeroed in-kernel
(so even an all-padded key block is inert), and padded query rows are garbage
that the wrapper slices off.  Gradients for padded dO rows are zero by
construction.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 512  # q/k tile edge; also sets the sequence padding multiple
_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# counter-based dropout hash (shared by kernels and the jnp test oracle)
# ---------------------------------------------------------------------------

def _uniform_hash(ids: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """murmur3-fmix32 of (element id ^ seed) -> uniform f32 in [0, 1)."""
    x = ids.astype(jnp.uint32) ^ seed.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    # cast through int32: Mosaic has no uint32->f32 lowering, and after the
    # >> 8 the value fits in 24 bits so the detour is exact.
    return (x >> 8).astype(jnp.int32).astype(jnp.float32) * (2.0 ** -24)


def _keep_scale_block(seed, bh, jq, jk, shape, t_pad, dropout_p,
                      impl="hash"):
    """``shape``-sized dropout scale {0, 1/(1-p)} for tile (bh, jq, jk).

    impl="hash": element id = (bh·Tp + row)·Tp + col — position-global, so
    the forward and both backward kernels regenerate identical bits from
    their own grid coordinates/tile sizes.  (Tp is part of the id formula:
    the bit stream is only reproducible for the same padded length, which
    fwd/bwd share.)

    impl="hw": the TPU hardware PRNG, re-seeded per tile with
    (seed, tile_id) where tile_id = (bh·nblk + jq)·nblk + jk — same tile
    coordinates => same bit stream, so the three kernels agree without any
    cross-kernel state.  (Mosaic caps prng_seed at 2 values, hence the
    folded id; nblk = t_pad/block makes it collision-free.)  The keep
    decision compares the top 24 bits against ceil(p·2^24), the exact
    integer form of the hash path's ``u >= p`` on 24-bit uniforms —
    identical keep probability, ~3x fewer VPU ops.  Real-TPU only (no
    interpreter PRNG).
    """
    keep = _keep_block(seed, bh, jq, jk, shape, t_pad, dropout_p, impl)
    return keep.astype(jnp.float32) * (1.0 / (1.0 - dropout_p))


def _keep_block(seed, bh, jq, jk, shape, t_pad, dropout_p, impl):
    """Boolean keep mask for tile (bh, jq, jk) — see :func:`_keep_scale_block`.

    The attention kernels consume the boolean directly (``jnp.where(keep,
    x, 0)``) and fold the 1/(1-p) scale into the much smaller (block, D)
    v / dO tiles — one select per T² element instead of cast+mul+mul.
    """
    if impl == "hw":
        nblk = t_pad // shape[0]
        pltpu.prng_seed(seed, (bh * nblk + jq) * nblk + jk)
        raw = pltpu.prng_random_bits(shape)
        # int32 bitcast + logical shift: Mosaic has no uint32->f32/int32
        # value casts, and after >> 8 the value fits 24 bits (positive).
        bits = jax.lax.shift_right_logical(
            pltpu.bitcast(raw, jnp.int32), 8)
        thresh = int(math.ceil(dropout_p * (1 << 24)))
        return bits >= thresh
    r = jq * shape[0] + jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jk * shape[1] + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    ids = (bh.astype(jnp.uint32) * t_pad + r) * t_pad + c
    u = _uniform_hash(ids, seed)
    return u >= dropout_p


def dropout_scale_reference(seed, n_bh: int, t: int, dropout_p: float,
                            block: int = DEFAULT_BLOCK):
    """Exact jnp replica of the in-kernel dropout mask, (n_bh, t, t).

    ``seed`` is the int32 scalar passed to :func:`flash_mha` internals (see
    :func:`derive_seed`); ``block`` must match the flash_mha call (it sets
    the padded length entering the id formula).  Test oracle only —
    materializes the full matrix.
    """
    t_pad = -(-t // block) * block
    bh = jnp.arange(n_bh, dtype=jnp.uint32)[:, None, None]
    r = jnp.arange(t, dtype=jnp.uint32)[None, :, None]
    c = jnp.arange(t, dtype=jnp.uint32)[None, None, :]
    ids = (bh * t_pad + r) * t_pad + c
    u = _uniform_hash(ids, jnp.asarray(seed))
    return (u >= dropout_p).astype(jnp.float32) / (1.0 - dropout_p)


def derive_seed(rng) -> jnp.ndarray:
    """PRNGKey -> (1,) int32 kernel seed (uniform bits, wrap-converted)."""
    return jax.lax.bitcast_convert_type(
        jax.random.bits(rng, (1,), jnp.uint32), jnp.int32)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, sm_scale, dropout_p, vlen, t_pad,
                block, dropout_impl):
    jk = pl.program_id(2)

    @pl.when(jk == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                           # (BLK, D)
    k = k_ref[0]                                           # (BLK, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    masked = vlen % block != 0
    if masked:
        col = jk * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < vlen, s, _NEG_INF)

    m_prev = jnp.max(m_scr[...], axis=1, keepdims=True)    # (BLK, 1)
    l_prev = jnp.max(l_scr[...], axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                                 # (BLK, BLK) f32
    if masked:
        # exp underflow already zeroes masked cols whenever the block holds
        # at least one valid column; the explicit zero also keeps an
        # all-padded block inert (there m_new == mask value and p == 1).
        p = jnp.where(col < vlen, p, 0.0)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    if dropout_p > 0.0:
        p = p * _keep_scale_block(seed_ref[0], pl.program_id(0),
                                  pl.program_id(1), jk, s.shape, t_pad,
                                  dropout_p, impl=dropout_impl)
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc = acc_scr[...] * alpha + pv
    acc_scr[...] = acc
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(jk == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc / l_new).astype(o_ref.dtype)
        # lane-replicated (block, 128) store: Mosaic requires the last two
        # block dims to be divisible by (8, 128) or equal the array dims, so
        # a flat (1, block) row vector cannot be a TPU output block.
        lse_ref[0] = jnp.broadcast_to(m_new + jnp.log(l_new),
                                      lse_ref[0].shape)


def _mha_fwd_pallas(q, k, v, seed, sm_scale, dropout_p, vlen, block,
                    interpret, dropout_impl):
    bh, t_pad, d = q.shape
    nblk = t_pad // block
    grid = (bh, nblk, nblk)
    kernel = functools.partial(_fwd_kernel, sm_scale=sm_scale,
                               dropout_p=dropout_p, vlen=vlen, t_pad=t_pad,
                               block=block, dropout_impl=dropout_impl)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # seed
            pl.BlockSpec((1, block, d), lambda i, j, kk: (i, j, 0)),  # q
            pl.BlockSpec((1, block, d), lambda i, j, kk: (i, kk, 0)),  # k
            pl.BlockSpec((1, block, d), lambda i, j, kk: (i, kk, 0)),  # v
        ],
        out_specs=[
            pl.BlockSpec((1, block, d), lambda i, j, kk: (i, j, 0)),  # o
            pl.BlockSpec((1, block, 128), lambda i, j, kk: (i, j, 0)),  # lse
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, 128), jnp.float32),  # running max (lane-repl)
            pltpu.VMEM((block, 128), jnp.float32),  # running sum
            pltpu.VMEM((block, d), jnp.float32),    # output accumulator
        ],
        interpret=interpret,
    )(seed, q, k, v)
    return o, lse[:, :, 0]


# ---------------------------------------------------------------------------
# backward kernels (recompute probability blocks from q, k, lse)
# ---------------------------------------------------------------------------

def _p_block(q, k, lse_rows, jk, *, sm_scale, vlen, block):
    """Recomputed probability block P = exp(s·scale − lse) with col mask.

    ``lse_rows`` is the lane-replicated (block, 128) tile; only lane 0 is
    used (all lanes carry the same value)."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    if vlen % block:
        col = jk * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < vlen, s, _NEG_INF)
    return jnp.exp(s - lse_rows[:, :1])


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref,
               dq_ref, dq_scr, *, sm_scale, dropout_p, vlen, t_pad, block,
               dropout_impl):
    jk = pl.program_id(2)

    @pl.when(jk == 0)
    def _():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    p = _p_block(q, k, lse_ref[0], jk, sm_scale=sm_scale, vlen=vlen,
                 block=block)
    v = v_ref[0]
    if dropout_p > 0.0:
        v = v * jnp.asarray(1.0 / (1.0 - dropout_p), v.dtype)
    dpd = jax.lax.dot_general(do_ref[0], v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if dropout_p > 0.0:
        keep = _keep_block(seed_ref[0], pl.program_id(0), pl.program_id(1),
                           jk, p.shape, t_pad, dropout_p, dropout_impl)
        dpd = jnp.where(keep, dpd, 0.0)
    ds = p * (dpd - dvec_ref[0][:, :1]) * sm_scale
    dq_scr[...] = dq_scr[...] + jax.lax.dot_general(
        ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jk == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref,
                dk_ref, dv_ref, dk_scr, dv_scr,
                *, sm_scale, dropout_p, vlen, t_pad, block, dropout_impl):
    jq = pl.program_id(2)
    jk = pl.program_id(1)

    @pl.when(jq == 0)
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    do = do_ref[0]
    p = _p_block(q, k, lse_ref[0], jk, sm_scale=sm_scale, vlen=vlen,
                 block=block)
    if dropout_p > 0.0:
        # fold 1/(1-p) into the (BLK, D) dO and v tiles (see _fwd_kernel);
        # dv = (keep·p)ᵀ (c·dO) and dpd = dO (c·v)ᵀ masked by keep — the
        # same math as scaling the (BLK, BLK) tiles, c x fewer multiplies
        c = jnp.asarray(1.0 / (1.0 - dropout_p), do.dtype)
        keep = _keep_block(seed_ref[0], pl.program_id(0), jq, jk,
                           p.shape, t_pad, dropout_p, dropout_impl)
        pd = jnp.where(keep, p, 0.0)
        dpd = jax.lax.dot_general(do, v_ref[0] * c, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dpd = jnp.where(keep, dpd, 0.0)
        do_for_dv = do * c
    else:
        pd = p
        dpd = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        do_for_dv = do
    dv_scr[...] = dv_scr[...] + jax.lax.dot_general(
        pd.astype(do.dtype), do_for_dv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dpd - dvec_ref[0][:, :1]) * sm_scale
    dk_scr[...] = dk_scr[...] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jq == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _merged_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                       dvec_ref, dq_ref, dk_ref, dv_ref,
                       dqacc_scr, dk_scr, dv_scr,
                       *, sm_scale, dropout_p, vlen, t_pad, block,
                       dropout_impl):
    """Single-pass backward: dq + dk + dv from ONE recompute of each tile.

    The split kernels (:func:`_dq_kernel` / :func:`_dkv_kernel`) each
    recompute s = q·kᵀ, P = exp(s − lse), the dropout mask, dpd and ds for
    every (q-block, k-block) tile — the whole T² recompute runs twice per
    backward.  Here one kernel walks the (bh, k-block, q-block) grid once:
    dk/dv accumulate over the inner q sweep exactly as in `_dkv_kernel`,
    while dq accumulates across the *outer* k iterations in a persistent
    (nblk, block, d) f32 VMEM scratch (TPU grids are sequential, scratch
    survives grid steps), written out on the last k iteration.  Same
    operations in the same order as the split path — numerics identical.
    The dq output tile (i, jq) is also visited (and written back as stale
    garbage) on non-final k iterations; the final visit overwrites it.
    """
    jk = pl.program_id(1)
    jq = pl.program_id(2)

    @pl.when((jk == 0) & (jq == 0))
    def _():
        dqacc_scr[...] = jnp.zeros_like(dqacc_scr)

    @pl.when(jq == 0)
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    do = do_ref[0]
    p = _p_block(q, k, lse_ref[0], jk, sm_scale=sm_scale, vlen=vlen,
                 block=block)
    if dropout_p > 0.0:
        # same factoring as _dkv_kernel: fold 1/(1-p) into the (BLK, D)
        # v / dO tiles, mask the (BLK, BLK) tiles with one select each
        c = jnp.asarray(1.0 / (1.0 - dropout_p), do.dtype)
        keep = _keep_block(seed_ref[0], pl.program_id(0), jq, jk,
                           p.shape, t_pad, dropout_p, dropout_impl)
        pd = jnp.where(keep, p, 0.0)
        dpd = jax.lax.dot_general(do, v_ref[0] * c, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dpd = jnp.where(keep, dpd, 0.0)
        do_for_dv = do * c
    else:
        pd = p
        dpd = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        do_for_dv = do
    dv_scr[...] = dv_scr[...] + jax.lax.dot_general(
        pd.astype(do.dtype), do_for_dv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dpd - dvec_ref[0][:, :1]) * sm_scale
    dk_scr[...] = dk_scr[...] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dqacc_scr[jq] = dqacc_scr[jq] + jax.lax.dot_general(
        ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jk == pl.num_programs(1) - 1)
    def _():
        dq_ref[0] = dqacc_scr[jq].astype(dq_ref.dtype)

    @pl.when(jq == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


# dq accumulator budget for the merged backward: a (t_pad, d) f32 scratch
# must stay a small slice of the ~16 MB VMEM next to the tile buffers.
_MERGED_DQ_BYTES = 4 * 1024 * 1024


def _bwd_mode(t_pad: int, d: int) -> str:
    """DEEPSENSE_FLASH_BWD = auto (default) | merged | split."""
    mode = os.environ.get("DEEPSENSE_FLASH_BWD", "auto")
    if mode not in ("auto", "merged", "split"):
        raise ValueError(f"DEEPSENSE_FLASH_BWD must be auto|merged|split, "
                         f"got {mode!r}")
    if mode != "auto":
        return mode
    return "merged" if t_pad * d * 4 <= _MERGED_DQ_BYTES else "split"


def _mha_bwd_pallas(q, k, v, o, lse, seed, do,
                    sm_scale, dropout_p, vlen, block, interpret,
                    dropout_impl):
    bh, t_pad, d = q.shape
    nblk = t_pad // block
    dvec = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    # lane-replicate the per-row vectors (see _fwd_kernel lse note): TPU
    # blocks cannot have a unit second-to-last dim unless it equals the
    # array dim, so (1, block) tiles of a (bh, t_pad) array don't lower.
    lse = jnp.broadcast_to(lse[..., None], (bh, t_pad, 128))
    dvec = jnp.broadcast_to(dvec[..., None], (bh, t_pad, 128))

    common = dict(sm_scale=sm_scale, dropout_p=dropout_p, vlen=vlen,
                  t_pad=t_pad, block=block, dropout_impl=dropout_impl)
    row_spec = lambda sel: pl.BlockSpec((1, block, d), sel)
    vec_spec = lambda sel: pl.BlockSpec((1, block, 128), sel)

    if _bwd_mode(t_pad, d) == "merged":
        # one (bh, k-block, q-block) sweep produces all three gradients
        dq, dk, dv = pl.pallas_call(
            functools.partial(_merged_bwd_kernel, **common),
            grid=(bh, nblk, nblk),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),               # seed
                row_spec(lambda i, kk, j: (i, j, 0)),                # q
                row_spec(lambda i, kk, j: (i, kk, 0)),               # k
                row_spec(lambda i, kk, j: (i, kk, 0)),               # v
                row_spec(lambda i, kk, j: (i, j, 0)),                # do
                vec_spec(lambda i, kk, j: (i, j, 0)),                # lse
                vec_spec(lambda i, kk, j: (i, j, 0)),                # dvec
            ],
            out_specs=[
                row_spec(lambda i, kk, j: (i, j, 0)),                # dq
                row_spec(lambda i, kk, j: (i, kk, 0)),               # dk
                row_spec(lambda i, kk, j: (i, kk, 0)),               # dv
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
                jax.ShapeDtypeStruct((bh, t_pad, d), k.dtype),
                jax.ShapeDtypeStruct((bh, t_pad, d), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((nblk, block, d), jnp.float32),  # dq accumulator
                pltpu.VMEM((block, d), jnp.float32),
                pltpu.VMEM((block, d), jnp.float32),
            ],
            interpret=interpret,
        )(seed, q, k, v, do, lse, dvec)
        return dq, dk, dv

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid=(bh, nblk, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # seed
            row_spec(lambda i, j, kk: (i, j, 0)),                    # q
            row_spec(lambda i, j, kk: (i, kk, 0)),                   # k
            row_spec(lambda i, j, kk: (i, kk, 0)),                   # v
            row_spec(lambda i, j, kk: (i, j, 0)),                    # do
            vec_spec(lambda i, j, kk: (i, j, 0)),                    # lse
            vec_spec(lambda i, j, kk: (i, j, 0)),                    # dvec
        ],
        out_specs=row_spec(lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block, d), jnp.float32)],
        interpret=interpret,
    )(seed, q, k, v, do, lse, dvec)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        grid=(bh, nblk, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # seed
            row_spec(lambda i, kk, j: (i, j, 0)),                    # q
            row_spec(lambda i, kk, j: (i, kk, 0)),                   # k
            row_spec(lambda i, kk, j: (i, kk, 0)),                   # v
            row_spec(lambda i, kk, j: (i, j, 0)),                    # do
            vec_spec(lambda i, kk, j: (i, j, 0)),                    # lse
            vec_spec(lambda i, kk, j: (i, j, 0)),                    # dvec
        ],
        out_specs=[
            row_spec(lambda i, kk, j: (i, kk, 0)),                   # dk
            row_spec(lambda i, kk, j: (i, kk, 0)),                   # dv
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, d), jnp.float32),
            pltpu.VMEM((block, d), jnp.float32),
        ],
        interpret=interpret,
    )(seed, q, k, v, do, lse, dvec)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom-vjp core + public wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _mha_core(q, k, v, seed, sm_scale, dropout_p, vlen, block, interpret,
              dropout_impl):
    o, _ = _mha_fwd_pallas(q, k, v, seed, sm_scale, dropout_p, vlen, block,
                           interpret, dropout_impl)
    return o


def _mha_fwd_rule(q, k, v, seed, sm_scale, dropout_p, vlen, block,
                  interpret, dropout_impl):
    o, lse = _mha_fwd_pallas(q, k, v, seed, sm_scale, dropout_p, vlen, block,
                             interpret, dropout_impl)
    return o, (q, k, v, o, lse, seed)


def _mha_bwd_rule(sm_scale, dropout_p, vlen, block, interpret,
                  dropout_impl, res, do):
    q, k, v, o, lse, seed = res
    dq, dk, dv = _mha_bwd_pallas(q, k, v, o, lse, seed, do,
                                 sm_scale, dropout_p, vlen, block, interpret,
                                 dropout_impl)
    return dq, dk, dv, np.zeros((1,), dtype=jax.dtypes.float0)


_mha_core.defvjp(_mha_fwd_rule, _mha_bwd_rule)


def resolve_dropout_impl(dropout_impl, interpret) -> str:
    """None -> "hw" on a real (non-interpret) TPU backend, else "hash"."""
    if dropout_impl is None:
        return "hw" if (not interpret
                        and jax.default_backend() == "tpu") else "hash"
    if dropout_impl not in ("hash", "hw"):
        raise ValueError(f"dropout_impl must be 'hash' or 'hw', "
                         f"got {dropout_impl!r}")
    return dropout_impl


def flash_mha(q, k, v, *, sm_scale=None, dropout_p: float = 0.0, rng=None,
              block: int = DEFAULT_BLOCK, interpret=None, dropout_impl=None):
    """Flash attention: softmax(q kᵀ · sm_scale) v, optional prob dropout.

    q, k, v: (B, heads, T, head_dim); any T (padded internally to a multiple
    of ``block``).  ``dropout_p`` > 0 requires ``rng`` (a PRNGKey) and
    applies iid dropout to the normalized attention probabilities — torch
    ``nn.Dropout`` on the attention matrix semantics (model2_seq.py:94-99)
    from an in-kernel PRNG (not the torch RNG stream).
    ``interpret=None`` auto-selects interpreter mode off-TPU (CPU tests);
    ``dropout_impl`` (None | "hash" | "hw") selects the in-kernel PRNG (see
    module docstring) — None picks "hw" on a real TPU, "hash" elsewhere.
    """
    b, h, t, d = q.shape
    if sm_scale is None:
        sm_scale = float(d) ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dropout_impl = resolve_dropout_impl(dropout_impl, interpret)
    t_pad = -(-t // block) * block
    pad = t_pad - t

    def prep(x):
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x.reshape(b * h, t_pad, d)

    if dropout_p > 0.0:
        if rng is None:
            raise ValueError("flash_mha: dropout_p > 0 requires rng")
        seed = derive_seed(rng)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    o = _mha_core(prep(q), prep(k), prep(v), seed, float(sm_scale),
                  float(dropout_p), t, int(block), bool(interpret),
                  dropout_impl)
    return o.reshape(b, h, t_pad, d)[:, :, :t]


# ---------------------------------------------------------------------------
# dropout-mask export (oracle for the "hw" path; sanity tie for "hash")
# ---------------------------------------------------------------------------

def _mask_kernel(seed_ref, m_ref, *, t_pad, block, dropout_p, dropout_impl):
    m_ref[0] = _keep_scale_block(
        seed_ref[0], pl.program_id(0), pl.program_id(1), pl.program_id(2),
        (block, block), t_pad, dropout_p, impl=dropout_impl)


def dropout_mask(seed, n_bh: int, t: int, dropout_p: float,
                 block: int = DEFAULT_BLOCK, dropout_impl="hash",
                 interpret=None):
    """Export the exact (n_bh, t, t) dropout scale the attention kernels draw.

    Runs :func:`_keep_scale_block` — the same code path the fwd/dq/dkv
    kernels call — tile-by-tile over the same (bh, q-block, k-block) grid
    coordinates and seeding.  With impl="hash" this equals
    :func:`dropout_scale_reference` (tested in interpret mode); with
    impl="hw" it is the only way to observe the hardware PRNG stream, making
    it the oracle for on-chip verification (tools/verify_flash_tpu.py).
    Test/verify tool only — materializes the full T×T matrix.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_pad = -(-t // block) * block
    nblk = t_pad // block
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    kernel = functools.partial(_mask_kernel, t_pad=t_pad, block=block,
                               dropout_p=float(dropout_p),
                               dropout_impl=dropout_impl)
    m = pl.pallas_call(
        kernel,
        grid=(n_bh, nblk, nblk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, block, block),
                               lambda i, j, kk: (i, j, kk)),
        out_shape=jax.ShapeDtypeStruct((n_bh, t_pad, t_pad), jnp.float32),
        interpret=interpret,
    )(seed)
    return m[:, :t, :t]
