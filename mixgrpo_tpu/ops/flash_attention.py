"""Pallas TPU flash attention for the MMDiT joint text+image sequence.

TPU-native replacement for the reference's FlashAttention-2 CUDA kernels
(zqqqqz2000/MixGRPO fastvideo/models/flash_attn_no_pad.py:6-37 and the
flash-attn dependency pinned in env_setup.sh:7).  The MMDiT sequence here is
static-shape (512 text + packed image tokens), so there is no varlen
unpad/repad; sequences that are not multiples of the block size are padded
by the wrapper and key-side padding is masked inside the kernel.

Design (per pallas_guide.md):
  - forward: grid (batch*heads, q_blocks, k_blocks), online softmax with
    running max/denominator in VMEM scratch; k iterates innermost so the
    accumulator lives across the k loop; logsumexp is saved for backward.
  - backward: two kernels — dkv (grid over k blocks, scanning q blocks) and
    dq (grid over q blocks, scanning k blocks) — recomputing probabilities
    from the saved logsumexp, the standard flash backward.
  - all matmuls hit the MXU with fp32 accumulation
    (preferred_element_type); probabilities are cast back to the input
    dtype (bf16) for the PV and dV matmuls.

The kernel runs in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128
# The wrapper folds the 1/sqrt(D) softmax scale into q once — an
# elementwise multiply XLA fuses into the projection/RoPE fusion that
# produces q — so every score tile arrives pre-scaled.  This removes
# one full (BQ, BK) f32 VPU traversal per tile from the forward (the
# `* scale`) and two from the backward (that one plus the `ds * scale`)
# at zero cost: with q2 = q*scale and s = q2@k^T,
#   p  = exp(s - m)                      (probabilities unchanged)
#   h  = p*(dp - delta) = dL/ds          (softmax bwd, no scale factor)
#   dk = h^T@q2 == scale*(h^T@q)         (exact — q2 carries the scale)
#   dq2 = h@k; the outer q2 = q*scale multiply's autodiff restores
#   dq = scale*dq2, so the wrapper applies no correction at all.
# A full LOG2-domain variant (fold scale*log2e, exp2 everywhere, which
# would also delete exp's internal *log2e multiply) was measured round 5
# and is ~50x SLOWER: Mosaic lowers jnp.exp2/lax.exp2 through a slow
# path while jnp.exp is the fast hardware route (S=1536 B=2 fwd:
# 11.8 ms exp2 vs 0.415 ms exp(x*ln2) in the same session).  Keep exp.


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def _fwd_kernel(q_ref, k_ref, v_ref, kbias_ref, *out_and_scratch,
                kv_len, block_k, want_lse, has_bias=True, need_kmask=True):
    if want_lse:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = out_and_scratch
    else:
        # primal (no-grad) variant: the rollout/serving forward never uses
        # the logsumexp, and a pallas output cannot be dead-code-eliminated
        # by XLA — not emitting it saves a (B*H, S, 128) f32 HBM write per
        # block application (~1 GB per full-depth forward at 512px)
        o_ref, m_scr, l_scr, acc_scr = out_and_scratch
        lse_ref = None
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[...]  # (BQ, D) — pre-scaled by 1/sqrt(D) (see header note)
    k = k_ref[...]  # (BK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK), pre-scaled scores
    if has_bias:
        s = s + kbias_ref[...]  # (1, BK) additive key mask (0 or NEG_INF)

    # mask key-side padding (kv_len folds flash_attention's static
    # kv_valid prefix count).  Statically ELIDED when every key tile is
    # fully valid (kv_len == padded Sk): the iota+compare+select on the
    # (BQ, BK) f32 score tile is real VPU work — within-session A/B
    # @S=2560 B=2 measured ~5% of the kernel
    # (bench_results/round5/attn_2560_b2_modes.json).
    if need_kmask:
        col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:, :1]  # (BQ, 1)
    l_prev = l_scr[:, :1]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)  # (BQ, BK)
    l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_cur, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_cur, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _():
        l = l_scr[:, :1]
        o_ref[...] = (acc_scr[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[...] = (
                m_scr[:] + jnp.log(jnp.maximum(l_scr[:], 1e-30))
            ).astype(jnp.float32)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, o_ref, kbias_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, kv_len, block_k,
                block_q, q_len, has_bias=True, need_kmask=True,
                need_qmask=True):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[...]  # (BQ, D) — pre-scaled by 1/sqrt(D)
    k = k_ref[...]  # (BK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK), pre-scaled scores
    if has_bias:
        s = s + kbias_ref[...]
    valid = None  # statically elided when every tile is fully valid
    if need_kmask:
        col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = col < kv_len
    if need_qmask:
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        qv = row < q_len
        valid = qv if valid is None else jnp.logical_and(valid, qv)

    lse = lse_ref[...][:, :1]  # (BQ, 1)
    p = jnp.exp(s - lse)  # (BQ, BK)
    if valid is not None:
        p = jnp.where(valid, p, 0.0)

    do = do_ref[...]  # (BQ, D)
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK)
    # delta = rowsum(o * do), computed here from the o residual tile: a
    # bf16 (BQ, D) read replaces the f32 (BQ, 128) broadcast-delta read and
    # retires the separate delta pass entirely (cheap VPU recompute)
    delta = jnp.sum(
        o_ref[...].astype(jnp.float32) * do.astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # (BQ, 1)
    # h = p*(dp - delta); no scale factor here — dk = h^T @ (scale*q)
    # is exactly scale*(h^T @ q) because q arrives pre-scaled (header note)
    ds = p * (dp - delta)
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[...] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[...] = dv_scr[:].astype(dv_ref.dtype)


def _fused_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, o_ref, kbias_ref,
                      dq_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                      kv_len, block_q, q_len, has_bias=True, need_kmask=True,
                      need_qmask=True):
    """Single-pass dq/dk/dv for the full-K case (one K block).

    With the whole key range resident, each q block's dq is complete in
    one visit, so the separate dq kernel — which recomputes the score
    matrix and dp from scratch — collapses into the dkv sweep: 5 matmuls
    (s, dv, dp, dk, dq) instead of 7, and q/do/o/lse tiles stream once
    instead of twice.  Used whenever the full-K tiles + f32 dk/dv scratch
    fit VMEM (every training shape through 720px); longer sequences keep
    the two-kernel path."""
    qi = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[...]  # (BQ, D) — pre-scaled by 1/sqrt(D)
    k = k_ref[...]  # (BK, D) — the full key range
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK), pre-scaled scores
    if has_bias:
        s = s + kbias_ref[...]
    valid = None  # statically elided when every tile is fully valid
    if need_kmask:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = col < kv_len
    if need_qmask:
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        qv = row < q_len
        valid = qv if valid is None else jnp.logical_and(valid, qv)

    lse = lse_ref[...][:, :1]  # (BQ, 1)
    p = jnp.exp(s - lse)  # (BQ, BK)
    if valid is not None:
        p = jnp.where(valid, p, 0.0)

    do = do_ref[...]  # (BQ, D)
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK)
    delta = jnp.sum(
        o_ref[...].astype(jnp.float32) * do.astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # (BQ, 1) — see _dkv_kernel
    ds = p * (dp - delta)  # h = dL/ds; no scale factor (header note)
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[...] = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[...] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[...] = dv_scr[:].astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, o_ref, kbias_ref,
               dq_ref, dq_scr, *, kv_len, block_k, has_bias=True,
               need_kmask=True):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[...]  # pre-scaled by 1/sqrt(D)
    k = k_ref[...]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # pre-scaled scores
    if has_bias:
        s = s + kbias_ref[...]
    lse = lse_ref[...][:, :1]
    p = jnp.exp(s - lse)
    if need_kmask:
        col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        p = jnp.where(col < kv_len, p, 0.0)
    dp = jax.lax.dot_general(
        do_ref[...], v_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jnp.sum(
        o_ref[...].astype(jnp.float32) * do_ref[...].astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # (BQ, 1) — see _dkv_kernel
    ds = p * (dp - delta)  # h = dL/ds; no scale factor (header note)
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[...] = dq_scr[:].astype(dq_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_sizes(block_q, block_k, S, Sk):
    """Clamp requested blocks to the sequence, then align to MXU tiling:
    128-lane multiples on the key block, 16-sublane on the query block.
    An unaligned full-K block (e.g. Sk=2537 at 720px) forces Mosaic
    relayouts on every score tile; rounding up and masking the padded
    keys (col < kv_len below) is strictly cheaper."""
    bq = _round_up(min(block_q, S), 16)
    bk = _round_up(min(block_k, Sk), 128)
    return bq, bk


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _shape_of(x, layout):
    """(B, H, S, D) logical dims of ``x`` under ``layout``."""
    if layout == "bshd":
        B, S, H, D = x.shape
        return B, H, S, D
    B, H, S, D = x.shape
    return B, H, S, D


def _prep(x, layout, Sp):
    """Pad the sequence dim to ``Sp``; flatten trailing/leading head dims.

    bhsd: (B,H,S,D) -> (B*H, Sp, D) — blocks are dense row ranges.
    bshd: (B,S,H,D) -> (B,Sp,H*D) — a free reshape; each head's (bq, D)
    tile is then a lane-aligned COLUMN block at offset h*D (D=128 = one
    lane tile), so the block DMA does the head-split for free and the
    surrounding program needs no (B,S,H*D) -> (B,H,S,D) relayout ops.
    (Mosaic cannot squeeze the sublane-position dim of a 4D (B,S,H,D)
    array — block dims over the last two axes must tile (8, 128) — so
    the head axis is addressed through lane blocking instead.)
    """
    if layout == "bshd":
        B, S, H, D = x.shape
        return _pad_to(x.reshape(B, S, H * D), Sp, 1)
    B, H, S, D = x.shape
    return _pad_to(x.reshape(B * H, S, D), Sp, 1)


def _row_spec(layout, H, rows, D, pick):
    """BlockSpec for a q/k/v/o/do-like operand; ``pick(*grid)`` selects the
    row-block index.  The grid's leading axis is always the fused b*H
    batch-head index; the kernel sees a 2D (rows, D) ref in both layouts
    (leading dim squeezed; bshd picks the head as a lane-block column)."""
    if layout == "bshd":
        return pl.BlockSpec(
            (None, rows, D), lambda *g: (g[0] // H, pick(*g), g[0] % H)
        )
    return pl.BlockSpec((None, rows, D), lambda *g: (g[0], pick(*g), 0))


def _lse_spec(rows, pick):
    return pl.BlockSpec((None, rows, _LANES), lambda *g: (g[0], pick(*g), 0))


def _kbias_spec(H, bk, pick):
    return pl.BlockSpec(
        (None, 1, bk), lambda *g: (g[0] // H, 0, pick(*g))
    )


def _out_struct(layout, B, H, Sp, D, dtype):
    shape = (B, Sp, H * D) if layout == "bshd" else (B * H, Sp, D)
    return jax.ShapeDtypeStruct(shape, dtype)


def _unprep(x, layout, B, H, S, D):
    """Slice off sequence padding and restore the caller's layout."""
    if layout == "bshd":
        return x[:, :S].reshape(B, S, H, D)
    return x[:, :S].reshape(B, H, S, D)


def _fwd_impl(q, k, v, kbias, block_q, block_k, layout,
              kv_valid=None, has_bias=True, want_lse=True):
    B, H, S, D = _shape_of(q, layout)
    Sk = _shape_of(k, layout)[2]
    kv_len = Sk if kv_valid is None else min(kv_valid, Sk)
    bq, bk = _block_sizes(block_q, block_k, S, Sk)
    Sp = pl.cdiv(S, bq) * bq
    Skp = pl.cdiv(Sk, bk) * bk
    qf = _prep(q, layout, Sp)
    kf = _prep(k, layout, Skp)
    vf = _prep(v, layout, Skp)
    # (B, 1, Skp): the per-batch row bias carries an explicit singleton
    # sublane axis (squeezed out by the (None, 1, bk) block spec)
    kb = _pad_to(kbias, Skp, 1)[:, None, :]

    grid = (B * H, Sp // bq, Skp // bk)
    kernel = functools.partial(_fwd_kernel, kv_len=kv_len,
                               block_k=bk, want_lse=want_lse,
                               has_bias=has_bias, need_kmask=kv_len < Skp)
    qpick = lambda b, qi, ki: qi
    kpick = lambda b, qi, ki: ki
    out_specs = [_row_spec(layout, H, bq, D, qpick)]
    out_shape = [_out_struct(layout, B, H, Sp, D, q.dtype)]
    if want_lse:
        out_specs.append(_lse_spec(bq, qpick))
        out_shape.append(
            jax.ShapeDtypeStruct((B * H, Sp, _LANES), jnp.float32)
        )
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _row_spec(layout, H, bq, D, qpick),
            _row_spec(layout, H, bk, D, kpick),
            _row_spec(layout, H, bk, D, kpick),
            _kbias_spec(H, bk, kpick),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, kb)
    o = _unprep(res[0], layout, B, H, S, D)
    return (o, res[1][:, :S]) if want_lse else (o, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, kbias, block_q, block_k, layout, kv_valid,
           has_bias):
    # q arrives pre-scaled by 1/sqrt(D) (see flash_attention / header)
    o, _ = _fwd_impl(q, k, v, kbias, block_q, block_k, layout,
                     kv_valid=kv_valid, has_bias=has_bias, want_lse=False)
    return o


def _flash_fwd(q, k, v, kbias, block_q, block_k, layout, kv_valid,
               has_bias):
    o, lse = _fwd_impl(q, k, v, kbias, block_q, block_k, layout,
                       kv_valid=kv_valid, has_bias=has_bias)
    return o, (q, k, v, kbias, o, lse)


def _flash_bwd(block_q, block_k, layout, kv_valid, has_bias, res, do):
    q, k, v, kbias, o, lse = res
    B, H, S, D = _shape_of(q, layout)
    Sk = _shape_of(k, layout)[2]
    kv_len = Sk if kv_valid is None else min(kv_valid, Sk)
    bq, bk = _block_sizes(block_q, block_k, S, Sk)
    Sp = pl.cdiv(S, bq) * bq
    Skp = pl.cdiv(Sk, bk) * bk

    qf = _prep(q, layout, Sp)
    kf = _prep(k, layout, Skp)
    vf = _prep(v, layout, Skp)
    dof = _prep(do, layout, Sp)
    of = _prep(o, layout, Sp)
    lsef = _pad_to(lse.reshape(B * H, S, _LANES), Sp, 1)
    kb = _pad_to(kbias, Skp, 1)[:, None, :]  # (B, 1, Skp) — see _fwd_impl

    fused_ok = os.environ.get("MIXGRPO_FLASH_FUSED_BWD", "1") != "0"
    if fused_ok and Skp == bk and bq * Skp * 4 <= 6 * 2**20:
        # full-K single block at training shapes: one fused pass computes
        # dq/dk/dv together (see _fused_bwd_kernel)
        fused = functools.partial(
            _fused_bwd_kernel, kv_len=kv_len, block_q=bq,
            q_len=S, has_bias=has_bias, need_kmask=kv_len < Skp,
            need_qmask=S < Sp,
        )
        qpick = lambda b, qi: qi
        kpick = lambda b, qi: 0
        dq, dk, dv = pl.pallas_call(
            fused,
            grid=(B * H, Sp // bq),
            in_specs=[
                _row_spec(layout, H, bq, D, qpick),
                _row_spec(layout, H, bk, D, kpick),
                _row_spec(layout, H, bk, D, kpick),
                _row_spec(layout, H, bq, D, qpick),
                _lse_spec(bq, qpick),
                _row_spec(layout, H, bq, D, qpick),
                _kbias_spec(H, bk, kpick),
            ],
            out_specs=[
                _row_spec(layout, H, bq, D, qpick),
                _row_spec(layout, H, bk, D, kpick),
                _row_spec(layout, H, bk, D, kpick),
            ],
            out_shape=[
                _out_struct(layout, B, H, Sp, D, q.dtype),
                _out_struct(layout, B, H, Skp, D, q.dtype),
                _out_struct(layout, B, H, Skp, D, q.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, D), jnp.float32),
                pltpu.VMEM((bk, D), jnp.float32),
            ],
            interpret=_interpret(),
        )(qf, kf, vf, dof, lsef, of, kb)
        # dq here is d/d(q*scale); the wrapper's pre-scale multiply's
        # autodiff restores dq = scale*dq2.  dk is exact as computed.
        return (
            _unprep(dq, layout, B, H, S, D),
            _unprep(dk, layout, B, H, Sk, D),
            _unprep(dv, layout, B, H, Sk, D),
            jnp.zeros_like(kbias),
        )

    dkv_kernel = functools.partial(
        _dkv_kernel, kv_len=kv_len, block_k=bk, block_q=bq,
        q_len=S, has_bias=has_bias, need_kmask=kv_len < Skp,
        need_qmask=S < Sp,
    )
    qpick_kq = lambda b, ki, qi: qi
    kpick_kq = lambda b, ki, qi: ki
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B * H, Skp // bk, Sp // bq),
        in_specs=[
            _row_spec(layout, H, bq, D, qpick_kq),
            _row_spec(layout, H, bk, D, kpick_kq),
            _row_spec(layout, H, bk, D, kpick_kq),
            _row_spec(layout, H, bq, D, qpick_kq),
            _lse_spec(bq, qpick_kq),
            _row_spec(layout, H, bq, D, qpick_kq),
            _kbias_spec(H, bk, kpick_kq),
        ],
        out_specs=[
            _row_spec(layout, H, bk, D, kpick_kq),
            _row_spec(layout, H, bk, D, kpick_kq),
        ],
        out_shape=[
            _out_struct(layout, B, H, Skp, D, q.dtype),
            _out_struct(layout, B, H, Skp, D, q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, dof, lsef, of, kb)

    dq_kernel = functools.partial(_dq_kernel, kv_len=kv_len,
                                  block_k=bk, has_bias=has_bias,
                                  need_kmask=kv_len < Skp)
    qpick_qk = lambda b, qi, ki: qi
    kpick_qk = lambda b, qi, ki: ki
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B * H, Sp // bq, Skp // bk),
        in_specs=[
            _row_spec(layout, H, bq, D, qpick_qk),
            _row_spec(layout, H, bk, D, kpick_qk),
            _row_spec(layout, H, bk, D, kpick_qk),
            _row_spec(layout, H, bq, D, qpick_qk),
            _lse_spec(bq, qpick_qk),
            _row_spec(layout, H, bq, D, qpick_qk),
            _kbias_spec(H, bk, kpick_qk),
        ],
        out_specs=_row_spec(layout, H, bq, D, qpick_qk),
        out_shape=_out_struct(layout, B, H, Sp, D, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        interpret=_interpret(),
    )(qf, kf, vf, dof, lsef, of, kb)

    return (
        _unprep(dq, layout, B, H, S, D),
        _unprep(dk, layout, B, H, Sk, D),
        _unprep(dv, layout, B, H, Sk, D),
        jnp.zeros_like(kbias),  # mask bias is non-trainable
    )


_flash.defvjp(_flash_fwd, _flash_bwd)


def _auto_block_k(block_q: int, S: int, Sk: int) -> int:
    """Full-K only when the fp32 (block_q, Sk) score tile fits the
    ~16 MB/core VMEM alongside double-buffered K/V tiles.  Budget the
    score tile at <= 10 MB — Sk <= 5120 at block_q=512, which covers
    every supported image size through 1024px (S=4608: measured working
    and 1.2x faster than 1024-chunks at B=4 on-chip,
    bench_results/round3/probe_serve_1024.json; Mosaic subtiles the
    score internally so the naive two-temporaries estimate overshoots).
    Beyond that, 1024-wide chunks."""
    bq_eff = min(block_q, S)
    return Sk if bq_eff * Sk * 4 <= 10 * 2**20 else 1024


def flash_attention(q, k, v, mask=None, block_q=None, block_k=None,
                    layout="bhsd", kv_valid=None):
    """Flash attention over (B, H, S, D) — or (B, S, H, D) with
    ``layout="bshd"``; optional key-side mask.

    ``layout="bshd"`` consumes and produces head-minor (B, S, H, D)
    arrays directly: the kernel's block DMAs gather one head's (rows, D)
    tile as a lane-aligned column block, so the surrounding program needs
    NO (B,S,H*D) -> (B,H,S,D) head-split transposes.  The grid and kernel
    bodies are identical in both layouts.  Measured round 5 (PERF.md):
    kernel-level the strided loads cost ~7% fwd and WIN 34% on the fused
    bwd, but at the full-model level bshd is a small net loss (update
    2.47 vs 2.40 s, rollout 6.74 vs 6.61 s at 512px) — the model keeps
    bhsd as its default and this mode stays env-selectable
    (MIXGRPO_ATTN_LAYOUT=bshd).

    ``mask`` may be None (full bidirectional — the FLUX cached-embedding
    path), a (B, S_k) boolean, or a broadcastable (B, 1, 1, S_k) boolean
    (True = attend); it enters the kernel as an additive 0/-inf row bias
    (HunyuanVideo's padded-text masking, use_attention_mask).  Query-
    dependent masks are not supported.  Key-side *padding* from block
    alignment is masked internally.

    ``kv_valid`` (static int): the first ``kv_valid`` keys are valid and
    the rest masked — the contiguous-prefix special case of ``mask``
    (FLUX's lane-alignment sequence padding, flux_forward
    pad_seq_multiple).  It folds into the kernels' ``col < kv_len``
    alignment comparison: no bias array and no traced mask operand
    entering the rollout scan.  Measured (round 5, within-session A/B
    at S=2560 B=2, bench_results/round5/attn_2560_b2_modes.json) the
    three representations are within ~5%: nomask 1.168 ms / bias-mask
    1.200 / kv_valid 1.223 — kv_valid's value is program hygiene (one
    less operand, static semantics), not kernel speed.  When every key
    tile is fully valid the comparison is statically elided entirely
    (aligned no-mask calls run a pure matmul+softmax kernel).  Mutually
    exclusive with ``mask``.

    ``block_q=None`` = 512 (measured best at every MMDiT shape: LARGER q
    blocks — one 1536-row block at S=1536, 1024 at S=2560 — were tried in
    round 4 and are 15-32% slower; the grid loses pipeline overlap worth
    more than the saved K/V re-streaming).  ``block_k=None``
    auto-selects: a single full-K pass when the fp32 (block_q, S_k)
    score tile fits VMEM (measured 1.3-2x faster than chunked
    online-softmax at MMDiT shapes — no accumulator churn), else
    1024-wide chunks.
    """
    assert layout in ("bhsd", "bshd"), layout
    B, H, S, D = _shape_of(q, layout)
    Sk = _shape_of(k, layout)[2]
    if block_q is None:
        block_q = 512
    if block_k is None:
        block_k = _auto_block_k(block_q, S, Sk)
    if mask is None:
        # no bias add in-kernel (has_bias=False); the zeros array only
        # satisfies the fixed operand list (4 KB/block DMA, dead in VPU)
        kbias = jnp.zeros((B, Sk), jnp.float32)
        has_bias = False
    else:
        assert kv_valid is None, "mask and kv_valid are mutually exclusive"
        m = jnp.asarray(mask)
        if m.ndim == 4:
            assert m.shape[1] == 1 and m.shape[2] == 1, (
                "only key-side masks supported", m.shape)
            m = m[:, 0, 0, :]
        assert m.shape == (B, Sk), (m.shape, (B, Sk))
        kbias = jnp.where(m, 0.0, NEG_INF).astype(jnp.float32)
        has_bias = True
    if kv_valid is not None:
        kv_valid = int(kv_valid)
        assert 0 < kv_valid <= Sk, (kv_valid, Sk)
    # fold the softmax scale into q once; XLA fuses this multiply into
    # q's producer (the qkv projection / RoPE fusion), so it is free and
    # the kernels skip the per-tile (BQ, BK) `* scale` (see header note).
    scale = 1.0 / (q.shape[-1] ** 0.5)
    q = q * jnp.asarray(scale, q.dtype)
    return _flash(q, k, v, kbias, block_q, block_k, layout,
                  kv_valid, has_bias)
