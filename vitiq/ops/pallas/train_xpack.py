"""Fused TRAINING layer with the CROSS-HEAD PACKED (xpack) attention core.

Round-3 serving work replaced the v3 kernel's 8 serialized per-head
score->exp->PV chains with ONE block-diagonal GEMM chain
(fused_encoder_layer._v3_attention_core_xpack) and measured +13% on the
flagship. This module carries the same structural idea into the TRAINING
kernels (roadmap round-4 lever #1):

* FORWARD: the per-layer train kernel (fused_layer_train._fwd_kernel) with
  its chained `_attention_fwd` replaced by the packed core — K and V are
  scattered into block-diagonal [H*Lp, D] VMEM scratch, then ONE score GEMM
  + ONE wide exp2 + ONE PV GEMM + a narrow ones-matmul denominator replace
  the 8 chains.
* BACKWARD: HYBRID. The forward RECOMPUTE inside the backward kernel (which
  is roughly half the backward's critical path and is the same serialized
  8-chain structure) runs packed; the per-head gradient GEMMs stay per-head.
  Rationale, from the measured MXU pass model (docs/BENCHMARKS.md round-2.5:
  MXU time tracks the ACTUAL N width): a fully packed dK/dV needs
  ds^T @ q_full products that compute all D output lanes but keep only each
  head's d_head slice (~8x redundant MXU work at d_head=16) plus two
  compaction GEMMs of score-GEMM size, while the per-head dk/dv/dq GEMMs
  have NO sequential inter-head dependency for the scheduler to serialize —
  the thing xpack exists to fix. The packed tensors a full-pack backward
  would add (dKp/dVp at [G,H*Lp,D] f32) also cost ~5 MB per unit G, forcing
  G<=2 (docs/ROADMAP.md lever #1).

* COUNTER-BASED DROPOUT: the chained train kernels generate dropout masks
  from the TPU PRNG stream seeded per grid block, which forces forward and
  backward to use the SAME batch-block size G (fused_layer_train._pick_g).
  That coupling is expensive here: the packed backward's VMEM footprint
  wants a smaller G than the packed forward. This module instead derives
  each mask bit from a stateless integer hash of
  (seed, layer, dropout-site, absolute element position) — murmur3-style
  fmix32 — so fwd and bwd recompute identical masks under DIFFERENT grid
  partitions. Same determinism contract as before (masks are a pure
  function of the step seed; parity with the XLA path's threefry stream was
  never a requirement — the reference's torch masks differ too, see
  fused_layer_train.py module docstring).

Reference numerics (post-norm, LN eps=1e-12 biased var, ReLU FFN, dropout
before residual): ViT/models/blocks/encoder_layer.py:18-35,
position_wise_feed_forward.py:12-17 — same contract as fused_layer_train.

Selection: fused_layer_train.fused_train_layer_stack dispatches here when
VITIQ_TRAIN_ATTN=xpack (or auto on eligible geometries once measured).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitiq.ops.pallas._common import pallas_call as _pallas_call
from vitiq.ops.pallas.fused_encoder_layer import _den_expand
from vitiq.ops.pallas.fused_layer_train import (
    _flat_weights,
    _ln_bwd,
    _ln_fwd,
    _round_up,
)

_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _i32(v: int) -> np.int32:
    """Wrap a (possibly >2^31) python constant to a signed int32."""
    return np.uint32(v & 0xFFFFFFFF).astype(np.int32)


# --------------------------------------------------------------------------
# counter-based dropout: mask = f(seed, layer, site, absolute position)
# --------------------------------------------------------------------------


def _hash_mask(shape, rate: float, seed_val, salt: np.int32, batch0):
    """[G, L, W] keep/(1-rate) multiplier from a stateless position hash.

    `batch0` is the absolute batch index of block row 0 (program_id * G),
    so the mask for a given physical element is independent of the grid
    partition — the property that lets fwd and bwd pick different G.
    """
    gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + batch0
    li = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    wi = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    h = (gi * _i32(0x9E3779B1)) ^ (li * _i32(0x85EBCA77)) ^ (wi * _i32(0xC2B2AE3D))
    h = h + (seed_val + salt)
    # murmur3 fmix32 finalizer — full avalanche, so neighbouring positions
    # decorrelate even though the inputs are tiny integers
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * _i32(0x85EBCA6B)
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * _i32(0xC2B2AE35)
    h = h ^ jax.lax.shift_right_logical(h, 16)
    u = jax.lax.bitwise_and(h, np.int32(0x7FFFFFFF))
    thresh = np.int32(int(rate * 2147483648.0))
    keep = (u >= thresh).astype(jnp.float32)
    return keep * (1.0 / (1.0 - rate))


def _site_salt(layer_idx: int, site: int) -> np.int32:
    return _i32((layer_idx * 3 + site) * 0x9E3779B9 + 0x61C88647)


# --------------------------------------------------------------------------
# packed attention (shared by fwd kernel and bwd recompute)
# --------------------------------------------------------------------------


def _xpack_attention(qkv, kp_ref, vp_ref, *, n_head: int, seq_len: int,
                     x_dtype, zero_fill):
    """Cross-head packed attention on a [G, Lp, 3D] qkv block whose q section
    is PRE-SCALED by softmax_scale*log2(e) (folded into W_q at trace time,
    as in the serving stack). Returns (attn bf16, attn32 f32, dens f32).

    Layout identical to fused_encoder_layer._v3_attention_core_xpack: head
    h's keys/values occupy rows [h*Lp,(h+1)*Lp) x lanes [h*dh,(h+1)*dh) of
    the block-diagonal scratches; one score GEMM against the UNSPLIT query
    tile yields every head's scores at once; padded-key masking rides in
    zeroed vp rows + ones_bd rows, never on the score path.
    """
    g, lp, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_head

    @pl.when(zero_fill)
    def _zero():
        # zero ONCE (grid step 0): only the per-head dh-lane blocks are ever
        # written afterwards and TPU scratch persists across the grid
        kp_ref[:] = jnp.zeros_like(kp_ref)
        vp_ref[:] = jnp.zeros_like(vp_ref)

    if seq_len < lp:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, lp, dh), dimension=1)
        vmask = row < seq_len
    else:
        vmask = None
    for h in range(n_head):
        k_h = qkv[:, :, d + h * dh:d + (h + 1) * dh]
        v_h = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        if vmask is not None:
            v_h = jnp.where(vmask, v_h, 0)
        kp_ref[:, h * lp:(h + 1) * lp, h * dh:(h + 1) * dh] = k_h
        vp_ref[:, h * lp:(h + 1) * lp, h * dh:(h + 1) * dh] = v_h

    scores = jax.lax.dot_general(
        qkv[:, :, :d], kp_ref[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, Lp, H*Lp]
    probs = jnp.exp2(scores).astype(x_dtype)
    nums = jax.lax.dot_general(
        probs, vp_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, Lp, D]
    r_i = jax.lax.broadcasted_iota(jnp.int32, (n_head * lp, n_head), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (n_head * lp, n_head), 1)
    ones_bd = ((r_i // lp == c_i) & (r_i % lp < seq_len)).astype(x_dtype)
    dens = jax.lax.dot_general(
        probs, ones_bd,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G, Lp, H]
    den_exp = _den_expand(dens, x_dtype, n_head, dh, d)
    attn32 = nums / den_exp
    return attn32.astype(x_dtype), attn32, dens


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------


def _fwd_kernel_x(
    seed_ref, x_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref, be1_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    y_ref, kp_s, vp_s,
    *, seq_len: int, n_head: int, drop: float, layer_idx: int, block_g: int,
):
    g, lp, d = x_ref.shape
    x = x_ref[:]
    batch0 = pl.program_id(0) * np.int32(block_g)
    seed = seed_ref[0]

    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]
    qkv = qkv.astype(x.dtype)

    attn, _, _ = _xpack_attention(
        qkv, kp_s, vp_s, n_head=n_head, seq_len=seq_len, x_dtype=x.dtype,
        zero_fill=pl.program_id(0) == 0)

    a = jax.lax.dot_general(
        attn, wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    if drop > 0.0:
        a = a * _hash_mask(a.shape, drop, seed, _site_salt(layer_idx, 0),
                           batch0)
    z1 = a + x.astype(jnp.float32)
    x1, _, _ = _ln_fwd(z1, g1_ref[:], be1_ref[:], x.dtype)

    pre = jax.lax.dot_general(
        x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    h = jnp.maximum(pre, 0.0)
    if drop > 0.0:
        h = h * _hash_mask(h.shape, drop, seed, _site_salt(layer_idx, 1),
                           batch0)
    h = h.astype(x.dtype)
    f = jax.lax.dot_general(
        h, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    if drop > 0.0:
        f = f * _hash_mask(f.shape, drop, seed, _site_salt(layer_idx, 2),
                           batch0)
    z2 = f + x1.astype(jnp.float32)
    y, _, _ = _ln_fwd(z2, g2_ref[:], be2_ref[:], y_ref.dtype)
    y_ref[:] = y


def _bwd_kernel_x(
    seed_ref, x_ref, dy_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref, be1_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dg1_ref, dbe1_ref,
    dw1_ref, db1_ref, dw2_ref, db2_ref, dg2_ref, dbe2_ref,
    swqkv, sbqkv, swo, sbo, sg1, sbe1, sw1, sb1, sw2, sb2, sg2, sbe2,
    kp_s, vp_s,
    *, seq_len: int, n_head: int, drop: float, layer_idx: int, block_g: int,
):
    g, lp, d = x_ref.shape
    dh = d // n_head
    x = x_ref[:]
    dy = dy_ref[:].astype(jnp.float32)
    batch0 = pl.program_id(0) * np.int32(block_g)
    seed = seed_ref[0]

    # ---------------- recompute forward (packed attention) -----------------
    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]
    qkv = qkv.astype(x.dtype)

    attn, attn32, dens = _xpack_attention(
        qkv, kp_s, vp_s, n_head=n_head, seq_len=seq_len, x_dtype=x.dtype,
        zero_fill=pl.program_id(0) == 0)

    a = jax.lax.dot_general(
        attn, wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    if drop > 0.0:
        m1 = _hash_mask(a.shape, drop, seed, _site_salt(layer_idx, 0), batch0)
        a = a * m1
    z1 = a + x.astype(jnp.float32)
    x1, xh1, r1 = _ln_fwd(z1, g1_ref[:], be1_ref[:], x.dtype)

    pre = jax.lax.dot_general(
        x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    h = jnp.maximum(pre, 0.0)
    if drop > 0.0:
        m2 = _hash_mask(h.shape, drop, seed, _site_salt(layer_idx, 1), batch0)
        h = h * m2
    h = h.astype(x.dtype)
    f = jax.lax.dot_general(
        h, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    if drop > 0.0:
        m3 = _hash_mask(f.shape, drop, seed, _site_salt(layer_idx, 2), batch0)
        f = f * m3
    z2 = f + x1.astype(jnp.float32)
    _, xh2, r2 = _ln_fwd(z2, g2_ref[:], be2_ref[:], x.dtype)

    first = pl.program_id(0) == 0
    last = pl.program_id(0) == pl.num_programs(0) - 1
    _scratch = {id(dwqkv_ref): swqkv, id(dbqkv_ref): sbqkv, id(dwo_ref): swo,
                id(dbo_ref): sbo, id(dg1_ref): sg1, id(dbe1_ref): sbe1,
                id(dw1_ref): sw1, id(db1_ref): sb1, id(dw2_ref): sw2,
                id(db2_ref): sb2, id(dg2_ref): sg2, id(dbe2_ref): sbe2}

    def emit(ref, val):
        acc = _scratch[id(ref)]

        @pl.when(first)
        def _():
            acc[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            acc[:] = acc[:] + val

        @pl.when(last)
        def _():
            ref[:] = acc[:]

    # ---------------- backward (LN2 / FFN / LN1 / projection) --------------
    emit(dg2_ref, jnp.sum(dy * xh2, axis=(0, 1), keepdims=False)[None, :])
    emit(dbe2_ref, jnp.sum(dy, axis=(0, 1))[None, :])
    dz2 = _ln_bwd(dy, xh2, r2, g2_ref[:])

    df = dz2 * m3 if drop > 0.0 else dz2
    dx1 = dz2

    dfb = df.astype(x.dtype)
    emit(dw2_ref, jnp.sum(jax.lax.dot_general(
        h, dfb, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32), axis=0))
    emit(db2_ref, jnp.sum(df, axis=(0, 1))[None, :])
    dhd = jax.lax.dot_general(
        dfb, w2_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh_ = dhd * m2 if drop > 0.0 else dhd
    dpre = jnp.where(pre > 0.0, dh_, 0.0)

    dpreb = dpre.astype(x.dtype)
    emit(dw1_ref, jnp.sum(jax.lax.dot_general(
        x1, dpreb, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32), axis=0))
    emit(db1_ref, jnp.sum(dpre, axis=(0, 1))[None, :])
    dx1 = dx1 + jax.lax.dot_general(
        dpreb, w1_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    emit(dg1_ref, jnp.sum(dx1 * xh1, axis=(0, 1))[None, :])
    emit(dbe1_ref, jnp.sum(dx1, axis=(0, 1))[None, :])
    dz1 = _ln_bwd(dx1, xh1, r1, g1_ref[:])

    da = dz1 * m1 if drop > 0.0 else dz1
    dx = dz1

    dab = da.astype(x.dtype)
    emit(dwo_ref, jnp.sum(jax.lax.dot_general(
        attn, dab, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32), axis=0))
    emit(dbo_ref, jnp.sum(da, axis=(0, 1))[None, :])
    dattn = jax.lax.dot_general(
        dab, wo_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)

    # ---------------- attention backward: per-head GEMMs -------------------
    # Residuals come from the PACKED recompute (qkv lane slices, dens
    # columns, attn32 lane slices) instead of per-head chained recompute
    # state; the gradient GEMMs themselves are per-head and mutually
    # independent — the scheduler can overlap them freely, unlike the
    # fwd's chained score->exp->PV dependency.
    if seq_len < lp:
        rowm = jax.lax.broadcasted_iota(jnp.int32, (g, lp, 2 * d), dimension=1)
        kv = jnp.where(rowm < seq_len, qkv[:, :, d:], 0)
    else:
        kv = qkv[:, :, d:]
    dq_heads, dk_heads, dv_heads = [], [], []
    for hd_i in range(n_head):
        qs = qkv[:, :, hd_i * dh:(hd_i + 1) * dh]  # pre-scaled q
        k = kv[:, :, hd_i * dh:(hd_i + 1) * dh]
        v = kv[:, :, d + hd_i * dh:d + (hd_i + 1) * dh]
        denom = dens[:, :, hd_i:hd_i + 1]
        out = attn32[:, :, hd_i * dh:(hd_i + 1) * dh]
        dout = dattn[:, :, hd_i * dh:(hd_i + 1) * dh].astype(jnp.float32)
        drow = jnp.sum(dout * out, axis=-1, keepdims=True)
        dq_acc = None
        dk_cols = []
        dv_cols = []
        for c0 in range(0, lp, 128):
            t = min(128, lp - c0)
            scores = jax.lax.dot_general(
                qs, k[:, c0:c0 + t, :],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            pbar = (jnp.exp2(scores) / denom).astype(x.dtype)
            dv_cols.append(jax.lax.dot_general(
                pbar, dout.astype(x.dtype),
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ))
            dp = jax.lax.dot_general(
                dout.astype(x.dtype), v[:, c0:c0 + t, :],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            ds = (pbar.astype(jnp.float32) * (dp - drow)).astype(x.dtype)
            dq_part = jax.lax.dot_general(
                ds, k[:, c0:c0 + t, :],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dq_acc = dq_part if dq_acc is None else dq_acc + dq_part
            dk_cols.append(jax.lax.dot_general(
                ds, qs, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ))
        # q carries scale2 via the FOLDED W_q (trace-time fold, like the
        # serving stack), so dq here is w.r.t. the SCALED q and only the
        # base-2 softmax's ln2 factor remains; autodiff through the fold in
        # _flat_weights_scaled routes the scale onto dW_q automatically.
        dq_heads.append(dq_acc * _LN2)
        dk_heads.append(jnp.concatenate(dk_cols, axis=1) * _LN2)
        dv_heads.append(jnp.concatenate(dv_cols, axis=1))

    dqkv = jnp.concatenate(dq_heads + dk_heads + dv_heads, axis=-1)
    if seq_len < lp:
        rowq = jax.lax.broadcasted_iota(jnp.int32, (g, lp, 3 * d), dimension=1)
        dqkv = jnp.where(rowq < seq_len, dqkv, 0.0)

    dqkvb = dqkv.astype(x.dtype)
    emit(dwqkv_ref, jnp.sum(jax.lax.dot_general(
        x, dqkvb, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32), axis=0))
    emit(dbqkv_ref, jnp.sum(dqkv, axis=(0, 1))[None, :])
    dx = dx + jax.lax.dot_general(
        dqkvb, wqkv_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)


# --------------------------------------------------------------------------
# host wrappers
# --------------------------------------------------------------------------


def _pick_g_fwd_x(Lp: int, D: int, ffn_h: int, n_head: int,
                  itemsize: int) -> int:
    """VMEM-fitting G for the packed train forward — serving xpack picker
    terms plus the FFN pre-activation f32. Returns 0 when even G=1 cannot
    fit (caller falls back to the chained module)."""
    for g in (8, 4, 2, 1):
        x_like = g * Lp * D
        vmem = (
            2 * 2 * x_like * itemsize
            + 3 * x_like * itemsize
            + 2 * g * n_head * Lp * D * itemsize       # kp + vp
            + g * Lp * n_head * Lp * (4 + itemsize)    # scores f32 + probs
            + x_like * 4                               # nums f32
            + g * Lp * n_head * 4                      # dens
            + 2 * g * Lp * ffn_h * itemsize            # ffn hidden
            + g * Lp * ffn_h * 4                       # pre f32
            + 3 * x_like * 4                           # LN temps / residuals
        )
        if vmem <= 10 * 1024 * 1024:
            return g
    return 0


def _pick_g_bwd_x(Lp: int, D: int, ffn_h: int, n_head: int,
                  itemsize: int) -> int:
    """Backward block size: chained-backward footprint (recompute + grad
    temporaries, the x3 multiplier from fused_layer_train._pick_g) PLUS the
    packed recompute's kp/vp/scores/probs (single-instance, x1.5 for
    double-buffer headroom)."""
    t = min(128, Lp)
    for g in (8, 4, 2, 1):
        x_like = g * Lp * D
        base = 3 * (
            4 * x_like * itemsize
            + 3 * x_like * itemsize
            + g * Lp * t * (4 + itemsize)
            + 2 * g * Lp * ffn_h * itemsize
            + 3 * x_like * 4
        )
        packed = 1.5 * (
            2 * g * n_head * Lp * D * itemsize
            + g * Lp * n_head * Lp * (4 + itemsize)
        )
        if base + packed <= 10 * 1024 * 1024:
            return g
    return 0


def _flat_weights_scaled(layer_params, dtype, n_head: int):
    """fused_layer_train._flat_weights with softmax_scale*log2(e) folded into
    the q columns (constants folded by XLA at trace time; autodiff through
    this fold routes the scale onto dW_q/db_q automatically)."""
    flat = list(_flat_weights(layer_params, dtype))
    wqkv, bqkv = flat[0], flat[1]
    d = wqkv.shape[0]
    scale = _LOG2E / ((d // n_head) ** 0.5)
    wq = (wqkv[:, :d].astype(jnp.float32) * scale).astype(dtype)
    bq = bqkv[:d] * scale
    flat[0] = jnp.concatenate([wq, wqkv[:, d:]], axis=1)
    flat[1] = jnp.concatenate([bq, bqkv[d:]])
    return tuple(flat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_train_layer_x(n_head, drop, layer_idx, seq_len, seed, x, *weights):
    y, _ = _fused_train_layer_x_fwd(n_head, drop, layer_idx, seq_len, seed,
                                    x, *weights)
    return y


def _geom(x, weights):
    B, L, D = x.shape
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    ffn_h = weights[6].shape[1]
    return B, L, D, Lp, ffn_h


def _run_fwd_x(n_head, drop, layer_idx, seq_len, seed, x, weights):
    B, L, D, Lp, ffn_h = _geom(x, weights)
    G = (int(os.environ.get("VITIQ_TXP_GF", "0"))
         or _pick_g_fwd_x(Lp, D, ffn_h, n_head, x.dtype.itemsize))
    if G == 0:
        raise ValueError("train-xpack fwd does not fit VMEM at G=1; "
                         "use the chained fused_train_layer_stack")
    Bp = _round_up(B, G)
    xp = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))

    data_block = pl.BlockSpec((G, Lp, D), lambda i, s: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    def rep(shape):
        return pl.BlockSpec(shape, lambda i, s: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_fwd_kernel_x, seq_len=seq_len, n_head=n_head,
                               drop=drop, layer_idx=layer_idx, block_g=G)
    y = _pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // G,),
            in_specs=[data_block] + [rep(w.shape) for w in weights],
            out_specs=data_block,
            scratch_shapes=[pltpu.VMEM((G, n_head * Lp, D), x.dtype),
                            pltpu.VMEM((G, n_head * Lp, D), x.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype),
    )(jnp.asarray([seed], jnp.int32), xp, *weights)
    return y[:B, :L, :]


def _fused_train_layer_x_fwd(n_head, drop, layer_idx, seq_len, seed, x,
                             *weights):
    y = _run_fwd_x(n_head, drop, layer_idx, seq_len, seed, x, weights)
    return y, (seed, x, weights)


def _fused_train_layer_x_bwd(n_head, drop, layer_idx, seq_len, res, dy):
    seed, x, weights = res
    B, L, D, Lp, ffn_h = _geom(x, weights)
    G = (int(os.environ.get("VITIQ_TXP_GB", "0"))
         or _pick_g_bwd_x(Lp, D, ffn_h, n_head, x.dtype.itemsize))
    if G == 0:
        raise ValueError("train-xpack bwd does not fit VMEM at G=1; "
                         "use the chained fused_train_layer_stack")
    Bp = _round_up(B, G)
    xp = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))
    dyp = jnp.pad(dy.astype(x.dtype), ((0, Bp - B), (0, Lp - L), (0, 0)))

    data_block = pl.BlockSpec((G, Lp, D), lambda i, s: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    def rep(shape):
        return pl.BlockSpec(shape, lambda i, s: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    def w2d(w):
        return w.shape if w.ndim == 2 else (1, w.shape[0])

    out_shapes = [jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype)] + [
        jax.ShapeDtypeStruct(w2d(w), jnp.float32) for w in weights]
    out_specs = [data_block] + [rep(w2d(w)) for w in weights]

    kernel = functools.partial(_bwd_kernel_x, seq_len=seq_len, n_head=n_head,
                               drop=drop, layer_idx=layer_idx, block_g=G)
    outs = _pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // G,),
            in_specs=[data_block, data_block] + [rep(w.shape) for w in weights],
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM(w2d(w), jnp.float32) for w in weights]
            + [pltpu.VMEM((G, n_head * Lp, D), x.dtype),
               pltpu.VMEM((G, n_head * Lp, D), x.dtype)],
        ),
        out_shape=out_shapes,
    )(jnp.asarray([seed], jnp.int32), xp, dyp, *weights)

    dx = outs[0][:B, :L, :]
    dws = []
    for w, dw in zip(weights, outs[1:]):
        dw = dw if w.ndim == 2 else dw[0]
        dws.append(dw.astype(w.dtype))
    dseed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return (dseed, dx, *dws)


_fused_train_layer_x.defvjp(_fused_train_layer_x_fwd, _fused_train_layer_x_bwd)


def xpack_train_supported(L: int, D: int, ffn_h: int, n_head: int,
                          itemsize: int = 2) -> bool:
    """True when BOTH packed passes fit VMEM for this geometry."""
    Lp = _round_up(L, 16 if itemsize == 2 else 8)
    return (_pick_g_fwd_x(Lp, D, ffn_h, n_head, itemsize) > 0
            and _pick_g_bwd_x(Lp, D, ffn_h, n_head, itemsize) > 0)


def fused_train_layer_stack_xpack(
    x: jnp.ndarray,
    layer_params_list,
    n_head: int,
    drop_prob: float,
    seed,
    seq_len: Optional[int] = None,
) -> jnp.ndarray:
    """Differentiable fused-layer stack for training, xpack attention core.

    Drop-in for fused_layer_train.fused_train_layer_stack (same signature,
    same reference numerics, same determinism contract); the dropout mask
    STREAM differs (counter-based hash vs TPU PRNG) — both are deterministic
    functions of `seed` and neither matches the XLA path's threefry masks.
    """
    B, L, D = x.shape
    seq_len = L if seq_len is None else seq_len
    seed = jnp.asarray(seed, jnp.int32)
    for i, lp_ in enumerate(layer_params_list):
        flat = _flat_weights_scaled(lp_, x.dtype, n_head)
        x = _fused_train_layer_x(n_head, float(drop_prob), i, seq_len, seed,
                                 x, *flat)
    return x
