"""Fused encoder layer for TRAINING: Pallas forward + Pallas backward.

Round-1/2 measurements (docs/BENCHMARKS.md): the unfused XLA train path costs
425 ms @ batch 2048 on the flagship, of which ~331 ms is backward — the
backward re-materializes every activation through HBM and recomputes
attention unfused. This module gives the training step the same treatment the
serving path got, then the round-3 train campaign (docs/BENCHMARKS.md rounds
3t-3am) rebuilt both passes around the measured ~317 ns/op serialization tax:

* FORWARD: one Pallas kernel per layer with the reference's three dropout
  sites (ref: ViT/models/blocks/encoder_layer.py:18-35,
  position_wise_feed_forward.py:12-17) generated IN-KERNEL with the TPU PRNG.
  Two attention cores: the chained per-head v3 structure, and (default in
  its regime) the serving kernel's CROSS-HEAD PACKED core
  (_fwd_kernel_stash_xpack — one block-diagonal GEMM chain).
* RESIDUALS, two modes: STASH (auto at Lp<=64, d<=128) — the forward emits
  [attn|xh1|xh2|pbar]+[r1|r2] so the backward skips the attention/LN/FFN2
  recompute and its freed VMEM climbs the measured G ladders (G=40/16/8 at
  Lp<=16/32/64); RECOMPUTE elsewhere — the backward re-runs the forward
  flash-style (no [B,H,L,L] tensor; dropout masks regenerated
  bit-identically from the same PRNG stream).
* BACKWARD: one Pallas kernel per layer producing dx plus all 12 weight
  gradients (f32 accumulators across the sequential grid; merged-contraction
  dW at small Lp). The attention backward runs FULL-PRODUCT + WIDE by
  default in both residual modes: dV/dK merge into one
  [G, gh*t, gh*dh] product per (tile, head-group) whose diagonal blocks are
  the per-head gradients, and the softmax backward runs as one block-matmul
  drow + hi/lo lane expansion + one wide ds chain per tile
  (_attention_bwd_fullprod; VITIQ_TRAIN_ATTNBWD=chain restores the per-head
  chains).

Gradient notes:
  - softmax runs in base 2 (exp2); d scores picks up the ln2 factor, which
    combined with the folded log2(e) collapses back to the plain 1/sqrt(dh)
    scale.
  - the softmax-backward row term uses the flash identity
    sum_j dp_ij p_ij = dout_i . out_i, so only [*, dh]-sized tensors are
    reduced.
  - padded key/query handling: K and V rows >= seq_len are zeroed in both
    passes, so phantom probability columns contribute nothing to any
    surviving gradient; dqkv rows >= seq_len are masked before the weight
    reductions.

Dropout mask stream: TPU-PRNG (per (seed, layer, grid block)), deterministic
given the step seed but intentionally NOT the XLA path's threefry stream —
mask parity across implementations is not a requirement (the reference's
torch masks differ too).
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

LN_EPS = 1e-12
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


from vitiq.ops.pallas._common import (  # noqa: E402
    generic_interpret as _generic_interpret,
    pallas_call as _pallas_call,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln_fwd(z, gamma, beta, out_dtype):
    z32 = z.astype(jnp.float32)
    mu = jnp.mean(z32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z32 - mu), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + LN_EPS)
    xh = (z32 - mu) * r
    return (gamma * xh + beta).astype(out_dtype), xh, r


def _ln_bwd(dy, xh, r, gamma):
    """dz for y = gamma*xh + beta with xh = (z - mu)*rsqrt(var+eps)."""
    dyg = dy.astype(jnp.float32) * gamma
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xh, axis=-1, keepdims=True)
    return r * (dyg - m1 - xh * m2)


def _dropout_mask(shape, rate: float):
    """keep/(1-rate) multiplier from the in-kernel PRNG stream (consumes one
    prng_random_bits call — fwd and bwd must make these calls in the same
    order)."""
    bits = pltpu.prng_random_bits(shape)  # int32
    # uniform in [0, 2^31): drop iff bits < rate * 2^31 (sign bit cleared)
    u = jax.lax.bitwise_and(bits, np.int32(0x7FFFFFFF))
    thresh = np.int32(int(rate * 2147483648.0))
    keep = (u >= thresh).astype(jnp.float32)
    return keep * (1.0 / (1.0 - rate))


def _key_split(lp: int, seq_len: int):
    """(mxu_k, n_tail): keys [0, mxu_k) go through 128-wide MXU score tiles;
    the n_tail real keys at [mxu_k, seq_len) become packed cross-head
    corrections. Default OFF (VITIQ_TRAIN_TAIL=1 to enable): the serving-side
    A/B measured the remainder tile FREE on v5e (MXU cost tracks actual N
    width, not ceil(N/128)) and every replacement a net loss — see
    fused_encoder_layer.fused_encoder_layer_v3_stack. Kept gated + tested."""
    if os.environ.get("VITIQ_TRAIN_TAIL", "0") != "1":
        return lp, 0
    mxu_k = (lp // 128) * 128
    if mxu_k >= 128 and mxu_k <= seq_len and (seq_len - mxu_k) <= 8:
        return mxu_k, seq_len - mxu_k
    return lp, 0


def _stash_supported(lp: int, seq_len: int, n_head: int) -> bool:
    """Geometries the stash fwd/bwd pair (VITIQ_TRAIN_STASH) can serve:
    no tail mode (the packed tail corrections aren't stashed) and a
    packed-probs stash narrow enough to stay a sane lane count (flagship
    Lp=144 x H8 = 1152 lanes bf16 = 36 KB/frame is the largest served)."""
    mxu_k, n_tail = _key_split(lp, seq_len)
    return n_tail == 0 and n_head * lp <= 1280


def _stash_enabled(lp: int, seq_len: int, n_head: int, d: int,
                   batch: int | None = None) -> bool:
    """Rounds 3y-3ad on-chip A/Bs (docs/BENCHMARKS.md): the stash backward
    wins at Lp=16 (+13% with the G=40 rung it unlocks), Lp=32 (+24.3% with
    G=16) and Lp=64 (+30% with G=8); the round-3 'NEUTRAL at Lp=80' verdict
    was a per-call-fetch-tax artifact (CLAUDE.md round 3t-3w) — the round-4
    AMORTIZED ladder measured +14%/+11.6% at Lp=80 batch 2048/8192 (rawIQ
    flagship, /tmp/r4_ladder.jsonl -> docs/BENCHMARKS.md round-4), so the
    auto gate now includes it. Still off at Lp=144 (vit: −22%, the 36
    KB/frame probs stash outgrows the recompute it saves) and gated to
    d<=128: the stash residuals are HBM-resident per LAYER (the d256/L9
    arm at Lp=64 batch 8192 measured a 16.17 GB HBM OOM — ~164
    KB/frame/layer of stashes — where the recompute backward fits)."""
    env = os.environ.get("VITIQ_TRAIN_STASH", "auto")
    if env == "0" or not _stash_supported(lp, seq_len, n_head):
        return False
    if env == "1":
        return True
    if d <= 128:
        return lp <= 80
    # d=256 (rawiq_best family): the stash is HBM-capacity-gated, not a
    # loss — the round-4 batch-matched chip A/B measured +13.7% at Lp=64
    # batch 4096 (24.28K vs 21.30K at the same G=4 rung) while batch 8192
    # HBM-OOMs (round 3: 16.17 GB; ~327 KB/frame/layer of stashes x 9
    # layers). auto = on where the measured fit holds; callers that don't
    # know the batch (batch=None) stay conservative.
    return (batch is not None and batch <= 4096
            and lp <= 64 and d <= 256)


def _dwpack_mode(lp: int, seq_len: int, n_head: int, d: int) -> str:
    """VITIQ_TRAIN_DWPACK: merge the D-wide dW contractions into one full
    product per grid step (see the _bwd_kernel pack block). Returns one of
    '0' (four separate dW GEMMs), 'p1' ([x|attn|x1] pack, dw2 separate) or
    'full' (dw2 folded in too; +2.6 MB f32 accumulator). auto = '0': the
    pack MEASURED NEGATIVE on chip (round 3as) — its f32 accumulator costs
    a stash-G rung (p1 OOMs G=40 by 1.39 MB; at G=36/32 seg-64 mp runs
    33.74/32.32 ms vs 29.46 baseline, and vit_tiny p1 is neutral at its
    rung), so the ~5 us/GEMM dW serialization saving never pays for the
    grid-amortization loss. Env-forceable for probes; CI keeps all three
    modes gradient-correct."""
    env = os.environ.get("VITIQ_TRAIN_DWPACK", "auto")
    if env in ("0", "p1", "full"):
        return env
    return "0"


def _rcore_xpack(which: str, lp: int, seq_len: int, n_head: int,
                 d: int) -> bool:
    """VITIQ_TRAIN_RFWD / VITIQ_TRAIN_RBWD ∈ {auto, chain, xpack}: the
    attention core used in the RECOMPUTE train regime (the big-Lp shapes
    the stash gate excludes) — 'which' is 'RFWD' (the forward kernel) or
    'RBWD' (the backward's recompute). The round-3av decomposition priced
    the vit flagship train fwd at ~142 ms vs the serving xpack forward's
    ~62 ms on the same shape/batch, so the serialization the serving core
    removed at Lp>=96 is still being paid twice per train step here.
    Structural eligibility: no tail mode, block-diagonal lanes sane
    (n_head*Lp <= 1280, the _stash_supported bound), and for RBWD the
    fullprod gradient loop (it consumes the packed core's residual tiles;
    the legacy chain loop re-runs its own score matmuls). auto = chain
    until the round-3aw chip ladder certifies a default."""
    env = os.environ.get(f"VITIQ_TRAIN_{which}", "auto")
    structural = (_key_split(lp, seq_len) == (lp, 0)
                  and n_head * lp <= 1280)
    if which == "RBWD":
        structural = (structural and os.environ.get(
            "VITIQ_TRAIN_ATTNBWD", "fullprod") == "fullprod")
    if env == "xpack":
        return structural
    return False  # auto stays chain until the round-3aw chip ladder


def _attention_fwd(qkv, n_head, seq_len, scale2, x_dtype, want_residuals=False,
                   force_probs=False, packed_scratch=None):
    """Shared fwd attention (v3 structure) on a [G, Lp, 3D] qkv block.

    Returns attn [G, Lp, D] (normalized, heads packed); with want_residuals,
    also per-head (out, denom) lists for the backward.

    packed_scratch=(kp_s, vp_s) selects the CROSS-HEAD PACKED core
    (round 3aw — the recompute-regime port of the serving/stash xpack
    mechanism): K/V are scattered into block-diagonal [H*Lp, D] scratches
    (zeroed once per call), then ONE score GEMM + one exp2 + one PV GEMM +
    one ones-block denominator GEMM replace the H serialized per-head
    score->exp->PV chains. Pass count is identical (dh<=128 pads to the
    same MXU pass either way) — the win is de-serialization, the mechanism
    that bought serving +21% at exactly the big-Lp shapes (Lp>=96) where
    the recompute train regime lives. K is masked at padded keys like the
    chain (probs there = exp2(0) = 1), so the residual tuples handed to
    the gradient loop are numerically chain-identical. Requires no tail
    mode (n_tail == 0)."""
    g, lp, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_head

    if packed_scratch is not None:
        kp_s, vp_s = packed_scratch

        @pl.when(pl.program_id(0) == 0)
        def _zero():
            kp_s[:] = jnp.zeros_like(kp_s)
            vp_s[:] = jnp.zeros_like(vp_s)

        if seq_len < lp:
            row = jax.lax.broadcasted_iota(jnp.int32, (g, lp, dh), dimension=1)
            kv_mask = row < seq_len
        else:
            kv_mask = None
        kvs = []
        for h in range(n_head):
            k_h = qkv[:, :, d + h * dh:d + (h + 1) * dh]
            v_h = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
            if kv_mask is not None:
                k_h = jnp.where(kv_mask, k_h, 0)
                v_h = jnp.where(kv_mask, v_h, 0)
            kp_s[:, h * lp:(h + 1) * lp, h * dh:(h + 1) * dh] = k_h
            vp_s[:, h * lp:(h + 1) * lp, h * dh:(h + 1) * dh] = v_h
            kvs.append((k_h, v_h))

        qs_full = (qkv[:, :, :d].astype(jnp.float32) * scale2).astype(x_dtype)
        scores = jax.lax.dot_general(
            qs_full, kp_s[:],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, Lq, H*Lp]
        probs = jnp.exp2(scores).astype(x_dtype)
        nums = jax.lax.dot_general(
            probs, vp_s[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, Lq, D]
        r_i = jax.lax.broadcasted_iota(jnp.int32, (n_head * lp, n_head), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (n_head * lp, n_head), 1)
        ones_bd = ((r_i // lp == c_i) & (r_i % lp < seq_len)).astype(x_dtype)
        dens = jax.lax.dot_general(
            probs, ones_bd,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, Lq, H] f32

        from vitiq.ops.pallas.fused_encoder_layer import _den_expand

        attn32 = nums / _den_expand(dens, x_dtype, n_head, dh, d)
        attn = attn32.astype(x_dtype)
        if not want_residuals:
            return attn, None
        heads = []
        for h in range(n_head):
            qs_h = qs_full[:, :, h * dh:(h + 1) * dh]
            k_h, v_h = kvs[h]
            tiles = [probs[:, :, h * lp + c0:h * lp + min(c0 + 128, lp)]
                     for c0 in range(0, lp, 128)]
            heads.append((qs_h, k_h, v_h, dens[:, :, h:h + 1],
                          attn32[:, :, h * dh:(h + 1) * dh], tiles))
        return attn, heads

    mxu_k, n_tail = _key_split(lp, seq_len)
    lane = jax.lax.broadcasted_iota(jnp.int32, (g, lp, dh), dimension=2)
    if seq_len < lp and n_tail == 0:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, lp, dh), dimension=1)
        ones_block = jnp.where((lane == 0) & (row < seq_len), 1.0, 0.0)
        kv_mask = row < seq_len
    else:
        # tail mode: MXU tiles cover only real keys and the tail loop skips
        # padded keys entirely — no masking op needed anywhere
        ones_block = jnp.where(lane == 0, 1.0, 0.0)
        kv_mask = None
    ones_block = ones_block.astype(x_dtype)

    # VITIQ_TRAIN_PB=reuse: keep each head's unnormalized probability tiles
    # (bf16) from this recompute and let the backward's gradient loop use
    # them directly (pbar = probs * 1/denom) instead of re-running the score
    # matmul + exp per tile.
    keep_probs = want_residuals and (
        force_probs
        or os.environ.get("VITIQ_TRAIN_PB", "recompute") == "reuse")

    accs, qkvs, probs_all = [], [], []
    for h in range(n_head):
        q = qkv[:, :, h * dh:(h + 1) * dh]
        k = qkv[:, :, d + h * dh:d + (h + 1) * dh]
        v = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        if kv_mask is not None:
            k = jnp.where(kv_mask, k, 0)
            v = jnp.where(kv_mask, v, 0)
        qs = (q.astype(jnp.float32) * scale2).astype(x_dtype)
        vaug = jnp.concatenate([v, ones_block], axis=-1)
        acc = None
        probs_tiles = []
        for c0 in range(0, mxu_k, 128):
            t = min(128, mxu_k - c0)
            scores = jax.lax.dot_general(
                qs, k[:, c0:c0 + t, :],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            probs = jnp.exp2(scores).astype(x_dtype)
            if keep_probs:
                probs_tiles.append(probs)
            part = jax.lax.dot_general(
                probs, vaug[:, c0:c0 + t, :],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        accs.append(acc)
        qkvs.append((qs, k, v))
        probs_all.append(probs_tiles if keep_probs else None)

    corr = pacc = None
    if n_tail:
        # Packed cross-head tail (wide ops only — narrow per-head VPU
        # broadcasts lower catastrophically in Mosaic; see
        # fused_encoder_layer._v3_attention_core for the measured A/B)
        li = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 0)
        hi = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 1)
        blk = (li // dh == hi).astype(x_dtype)  # [D, H] block-diag ones
        ones_col = jnp.ones((g, lp, 1), x_dtype)

        def expand_row(rowvec):  # [G, 1, D] -> [G, Lp, D] (f32); Mosaic
            # rejects sublane-broadcasting a row, so expand via a K=1 matmul
            return jax.lax.dot_general(
                ones_col, rowvec,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        q_all_s = (qkv[:, :, :d].astype(jnp.float32) * scale2).astype(x_dtype)
        for j in range(n_tail):
            r = mxu_k + j
            k_row = qkv[:, r:r + 1, d:2 * d]
            v_row = qkv[:, r:r + 1, 2 * d:3 * d]
            prod = q_all_s * expand_row(k_row).astype(x_dtype)  # [G, Lp, D]
            s_all = jax.lax.dot_general(
                prod, blk, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [G, Lp, H]
            p_all = jnp.exp2(s_all)
            p_exp = jax.lax.dot_general(
                p_all.astype(x_dtype), blk,
                dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [G, Lp, D]
            c = p_exp * expand_row(v_row)
            corr = c if corr is None else corr + c
            pacc = p_all if pacc is None else pacc + p_all

    outs_u, denoms = [], []
    for h in range(n_head):
        acc = accs[h]
        out_u = acc[:, :, :dh]
        denom = acc[:, :, dh:dh + 1]
        if n_tail:
            out_u = out_u + corr[:, :, h * dh:(h + 1) * dh]
            denom = denom + pacc[:, :, h:h + 1]
        outs_u.append(out_u)
        denoms.append(denom)

    # measured on chip (batch 2048): wide 53.2/150.1 ms fwd/step vs head
    # 56.1/157.3 — the serving kernel's wide-divide win carries over
    if os.environ.get("VITIQ_TRAIN_EPI", "wide") == "wide":
        # ONE wide [G,Lp,D] divide instead of 8 narrow per-head ones —
        # the serving kernel's measured win (docs/BENCHMARKS.md round-2.6):
        # denominators expanded onto head lanes via the shared constant
        # block-diag matmul helper (f32-accurate hi/lo split).
        from vitiq.ops.pallas.fused_encoder_layer import _den_expand

        dens = jnp.concatenate(denoms, axis=-1)  # [G, Lp, H] f32
        den_exp = _den_expand(dens, x_dtype, n_head, dh, d)
        attn32 = jnp.concatenate(outs_u, axis=-1) / den_exp  # [G, Lp, D]
        attn = attn32.astype(x_dtype)
        if not want_residuals:
            return attn, None
        heads = [(qkvs[h][0], qkvs[h][1], qkvs[h][2], denoms[h],
                  attn32[:, :, h * dh:(h + 1) * dh], probs_all[h])
                 for h in range(n_head)]
        return attn, heads

    outs = []
    heads = []
    for h in range(n_head):
        out = outs_u[h] / denoms[h]
        outs.append(out.astype(x_dtype))
        if want_residuals:
            qs, k, v = qkvs[h]
            heads.append((qs, k, v, denoms[h], out, probs_all[h]))
    attn = jnp.concatenate(outs, axis=-1)
    return (attn, heads) if want_residuals else (attn, None)


def _fwd_kernel(
    seed_ref, x_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref, be1_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    y_ref, *scratch,
    seq_len: int, n_head: int, drop: float, layer_idx: int,
):
    g, lp, d = x_ref.shape
    scale2 = _LOG2E / ((d // n_head) ** 0.5)
    x = x_ref[:]

    if os.environ.get("VITIQ_TRAIN_PROBE") == "kernoff":
        # TIMING-ONLY (wrong outputs): the layer reduces to a copy so the
        # step measurement bounds the out-of-kernel cost
        y_ref[:] = x
        return

    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]
    qkv = qkv.astype(x.dtype)

    # scratch = (kp_s, vp_s) selects the packed cross-head core (round 3aw)
    attn, _ = _attention_fwd(qkv, n_head, seq_len, scale2, x.dtype,
                             packed_scratch=scratch if scratch else None)

    a = jax.lax.dot_general(
        attn, wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]

    if drop > 0.0:
        # prng_seed supports at most 2 seed words (Mosaic: 'Setting seed
        # with more than 2 values is not supported') — fold the layer
        # index into the first word
        pltpu.prng_seed(seed_ref[0] + np.int32((layer_idx * 0x1E3779B9) & 0x7FFFFFFF),
                        pl.program_id(0))
        a = a * _dropout_mask(a.shape, drop)
    z1 = a + x.astype(jnp.float32)
    x1, _, _ = _ln_fwd(z1, g1_ref[:], be1_ref[:], x.dtype)

    pre = jax.lax.dot_general(
        x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    h = jnp.maximum(pre, 0.0)
    if drop > 0.0:
        h = h * _dropout_mask(h.shape, drop)
    h = h.astype(x.dtype)
    f = jax.lax.dot_general(
        h, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    if drop > 0.0:
        f = f * _dropout_mask(f.shape, drop)
    z2 = f + x1.astype(jnp.float32)
    y, _, _ = _ln_fwd(z2, g2_ref[:], be2_ref[:], y_ref.dtype)
    y_ref[:] = y


def _fwd_kernel_stash(
    seed_ref, x_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref, be1_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    y_ref, sb_ref, sf_ref,
    *, seq_len: int, n_head: int, drop: float, layer_idx: int,
):
    """Forward that additionally EMITS the backward's recompute products
    (VITIQ_TRAIN_STASH=1): sb = [attn | xh1 | xh2 | pbar(all heads)] in the
    compute dtype and sf = [r1 | r2 | pad] f32, blocked like the data. The
    stash backward then skips the attention/LN/FFN2 recompute entirely and
    runs its gradient loop directly on the PRE-normalized probability tiles
    (round-3x measured the PB=reuse normalization neutral, so folding rcp
    into the stash costs nothing). Round-3w context: the recompute is
    ~10.9 ms of the 54.1 ms seg-64 mp step."""
    g, lp, d = x_ref.shape
    dh = d // n_head
    scale2 = _LOG2E / (dh ** 0.5)
    x = x_ref[:]

    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]
    qkv = qkv.astype(x.dtype)

    attn, heads = _attention_fwd(qkv, n_head, seq_len, scale2, x.dtype,
                                 want_residuals=True, force_probs=True)

    a = jax.lax.dot_general(
        attn, wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    if drop > 0.0:
        pltpu.prng_seed(
            seed_ref[0] + np.int32((layer_idx * 0x1E3779B9) & 0x7FFFFFFF),
            pl.program_id(0))
        a = a * _dropout_mask(a.shape, drop)
    z1 = a + x.astype(jnp.float32)
    x1, xh1, r1 = _ln_fwd(z1, g1_ref[:], be1_ref[:], x.dtype)

    pre = jax.lax.dot_general(
        x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    h = jnp.maximum(pre, 0.0)
    if drop > 0.0:
        h = h * _dropout_mask(h.shape, drop)
    h = h.astype(x.dtype)
    f = jax.lax.dot_general(
        h, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    if drop > 0.0:
        f = f * _dropout_mask(f.shape, drop)
    z2 = f + x1.astype(jnp.float32)
    y, xh2, r2 = _ln_fwd(z2, g2_ref[:], be2_ref[:], y_ref.dtype)
    y_ref[:] = y

    if os.environ.get("VITIQ_TRAIN_PROBE") == "nostash":
        # TIMING-ONLY (breaks the backward): skip the stash normalization,
        # packing and writes to bound the stash-emission share of the
        # forward kernel (y still depends on the full compute)
        return

    from vitiq.ops.pallas.fused_encoder_layer import _den_expand

    # concat every head's unnormalized probability tiles (head-major, tile
    # order within each head) and normalize once on the packed head*key
    # lanes (f32-accurate hi/lo denominator expansion)
    probs_cat = jnp.concatenate([t for hd in heads for t in hd[5]], axis=-1)
    dens = jnp.concatenate([hd[3] for hd in heads], axis=-1)  # [G,Lp,H] f32
    den_exp = _den_expand(dens, x.dtype, n_head, lp, n_head * lp)
    pbar = (probs_cat.astype(jnp.float32) / den_exp).astype(x.dtype)
    sb_ref[:] = jnp.concatenate(
        [attn, xh1.astype(x.dtype), xh2.astype(x.dtype), pbar], axis=-1)
    sf_ref[:] = jnp.concatenate(
        [r1, r2, jnp.zeros((g, lp, 6), jnp.float32)], axis=-1)


def _fwd_kernel_stash_xpack(
    seed_ref, x_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref, be1_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    y_ref, sb_ref, sf_ref,
    kp_s, vp_s,
    *, seq_len: int, n_head: int, drop: float, layer_idx: int,
):
    """Stash forward with the serving kernel's CROSS-HEAD PACKED attention
    core (fused_encoder_layer._v3_attention_core_xpack structure): K/V
    scattered into block-diagonal [H*Lp, D] scratches once per grid step
    (zeroed once per call — off-block lanes are never dirtied), then ONE
    score GEMM + one exp2 + one PV GEMM + one ones-block denominator GEMM
    replace the H serialized per-head chains. The packed probs tensor
    [G, Lq, H*Lk] is EXACTLY the stash's pbar layout, so the stash
    emission's per-head concat disappears too. q is scaled in-kernel (one
    wide VPU op) instead of the serving path's host-side W_q folding.
    Padded keys: vp rows + ones_bd rows are zeroed, so attn and dens are
    exact; pbar's padded columns carry junk-but-finite values that the
    backward annihilates (zeroed k/v + dqkv row mask), same as the chain
    stash's probs=1 columns."""
    g, lp, d = x_ref.shape
    dh = d // n_head
    scale2 = _LOG2E / (dh ** 0.5)
    x = x_ref[:]

    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]
    qkv = qkv.astype(x.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        kp_s[:] = jnp.zeros_like(kp_s)
        vp_s[:] = jnp.zeros_like(vp_s)

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
        kp_s[:, h * lp:(h + 1) * lp, h * dh:(h + 1) * dh] = k_h
        vp_s[:, h * lp:(h + 1) * lp, h * dh:(h + 1) * dh] = v_h

    qs_full = (qkv[:, :, :d].astype(jnp.float32) * scale2).astype(x.dtype)
    scores = jax.lax.dot_general(
        qs_full, kp_s[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, Lq, H*Lp]
    probs = jnp.exp2(scores).astype(x.dtype)
    nums = jax.lax.dot_general(
        probs, vp_s[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, Lq, D]
    r_i = jax.lax.broadcasted_iota(jnp.int32, (n_head * lp, n_head), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (n_head * lp, n_head), 1)
    ones_bd = ((r_i // lp == c_i) & (r_i % lp < seq_len)).astype(x.dtype)
    dens = jax.lax.dot_general(
        probs, ones_bd,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G, Lq, H]

    from vitiq.ops.pallas.fused_encoder_layer import _den_expand

    attn = (nums / _den_expand(dens, x.dtype, n_head, dh, d)).astype(x.dtype)

    a = jax.lax.dot_general(
        attn, wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    if drop > 0.0:
        pltpu.prng_seed(
            seed_ref[0] + np.int32((layer_idx * 0x1E3779B9) & 0x7FFFFFFF),
            pl.program_id(0))
        a = a * _dropout_mask(a.shape, drop)
    z1 = a + x.astype(jnp.float32)
    x1, xh1, r1 = _ln_fwd(z1, g1_ref[:], be1_ref[:], x.dtype)

    pre = jax.lax.dot_general(
        x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    h = jnp.maximum(pre, 0.0)
    if drop > 0.0:
        h = h * _dropout_mask(h.shape, drop)
    h = h.astype(x.dtype)
    f = jax.lax.dot_general(
        h, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    if drop > 0.0:
        f = f * _dropout_mask(f.shape, drop)
    z2 = f + x1.astype(jnp.float32)
    y, xh2, r2 = _ln_fwd(z2, g2_ref[:], be2_ref[:], y_ref.dtype)
    y_ref[:] = y

    if os.environ.get("VITIQ_TRAIN_PROBE") == "nostash":
        return
    pbar = (probs.astype(jnp.float32)
            / _den_expand(dens, x.dtype, n_head, lp, n_head * lp)
            ).astype(x.dtype)
    sb_ref[:] = jnp.concatenate(
        [attn, xh1.astype(x.dtype), xh2.astype(x.dtype), pbar], axis=-1)
    sf_ref[:] = jnp.concatenate(
        [r1, r2, jnp.zeros((g, lp, 6), jnp.float32)], axis=-1)


def _bwd_kernel(
    seed_ref, x_ref, dy_ref, *rest,
    seq_len: int, n_head: int, drop: float, layer_idx: int,
    stash: bool = False, fpa_blk: bool = False, dwpack: str = "0",
    rbwd: bool = False,
):
    if stash:
        sb_ref, sf_ref, *rest = rest
    else:
        sb_ref = sf_ref = None
    if rbwd:  # packed-recompute K/V scratches are appended last of all
        *rest, kp_x, vp_x = rest
    else:
        kp_x = vp_x = None
    if dwpack != "0":  # pack scratch is appended after blk_s
        *rest, pack_s = rest
    else:
        pack_s = None
    if fpa_blk:
        *rest, blk_s = rest
    else:
        blk_s = None
    (wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref, be1_ref,
     w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
     dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dg1_ref, dbe1_ref,
     dw1_ref, db1_ref, dw2_ref, db2_ref, dg2_ref, dbe2_ref,
     # persistent VMEM scratch accumulators, one per weight grad (sequential
     # grid; output refs with constant index maps are NOT safe to
     # read-modify-write across grid steps on hardware — double buffering)
     swqkv, sbqkv, swo, sbo, sg1, sbe1, sw1, sb1, sw2, sb2, sg2, sbe2,
     ) = rest
    g, lp, d = x_ref.shape
    dh = d // n_head
    hwidth = w1_ref.shape[1]
    scale2 = _LOG2E / (dh ** 0.5)
    x = x_ref[:]
    dy = dy_ref[:].astype(jnp.float32)

    # TIMING-ONLY surgery probes (wrong outputs; VITIQ_TRAIN_PROBE) — the
    # train-path analogue of serving's VITIQ_V3_PROBE, for attributing the
    # backward's execution wall (docs/BENCHMARKS.md rounds 3o/3t: small-Lp
    # training runs at ~7% of its pass ceiling):
    #   fwdonly   — recompute only; dx := dy, grads zero-filled once
    #               (bounds the recompute share of the backward)
    #   noattnbwd — skip the per-head attention backward chains
    #   nodw      — zeros instead of the four dW GEMMs (bias sums stay)
    #   noacc     — grads written only at the last grid step (skips the
    #               cross-step read-add-write accumulator traffic)
    #   norecomp  — skip the recompute; full backward chain runs on
    #               shape-correct stand-ins derived from x (bounds the
    #               recompute cost from the other side)
    #   kernoff   — both kernels reduce to copies + one zero grad emit;
    #               bounds the OUT-of-kernel step cost (embed, head, loss,
    #               AdamW, launches, padding)
    probe = os.environ.get("VITIQ_TRAIN_PROBE") or None

    first = pl.program_id(0) == 0
    last = pl.program_id(0) == pl.num_programs(0) - 1
    _scratch = {id(dwqkv_ref): swqkv, id(dbqkv_ref): sbqkv, id(dwo_ref): swo,
                id(dbo_ref): sbo, id(dg1_ref): sg1, id(dbe1_ref): sbe1,
                id(dw1_ref): sw1, id(db1_ref): sb1, id(dw2_ref): sw2,
                id(db2_ref): sb2, id(dg2_ref): sg2, id(dbe2_ref): sbe2}

    def emit(ref, val):
        acc = _scratch[id(ref)]

        if probe == "noacc":
            # TIMING-ONLY: write once at the last step, no cross-step
            # read-add-write (val is still computed every step)
            @pl.when(last)
            def _():
                acc[:] = val
                ref[:] = acc[:]

            return

        @pl.when(first)
        def _():
            acc[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            acc[:] = acc[:] + val

        @pl.when(last)
        def _():
            ref[:] = acc[:]

    if probe == "kernoff":
        # direct ref writes (not emit): under dwpack the packed weights'
        # per-ref scratches are (1,1) dummies, so emit() would shape-clash
        @pl.when(last)
        def _():
            for ref in (dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dg1_ref,
                        dbe1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                        dg2_ref, dbe2_ref):
                ref[:] = jnp.zeros(ref.shape, jnp.float32)

        dx_ref[:] = dy.astype(dx_ref.dtype)
        return

    if probe == "norecomp":
        # TIMING-ONLY (wrong outputs): fabricate every recompute product
        # from x — data-dependent, so neither Mosaic nor XLA can fold the
        # downstream backward away — and run the full backward chain.
        x32 = x.astype(jnp.float32)
        reps = (hwidth + d - 1) // d
        wide32 = jnp.concatenate([x32] * reps, axis=-1)[:, :, :hwidth]
        qkv = jnp.concatenate([x, x, x], axis=-1)
        attn = x
        pos_col = jnp.abs(x32[:, :, :1]) + 1.0
        heads = []
        for hh in range(n_head):
            sl = x[:, :, hh * dh:(hh + 1) * dh]
            heads.append((sl, sl, sl, pos_col + 1.0,
                          sl.astype(jnp.float32), None))
        m1 = m2 = m3 = jnp.float32(1.0)
        x1 = x
        xh1 = x32
        r1 = pos_col
        pre = wide32
        h = jnp.maximum(wide32, 0.0).astype(x.dtype)
        xh2 = x32
        r2 = pos_col
        _run_recompute = False
    elif stash:
        # ---- stash mode: rebuild the backward's inputs from the forward's
        # stashes + two cheap GEMMs (qkv, FFN1); dropout masks are
        # regenerated from the same PRNG stream in the same call order ----
        sb = sb_ref[:]
        attn = sb[:, :, :d]
        xh1 = sb[:, :, d:2 * d].astype(jnp.float32)
        xh2 = sb[:, :, 2 * d:3 * d].astype(jnp.float32)
        pbar_all = sb[:, :, 3 * d:3 * d + n_head * lp]
        sf = sf_ref[:]
        r1 = sf[:, :, 0:1]
        r2 = sf[:, :, 1:2]

        qkv = jax.lax.dot_general(
            x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[:]
        qkv = qkv.astype(x.dtype)
        kv_mask = None
        if seq_len < lp:
            kv_mask = jax.lax.broadcasted_iota(
                jnp.int32, (g, lp, dh), dimension=1) < seq_len
        heads = []
        for hh in range(n_head):
            q = qkv[:, :, hh * dh:(hh + 1) * dh]
            k = qkv[:, :, d + hh * dh:d + (hh + 1) * dh]
            v = qkv[:, :, 2 * d + hh * dh:2 * d + (hh + 1) * dh]
            if kv_mask is not None:
                k = jnp.where(kv_mask, k, 0)
                v = jnp.where(kv_mask, v, 0)
            qs = (q.astype(jnp.float32) * scale2).astype(x.dtype)
            out = attn[:, :, hh * dh:(hh + 1) * dh].astype(jnp.float32)
            # denom=None: the stashed tiles are PRE-normalized pbar; re-cut
            # this head's lanes into the 128-wide tile list the gradient
            # loop walks (one entry per score tile; n_tail==0 so mxu_k==lp)
            heads.append((qs, k, v, None, out,
                          [pbar_all[:, :,
                                    hh * lp + c0:hh * lp + min(c0 + 128, lp)]
                           for c0 in range(0, lp, 128)]))
        if drop > 0.0:
            pltpu.prng_seed(
                seed_ref[0] + np.int32((layer_idx * 0x1E3779B9) & 0x7FFFFFFF),
                pl.program_id(0))
            m1 = _dropout_mask((g, lp, d), drop)
        x1 = (xh1 * g1_ref[:] + be1_ref[:]).astype(x.dtype)
        pre = jax.lax.dot_general(
            x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:]
        h = jnp.maximum(pre, 0.0)
        if drop > 0.0:
            m2 = _dropout_mask(h.shape, drop)
            h = h * m2
        h = h.astype(x.dtype)
        if drop > 0.0:
            m3 = _dropout_mask((g, lp, d), drop)
        _run_recompute = False
    else:
        _run_recompute = True

    # the full-product/wide attention backward applies in BOTH residual
    # modes: stash (pre-normalized pbar tiles) and recompute (force the
    # recompute to keep its unnormalized tiles + denominators) — round 3al
    use_fullprod = (
        probe not in ("noattnbwd", "norecomp")  # norecomp fabricates
        # heads without probability tiles
        and _key_split(lp, seq_len)[1] == 0
        and os.environ.get("VITIQ_TRAIN_ATTNBWD", "fullprod") == "fullprod")

    if _run_recompute:
        # ------------- recompute forward (same PRNG call order) -----------
        qkv = jax.lax.dot_general(
            x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[:]
        qkv = qkv.astype(x.dtype)

        attn, heads = _attention_fwd(
            qkv, n_head, seq_len, scale2, x.dtype,
            want_residuals=True, force_probs=use_fullprod,
            packed_scratch=(kp_x, vp_x) if rbwd else None)

        a = jax.lax.dot_general(
            attn, wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[:]
        if drop > 0.0:
            # prng_seed supports at most 2 seed words (Mosaic: 'Setting seed
            # with more than 2 values is not supported') — fold the layer
            # index into the first word
            pltpu.prng_seed(
                seed_ref[0] + np.int32((layer_idx * 0x1E3779B9) & 0x7FFFFFFF),
                pl.program_id(0))
            m1 = _dropout_mask(a.shape, drop)
            a = a * m1
        z1 = a + x.astype(jnp.float32)
        x1, xh1, r1 = _ln_fwd(z1, g1_ref[:], be1_ref[:], x.dtype)

        pre = jax.lax.dot_general(
            x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:]
        h = jnp.maximum(pre, 0.0)
        if drop > 0.0:
            m2 = _dropout_mask(h.shape, drop)
            h = h * m2
        h = h.astype(x.dtype)
        f = jax.lax.dot_general(
            h, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[:]
        if drop > 0.0:
            m3 = _dropout_mask(f.shape, drop)
            f = f * m3
        z2 = f + x1.astype(jnp.float32)
        _, xh2, r2 = _ln_fwd(z2, g2_ref[:], be2_ref[:], x.dtype)

    _dw_env = os.environ.get("VITIQ_TRAIN_DW", "auto")
    dw_merge = _dw_env == "merged" or (_dw_env == "auto" and lp <= 32)

    def dw_gemm(act, grad):
        """Weight gradient act^T @ grad summed over the G block.

        merged: collapse the block to [G*Lp, .] and contract ONCE
        — the 128-deep MXU pass pad on the token contraction amortizes
        across the whole block instead of repeating per frame
        (scripts/train_roofline.py: at seg-64/Lp=16 the four dW GEMMs are
        68.5%% of ALL step passes and each pays an 8x K pad; merging lifts
        the step ceiling 268K -> 669K fps). Identical math: same rows, f32
        accumulation, just reassociated.

        Round-3m on-chip A/B (batch 2048): merged 47,382 vs batched 42,812
        frames/s at seg-64 mean-pool (Lp=16, +10.7%); flagship (Lp=144)
        13,908 vs 14,016 (-0.8%, within noise) — so the default is
        geometry-aware: merged when Lp <= 32 (the small-Lp regime where
        the K pad dominates), batched otherwise. VITIQ_TRAIN_DW=merged/
        batched forces either.
        """
        if probe == "nodw":
            # TIMING-ONLY: bound the dW GEMM cost
            return jnp.zeros((act.shape[-1], grad.shape[-1]), jnp.float32)
        if dw_merge:
            a2 = act.reshape(g * lp, act.shape[-1])
            g2 = grad.reshape(g * lp, grad.shape[-1])
            return jax.lax.dot_general(
                a2, g2, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jnp.sum(jax.lax.dot_general(
            act, grad, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32), axis=0)

    if probe == "fwdonly":
        # TIMING-ONLY: the recompute ran; skip the whole backward (zero
        # grads, dx := dy) to bound the recompute's share of this kernel.
        # Direct ref writes (not emit): see the kernoff note above.
        @pl.when(last)
        def _():
            for ref in (dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dg1_ref,
                        dbe1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                        dg2_ref, dbe2_ref):
                ref[:] = jnp.zeros(ref.shape, jnp.float32)
        # xh2 transitively depends on the ENTIRE recompute chain — adding it
        # keeps the recompute alive against dead-code elimination
        dx_ref[:] = (dy + xh2).astype(dx_ref.dtype)
        return

    # ---------------- backward --------------------------------------------
    # LN2
    emit(dg2_ref, jnp.sum(dy * xh2, axis=(0, 1), keepdims=False)[None, :])
    emit(dbe2_ref, jnp.sum(dy, axis=(0, 1))[None, :])
    dz2 = _ln_bwd(dy, xh2, r2, g2_ref[:])

    df = dz2 * m3 if drop > 0.0 else dz2
    dx1 = dz2  # residual branch

    # FFN linear2
    dfb = df.astype(x.dtype)
    if dwpack != "full":
        emit(dw2_ref, dw_gemm(h, dfb))
    emit(db2_ref, jnp.sum(df, axis=(0, 1))[None, :])
    dhd = jax.lax.dot_general(
        dfb, w2_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh_ = dhd * m2 if drop > 0.0 else dhd
    dpre = jnp.where(pre > 0.0, dh_, 0.0)

    dpreb = dpre.astype(x.dtype)
    if dwpack == "0":
        emit(dw1_ref, dw_gemm(x1, dpreb))
    emit(db1_ref, jnp.sum(dpre, axis=(0, 1))[None, :])
    dx1 = dx1 + jax.lax.dot_general(
        dpreb, w1_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # LN1
    emit(dg1_ref, jnp.sum(dx1 * xh1, axis=(0, 1))[None, :])
    emit(dbe1_ref, jnp.sum(dx1, axis=(0, 1))[None, :])
    dz1 = _ln_bwd(dx1, xh1, r1, g1_ref[:])

    da = dz1 * m1 if drop > 0.0 else dz1
    dx = dz1  # residual branch

    # output projection
    dab = da.astype(x.dtype)
    if dwpack == "0":
        emit(dwo_ref, dw_gemm(attn, dab))
    emit(dbo_ref, jnp.sum(da, axis=(0, 1))[None, :])
    dattn = jax.lax.dot_general(
        dab, wo_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)

    # attention backward, per head, tiled over keys — wrapped in a
    # closure so the VITIQ_TRAIN_PROBE=noattnbwd timing probe can omit
    # it entirely (relying on Mosaic DCE for unused traced ops is not
    # safe)
    def _attention_bwd_fullprod():
        """Rounds 3ae-3am mechanism: dV and dK both contract over Lq (the
        batch row dim), so their per-head [Lq,t]x[Lq,dh] GEMMs merge into
        ONE full product per (tile, group) — pbar_pk^T @ dattn and
        ds_pk^T @ qs_pk, [G, gh*t, gh*dh] outputs whose DIAGONAL [t, dh]
        blocks are the per-head gradients (off-diagonals are computed and
        discarded — MXU arithmetic is ~400x cheaper than the measured
        ~317 ns/op serialization tax). No block-diagonal operand
        construction (the cost that sank xpack). dP and dQ contract over
        lanes and stay per-head. The softmax backward runs WIDE by default
        (one block-matmul drow + hi/lo lane expansion + one wide ds chain
        per tile; VITIQ_TRAIN_FPV=head restores the narrow per-head form).
        Works for BOTH residual modes — stash (pre-normalized pbar) and
        recompute (force_probs keeps unnormalized tiles + denominators,
        normalized here once per tile, wide) — and for multi-tile key
        dimensions (vit flagship Lp=144 = 128+16)."""
        fpg = int(os.environ.get("VITIQ_TRAIN_FPG", "8"))
        from vitiq.ops.pallas.fused_encoder_layer import _den_expand

        mxu_k, _ = _key_split(lp, seq_len)
        tile_offs = [(c0, min(128, mxu_k - c0))
                     for c0 in range(0, mxu_k, 128)]
        n_tiles = len(tile_offs)
        wide = os.environ.get("VITIQ_TRAIN_FPV", "wide") == "wide"

        stash_tiles = heads[0][3] is None  # pre-normalized pbar
        dens_cat = None
        if not stash_tiles:
            dens_cat = jnp.concatenate(
                [heads[h][3] for h in range(n_head)], axis=-1)

        def pbar_tile_major(ti, c0, t):
            # heads[h][5][ti] is this head's ti-th key tile in BOTH modes
            probs_ti = jnp.concatenate(
                [heads[h][5][ti] for h in range(n_head)], axis=-1)
            if stash_tiles:
                return probs_ti  # already normalized
            return (probs_ti.astype(jnp.float32)
                    / _den_expand(dens_cat, x.dtype, n_head, t, n_head * t)
                    ).astype(x.dtype)

        drow_cat = None
        drows = None
        if wide:
            li = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 0)
            hi = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 1)
            blk = (li // dh == hi).astype(x.dtype)  # [D, H]
            drow_cat = jax.lax.dot_general(
                (dattn.astype(jnp.float32)
                 * attn.astype(jnp.float32)).astype(x.dtype), blk,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [G, Lq, H]
        if wide and blk_s is not None:
            # VITIQ_TRAIN_FPA=blk: ONE block-diagonal scratch (serially
            # reused for V then K — the h-th [Lp, dh] block is overwritten
            # each grid step, off-block lanes stay zero from the one fill)
            # collapses dP and dQ to single GEMMs and erases the tile loop:
            # the whole attention backward is 5 GEMMs + 16 scratch writes.
            @pl.when(pl.program_id(0) == 0)
            def _zero_blk():
                blk_s[:] = jnp.zeros_like(blk_s)

            for h in range(n_head):
                blk_s[:, h * lp:(h + 1) * lp, h * dh:(h + 1) * dh] = \
                    heads[h][2]  # kv-masked V
            # pbar head-major over the FULL key range
            if stash_tiles:
                pbar_full = jnp.concatenate(
                    [t for h in range(n_head) for t in heads[h][5]],
                    axis=-1)
            else:
                probs_hm = jnp.concatenate(
                    [t for h in range(n_head) for t in heads[h][5]],
                    axis=-1)
                pbar_full = (probs_hm.astype(jnp.float32)
                             / _den_expand(dens_cat, x.dtype, n_head, lp,
                                           n_head * lp)).astype(x.dtype)
            dp_full = jax.lax.dot_general(
                dattn, blk_s[:],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [G, Lq, H*Lp]
            drow_exp = _den_expand(drow_cat, x.dtype, n_head, lp,
                                   n_head * lp)
            ds_full = (pbar_full.astype(jnp.float32)
                       * (dp_full - drow_exp)).astype(x.dtype)
            for h in range(n_head):
                blk_s[:, h * lp:(h + 1) * lp, h * dh:(h + 1) * dh] = \
                    heads[h][1]  # kv-masked K
            dq_all = jax.lax.dot_general(
                ds_full, blk_s[:],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * (_LN2 * scale2)
            qs_full = jnp.concatenate(
                [heads[h][0] for h in range(n_head)], axis=-1)
            dv_out = jax.lax.dot_general(
                pbar_full, dattn,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [G, H*Lp, D]
            dk_out = jax.lax.dot_general(
                ds_full, qs_full,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dv_all = jnp.concatenate(
                [dv_out[:, h * lp:(h + 1) * lp, h * dh:(h + 1) * dh]
                 for h in range(n_head)], axis=-1)
            dk_all = jnp.concatenate(
                [dk_out[:, h * lp:(h + 1) * lp, h * dh:(h + 1) * dh]
                 for h in range(n_head)], axis=-1) * _LN2
            return jnp.concatenate([dq_all, dk_all, dv_all], axis=-1)
        if not wide:
            drows = [jnp.sum(
                dattn[:, :, h * dh:(h + 1) * dh].astype(jnp.float32)
                * heads[h][4], axis=-1, keepdims=True)
                for h in range(n_head)]

        dq_accs = [None] * n_head
        dv_rows = [[] for _ in range(n_head)]
        dk_rows = [[] for _ in range(n_head)]
        for ti, (c0, t) in enumerate(tile_offs):
            pbar_ti = pbar_tile_major(ti, c0, t)  # [G, Lq, H*t]
            if wide:
                dp_ti = jnp.concatenate([jax.lax.dot_general(
                    dattn[:, :, h * dh:(h + 1) * dh],
                    heads[h][2][:, c0:c0 + t, :],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                    for h in range(n_head)], axis=-1)  # [G, Lq, H*t]
                drow_exp = _den_expand(drow_cat, x.dtype, n_head, t,
                                       n_head * t)
                ds_ti = (pbar_ti.astype(jnp.float32)
                         * (dp_ti - drow_exp)).astype(x.dtype)
            else:
                ds_parts = []
                for h in range(n_head):
                    dp = jax.lax.dot_general(
                        dattn[:, :, h * dh:(h + 1) * dh],
                        heads[h][2][:, c0:c0 + t, :],
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    ds_parts.append(
                        (pbar_ti[:, :, h * t:(h + 1) * t].astype(jnp.float32)
                         * (dp - drows[h])).astype(x.dtype))
                ds_ti = jnp.concatenate(ds_parts, axis=-1)
            for h in range(n_head):
                dq_p = jax.lax.dot_general(
                    ds_ti[:, :, h * t:(h + 1) * t],
                    heads[h][1][:, c0:c0 + t, :],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                dq_accs[h] = dq_p if dq_accs[h] is None else dq_accs[h] + dq_p
            for g0 in range(0, n_head, fpg):
                gh = min(fpg, n_head - g0)
                pbar_pk = pbar_ti[:, :, g0 * t:(g0 + gh) * t]
                ds_pk = ds_ti[:, :, g0 * t:(g0 + gh) * t]
                dout_pk = dattn[:, :, g0 * dh:(g0 + gh) * dh]
                qs_pk = jnp.concatenate(
                    [heads[h][0] for h in range(g0, g0 + gh)], axis=-1)
                dv_out = jax.lax.dot_general(
                    pbar_pk, dout_pk,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [G, gh*t, gh*dh]
                dk_out = jax.lax.dot_general(
                    ds_pk, qs_pk,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                for j in range(gh):
                    dv_rows[g0 + j].append(
                        dv_out[:, j * t:(j + 1) * t, j * dh:(j + 1) * dh])
                    dk_rows[g0 + j].append(
                        dk_out[:, j * t:(j + 1) * t, j * dh:(j + 1) * dh])

        dq_heads = [acc * (_LN2 * scale2) for acc in dq_accs]
        dv_heads = [rows[0] if n_tiles == 1 else
                    jnp.concatenate(rows, axis=1) for rows in dv_rows]
        dk_heads = [rows[0] if n_tiles == 1 else
                    jnp.concatenate(rows, axis=1) for rows in dk_rows]
        dk_all = jnp.concatenate(dk_heads, axis=-1) * _LN2
        dv_all = jnp.concatenate(dv_heads, axis=-1)
        return jnp.concatenate(
            [jnp.concatenate(dq_heads, axis=-1), dk_all, dv_all], axis=-1)

    def _attention_bwd():
        # attention backward, per head, tiled over keys (tail keys beyond the
        # last full 128-wide tile handled as rank-1 VPU terms, as in forward)
        mxu_k, n_tail = _key_split(lp, seq_len)
        dq_heads, dk_heads, dv_heads = [], [], []
        for hd_i in range(n_head):
            qs, k, v, denom, out, probs_tiles = heads[hd_i]
            dout = dattn[:, :, hd_i * dh:(hd_i + 1) * dh].astype(jnp.float32)
            # flash identity: sum_j dp_ij p_ij = dout_i . out_i
            drow = jnp.sum(dout * out, axis=-1, keepdims=True)
            # probs_tiles with denom: unnormalized recompute cache (PB=reuse);
            # probs_tiles with denom=None: PRE-normalized stash tiles
            rcp = (1.0 / denom) if (probs_tiles is not None
                                    and denom is not None) else None
            dq_acc = None
            dk_cols = []
            dv_cols = []
            for c0 in range(0, mxu_k, 128):
                t = min(128, mxu_k - c0)
                if probs_tiles is not None:
                    # VITIQ_TRAIN_PB=reuse: normalize the recompute's cached
                    # probability tile instead of re-running score matmul + exp
                    # (stash mode: the tile is already normalized, rcp=None)
                    tile = probs_tiles[c0 // 128]
                    pbar = (tile if rcp is None else
                            (tile.astype(jnp.float32) * rcp).astype(x.dtype))
                else:
                    scores = jax.lax.dot_general(
                        qs, k[:, c0:c0 + t, :],
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    pbar = (jnp.exp2(scores) / denom).astype(x.dtype)  # [G, Lq, t]
                # TIMING-ONLY sub-probes of this chain (square tiles only —
                # dout [G,Lq,dh] stands in for the [G,t,dh] outputs):
                #   attn_nodv  — skip the dV GEMM
                #   attn_nodsp — skip the dP GEMM + softmax-bwd VPU combine
                #   attn_nodq  — skip the dQ GEMM
                #   attn_nodk  — skip the dK GEMM
                sq = lp == mxu_k and t == lp
                # dV[kt] = pbar^T dout ; ddenom folds via the drow term
                if probe == "attn_nodv" and sq:
                    dv_cols.append(dout)
                else:
                    dv_cols.append(jax.lax.dot_general(
                        pbar, dout.astype(x.dtype),
                        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ))  # [G, t, dh]
                if probe == "attn_nodsp":
                    ds = pbar
                else:
                    dp = jax.lax.dot_general(
                        dout.astype(x.dtype), v[:, c0:c0 + t, :],
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )  # [G, Lq, t]
                    ds = (pbar.astype(jnp.float32) * (dp - drow)).astype(x.dtype)
                if probe == "attn_nodq":
                    dq_part = dout
                else:
                    dq_part = jax.lax.dot_general(
                        ds, k[:, c0:c0 + t, :],
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )  # [G, Lq, dh]
                dq_acc = dq_part if dq_acc is None else dq_acc + dq_part
                if probe == "attn_nodk" and sq:
                    dk_cols.append(dout)
                else:
                    dk_cols.append(jax.lax.dot_general(
                        ds, qs,
                        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ))  # [G, t, dh]
            # ds was d(base-2 exponent); dq/dk w.r.t. unscaled q,k carry
            # ln2 * scale2 = 1/sqrt(dh); qs already includes scale2, so dk needs
            # ln2 only (ds @ qs = ln2^-1 ... ): dq = ln2*scale2 * (ds k) on raw k;
            # dk = ln2 * (ds^T qs) = ln2 * scale2 * (ds^T q_raw) — both reduce to
            # plain_scale against the raw q/k.
            dq_heads.append(dq_acc * (_LN2 * scale2))
            dk_heads.append(jnp.concatenate(dk_cols, axis=1) * _LN2)  # qs carries scale2
            dv_heads.append(jnp.concatenate(dv_cols, axis=1))

        if n_tail:
            # Packed cross-head tail gradients — same layout rules as the fwd
            # tail (wide ops + constant-matrix MXU contractions only; Mosaic
            # rejects sublane broadcasts of single rows and narrow per-head VPU
            # ops are catastrophically slow). Definitions per tail key j:
            #   pbar_jh = exp2(s_jh) / denom_h          dp_jh = dout_h . v_h(j)
            #   ds_jh  = pbar_jh (dp_jh - drow_h)
            #   dq_h  += ds_jh k_h(j)                   (x LN2*scale2, raw-k basis)
            #   dk_h(j) = sum_i ds_ijh qs_ih            (x LN2)
            #   dv_h(j) = sum_i pbar_ijh dout_ih
            # The query-dim reductions AND the tail-row placement fuse into one
            # one-hot matmul: sel[r, i] = (r == j) -> sel @ A = row j holds
            # sum_i A[i], other rows 0.
            li = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 0)
            hi = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 1)
            blk = (li // dh == hi).astype(x.dtype)  # [D, H] block-diag ones
            ones_col = jnp.ones((g, lp, 1), x.dtype)

            def expand_row(rowvec):  # [G, 1, D] -> [G, Lp, D] (f32) via K=1 MXU
                return jax.lax.dot_general(
                    ones_col, rowvec,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)

            def reduce_to_row(a_bf16, j):  # [G, Lp, D] -> [G, tail_rows, D]
                sel = (jax.lax.broadcasted_iota(
                    jnp.int32, (g, lp - mxu_k, lp), 1) == j).astype(x.dtype)
                return jax.lax.dot_general(
                    sel, a_bf16, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)

            # denominator of head h at column h: gather the per-head denom lanes
            # (lane h*2dh + dh of the concatenated accs) with a selection matmul
            acc_all = jnp.concatenate([hd[3] for hd in heads], axis=-1)  # [G,Lq,H] f32
            denom_cat = acc_all  # heads[h][3] is [G, Lq, 1] -> concat IS [G,Lq,H]
            qs_all = (qkv[:, :, :d].astype(jnp.float32) * scale2).astype(x.dtype)
            dattn32 = dattn.astype(jnp.float32)
            attn32 = attn.astype(jnp.float32)
            drow_cat = jax.lax.dot_general(
                (dattn32 * attn32).astype(x.dtype), blk,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [G, Lq, H]

            dq_all = jnp.concatenate(dq_heads, axis=-1)  # [G, Lq, D]
            dk_tail_acc = None
            dv_tail_acc = None
            for j in range(n_tail):
                r = mxu_k + j
                k_row = qkv[:, r:r + 1, d:2 * d]
                v_row = qkv[:, r:r + 1, 2 * d:3 * d]
                k_exp = expand_row(k_row)  # [G, Lp, D] f32
                prod = qs_all * k_exp.astype(x.dtype)
                s_all = jax.lax.dot_general(
                    prod, blk, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [G, Lq, H]
                pbar_all = jnp.exp2(s_all) / denom_cat
                dp_all = jax.lax.dot_general(
                    (dattn32 * expand_row(v_row)).astype(x.dtype), blk,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [G, Lq, H]
                ds_all = pbar_all * (dp_all - drow_cat)
                ds_exp = jax.lax.dot_general(
                    ds_all.astype(x.dtype), blk,
                    dimension_numbers=(((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [G, Lq, D]
                dq_all = dq_all + (ds_exp * k_exp) * (_LN2 * scale2)
                pbar_exp = jax.lax.dot_general(
                    pbar_all.astype(x.dtype), blk,
                    dimension_numbers=(((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [G, Lq, D]
                dk_t = reduce_to_row(
                    (ds_exp * qs_all.astype(jnp.float32)).astype(x.dtype), j)
                dv_t = reduce_to_row((pbar_exp * dattn32).astype(x.dtype), j)
                dk_tail_acc = dk_t if dk_tail_acc is None else dk_tail_acc + dk_t
                dv_tail_acc = dv_t if dv_tail_acc is None else dv_tail_acc + dv_t

            dk_all = jnp.concatenate(
                [jnp.concatenate(dk_heads, axis=-1), dk_tail_acc * _LN2], axis=1)
            dv_all = jnp.concatenate(
                [jnp.concatenate(dv_heads, axis=-1), dv_tail_acc], axis=1)
            dqkv = jnp.concatenate([dq_all, dk_all, dv_all], axis=-1)
        else:
            dqkv = jnp.concatenate(dq_heads + dk_heads + dv_heads, axis=-1)
        return dqkv

    if probe == "noattnbwd":
        # TIMING-ONLY (wrong outputs): skip the per-head attention
        # backward chains; dqkv stands in with matching shape/dtype
        dqkv = jnp.concatenate([dattn.astype(jnp.float32)] * 3, axis=-1)
    elif use_fullprod:
        # Round-3ae on-chip ladder (seg-64 mp @ 8192, G=40): FPG=8 40.01 /
        # FPG=4 42.29 / FPG=2 42.16 vs chain 46.90 ms — fullprod with one
        # GEMM per gradient type is +17.2% (204.7K frames/s) and the
        # DEFAULT in both residual modes; VITIQ_TRAIN_ATTNBWD=chain
        # restores the per-head chain. Diagonal blocks of the full product
        # are the same per-head sums (identical arithmetic).
        dqkv = _attention_bwd_fullprod()
    else:
        dqkv = _attention_bwd()
    if seq_len < lp:
        rowq = jax.lax.broadcasted_iota(jnp.int32, (g, lp, 3 * d), dimension=1)
        dqkv = jnp.where(rowq < seq_len, dqkv, 0.0)

    dqkvb = dqkv.astype(x.dtype)
    if dwpack == "0":
        emit(dwqkv_ref, dw_gemm(x, dqkvb))
    else:
        # VITIQ_TRAIN_DWPACK (round 3ar): the D-wide dW contractions all
        # share the same [G*Lp] contraction dim, so they merge into ONE
        # full product [x|attn|x1]^T @ [dqkv|da|dpre] whose DIAGONAL
        # blocks are the per-weight grads (identical arithmetic; the
        # off-diagonal MACs are discarded — MXU arithmetic is ~400x
        # cheaper than the measured ~5 us/GEMM serialization tax at
        # seg-64 mp G=40, where the four separate dW GEMMs cost 4.12 ms
        # of the 29.4 ms step). 'full' folds in h^T@df too (dw2), at
        # +2.6 MB of f32 accumulator. One accumulator add per step
        # replaces three (four) scratch read-add-writes; the diagonal
        # blocks are sliced out once at the last grid step.
        acts_p = [x, attn, x1]
        grads_p = [dqkvb, dab, dpreb]
        if dwpack == "full":
            acts_p.append(h)
            grads_p.append(dfb)
        pk = dw_gemm(jnp.concatenate(acts_p, axis=-1),
                     jnp.concatenate(grads_p, axis=-1))

        @pl.when(first)
        def _():
            pack_s[:] = pk

        @pl.when(jnp.logical_not(first))
        def _():
            pack_s[:] = pack_s[:] + pk

        @pl.when(last)
        def _():
            dwqkv_ref[:] = pack_s[0:d, 0:3 * d]
            dwo_ref[:] = pack_s[d:2 * d, 3 * d:4 * d]
            dw1_ref[:] = pack_s[2 * d:3 * d, 4 * d:4 * d + hwidth]
            if dwpack == "full":
                dw2_ref[:] = pack_s[3 * d:3 * d + hwidth,
                                    4 * d + hwidth:5 * d + hwidth]
    emit(dbqkv_ref, jnp.sum(dqkv, axis=(0, 1))[None, :])
    dx = dx + jax.lax.dot_general(
        dqkvb, wqkv_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)


# --------------------------------------------------------------------------
# host wrappers
# --------------------------------------------------------------------------

_WNAMES = ("wqkv", "bqkv", "wo", "bo", "g1", "be1",
           "w1", "b1", "w2", "b2", "g2", "be2")


_TRAIN_VMEM_BUDGET = 10 * 1024 * 1024


def _train_vmem_estimate(g: int, Lp: int, D: int, H: int,
                         itemsize: int) -> int:
    """Scoped-VMEM planning estimate for the fused train kernels at batch
    block g, sized for the BACKWARD (the 3x multiplier: recompute + grad
    temporaries). The ONE formula shared by the block picker (_pick_g) and
    the eligibility gate (fused_train_supported) — keep them in lockstep or
    the encoder can admit a geometry whose backward hard-fails the 16 MB
    scoped-VMEM compile on chip."""
    t = min(128, Lp)
    x_like = g * Lp * D
    return 3 * (
        4 * x_like * itemsize
        + 3 * x_like * itemsize
        + g * Lp * t * (4 + itemsize)
        + 2 * g * Lp * H * itemsize
        + 3 * x_like * 4
    )


def _rcore_g_bytes(Lp: int, seq_len: int, n_head: int, D: int,
                   itemsize: int, stash: bool) -> int:
    """Per-G scoped-VMEM bytes of the forced cross-head packed recompute
    cores (VITIQ_TRAIN_RFWD/RBWD=xpack): two (G, n_head*Lp, D) scratches.
    Folded into _pick_g so forced ladder runs don't blow the 16 MB scoped
    -VMEM compile wall the planner exists to avoid (advisor round-3
    finding). Evaluated from BOTH knobs symmetrically: fwd and bwd must
    pick the SAME G (the per-grid-block dropout-mask contract), so a
    fwd-only or bwd-only force still shrinks both passes' G together.
    Stash regime excluded — its xpack scratches are covered by the
    measured stash G ladder."""
    if stash:
        return 0
    if (_rcore_xpack("RFWD", Lp, seq_len, n_head, D)
            or _rcore_xpack("RBWD", Lp, seq_len, n_head, D)):
        return 2 * n_head * Lp * D * itemsize
    return 0


def _pick_g(Lp: int, D: int, H: int, itemsize: int,
            stash: bool = False, rcore_g_bytes: int = 0) -> int:
    """One block size for BOTH passes: dropout masks are generated per grid
    block (seeded on program_id), so fwd and bwd must partition the batch
    identically. Sized for the backward (recompute + grad temporaries).
    VITIQ_TRAIN_G overrides for on-chip ladder probes (the serving G
    ladder was monotone-up to its compile wall; flagship train sits at
    G=2 under this estimate)."""
    g_env = int(os.environ.get("VITIQ_TRAIN_G", "0"))
    if g_env:
        return g_env
    if stash and D <= 128:
        # Rounds 3y-3ad measured stash ladders (@ 8192, D=128 arms; the
        # D>128 family keeps the conservative estimate below):
        #   Lp=16: 24→52.08 / 32→49.76 / 40→47.41 ms (G=48 OOM 17.07 MB);
        #          G=40 batch-robust through 32768 (181.8K frames/s)
        #   Lp=32: 8→112.57 / 12→96.46 / 16→90.79 ms (+24.3%; G=20 OOM
        #          17.46 MB)
        #   Lp=64: 4→216.9 / 8→185.9 ms (+17%; G=12 OOM 20.13 MB)
        if Lp <= 16:
            return 40
        if Lp <= 32:
            return 16
        if Lp <= 64:
            return 8
    if Lp <= 16:
        # Round-3o/3p measured ladder at seg-64 mean-pool (Lp=16):
        # @2048 G=16 47.4K / G=24 50.5K / G=32 51.5K frames/s; G=48 is a
        # hard scoped-VMEM compile OOM (22.83 MB vs the 16.00 MB limit).
        # G=32's REAL footprint is also batch-sensitive: it compiled at
        # batch 2048 (~15.2 MB) but OOMed at batch 8192 (16.33 MB) — the
        # double-buffered in/out blocks scale with grid length headroom.
        # G=24 (~12.5 MB real, within noise of G=32's throughput) is the
        # robust pick. Extension gated to the MEASURED Lp<=16 regime:
        # at Lp=32 the same ladder is unmeasured — keep the conservative
        # one there until a chip run certifies it.
        for g in (24, 16, 8, 4, 2, 1):
            if (_train_vmem_estimate(g, Lp, D, H, itemsize)
                    + g * rcore_g_bytes <= 11_796_480):
                return g
        return 1
    if D > 128:
        # Round-4 d256/L9 chip ladder (docs/BENCHMARKS.md round 4): G=4
        # (estimate 10.28 MB at Lp=80) compiles and wins +15% at batch
        # 2048 AND 8192 on BOTH residual modes; G=5 (12.85 MB estimate)
        # fails the remote compile. Walk down from the measured-good rung
        # under the same relaxed budget the Lp<=16 branch uses.
        for g in (4, 2, 1):
            if (_train_vmem_estimate(g, Lp, D, H, itemsize)
                    + g * rcore_g_bytes <= 11_796_480):
                return g
        return 1
    for g in (16, 8, 4, 2, 1):
        if (_train_vmem_estimate(g, Lp, D, H, itemsize)
                + g * rcore_g_bytes <= _TRAIN_VMEM_BUDGET):
            return g
    return 1


def fused_train_supported(L: int, D: int, ffn_hidden: int,
                          itemsize: int = 2) -> bool:
    """Can the fused train kernels hold this token length at all?

    The backward keeps recompute + weight-grad accumulators sized in Lp even
    at G=1; at conv1d length (1025 tokens, Lp=1040) the scoped-VMEM stack
    measured 65.25 MB against the chip's 16.00 MB limit — a hard compile
    error, not a perf cliff. Evaluates _pick_g's estimate at G=1: if even
    that exceeds the planning budget, the caller must take the XLA train
    path (which tiles attention through HBM and handles long sequences,
    just slower). Flagship Lp=144 passes with 3.5 MB.
    """
    sublane = 16 if itemsize == 2 else 8
    Lp = _round_up(L, sublane)
    return (_train_vmem_estimate(1, Lp, D, ffn_hidden, itemsize)
            <= _TRAIN_VMEM_BUDGET)


def _flat_weights(layer_params, dtype):
    ap = layer_params["attention"]
    wqkv = jnp.concatenate([ap["w_q"]["kernel"], ap["w_k"]["kernel"],
                            ap["w_v"]["kernel"]], axis=1).astype(dtype)
    bqkv = jnp.concatenate([ap["w_q"]["bias"], ap["w_k"]["bias"],
                            ap["w_v"]["bias"]]).astype(jnp.float32)
    ffn = layer_params["ffn"]
    return (
        wqkv, bqkv,
        ap["w_concat"]["kernel"].astype(dtype),
        ap["w_concat"]["bias"].astype(jnp.float32),
        layer_params["norm1"]["gamma"].astype(jnp.float32),
        layer_params["norm1"]["beta"].astype(jnp.float32),
        ffn["linear1"]["kernel"].astype(dtype),
        ffn["linear1"]["bias"].astype(jnp.float32),
        ffn["linear2"]["kernel"].astype(dtype),
        ffn["linear2"]["bias"].astype(jnp.float32),
        layer_params["norm2"]["gamma"].astype(jnp.float32),
        layer_params["norm2"]["beta"].astype(jnp.float32),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_train_layer(n_head, drop, layer_idx, seq_len, seed, x, *weights):
    y, _ = _fused_train_layer_fwd(n_head, drop, layer_idx, seq_len, seed,
                                  x, *weights)
    return y


def _run_fwd(n_head, drop, layer_idx, seq_len, seed, x, weights):
    B, L, D = x.shape
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    H = weights[6].shape[1]
    _stash_on = _stash_enabled(Lp, seq_len, n_head, D, batch=B)
    G = _pick_g(Lp, D, H, x.dtype.itemsize, stash=_stash_on,
                rcore_g_bytes=_rcore_g_bytes(Lp, seq_len, n_head, D,
                                             x.dtype.itemsize, _stash_on))
    Bp = _round_up(B, G)
    xp = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))

    data_block = pl.BlockSpec((G, Lp, D), lambda i, s: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    def rep(shape):
        return pl.BlockSpec(shape, lambda i, s: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    if _stash_on:
        wb = 3 * D + n_head * Lp
        # The serving kernel's cross-head packed attention core in the
        # stash forward (one block-diagonal GEMM chain; the packed probs
        # ARE the stash layout). DEFAULT in its eligible regime — round-3ai
        # on-chip A/B (seg-64 mp @ 8192): 33.05 ms = 247.9K frames/s vs
        # the chain fwd's 35.92 (+8.7%). VITIQ_TRAIN_FWD=chain restores.
        xpack_fwd = (os.environ.get("VITIQ_TRAIN_FWD", "xpack") == "xpack"
                     and n_head * Lp <= 512
                     and _key_split(Lp, seq_len) == (Lp, 0))
        scratch = []
        if xpack_fwd:
            kernel = functools.partial(_fwd_kernel_stash_xpack,
                                       seq_len=seq_len, n_head=n_head,
                                       drop=drop, layer_idx=layer_idx)
            scratch = [pltpu.VMEM((G, n_head * Lp, D), x.dtype),
                       pltpu.VMEM((G, n_head * Lp, D), x.dtype)]
        else:
            kernel = functools.partial(_fwd_kernel_stash, seq_len=seq_len,
                                       n_head=n_head, drop=drop,
                                       layer_idx=layer_idx)
        y, sb, sf = _pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Bp // G,),
                in_specs=[data_block] + [rep(w.shape) for w in weights],
                out_specs=[
                    data_block,
                    pl.BlockSpec((G, Lp, wb), lambda i, s: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((G, Lp, 8), lambda i, s: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=scratch,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype),
                jax.ShapeDtypeStruct((Bp, Lp, wb), x.dtype),
                jax.ShapeDtypeStruct((Bp, Lp, 8), jnp.float32),
            ],
        )(jnp.asarray([seed], jnp.int32), xp, *weights)
        # stashes keep padded Bp rows: the backward re-derives the same
        # G/Bp and consumes them directly, no re-pad needed
        return y[:B, :L, :], sb, sf

    kernel = functools.partial(_fwd_kernel, seq_len=seq_len, n_head=n_head,
                               drop=drop, layer_idx=layer_idx)
    scratch = ([pltpu.VMEM((G, n_head * Lp, D), x.dtype)] * 2
               if _rcore_xpack("RFWD", Lp, seq_len, n_head, D) else [])
    y = _pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // G,),
            in_specs=[data_block] + [rep(w.shape) for w in weights],
            out_specs=data_block,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype),
    )(jnp.asarray([seed], jnp.int32), xp, *weights)
    return y[:B, :L, :], None, None


def _fused_train_layer_fwd(n_head, drop, layer_idx, seq_len, seed, x, *weights):
    y, sb, sf = _run_fwd(n_head, drop, layer_idx, seq_len, seed, x, weights)
    return y, (seed, x, sb, sf, weights)


def _fused_train_layer_bwd(n_head, drop, layer_idx, seq_len, res, dy):
    seed, x, sb, sf, weights = res
    B, L, D = x.shape
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    H = weights[6].shape[1]
    _stash_on = _stash_enabled(Lp, seq_len, n_head, D, batch=B)
    G = _pick_g(Lp, D, H, x.dtype.itemsize, stash=_stash_on,
                rcore_g_bytes=_rcore_g_bytes(Lp, seq_len, n_head, D,
                                             x.dtype.itemsize, _stash_on))
    Bp = _round_up(B, G)
    xp = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))
    dyp = jnp.pad(dy.astype(x.dtype), ((0, Bp - B), (0, Lp - L), (0, 0)))

    data_block = pl.BlockSpec((G, Lp, D), lambda i, s: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    def rep(shape):
        return pl.BlockSpec(shape, lambda i, s: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    # gradient outputs: dx (blocked) + one f32 ref per weight, accumulated
    # across the sequential grid (constant index map)
    def w2d(w):
        return w.shape if w.ndim == 2 else (1, w.shape[0])

    out_shapes = [jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype)] + [
        jax.ShapeDtypeStruct(w2d(w), jnp.float32) for w in weights]
    out_specs = [data_block] + [rep(w2d(w)) for w in weights]

    stash = sb is not None
    stash_ins = []
    stash_specs = []
    if stash:
        assert sb.shape[0] == Bp, (sb.shape, Bp)
        stash_ins = [sb, sf]
        stash_specs = [
            pl.BlockSpec((G, Lp, sb.shape[-1]), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lp, sf.shape[-1]), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    # VITIQ_TRAIN_FPA: one block-diagonal K/V scratch for the fullprod
    # backward's single-GEMM dP/dQ (round 3ao on-chip ladder @ 8192:
    # Lp=16 30.08 ms = 272.3K frames/s (+7.5%), Lp=32 +1.8%, Lp>=64
    # neutral) — auto = blk in the measured-win regime; =blk forces,
    # =0 disables.
    _fpa_env = os.environ.get("VITIQ_TRAIN_FPA", "auto")
    fpa_blk = ((_fpa_env == "blk" or (_fpa_env == "auto" and Lp <= 32))
               and os.environ.get("VITIQ_TRAIN_ATTNBWD", "fullprod")
               == "fullprod"
               and os.environ.get("VITIQ_TRAIN_FPV", "wide") == "wide"
               and _key_split(Lp, seq_len)[1] == 0)
    blk_scratch = ([pltpu.VMEM((G, n_head * Lp, D), x.dtype)]
                   if fpa_blk else [])
    # VITIQ_TRAIN_DWPACK: one packed f32 accumulator replaces the packed
    # weights' per-ref scratches (their slots shrink to (1,1) dummies so
    # the kernel's positional parse stays fixed); appended LAST so the
    # kernel pops it before blk_s.
    dwpack = _dwpack_mode(Lp, seq_len, n_head, D)
    hw = weights[6].shape[1]
    packed_idx = {0, 2, 6} | ({8} if dwpack == "full" else set())
    if dwpack == "full":
        pack_scratch = [pltpu.VMEM((3 * D + hw, 5 * D + hw), jnp.float32)]
    elif dwpack == "p1":
        pack_scratch = [pltpu.VMEM((3 * D, 4 * D + hw), jnp.float32)]
    else:
        pack_scratch = []

    def wscratch(i, w):
        if pack_scratch and i in packed_idx:
            return pltpu.VMEM((1, 1), jnp.float32)
        return pltpu.VMEM(w2d(w), jnp.float32)

    # VITIQ_TRAIN_RBWD=xpack (round 3aw): packed cross-head core for the
    # backward's RECOMPUTE (recompute regime only — stash has no recompute)
    rbwd = (not stash) and _rcore_xpack("RBWD", Lp, seq_len, n_head, D)
    rbwd_scratch = ([pltpu.VMEM((G, n_head * Lp, D), x.dtype)] * 2
                    if rbwd else [])

    kernel = functools.partial(_bwd_kernel, seq_len=seq_len, n_head=n_head,
                               drop=drop, layer_idx=layer_idx, stash=stash,
                               fpa_blk=fpa_blk, dwpack=dwpack, rbwd=rbwd)
    outs = _pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // G,),
            in_specs=[data_block, data_block] + stash_specs
            + [rep(w.shape) for w in weights],
            out_specs=out_specs,
            scratch_shapes=[wscratch(i, w) for i, w in enumerate(weights)]
            + blk_scratch + pack_scratch + rbwd_scratch,
        ),
        out_shape=out_shapes,
    )(jnp.asarray([seed], jnp.int32), xp, dyp, *stash_ins, *weights)

    dx = outs[0][:B, :L, :]
    dws = []
    for w, dw in zip(weights, outs[1:]):
        dw = dw if w.ndim == 2 else dw[0]
        dws.append(dw.astype(w.dtype))
    # integer seed's cotangent is float0
    dseed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return (dseed, dx, *dws)


_fused_train_layer.defvjp(_fused_train_layer_fwd, _fused_train_layer_bwd)


# --------------------------------------------------------------------------
# layer-stacked train calls (VITIQ_TRAIN_LPC, round 3au)
#
# The round-3at amortized decomposition showed the seg-64 mp step is HALF
# fixed floor: with both kernel bodies stubbed the step still costs 14.3 ms
# of 29.6 (and the REAL forward measures the same as the stub — its compute
# is entirely hidden under DMA/grid overhead). The G ladder's arithmetic
# prices that floor at ~4.7 us per grid step, and a step at G=40 runs
# 12 pallas calls x 205 grid steps. Stacking LPC layers per call divides
# the call count (and the inter-layer y->x HBM round trips) by LPC at the
# cost of per-layer stash blocks + weight copies + grad accumulators all
# resident at once, which lowers the feasible G. The wrappers below chain
# the EXISTING per-layer kernel bodies through in-VMEM values (_VRef), so
# the per-layer math, dropout seeding (re-seeded per layer_idx, masks
# bit-identical to the per-layer path) and probe knobs are shared, not
# forked. Layer i>0's input is reconstructed from layer i-1's stash
# (x_i = g2*xh2 + be2 — exact in f32, 1-ulp in bf16), so stacking stores
# nothing the stash didn't already hold.
# --------------------------------------------------------------------------


class _VRef:
    """Value adapter with the tiny ref protocol the kernel bodies use
    (.shape/.dtype, [:] reads, [:] writes) so the stacked wrapper kernels
    can chain the per-layer bodies through VMEM values instead of HBM."""

    __slots__ = ("val", "shape", "dtype")

    def __init__(self, val=None, shape=None, dtype=None):
        self.val = val
        self.shape = val.shape if val is not None else shape
        self.dtype = val.dtype if val is not None else dtype

    def __getitem__(self, idx):
        return self.val[idx]

    def __setitem__(self, idx, v):
        # the bodies only ever write the full block
        self.val = v
        self.shape = v.shape
        self.dtype = v.dtype


def _fwd_kernel_stash_stacked(
    seed_ref, x_ref, *rest,
    seq_len: int, n_head: int, drop: float, layer_base: int, n_layers: int,
):
    nl = n_layers
    wrefs = rest[:12 * nl]
    y_ref = rest[12 * nl]
    sb_refs = rest[12 * nl + 1:12 * nl + 1 + nl]
    sf_refs = rest[12 * nl + 1 + nl:12 * nl + 1 + 2 * nl]
    kp_s, vp_s = rest[-2:]
    xv = x_ref[:]
    for i in range(nl):
        yv = _VRef(shape=xv.shape, dtype=y_ref.dtype)
        _fwd_kernel_stash_xpack(
            seed_ref, _VRef(xv), *wrefs[12 * i:12 * (i + 1)],
            yv, sb_refs[i], sf_refs[i], kp_s, vp_s,
            seq_len=seq_len, n_head=n_head, drop=drop,
            layer_idx=layer_base + i)
        xv = yv.val
    y_ref[:] = xv


def _bwd_kernel_stacked(
    seed_ref, x0_ref, dy_ref, *rest,
    seq_len: int, n_head: int, drop: float, layer_base: int, n_layers: int,
    fpa_blk: bool,
):
    nl = n_layers
    sb_refs = rest[:nl]
    sf_refs = rest[nl:2 * nl]
    wrefs = rest[2 * nl:2 * nl + 12 * nl]
    dx_ref = rest[2 * nl + 12 * nl]
    grefs = rest[2 * nl + 12 * nl + 1:2 * nl + 24 * nl + 1]
    arefs = rest[2 * nl + 24 * nl + 1:2 * nl + 36 * nl + 1]
    blk = [rest[-1]] if fpa_blk else []
    d = x0_ref.shape[-1]
    dyv = dy_ref[:]
    for i in range(nl - 1, -1, -1):
        if i == 0:
            xv = x0_ref[:]
        else:
            # layer i's input = layer i-1's output, reconstructed from its
            # stashed LN2 normalization (y = g2*xh2 + be2)
            pw = wrefs[12 * (i - 1):12 * i]
            xh2 = sb_refs[i - 1][:, :, 2 * d:3 * d].astype(jnp.float32)
            xv = (pw[10][:] * xh2 + pw[11][:]).astype(x0_ref.dtype)
        dxv = _VRef(shape=xv.shape, dtype=x0_ref.dtype)
        _bwd_kernel(
            seed_ref, _VRef(xv), _VRef(dyv), sb_refs[i], sf_refs[i],
            *wrefs[12 * i:12 * (i + 1)], dxv, *grefs[12 * i:12 * (i + 1)],
            *arefs[12 * i:12 * (i + 1)], *blk,
            seq_len=seq_len, n_head=n_head, drop=drop,
            layer_idx=layer_base + i, stash=True, fpa_blk=fpa_blk,
            dwpack="0")
        dyv = dxv.val
    dx_ref[:] = dyv


def _lpc_mode(n_layers: int, lp: int, seq_len: int, n_head: int,
              d: int, itemsize: int) -> int:
    """VITIQ_TRAIN_LPC: layers per pallas call for the stacked train path.
    Eligibility = the stash + xpack-forward regime (Lp<=64, d<=128,
    n_head*Lp<=512, no key tail) with the default DWPACK=0. The round-3au
    on-chip ladder measured NEUTRAL-to-NEGATIVE (LPC=2@G32 29.56 ms vs
    29.46-29.63 baseline; LPC=3@G24 -6.5%; LPC=6/stretch rungs VMEM OOM
    17.1-19.0 MB): the stacked call's nl x resident stash/weights/
    accumulators cost exactly the G rungs the halved call count saves.
    auto therefore stays 1 (docs/BENCHMARKS.md round 3au)."""
    env = os.environ.get("VITIQ_TRAIN_LPC", "auto")
    # structural = what the stacked wrappers require to be CORRECT;
    # bf16 (itemsize==2) is only an auto-default condition (the VMEM
    # rungs are sized for it), so forced f32 interpreter tests still run.
    structural = (
        _stash_enabled(lp, seq_len, n_head, d)
        and os.environ.get("VITIQ_TRAIN_FWD", "xpack") == "xpack"
        and n_head * lp <= 512
        and _key_split(lp, seq_len) == (lp, 0)
        and _dwpack_mode(lp, seq_len, n_head, d) == "0"
    )
    if env != "auto":
        lpc = max(1, int(env))
        return lpc if (lpc == 1 or structural) else 1
    return 1  # auto stays per-layer until the round-3au chip ladder rules


def _pick_g_stacked(Lp: int, D: int, H: int, itemsize: int, nl: int) -> int:
    """Block size for the stacked calls (both passes share it — dropout
    masks are seeded per grid block). The single-layer stash rungs shrink
    with nl because each grid step now holds nl layers' stash blocks
    (double-buffered), weights and grad accumulators. Rungs below are
    PLANNING estimates pending the round-3au ladder; VITIQ_TRAIN_G
    overrides for probes."""
    g_env = int(os.environ.get("VITIQ_TRAIN_G", "0"))
    if g_env:
        return g_env
    if Lp <= 16:
        return {1: 40, 2: 32, 3: 24}.get(nl, 16)
    if Lp <= 32:
        return {1: 16, 2: 12, 3: 8, 4: 8}.get(nl, 4)
    return {1: 8, 2: 4}.get(nl, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_train_chunk(n_head, drop, layer_base, seq_len, n_layers,
                       seed, x, *weights):
    y, _ = _fused_train_chunk_fwd(n_head, drop, layer_base, seq_len,
                                  n_layers, seed, x, *weights)
    return y


def _fused_train_chunk_fwd(n_head, drop, layer_base, seq_len, n_layers,
                           seed, x, *weights):
    B, L, D = x.shape
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    H = weights[6].shape[1]
    G = _pick_g_stacked(Lp, D, H, x.dtype.itemsize, n_layers)
    Bp = _round_up(B, G)
    xp = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))
    wb = 3 * D + n_head * Lp

    data_block = pl.BlockSpec((G, Lp, D), lambda i, s: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    def rep(shape):
        return pl.BlockSpec(shape, lambda i, s: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_fwd_kernel_stash_stacked, seq_len=seq_len,
                               n_head=n_head, drop=drop,
                               layer_base=layer_base, n_layers=n_layers)
    outs = _pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // G,),
            in_specs=[data_block] + [rep(w.shape) for w in weights],
            out_specs=[data_block]
            + [pl.BlockSpec((G, Lp, wb), lambda i, s: (i, 0, 0),
                            memory_space=pltpu.VMEM)] * n_layers
            + [pl.BlockSpec((G, Lp, 8), lambda i, s: (i, 0, 0),
                            memory_space=pltpu.VMEM)] * n_layers,
            scratch_shapes=[pltpu.VMEM((G, n_head * Lp, D), x.dtype),
                            pltpu.VMEM((G, n_head * Lp, D), x.dtype)],
        ),
        out_shape=[jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype)]
        + [jax.ShapeDtypeStruct((Bp, Lp, wb), x.dtype)] * n_layers
        + [jax.ShapeDtypeStruct((Bp, Lp, 8), jnp.float32)] * n_layers,
    )(jnp.asarray([seed], jnp.int32), xp, *weights)
    y = outs[0][:B, :L, :]
    sbs = tuple(outs[1:1 + n_layers])
    sfs = tuple(outs[1 + n_layers:1 + 2 * n_layers])
    return y, (seed, x, sbs, sfs, weights)


def _fused_train_chunk_bwd(n_head, drop, layer_base, seq_len, n_layers,
                           res, dy):
    seed, x, sbs, sfs, weights = res
    B, L, D = x.shape
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    H = weights[6].shape[1]
    G = _pick_g_stacked(Lp, D, H, x.dtype.itemsize, n_layers)
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

    stash_specs = [
        pl.BlockSpec((G, Lp, sb.shape[-1]), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM) for sb in sbs
    ] + [
        pl.BlockSpec((G, Lp, sf.shape[-1]), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM) for sf in sfs
    ]
    out_shapes = [jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype)] + [
        jax.ShapeDtypeStruct(w2d(w), jnp.float32) for w in weights]
    out_specs = [data_block] + [rep(w2d(w)) for w in weights]

    _fpa_env = os.environ.get("VITIQ_TRAIN_FPA", "auto")
    fpa_blk = ((_fpa_env == "blk" or (_fpa_env == "auto" and Lp <= 32))
               and os.environ.get("VITIQ_TRAIN_ATTNBWD", "fullprod")
               == "fullprod"
               and os.environ.get("VITIQ_TRAIN_FPV", "wide") == "wide"
               and _key_split(Lp, seq_len)[1] == 0)
    blk_scratch = ([pltpu.VMEM((G, n_head * Lp, D), x.dtype)]
                   if fpa_blk else [])

    kernel = functools.partial(_bwd_kernel_stacked, seq_len=seq_len,
                               n_head=n_head, drop=drop,
                               layer_base=layer_base, n_layers=n_layers,
                               fpa_blk=fpa_blk)
    outs = _pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // G,),
            in_specs=[data_block, data_block] + stash_specs
            + [rep(w.shape) for w in weights],
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM(w2d(w), jnp.float32)
                            for w in weights] + blk_scratch,
        ),
        out_shape=out_shapes,
    )(jnp.asarray([seed], jnp.int32), xp, dyp, *sbs, *sfs, *weights)

    dx = outs[0][:B, :L, :]
    dws = []
    for w, dw in zip(weights, outs[1:]):
        dw = dw if w.ndim == 2 else dw[0]
        dws.append(dw.astype(w.dtype))
    dseed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return (dseed, dx, *dws)


_fused_train_chunk.defvjp(_fused_train_chunk_fwd, _fused_train_chunk_bwd)


def fused_train_layer_stack(
    x: jnp.ndarray,
    layer_params_list,
    n_head: int,
    drop_prob: float,
    seed,
    seq_len: Optional[int] = None,
) -> jnp.ndarray:
    """Differentiable fused-layer stack for training.

    x: [B, L, D] (bf16 under the TPU policy); `seed` an int32 scalar (fold the
    train-step counter in before calling). Gradients flow to x and to every
    layer parameter via the Pallas backward kernels.
    """
    B, L, D = x.shape
    seq_len = L if seq_len is None else seq_len
    # VITIQ_TRAIN_ATTN: "xpack" routes through the cross-head packed train
    # kernels (train_xpack.py: packed fwd + hybrid packed-recompute bwd,
    # counter-based dropout); "auto" does so where both packed passes fit
    # VMEM. Default stays the chained core until the TPU A/B is recorded
    # (docs/ROADMAP.md lever #1). The dropout mask STREAM differs between
    # cores (hash vs TPU PRNG) — both deterministic in `seed`.
    _attn = os.environ.get("VITIQ_TRAIN_ATTN", "chain")
    if _attn in ("xpack", "auto"):
        from vitiq.ops.pallas.train_xpack import (
            fused_train_layer_stack_xpack,
            xpack_train_supported,
        )

        ffn_h = max(lp_["ffn"]["linear1"]["kernel"].shape[1]
                    for lp_ in layer_params_list)
        if _attn == "xpack" or xpack_train_supported(
                L, D, ffn_h, n_head, x.dtype.itemsize):
            return fused_train_layer_stack_xpack(
                x, layer_params_list, n_head, drop_prob, seed,
                seq_len=seq_len)
    seed = jnp.asarray(seed, jnp.int32)
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    lpc = _lpc_mode(len(layer_params_list), Lp, seq_len, n_head, D,
                    x.dtype.itemsize)
    if lpc > 1:
        base = 0
        while base < len(layer_params_list):
            chunk = layer_params_list[base:base + lpc]
            flats = []
            for lp_ in chunk:
                flats.extend(_flat_weights(lp_, x.dtype))
            x = _fused_train_chunk(n_head, float(drop_prob), base, seq_len,
                                   len(chunk), seed, x, *flats)
            base += len(chunk)
        return x
    for i, lp_ in enumerate(layer_params_list):
        flat = _flat_weights(lp_, x.dtype)
        x = _fused_train_layer(n_head, float(drop_prob), i, seq_len, seed,
                               x, *flat)
    return x
