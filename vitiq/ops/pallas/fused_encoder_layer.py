"""Fully-fused post-norm encoder layer (inference path).

Why: at d_model=128 / L=129 the encoder is HBM-bandwidth-bound — the unfused
layer moves every activation tensor through HBM ~9 times (QKV, attention out,
projection, two LN passes, FFN hidden at 4x width, FFN out). This kernel
keeps the entire layer resident in VMEM per block of G batch rows:

    x -> fused QKV GEMM -> per-head attention (scores never leave VMEM)
      -> output projection -> +residual -> LayerNorm (f32 stats)
      -> FFN (ReLU) -> +residual -> LayerNorm -> out

HBM traffic per layer: read x + weights, write out — ~10x less than unfused.
Semantics are the reference's exact post-norm / biased-variance eps=1e-12 LN /
ReLU chain (ref: ViT/models/blocks/encoder_layer.py:18-35) minus dropout, so
it is used for INFERENCE ONLY (train keeps the differentiable unfused path;
dropout is identity in eval anyway, torch semantics).

Layout rules as in flash_attention.py: packed heads, static lane slices, no
lane-splitting reshapes, per-head streaming into a VMEM scratch accumulator.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
LN_EPS = 1e-12


from vitiq.ops.pallas._common import (  # noqa: E402
    generic_interpret as _generic_interpret,
    pallas_call as _pallas_call,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _layer_norm(x, gamma, beta, out_dtype):
    """f32-stat biased-variance LN over the last dim, cast to out_dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (gamma * out + beta).astype(out_dtype)


def _fused_layer_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    o_ref, attn_scratch,
    *, seq_len: int, n_head: int, scale: float,
):
    g, lp, d = x_ref.shape
    dh = d // n_head
    x = x_ref[:]

    # ---- fused QKV projection: [G, Lp, D] @ [D, 3D] -------------------------
    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]
    qkv = qkv.astype(x.dtype)

    # ---- per-head attention (see flash_attention.py for the layout notes) ---
    key_bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, lp), dimension=2) < seq_len,
        0.0, _NEG_INF,
    ).astype(jnp.float32)
    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        q = qkv[:, :, h * dh:(h + 1) * dh].astype(jnp.float32)
        k = qkv[:, :, d + h * dh:d + (h + 1) * dh].astype(jnp.float32)
        v = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        # exp2 lowers to the VPU's native base-2 exponential (exp(x) =
        # 2^(x*log2 e)); the log2e factor folds into the existing scale mul
        probs = jnp.exp2(scores * 1.4426950408889634 + key_bias)
        denom = jnp.sum(probs, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            probs.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        attn_scratch[:, :, sl] = (out / denom).astype(attn_scratch.dtype)

    # ---- output projection + residual + LN1 ---------------------------------
    proj = jax.lax.dot_general(
        attn_scratch[:], wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    x1 = _layer_norm(proj + x.astype(jnp.float32), g1_ref[:], be1_ref[:], x.dtype)

    # ---- FFN + residual + LN2 ------------------------------------------------
    hmid = jax.lax.dot_general(
        x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    hmid = jnp.maximum(hmid, 0.0).astype(x.dtype)
    y = jax.lax.dot_general(
        hmid, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    o_ref[:] = _layer_norm(y + x1.astype(jnp.float32), g2_ref[:], be2_ref[:],
                           o_ref.dtype)


def _fused_layer_kernel_v2(
    x_ref, m_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    o_ref, attn_scratch,
    *, seq_len: int, n_head: int, scale: float,
):
    """Full-contraction attention variant.

    The v1 kernel's per-head score matmuls contract over d_head=16 — 1/8 MXU
    fill and thousands of fill-latency-bound tiny matmuls per layer (measured
    dominant cost; the softmax exp measured FREE — see docs/BENCHMARKS.md).
    v2 eliminates the narrow contraction with the algebraic identity

        q_h k_h^T = (x' A_h)(x' B_h)^T = x' (A_h B_h^T) x'^T = (x' M_h) x'^T

    where x' = [x | 1] (ones column carries the q/k biases exactly) and
    M_h = A_h B_h^T is a PRECOMPUTED [D+1, D+1] constant per head. Both score
    matmuls then contract over Dp ~= 136 lanes (full MXU fill) at ~8.5x the
    FLOPs — a winning trade when the old path runs ~8-30x below peak.
    Only the V projection remains from QKV.
    """
    g, lp, dp = x_ref.shape  # dp = D + pad (ones column at index D)
    d = wv_ref.shape[1]
    dh = d // n_head
    xp = x_ref[:]

    v = jax.lax.dot_general(
        xp, wv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bv_ref[:]
    v = v.astype(xp.dtype)

    key_bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, lp), dimension=2) < seq_len,
        0.0, _NEG_INF,
    ).astype(jnp.float32)
    for h in range(n_head):
        xm = jax.lax.dot_general(
            xp, m_ref[h], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xp.dtype)  # [G, Lp, Dp], K = Dp (full fill)
        scores = jax.lax.dot_general(
            xm, xp, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [G, Lp, Lp], K = Dp
        probs = jnp.exp(scores + key_bias)
        denom = jnp.sum(probs, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            probs.astype(v.dtype), v[:, :, h * dh:(h + 1) * dh],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        attn_scratch[:, :, h * dh:(h + 1) * dh] = (out / denom).astype(
            attn_scratch.dtype)

    x = xp[:, :, :d]
    proj = jax.lax.dot_general(
        attn_scratch[:], wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    x1 = _layer_norm(proj + x.astype(jnp.float32), g1_ref[:], be1_ref[:], x.dtype)
    hmid = jax.lax.dot_general(
        x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    hmid = jnp.maximum(hmid, 0.0).astype(x.dtype)
    y = jax.lax.dot_general(
        hmid, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    out_final = _layer_norm(y + x1.astype(jnp.float32), g2_ref[:], be2_ref[:],
                            o_ref.dtype)
    # write back WITH the ones column so layers chain without re-padding
    o_ref[:, :, :d] = out_final
    o_ref[:, :, d:] = xp[:, :, d:]


def _augmented_score_matrices(layer_params, n_head: int, dp: int,
                              dtype) -> jnp.ndarray:
    """[H, Dp, Dp] with M_h = [[Wq_h Wk_h^T, Wq_h bk_h], [bq_h^T Wk_h^T,
    bq_h.bk_h]] — so [x|1] M_h [x|1]^T == (x Wq_h + bq_h)(x Wk_h + bk_h)^T."""
    ap = layer_params["attention"]
    wq = ap["w_q"]["kernel"].astype(jnp.float32)  # [D, D]
    wk = ap["w_k"]["kernel"].astype(jnp.float32)
    bq = ap["w_q"]["bias"].astype(jnp.float32)
    bk = ap["w_k"]["bias"].astype(jnp.float32)
    d = wq.shape[0]
    dh = d // n_head
    mats = []
    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        a = jnp.concatenate([wq[:, sl], bq[sl][None, :]], axis=0)  # [D+1, dh]
        b = jnp.concatenate([wk[:, sl], bk[sl][None, :]], axis=0)
        m = a @ b.T  # [D+1, D+1]
        m = jnp.pad(m, ((0, dp - d - 1), (0, dp - d - 1)))
        mats.append(m)
    return jnp.stack(mats).astype(dtype)


def fused_encoder_layer_v2_stack(
    x: jnp.ndarray,
    layer_params_list,
    n_head: int,
    seq_len: Optional[int] = None,
    layers_per_call: int = 2,
) -> jnp.ndarray:
    """Run a whole stack of layers through the v2 kernel.

    Operates on an augmented [B, Lp, Dp] stream (ones column appended once,
    preserved across layers by the kernel) — x: [B, L, D] in/out.
    `layers_per_call` groups consecutive layers into one pallas_call (weights
    stacked on a leading axis, kernel loops) so the activation stream skips
    the HBM round-trip between grouped layers.
    """
    B, L, D = x.shape
    seq_len = L if seq_len is None else seq_len
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    Dp = D + sublane  # D + ones column, rounded to the sublane quantum
    G = _pick_batch_block(Lp, Dp, max(
        lp_["ffn"]["linear1"]["kernel"].shape[1] for lp_ in layer_params_list
    ), x.dtype.itemsize)
    Bp = _round_up(B, G)

    xp = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, Dp - D)))
    xp = xp.at[:, :, D].set(1.0)  # ones column (also on padded rows: harmless)

    data_block = pl.BlockSpec((G, Lp, Dp), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    def rep(shape):
        index_map = lambda i: tuple(0 for _ in shape)
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    def layer_operands(lp_):
        ap = lp_["attention"]
        m = _augmented_score_matrices(lp_, n_head, Dp, x.dtype)
        wv = jnp.pad(ap["w_v"]["kernel"], ((0, Dp - D), (0, 0))).astype(x.dtype)
        return [
            m, wv, ap["w_v"]["bias"].astype(jnp.float32),
            ap["w_concat"]["kernel"].astype(x.dtype),
            ap["w_concat"]["bias"].astype(jnp.float32),
            lp_["norm1"]["gamma"].astype(jnp.float32),
            lp_["norm1"]["beta"].astype(jnp.float32),
            lp_["ffn"]["linear1"]["kernel"].astype(x.dtype),
            lp_["ffn"]["linear1"]["bias"].astype(jnp.float32),
            lp_["ffn"]["linear2"]["kernel"].astype(x.dtype),
            lp_["ffn"]["linear2"]["bias"].astype(jnp.float32),
            lp_["norm2"]["gamma"].astype(jnp.float32),
            lp_["norm2"]["beta"].astype(jnp.float32),
        ]

    N_OPS = 13  # operands per layer (weights flattened, no stacking: Mosaic
    # cannot slice a leading axis when the lane dim isn't 128-aligned)
    for start in range(0, len(layer_params_list), layers_per_call):
        group = layer_params_list[start:start + layers_per_call]
        flat = [op for lp_ in group for op in layer_operands(lp_)]

        def kernel(x_ref, *rest, n_layers=len(group)):
            weight_refs, o_ref, attn_scratch = rest[:-2], rest[-2], rest[-1]
            for c in range(n_layers):
                src = x_ref if c == 0 else o_ref
                _fused_layer_kernel_v2(
                    src, *weight_refs[c * N_OPS:(c + 1) * N_OPS],
                    o_ref, attn_scratch,
                    seq_len=seq_len, n_head=n_head,
                    scale=1.0 / ((D // n_head) ** 0.5),
                )

        xp = _pallas_call(
            kernel,
            grid=(Bp // G,),
            in_specs=[data_block] + [rep(o.shape) for o in flat],
            out_specs=data_block,
            out_shape=jax.ShapeDtypeStruct((Bp, Lp, Dp), x.dtype),
            scratch_shapes=[pltpu.VMEM((G, Lp, D), x.dtype)],
        )(xp, *flat)
    return xp[:B, :L, :D]


def _wide_divide_epilogue(attn_scratch, nums_ref, dens_ref, x_dtype,
                          n_head: int, dh: int, d: int):
    """ONE [G,nq,D] divide instead of 8 narrow per-head ones: denominators
    are expanded onto head lanes with a constant block-diag matmul (f32
    numerator scratch; see _wide_mul_epilogue for the bf16-numerator
    variants)."""
    den_exp = _den_expand(dens_ref[:], x_dtype, n_head, dh, d)
    attn_scratch[:] = (nums_ref[:] / den_exp).astype(attn_scratch.dtype)


def _den_expand(dens, x_dtype, n_head: int, dh: int, d: int):
    """[G,nq,H] f32 -> [G,nq,D] f32 head-lane expansion via a constant
    block-diag matmul; the hi/lo split keeps ~f32 accuracy through the bf16
    MXU (lo <= v*2^-9, so its rounding is ~v*2^-17)."""
    hh = jax.lax.broadcasted_iota(jnp.int32, (n_head, d), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (n_head, d), 1)
    blk_t = (ll // dh == hh).astype(x_dtype)  # [H, D]
    hi_p = dens.astype(x_dtype)
    lo_p = (dens - hi_p.astype(jnp.float32)).astype(x_dtype)
    return jax.lax.dot_general(
        hi_p, blk_t, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        lo_p, blk_t, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G, nq, D]


def _wide_mul_epilogue(attn_scratch, nums_ref, dens_ref, x_dtype,
                       n_head: int, dh: int, d: int, epi: str):
    """Normalization over bf16 numerators (epilogue A/B variants; the
    measured tables live in docs/BENCHMARKS.md round-2.6):

    * "mul":  numerators were stored in place in attn_scratch; reciprocal on
      the narrow [G,nq,H] denominators, then an in-place wide multiply.
    * "mul2": numerators in a separate bf16 scratch; rcp + wide multiply.
    * "div2": numerators in a separate bf16 scratch; wide divide (no rcp).

    All three carry bf16 numerator rounding (2^-9 relative) — the attention
    output is cast to bf16 immediately after anyway, so the end error class
    is unchanged."""
    if epi == "div2":
        den_exp = _den_expand(dens_ref[:], x_dtype, n_head, dh, d)
        attn_scratch[:] = (
            nums_ref[:].astype(jnp.float32) / den_exp
        ).astype(attn_scratch.dtype)
        return
    if epi == "div3":
        # dens_ref is [G,nq,D] f32 holding [den_h, 0...] per dh-lane block
        # (16-lane stores instead of 1-lane); expansion selects lane h*dh
        # onto all of head h's lanes: blk3[i,j] = [i == (j//dh)*dh]
        ii = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
        blk3 = (ii == (jj // dh) * dh).astype(x_dtype)  # [D, D]
        dens = dens_ref[:]
        hi_p = dens.astype(x_dtype)
        lo_p = (dens - hi_p.astype(jnp.float32)).astype(x_dtype)
        den_exp = jax.lax.dot_general(
            hi_p, blk3, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            lo_p, blk3, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        attn_scratch[:] = (nums_ref[:] / den_exp).astype(attn_scratch.dtype)
        return
    rec_exp = _den_expand(1.0 / dens_ref[:], x_dtype, n_head, dh, d)
    src = attn_scratch if epi == "mul" else nums_ref
    attn_scratch[:] = (
        src[:].astype(jnp.float32) * rec_exp
    ).astype(attn_scratch.dtype)


def _v3_attention_core(qkv, x_dtype, attn_scratch, nums_ref=None,
                       dens_ref=None, *, seq_len: int,
                       n_head: int, vpu_tail: bool = True,
                       probe: Optional[str] = None, head_group: int = 1,
                       epi: str = "div", q_sec=None, pack: int = 1):
    """Score-tile-streamed attention shared by the v3 kernels.

    qkv: [G, Lp, 3D] with the q section pre-scaled by softmax_scale*log2(e)
    (host fold). Writes the NORMALIZED per-head attention outputs into
    attn_scratch [G, nq, D], where nq = Lp for the full kernels or 8 for the
    CLS-only kernel (query rows are always the first nq rows). With `q_sec`
    ([G, nq, D], pre-scaled), queries come from that array instead of
    qkv[:, :nq, :D] — the long-sequence kernel passes an arbitrary query
    TILE against the full key/value stream this way.

    Key-coverage strategy (the round-2.5 addition): MXU pass count scales
    with M-tiles x N-tiles, so a remainder score tile of width 16 costs the
    SAME passes as a full 128-wide tile while carrying ~1 real key on the
    flagship (Lp=144, seq_len=129). When the remainder holds <= 8 real keys,
    it is computed instead as rank-1 VPU corrections — per tail key j:
    s_j = sum(q * k_j) (broadcast multiply + lane reduction), p_j = exp2(s_j),
    acc += p_j * [v_j | 1] — halving the attention MXU passes at Lp=144.
    Padded keys are skipped entirely in that mode (no masking op needed);
    otherwise the padded-key masking rides in zeroed [v|1] rows as before.
    """
    g, lp, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_head
    nq = attn_scratch.shape[1]
    qsrc = qkv[:, :, :d] if q_sec is None else q_sec

    # TIMING-ONLY surgery probes (wrong outputs; VITIQ_V3_PROBE):
    #   noattn  — skip scores/softmax/PV entirely (attn := v)
    #   noscore — replace the score matmuls with a lane-broadcast column
    #   nopv    — replace the PV matmuls with a probs slice
    if probe == "noattn":
        attn_scratch[:] = qkv[:, :nq, 2 * d:3 * d].astype(attn_scratch.dtype)
        return

    mxu_k = (lp // 128) * 128
    use_tail = (pack == 1 and vpu_tail and mxu_k >= 128 and mxu_k <= seq_len
                and (seq_len - mxu_k) <= 8)
    if use_tail:
        # vpu_tail == "drop" is a TIMING PROBE ONLY: the tail keys are
        # dropped outright (wrong outputs) to bound the max win of removing
        # the remainder tile. Set via VITIQ_V3_TAIL=drop.
        n_tail = 0 if vpu_tail == "drop" else seq_len - mxu_k
        v_mask = None  # every MXU-covered key (< mxu_k <= seq_len) is real
    else:
        mxu_k = lp
        n_tail = 0
        elem_len = lp // pack  # per-element padded length
        v_mask = None if seq_len >= elem_len else "mask"

    lane = jax.lax.broadcasted_iota(jnp.int32, (g, lp, dh), dimension=2)
    if v_mask is not None:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, lp, dh), dimension=1)
        if pack > 1:
            row = row % elem_len
        ones_block = jnp.where((lane == 0) & (row < seq_len), 1.0, 0.0)
        v_mask = (row < seq_len)
    else:
        ones_block = jnp.where(lane == 0, 1.0, 0.0)
    ones_block = ones_block.astype(x_dtype)

    if head_group > 1 and n_tail == 0 and probe is None:
        # HEAD-GROUPED STAGING: the kernel is serialization-bound across the
        # 8 sequential per-head score->exp->PV chains (measured: dropping the
        # entire second-tile chain saves ~0 — it rides in scheduling slack —
        # while the critical path is per-head). Grouping `head_group` heads
        # per stage issues their score matmuls back-to-back, runs ONE wide
        # exp2 over the concatenated [G, nq, hg*128] scores, then their PVs —
        # widening every VPU stage and giving the scheduler independent MXU
        # work to overlap with the VPU.
        full_k = (lp // 128) * 128
        rem = lp - full_k
        qs_, ks_, vaugs = [], [], []
        for h in range(n_head):
            q = qsrc[:, :nq, h * dh:(h + 1) * dh]
            k = qkv[:, :, d + h * dh:d + (h + 1) * dh]
            v = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
            if v_mask is not None:
                v = jnp.where(v_mask, v, 0)
            qs_.append(q)
            ks_.append(k)
            vaugs.append(jnp.concatenate([v, ones_block], axis=-1))
        for h0 in range(0, n_head, head_group):
            grp = list(range(h0, min(h0 + head_group, n_head)))
            acc_g = {h: None for h in grp}
            for c0 in range(0, full_k, 128):
                scs = [jax.lax.dot_general(
                    qs_[h], ks_[h][:, c0:c0 + 128, :],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) for h in grp]
                wide = scs[0] if len(scs) == 1 else jnp.concatenate(scs, -1)
                probs_w = jnp.exp2(wide).astype(x_dtype)
                for i, h in enumerate(grp):
                    part = jax.lax.dot_general(
                        probs_w[:, :, i * 128:(i + 1) * 128],
                        vaugs[h][:, c0:c0 + 128, :],
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    acc_g[h] = part if acc_g[h] is None else acc_g[h] + part
            for h in grp:
                acc = acc_g[h]
                if rem:
                    sc = jax.lax.dot_general(
                        qs_[h], ks_[h][:, full_k:lp, :],
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    pr = jnp.exp2(sc).astype(x_dtype)
                    part = jax.lax.dot_general(
                        pr, vaugs[h][:, full_k:lp, :],
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
                if nums_ref is None:
                    attn_scratch[:, :, h * dh:(h + 1) * dh] = (
                        acc[:, :, :dh] / acc[:, :, dh:dh + 1]
                    ).astype(attn_scratch.dtype)
                else:
                    nums_ref[:, :, h * dh:(h + 1) * dh] = acc[:, :, :dh]
                    dens_ref[:, :, h:h + 1] = acc[:, :, dh:dh + 1]
        if nums_ref is not None:
            _wide_divide_epilogue(attn_scratch, nums_ref, dens_ref, x_dtype,
                                  n_head, dh, d)
        return

    accs = []
    for h in range(n_head):
        q = qsrc[:, :nq, h * dh:(h + 1) * dh]
        k = qkv[:, :, d + h * dh:d + (h + 1) * dh]
        v = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        if v_mask is not None:
            v = jnp.where(v_mask, v, 0)
        vaug = jnp.concatenate([v, ones_block], axis=-1)  # [G, Lp, 2dh]
        acc = None
        for c0 in range(0, mxu_k, 128):
            t = min(128, mxu_k - c0)
            if probe == "noscore":
                scores = jax.lax.broadcast_in_dim(
                    q[:, :, :1].astype(jnp.float32), (g, nq, t), (0, 1, 2))
            else:
                scores = jax.lax.dot_general(
                    q, k[:, c0:c0 + t, :],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [G, nq, t] — pre-scaled by scale*log2e via the folded W_q
            if probe == "noexp":
                probs = scores.astype(x_dtype)
            else:
                probs = jnp.exp2(scores.astype(jnp.float32)).astype(x_dtype)
            if pack > 1:
                # BATCH-PACKED short sequences: `pack` frames ride in one
                # score tile (frame p owns rows [p*Le, (p+1)*Le)); zero the
                # cross-frame probabilities with a constant block-diagonal
                # multiply so PV and the ones-column denominator sum only
                # each query's own frame. Masking PROBS (not scores) keeps
                # the score path mask-free, exp2 stays unconditioned, and a
                # multiply-by-constant on a matmul output is the same op
                # class the int8 kernel's dequant already uses.
                rr = jax.lax.broadcasted_iota(jnp.int32, (nq, t), 0)
                cc = jax.lax.broadcasted_iota(jnp.int32, (nq, t), 1)
                bm = (rr // elem_len == (c0 + cc) // elem_len)
                probs = probs * bm.astype(x_dtype)
            if probe == "nopv":
                part = jax.lax.broadcast_in_dim(
                    probs[:, :, :1].astype(jnp.float32), (g, nq, 2 * dh),
                    (0, 1, 2)) + 1.0
            else:
                part = jax.lax.dot_general(
                    probs, vaug[:, c0:c0 + t, :],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [G, nq, 2dh]: [:dh] = unnormalized out, [dh] = denom
            acc = part if acc is None else acc + part
        if n_tail:
            accs.append(acc)  # normalized after the packed tail correction
        elif probe == "nodiv":
            attn_scratch[:, :, h * dh:(h + 1) * dh] = (
                acc[:, :, :dh]).astype(attn_scratch.dtype)
        elif dens_ref is None:
            # legacy epilogue: per-head narrow f32 divide — measured 17.5 ms
            # over 6 flagship layers (nodiv probe 69.6 vs 87.1 baseline)
            attn_scratch[:, :, h * dh:(h + 1) * dh] = (
                acc[:, :, :dh] / acc[:, :, dh:dh + 1]).astype(attn_scratch.dtype)
        elif epi == "mul":
            # bf16 numerators go straight into attn_scratch; normalized in
            # place by _wide_mul_epilogue (no separate nums round trip)
            attn_scratch[:, :, h * dh:(h + 1) * dh] = (
                acc[:, :, :dh]).astype(attn_scratch.dtype)
            dens_ref[:, :, h:h + 1] = acc[:, :, dh:dh + 1]
        elif epi == "div3":
            nums_ref[:, :, h * dh:(h + 1) * dh] = acc[:, :, :dh]
            # full 16-lane store of [den, 0, ...] instead of a 1-lane store
            dens_ref[:, :, h * dh:(h + 1) * dh] = acc[:, :, dh:2 * dh]
        else:
            nums_ref[:, :, h * dh:(h + 1) * dh] = (
                acc[:, :, :dh]).astype(nums_ref.dtype)
            dens_ref[:, :, h:h + 1] = acc[:, :, dh:dh + 1]

    if not n_tail and probe != "nodiv" and dens_ref is not None:
        # The 8 per-head [G,nq,16]/[G,nq,1] divides measured 2.9 ms/layer
        # (nodiv probe); one wide op replaces them.
        if epi == "div":
            _wide_divide_epilogue(attn_scratch, nums_ref, dens_ref, x_dtype,
                                  n_head, dh, d)
        else:
            _wide_mul_epilogue(attn_scratch, nums_ref, dens_ref, x_dtype,
                               n_head, dh, d, epi)

    if n_tail:
        # Packed cross-head tail: ALL heads' tail-key contributions ride in
        # full-width ops. Per-head narrow VPU broadcasts lower catastrophically
        # in Mosaic (measured 117.6 ms vs 79.8 baseline) and sublane-
        # broadcasting a [G,1,D] row is rejected outright ("Invalid input
        # layout" on vector.broadcast), so single rows are expanded to all
        # query rows with a K=1 ONES OUTER-PRODUCT MATMUL — one MXU pass,
        # the same cost class as everything else here. Per tail key j:
        #   k_exp = ones @ k_row          row expansion (MXU, K=1)
        #   s     = (q_all*k_exp) @ blk   [D, H] constant block-diag ones
        #   p     = exp2(s)               [G, nq, H]
        #   pexp  = p @ blk^T             p_h onto head-h lanes (MXU)
        #   corr  = pexp * (ones @ v_row)
        # and the per-head normalize folds corr/p into out/denominator.
        # Net: ~4 MXU passes per tail key replace a full score+PV tile pair
        # per HEAD (8x18G passes on the flagship).
        li = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 0)
        hi = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 1)
        blk = (li // dh == hi).astype(x_dtype)  # [D, H]
        ones_col = jnp.ones((g, nq, 1), x_dtype)

        def expand_row(rowvec):  # [G, 1, D] -> [G, nq, D] (f32)
            return jax.lax.dot_general(
                ones_col, rowvec,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        q_all = qsrc[:, :nq, :]
        corr = None
        pacc = None
        for j in range(n_tail):
            k_row = qkv[:, mxu_k + j:mxu_k + j + 1, d:2 * d]
            v_row = qkv[:, mxu_k + j:mxu_k + j + 1, 2 * d:3 * d]
            prod = q_all * expand_row(k_row).astype(x_dtype)  # [G, nq, D]
            s_all = jax.lax.dot_general(
                prod, blk, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, nq, H] — column h = q_h . k_h(tail j), pre-scaled
            p_all = jnp.exp2(s_all)
            p_exp = jax.lax.dot_general(
                p_all.astype(x_dtype), blk,
                dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, nq, D] — p_h broadcast across head-h lanes
            c = p_exp * expand_row(v_row)
            corr = c if corr is None else corr + c
            pacc = p_all if pacc is None else pacc + p_all

        for h in range(n_head):
            acc = accs[h]
            out = acc[:, :, :dh] + corr[:, :, h * dh:(h + 1) * dh]
            den = acc[:, :, dh:dh + 1] + pacc[:, :, h:h + 1]
            attn_scratch[:, :, h * dh:(h + 1) * dh] = (
                out / den).astype(attn_scratch.dtype)


def _v3_attention_core_xpack(qkv, x_dtype, attn_scratch, nums_ref, dens_ref,
                             kp_ref, vp_ref, *, seq_len: int, n_head: int,
                             q_sec=None, zero_fill: bool = True):
    """CROSS-HEAD PACKED attention: one block-diagonal GEMM chain replaces
    the H sequential per-head score->exp->PV chains — the measured
    serialization wall of the v3 kernel (docs/BENCHMARKS.md round-2.6:
    surgery-probe deltas don't add up because ops ride in per-head
    scheduling slack; the critical path is the 8-fold chain).

    Layout trick: K and V are scattered into BLOCK-DIAGONAL [H*Lp, D]
    operands — head h's keys occupy rows [h*Lp, (h+1)*Lp) and lanes
    [h*dh, (h+1)*dh), zeros elsewhere. Then ONE matmul of the UNSPLIT query
    tile against kp^T yields every head's score tile at once, because head
    h's score columns contract exactly over head h's lane slice of q:

        scores [G,nq,H*Lp] = q_full @ kp^T     (single GEMM)
        probs              = exp2(scores)      (one wide VPU pass)
        nums   [G,nq,D]    = probs @ vp        (single GEMM; vp block-diag
                                                routes head h's probs onto
                                                head h's output lanes)
        dens   [G,nq,H]    = probs @ ones_bd   (narrow N=H matmul)

    MXU pass count is IDENTICAL to the chained path (a dh=16 contraction
    costs the same 128-deep pass after padding), but the work arrives as 3
    GEMMs + 1 exp2 instead of 8x(score, exp, PV) = 24 serialized stages.
    Score-tensor VMEM bytes/element match v3 (4 write + 4 read + 2 + 2);
    the block-diagonal scratch build writes only each head's dh-lane slice
    (one [G,Lp,D] pass after a zero fill). Padded-key masking rides in
    zeroed vp rows + ones_bd rows — the score path stays mask-free and
    padded scores are finite (bias values), exactly like v3.
    """
    g, lp, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_head
    nq = attn_scratch.shape[1]
    qsrc = qkv[:, :nq, :d] if q_sec is None else q_sec

    if zero_fill:
        # only the per-head dh-lane slices are ever written; callers running
        # several layers through the same scratch zero ONCE and pass
        # zero_fill=False thereafter (the off-block zeros are never dirtied)
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
        qsrc, kp_ref[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, nq, H*Lp] — q pre-scaled by scale*log2e via the folded W_q
    probs = jnp.exp2(scores).astype(x_dtype)
    nums_ref[:] = jax.lax.dot_general(
        probs, vp_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, nq, D]
    r_i = jax.lax.broadcasted_iota(jnp.int32, (n_head * lp, n_head), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (n_head * lp, n_head), 1)
    ones_bd = ((r_i // lp == c_i) & (r_i % lp < seq_len)).astype(x_dtype)
    dens_ref[:] = jax.lax.dot_general(
        probs, ones_bd,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G, nq, H]
    _wide_divide_epilogue(attn_scratch, nums_ref, dens_ref, x_dtype,
                          n_head, dh, d)


def _fused_layer_kernel_v3(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    o_ref, attn_scratch, nums_scratch, dens_scratch,
    *, seq_len: int, n_head: int, vpu_tail: bool = True,
    probe: Optional[str] = None, head_group: int = 1,
    epi: str = "div", pack: int = 1,
    kp_ref=None, vp_ref=None, xpack_zero_fill: bool = True,
):
    """Score-tile-streamed attention variant.

    What v3 changes vs v1, and why (all driven by the measured round-1
    attribution: the wall is VMEM traffic over the [G, Lp, Lp] score tensors,
    ~22 ms/layer on the flagship — docs/BENCHMARKS.md):

    * Lk TILING AT 128: score/prob tensors are computed in [G, Lp, <=128]
      key-column tiles. An Lp=144 lane dimension is physically padded to 256
      lanes (two tiles), so every VMEM pass over an untiled score tensor
      costs 1.78x its logical bytes; a 128-wide tile has zero lane padding.
    * bf16 PROBS: the exp pass writes probabilities in bf16 (they feed a bf16
      MXU matmul anyway), halving the probs write + read bytes. (Emitting the
      score matmul itself in bf16 is NOT possible: Mosaic requires a 32-bit
      matmul accumulator — "Expected matmul acc to be 32-bit" — and a
      separate cast pass would save nothing over the exp pass's own
      f32-read/bf16-write.)
    * MXU DENOMINATOR: V is augmented with a ones column, so the softmax
      denominator rides along in the probs @ [v|1] matmul (N=16 -> 32 fills
      the same 128-wide MXU column tile; marginal cost ~0) and the separate
      VPU lane-reduction pass over the full score tensor disappears.
    * SCALE FOLDED INTO WEIGHTS: the host wrapper pre-multiplies W_q/b_q by
      softmax_scale * log2(e), so the kernel's only per-score VPU work is a
      single exp2 (and a bias add on the one partially-masked tile).

    Net score-sized VMEM bytes per element: 35.6 -> ~8-12 (see the v3_stack
    docstring); everything after attention is identical to v1.
    """
    g, lp, d = x_ref.shape
    x = x_ref[:]

    if probe == "noqkv":  # TIMING-ONLY surgery probes; see _v3_attention_core
        qkv = jnp.concatenate([x, x, x], axis=-1)
    else:
        qkv = jax.lax.dot_general(
            x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[:]
        qkv = qkv.astype(x.dtype)

    # Padded-key masking lives ENTIRELY in the augmented V operand: rows
    # >= seq_len of [v | ones] are zeroed, so padded keys contribute exactly
    # 0 to both the attention output and the ones-column denominator — the
    # softmax is taken over valid keys only, with NO masking op anywhere on
    # the score path. (Elementwise-combining a matmul OUTPUT with an
    # iota-derived mask on a narrow <128-lane tile crashes the Mosaic
    # lowering — "Check failed: limits[i] <= dim(i)" — whereas iota/select
    # on plain values feeding matmul INPUTS lowers fine; see
    # scripts/tpu_probe_mask_ops.py for the op-by-op bisection.)
    # Correctness requires the padded columns' probs to stay FINITE, which
    # holds under the same |score| < 88 bound as the rest of the kernel.
    if kp_ref is not None:
        _v3_attention_core_xpack(
            qkv, x.dtype, attn_scratch, nums_scratch, dens_scratch,
            kp_ref, vp_ref, seq_len=seq_len, n_head=n_head,
            zero_fill=xpack_zero_fill)
    else:
        _v3_attention_core(qkv, x.dtype, attn_scratch, nums_scratch,
                           dens_scratch, seq_len=seq_len, n_head=n_head,
                           vpu_tail=vpu_tail, probe=probe,
                           head_group=head_group, epi=epi, pack=pack)

    if probe == "noproj":
        proj = attn_scratch[:].astype(jnp.float32)
    else:
        proj = jax.lax.dot_general(
            attn_scratch[:], wo_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[:]
    x1 = _layer_norm(proj + x.astype(jnp.float32), g1_ref[:], be1_ref[:], x.dtype)
    if probe == "noffn":
        y = x1.astype(jnp.float32)
    else:
        hmid = jax.lax.dot_general(
            x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:]
        hmid = jnp.maximum(hmid, 0.0).astype(x.dtype)
        y = jax.lax.dot_general(
            hmid, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[:]
    o_ref[:] = _layer_norm(y + x1.astype(jnp.float32), g2_ref[:], be2_ref[:],
                           o_ref.dtype)


def _fused_layer_kernel_v3_attn_int8(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    o_ref, attn_scratch,
    *, seq_len: int, n_head: int,
):
    """v3 with an INT8 ATTENTION CORE (weights stay bf16).

    After v3's VMEM cuts the flagship is MXU-pass-bound and the score + PV
    matmuls are ~73% of all passes; int8 runs the MXU at 2x the bf16 rate, so
    both are quantized DYNAMICALLY in-kernel:

    * q rows -> int8 with per-row absmax scales (a row-vector multiply on the
      dequant, the same broadcast class as the denominator divide); k -> int8
      with one per-head-block scale (k rows are LayerNorm'd, so their norms
      are tight enough for a tensor scale).
    * probs: exp2(scores - row_max) in (0, 1] quantized to uint7 in int8.
      ANY per-row scaling of probs cancels exactly in the final
      out/denominator division (both are linear in the row), so the
      quantization needs no dequant scale at all — and the row-max subtract
      incidentally makes this variant immune to the |score| < 88 overflow
      assumption the other kernels document.

    Everything outside attention is the v3 bf16 path.
    """
    g, lp, d = x_ref.shape
    dh = d // n_head
    x = x_ref[:]

    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]
    qkv = qkv.astype(x.dtype)

    lane = jax.lax.broadcasted_iota(jnp.int32, (g, lp, dh), dimension=2)
    if seq_len < lp:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, lp, dh), dimension=1)
        ones_block = jnp.where((lane == 0) & (row < seq_len), 1.0, 0.0)
        v_mask = (row < seq_len)
    else:
        ones_block = jnp.where(lane == 0, 1.0, 0.0)
        v_mask = None
    ones_block = ones_block.astype(x.dtype)

    for h in range(n_head):
        q = qkv[:, :, h * dh:(h + 1) * dh].astype(jnp.float32)
        k = qkv[:, :, d + h * dh:d + (h + 1) * dh].astype(jnp.float32)
        v = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        if v_mask is not None:
            v = jnp.where(v_mask, v, 0)
        vaug = jnp.concatenate([v, ones_block], axis=-1)  # [G, Lp, 2dh]

        aq = jnp.maximum(jnp.max(jnp.abs(q), axis=-1, keepdims=True), 1e-8)
        qq = jnp.round(q * (127.0 / aq)).astype(jnp.int8)
        ak = jnp.maximum(jnp.max(jnp.abs(k)), 1e-8)  # per-head-block scalar
        kq = jnp.round(k * (127.0 / ak)).astype(jnp.int8)
        # scale*log2e is folded into W_q by the host wrapper, so the dequant
        # factor aq*ak/127^2 is the only multiplier left before exp2
        deq = aq * (ak / (127.0 * 127.0))  # [G, Lp, 1]
        # per-head-block vaug scale: scales out and denominator uniformly,
        # so it cancels exactly in the final division (no dequant needed)
        av = jnp.maximum(jnp.max(jnp.abs(vaug.astype(jnp.float32))), 1e-8)
        vq = jnp.round(vaug.astype(jnp.float32) * (127.0 / av)).astype(jnp.int8)

        acc = None
        for c0 in range(0, lp, 128):
            t = min(128, lp - c0)
            scores = jax.lax.dot_general(
                qq, kq[:, c0:c0 + t, :],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * deq  # [G, Lp, t]
            m = jnp.max(scores, axis=-1, keepdims=True)
            probs = jnp.round(jnp.exp2(scores - m) * 127.0).astype(jnp.int8)
            part = jax.lax.dot_general(
                probs, vq[:, c0:c0 + t, :],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # [G, Lp, 2dh]
            # NOTE per-tile row maxes differ; rescale tiles onto a common max
            if acc is None:
                acc, acc_m = part, m
            else:
                new_m = jnp.maximum(acc_m, m)
                acc = acc * jnp.exp2(acc_m - new_m) + part * jnp.exp2(m - new_m)
                acc_m = new_m
        attn_scratch[:, :, h * dh:(h + 1) * dh] = (
            acc[:, :, :dh] / acc[:, :, dh:dh + 1]).astype(attn_scratch.dtype)

    proj = jax.lax.dot_general(
        attn_scratch[:], wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    x1 = _layer_norm(proj + x.astype(jnp.float32), g1_ref[:], be1_ref[:], x.dtype)
    hmid = jax.lax.dot_general(
        x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    hmid = jnp.maximum(hmid, 0.0).astype(x.dtype)
    y = jax.lax.dot_general(
        hmid, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    o_ref[:] = _layer_norm(y + x1.astype(jnp.float32), g2_ref[:], be2_ref[:],
                           o_ref.dtype)


def _fused_layer_kernel_v3_cls(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    o_ref, attn_scratch, nums_scratch, dens_scratch,
    *, seq_len: int, n_head: int, vpu_tail: bool = True, epi: str = "div",
):
    """v3 kernel computing ONLY the CLS row (query 0) of the layer output.

    For CLS-pooled classification the head consumes just token 0 of the LAST
    layer, so its attention needs a single query row: scores shrink from
    [G, Lp, Lp] to [G, 8, Lp] (one sublane tile) and the projection/FFN/LN
    tail runs on 8 rows — the last layer costs ~1/18 of a full one.
    K/V still come from the full token stream. o_ref: [G, 8, D] (row 0 valid).
    """
    g, lp, d = x_ref.shape
    rq = o_ref.shape[1]  # 8: one sublane tile of query rows
    x = x_ref[:]

    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]
    qkv = qkv.astype(x.dtype)

    _v3_attention_core(qkv, x.dtype, attn_scratch, nums_scratch, dens_scratch,
                       seq_len=seq_len, n_head=n_head, vpu_tail=vpu_tail,
                       epi=epi)

    xr = x[:, :rq, :]
    proj = jax.lax.dot_general(
        attn_scratch[:], wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    x1 = _layer_norm(proj + xr.astype(jnp.float32), g1_ref[:], be1_ref[:], x.dtype)
    hmid = jax.lax.dot_general(
        x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    hmid = jnp.maximum(hmid, 0.0).astype(x.dtype)
    y = jax.lax.dot_general(
        hmid, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    o_ref[:] = _layer_norm(y + x1.astype(jnp.float32), g2_ref[:], be2_ref[:],
                           o_ref.dtype)


def _pick_batch_block_v3(Lp: int, D: int, H: int, itemsize: int) -> int:
    t = min(128, Lp)
    for g in (32, 16, 8, 4, 2, 1):
        x_like = g * Lp * D
        vmem = (
            2 * 2 * x_like * itemsize          # in/out double-buffered
            + 3 * x_like * itemsize            # qkv
            + x_like * itemsize                # attn scratch
            + g * Lp * t * (4 + itemsize)      # one score tile f32 + probs tile
            + 2 * g * Lp * H * itemsize        # ffn hidden (+relu copy)
            + 3 * x_like * 4                   # f32 LN temps / residuals
        )
        if vmem <= 10 * 1024 * 1024:
            return g
    return 1


def _pick_batch_block_v3_xpack(Lp: int, D: int, H: int, n_head: int,
                               itemsize: int) -> int:
    """VMEM-fitting G for the cross-head packed core: the full [nq, H*Lp]
    score/prob tensors plus two [H*Lp, D] block-diagonal scratches replace
    the streamed 128-wide tiles, so G lands smaller than v3's. Returns 0
    when even G=1 cannot fit (long sequences) — caller falls back to the
    chained core. Measured ladder on the flagship (Lp=144, H8, ~2.29 MB/G
    estimate; scripts/round3b_tpu_runs.sh + the G=7 follow-up): G=2 loses
    (88.6 ms, M=288-row matmuls + 4x grid steps); G=4 69.2→66.7 ms;
    G=5 65.9; G=6 64.25; **G=7 62.09 ms (131.9K frames/s, the round-3
    default)**; G=8 (18.3 MB) fails to compile within the AOT budget —
    hence the 16.2 MB cap, which admits exactly G=7 on the flagship.
    Small-Lp ladder (round 3d, seg-64 Lp=32): G=4 324.9K < G=8 413.2K <
    G=16 541.8K ~ G=32 548.0K (G=24 dips to 491.2K); Lp=80's G=16
    measured SLOWER than G=8 (206.3K vs 221.6K) and is excluded by the
    budget anyway (21.6 MB). For Lp <= 32 the candidate ladder extends to
    64/32 (the ~0.2-0.4 MB/G footprints leave the 16-grid far from the
    VMEM wall and the measured Lp=32 ladder keeps rising to G=32): seg-64
    CLS (Lp=32, ~0.41 MB/G) lands on G=32 — measured 631.2K frames/s
    @ 16384 (round 3h; was 541.8K at the old G=16 pick); seg-64
    MEAN-POOL (Lp=16, ~0.19 MB/G) lands on G=64 — round-3h ladder
    @ 16384: G=16 985K < G=32 1,178K ~ G=64 1,300K ~ G=96 1,145K
    (32/64/96 share one noise band; one forced-G=64 probe read 534K,
    contradicted by three same-program runs — relay wedge, ledgered in
    docs/BENCHMARKS.md round 3h)."""
    cands = ((64, 32, 24, 16, 8, 7, 6, 5, 4, 3, 2, 1) if Lp <= 32
             else (16, 8, 7, 6, 5, 4, 3, 2, 1))
    for g in cands:
        x_like = g * Lp * D
        vmem = (
            2 * 2 * x_like * itemsize              # in/out double-buffered
            + 3 * x_like * itemsize                # qkv
            + x_like * itemsize                    # attn scratch
            + x_like * 4                           # nums f32
            + g * Lp * n_head * 4                  # dens f32
            + 2 * g * n_head * Lp * D * itemsize   # kp + vp block-diag scratch
            + g * Lp * n_head * Lp * (4 + itemsize)  # scores f32 + probs
            + 2 * g * Lp * H * itemsize            # ffn hidden (+relu copy)
            + 2 * x_like * 4                       # f32 LN temps / residuals
        )
        if vmem <= 16 * 1024 * 1024 + 200 * 1024:
            return g
    return 0


_LOG2E = 1.4426950408889634


def xpack_layer_operands(lp_, dtype, scale):
    """The 12 per-layer operands of the xpack kernels (v3 stack AND the
    key-tiled fallback in serve_xpack_kt.py — numerics-critical, keep one
    copy). Folds softmax scale * log2(e) into the q projection (constants,
    folded by XLA at trace time) so the kernel needs no per-score multiply,
    just exp2."""
    ap = lp_["attention"]
    wqkv = jnp.concatenate([
        ap["w_q"]["kernel"].astype(jnp.float32) * scale,
        ap["w_k"]["kernel"].astype(jnp.float32),
        ap["w_v"]["kernel"].astype(jnp.float32),
    ], axis=1).astype(dtype)
    bqkv = jnp.concatenate([
        ap["w_q"]["bias"].astype(jnp.float32) * scale,
        ap["w_k"]["bias"].astype(jnp.float32),
        ap["w_v"]["bias"].astype(jnp.float32),
    ]).astype(jnp.float32)
    return [
        wqkv, bqkv,
        ap["w_concat"]["kernel"].astype(dtype),
        ap["w_concat"]["bias"].astype(jnp.float32),
        lp_["norm1"]["gamma"].astype(jnp.float32),
        lp_["norm1"]["beta"].astype(jnp.float32),
        lp_["ffn"]["linear1"]["kernel"].astype(dtype),
        lp_["ffn"]["linear1"]["bias"].astype(jnp.float32),
        lp_["ffn"]["linear2"]["kernel"].astype(dtype),
        lp_["ffn"]["linear2"]["bias"].astype(jnp.float32),
        lp_["norm2"]["gamma"].astype(jnp.float32),
        lp_["norm2"]["beta"].astype(jnp.float32),
    ]


def fused_encoder_layer_v3_stack(
    x: jnp.ndarray,
    layer_params_list,
    n_head: int,
    seq_len: Optional[int] = None,
    layers_per_call: Optional[int] = None,
    g_override: Optional[int] = None,
    attn_int8: bool = False,
    cls_only: bool = False,
) -> jnp.ndarray:
    """Run a stack of layers through the v3 (score-tile-streamed) kernel.

    Plain [B, L, D] stream (no augmentation column — v1 layout, so the
    activation stream has zero lane padding). Per-element score-sized VMEM
    bytes: v1 untiled/padded = (4+4+4+4+4) x 1.78 = 35.6; v3 = 4 (scores
    write) + 4 (exp read) + 2 (probs write) + 2 (MXU read) = 12, or 8 with
    scores_bf16. `layers_per_call` groups consecutive layers into one
    pallas_call as in v2_stack.
    """
    import os

    B, L, D = x.shape
    seq_len = L if seq_len is None else seq_len
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    # probe knobs (scripts/tpu_time.py A/Bs): VITIQ_V3_G, VITIQ_V3_LPC,
    # VITIQ_V3_TAIL. The tail-key rework is default-OFF: measured on v5e the
    # 16-wide remainder score tile is FREE (drop probe 79.04 ms vs baseline
    # 78.97) and every replacement is a net loss (narrow VPU rank-1: 117.6;
    # packed ones-matmul expansion: 96.9) — MXU cost tracks the actual N
    # width, not ceil(N/128), so there was nothing to win. Kept (gated +
    # tested) as the record of that measurement.
    g_override = g_override or int(os.environ.get("VITIQ_V3_G", "0")) or None
    layers_per_call = layers_per_call or int(os.environ.get("VITIQ_V3_LPC", "0")) or 0
    _tail_env = os.environ.get("VITIQ_V3_TAIL", "0")
    vpu_tail = "drop" if _tail_env == "drop" else _tail_env != "0"
    # VITIQ_V3_PROBE (timing-only kernel surgery, wrong outputs):
    # noattn | noscore | nopv | noqkv | noproj | noffn | noexp | nodiv
    probe = os.environ.get("VITIQ_V3_PROBE") or None
    # VITIQ_V3_HG: heads per score->exp->PV stage group (1 = head-at-a-time).
    # MEASURED LOSS on v5e (layers3 87.2/89.8/86.1 ms for HG=2/4/8 vs 84.4
    # ungrouped): Mosaic already software-pipelines the per-head chains;
    # grouping only adds concatenate traffic. Kept as the record.
    head_group = int(os.environ.get("VITIQ_V3_HG", "1"))
    # VITIQ_V3_EPI: softmax normalization epilogue — "mul" (bf16 numerators
    # in place + reciprocal multiply) or "div" (f32 numerator scratch + wide
    # divide)
    epi = os.environ.get("VITIQ_V3_EPI", "div")
    if epi not in ("div", "div2", "div3", "mul", "mul2"):
        epi = "div"
    if head_group > 1:
        epi = "div"  # the grouped path only implements the div epilogue
    # bf16-numerator variants store numerators at the stream dtype; div3
    # keeps f32 nums but widens the denominator store to dh lanes
    nums_dtype = x.dtype if epi in ("div2", "mul2") else jnp.float32
    dens_width = D if epi == "div3" else n_head
    # VITIQ_V3_PACK: BATCH-PACKING for short sequences — ride `pack` frames
    # in one attention tile (frame p owns rows [p*Lp, (p+1)*Lp)), with the
    # cross-frame probabilities zeroed by a constant block-diagonal multiply
    # in the kernel. Motivation (measured): at Lp=80 the rawIQ arm spends
    # 56% of its time in attention (noattn probe 22.4 vs 50.2 ms) because
    # every per-head score/PV matmul is an M=80, N<=80 sliver — packing
    # multiplies M per MXU invocation by `pack`. MEASURED: pairs WIN at
    # Lp=80 (169.4K vs 163.3K rawIQ) but LOSE at Lp=32 even with a perfect
    # 128-tile fill (seg-64: packed-P4 346K vs unpacked 373K) and at P=4
    # on Lp=80 (137K) — so auto packs pairs only in the measured win
    # region 64 < Lp <= 96, and (since round 3d) only when the xpack core
    # is unavailable: xpack with pack=1 beats chained+pack2 at Lp=80
    # (221.6K vs 175.4K). -1 = auto, 0/1 = off, N = force P=N (forcing
    # N >= 2 disables xpack).
    pack = 1
    if not attn_int8 and head_group == 1 and not vpu_tail:
        pack = int(os.environ.get("VITIQ_V3_PACK", "-1"))  # -1 = auto
    # Attention-core selector (VITIQ_V3_ATTN): "xpack" (DEFAULT where
    # eligible) = cross-head packed block-diagonal core — one GEMM chain
    # instead of H serialized per-head chains (_v3_attention_core_xpack;
    # round-3 tables in docs/BENCHMARKS.md). MEASURED (rounds 3-3d) it
    # beats the chained core at EVERY shape whose VMEM fits: flagship
    # Lp=144 G=7 131.9K (chained 108.7K), seg-16 Lp=80 G=8 221.6K
    # (chained+pack2 175.4K), seg-64 Lp=32 G=16 541.8K (chained 372.9K) —
    # so auto-xpack preempts batch-packing wherever its picker finds a G;
    # a user-forced VITIQ_V3_PACK >= 2 or VITIQ_V3_ATTN=chain restores the
    # packed/chained cores. Incompatible with the per-head probe /
    # grouping / int8 variants and the non-div epilogues; falls back when
    # its VMEM footprint cannot fit even at G=1 (conv1d 1025 tokens).
    _attn_env = os.environ.get("VITIQ_V3_ATTN", "auto")
    xpack = (_attn_env in ("auto", "xpack")
             and not attn_int8 and head_group == 1 and not vpu_tail
             and pack in (-1, 0, 1) and probe is None and epi == "div")
    ffn_h = max(lp_["ffn"]["linear1"]["kernel"].shape[1]
                for lp_ in layer_params_list)
    if xpack:
        G = g_override or _pick_batch_block_v3_xpack(
            Lp, D, ffn_h, n_head, x.dtype.itemsize)
        if G == 0:
            xpack = False
    if xpack:
        pack = 1
    else:
        # batch-packing auto rule (chained core only): pairs win in
        # 64 < Lp <= 96 (169.4K vs 163.3K rawIQ), lose at Lp=32 even with
        # a perfect 128-tile fill and at P=4 on Lp=80 (137K)
        if pack < 0:
            pack = 2 if 64 < Lp <= 96 else 1
        pack = max(1, pack)
    Lpk = Lp * pack
    # KEY-TILED packed fallback (serve_xpack_kt.py): where the monolithic
    # xpack core cannot fit VMEM even at G=1 — in practice the conv1d
    # long-sequence arm (1025 tokens) — the same block-diagonal GEMM chain
    # runs tiled over key blocks, turning ~72 serialized narrow per-head
    # stages per layer into ceil(Lp/kt) packed steps. MEASURED ON CHIP
    # (round 3b): perf-neutral on conv1d (4,429 frames/s @ 2048 vs the
    # chained ~4.5K) AND numerically 7x looser than the chained core
    # (max |dlogit| 0.086 vs 0.0124 at 1025 tokens, tpu_check_fused
    # conv1d — fails the 0.05 gate; interpreter-mode parity passes, so the
    # delta is chip-only and unexplained). Default therefore stays the
    # chained core everywhere; VITIQ_V3_ATTN=kt forces this path for
    # further kernel work. The CLS-only tail recurses into this stack
    # (single-layer CLS call).
    _kt = (_attn_env == "kt" and not xpack
           and not attn_int8 and head_group == 1 and not vpu_tail
           and pack == 1 and probe is None and epi == "div"
           and len(layer_params_list) > (1 if cls_only else 0))
    if _kt:
        from vitiq.ops.pallas.serve_xpack_kt import (
            fused_encoder_layer_xpack_kt_stack)
        # The stack runs its own pick_kt (and raises if nothing fits);
        # VITIQ_KT_G is consumed there too.
        full = layer_params_list[:-1] if cls_only else layer_params_list
        y = fused_encoder_layer_xpack_kt_stack(x, full, n_head,
                                               seq_len=seq_len)
        if not cls_only:
            return y
        return fused_encoder_layer_v3_stack(
            y, layer_params_list[-1:], n_head, seq_len=seq_len,
            g_override=g_override, cls_only=True)
    if not xpack:
        G = g_override or _pick_batch_block_v3(Lpk, D, ffn_h,
                                               x.dtype.itemsize)
    if not layers_per_call:
        # xpack: ONE pallas_call for the whole full-layer stack measured
        # fastest (LPC 2/3/6 -> 69.2/68.2/66.7 ms on the flagship; weights
        # stay VMEM-resident across layers). The chained core keeps the
        # round-2 default of 2 (6-layers-per-call measured 95.0 vs 87.1).
        layers_per_call = len(layer_params_list) if xpack else 2
    Bp = _round_up(B, G * pack)
    xp = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))
    if pack > 1:
        xp = xp.reshape(Bp // pack, Lpk, D)
    Bk = Bp // pack  # leading dim of the packed stream

    data_block = pl.BlockSpec((G, Lpk, D), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    def rep(shape):
        index_map = lambda i: tuple(0 for _ in shape)
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    # cls_only: the caller consumes ONLY token 0 of the final layer (CLS
    # pooling), so the last layer runs the single-query-row kernel and the
    # stack returns [B, 1, D]
    full_layers = layer_params_list[:-1] if cls_only else layer_params_list
    # VITIQ_V3_FUSECLS=1: run the last FULL layer and the CLS-only layer in
    # ONE pallas call, keeping the intermediate [G, Lp, D] activation in a
    # VMEM scratch — removes one full-activation HBM write+read and one
    # dispatch
    fusecls = (os.environ.get("VITIQ_V3_FUSECLS", "0") == "1" and cls_only
               and pack == 1 and probe is None and not attn_int8
               and len(full_layers) >= 1)
    main_layers = full_layers[:-1] if fusecls else full_layers
    scale = _LOG2E / ((D // n_head) ** 0.5)

    def layer_operands(lp_):
        return xpack_layer_operands(lp_, x.dtype, scale)

    N_OPS = 12
    if xpack and fusecls:
        # FUSECLS under xpack: ONE pallas_call for the ENTIRE stack — all
        # full layers through the packed core with the inter-layer activation
        # in a VMEM scratch, then the CLS-only tail. Removes the
        # full-activation HBM write+read between the last full layer and the
        # CLS call AND one dispatch vs the two-call xpack default. (The
        # round-2 fusecls loss, 77.1 vs 75.8 ms, was measured on the chained
        # core merging only the last full layer — this merges all of them.)
        rq = 8
        flat = ([op for lp_ in full_layers for op in layer_operands(lp_)]
                + layer_operands(layer_params_list[-1]))
        out_block = pl.BlockSpec((G, rq, D), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)

        def mono_kernel(x_ref, *rest, n_full=len(full_layers)):
            w = rest[:-10]
            (o_ref, mid_s, attn_s, nums_s, dens_s, kp_s, vp_s,
             attn_c, nums_c, dens_c) = rest[-10:]

            @pl.when(pl.program_id(0) == 0)
            def _zero():
                kp_s[:] = jnp.zeros_like(kp_s)
                vp_s[:] = jnp.zeros_like(vp_s)

            for c in range(n_full):
                src = x_ref if c == 0 else mid_s
                _fused_layer_kernel_v3(
                    src, *w[c * N_OPS:(c + 1) * N_OPS], mid_s,
                    attn_s, nums_s, dens_s,
                    seq_len=seq_len, n_head=n_head,
                    kp_ref=kp_s, vp_ref=vp_s, xpack_zero_fill=False)
            _fused_layer_kernel_v3_cls(
                mid_s, *w[n_full * N_OPS:], o_ref, attn_c, nums_c, dens_c,
                seq_len=seq_len, n_head=n_head, vpu_tail=vpu_tail, epi=epi)

        out = _pallas_call(
            mono_kernel,
            grid=(Bp // G,),
            in_specs=[data_block] + [rep(o.shape) for o in flat],
            out_specs=out_block,
            out_shape=jax.ShapeDtypeStruct((Bp, rq, D), x.dtype),
            scratch_shapes=[pltpu.VMEM((G, Lp, D), x.dtype),      # mid act
                            pltpu.VMEM((G, Lp, D), x.dtype),      # attn
                            pltpu.VMEM((G, Lp, D), jnp.float32),  # nums
                            pltpu.VMEM((G, Lp, n_head), jnp.float32),
                            pltpu.VMEM((G, n_head * Lp, D), x.dtype),
                            pltpu.VMEM((G, n_head * Lp, D), x.dtype),
                            pltpu.VMEM((G, rq, D), x.dtype),
                            pltpu.VMEM((G, rq, D), jnp.float32),
                            pltpu.VMEM((G, rq, n_head), jnp.float32)],
        )(xp, *flat)
        return out[:B, :1, :D]
    for start in range(0, len(main_layers), layers_per_call):
        group = main_layers[start:start + layers_per_call]
        flat = [op for lp_ in group for op in layer_operands(lp_)]

        n_scratch = 6 if xpack else 4

        def kernel(x_ref, *rest, n_layers=len(group)):
            weight_refs = rest[:-n_scratch]
            o_ref, attn_scratch, nums_s, dens_s = rest[-n_scratch:][:4]
            kp_s, vp_s = (rest[-2:] if xpack else (None, None))
            if xpack:
                # zero the block-diagonal scratch ONCE (grid step 0): only
                # the per-head dh-lane blocks are ever written afterwards,
                # and TPU scratch persists across the sequential grid
                @pl.when(pl.program_id(0) == 0)
                def _zero():
                    kp_s[:] = jnp.zeros_like(kp_s)
                    vp_s[:] = jnp.zeros_like(vp_s)
            for c in range(n_layers):
                src = x_ref if c == 0 else o_ref
                if attn_int8:
                    _fused_layer_kernel_v3_attn_int8(
                        src, *weight_refs[c * N_OPS:(c + 1) * N_OPS],
                        o_ref, attn_scratch,
                        seq_len=seq_len, n_head=n_head,
                    )
                else:
                    _fused_layer_kernel_v3(
                        src, *weight_refs[c * N_OPS:(c + 1) * N_OPS],
                        o_ref, attn_scratch, nums_s, dens_s,
                        seq_len=seq_len, n_head=n_head, vpu_tail=vpu_tail,
                        probe=probe, head_group=head_group, epi=epi,
                        pack=pack, kp_ref=kp_s, vp_ref=vp_s,
                        xpack_zero_fill=False,
                    )

        scratch = [pltpu.VMEM((G, Lpk, D), x.dtype),
                   pltpu.VMEM((G, Lpk, D), nums_dtype),
                   pltpu.VMEM((G, Lpk, dens_width), jnp.float32)]
        if xpack:
            scratch += [pltpu.VMEM((G, n_head * Lp, D), x.dtype),
                        pltpu.VMEM((G, n_head * Lp, D), x.dtype)]
        xp = _pallas_call(
            kernel,
            grid=(Bk // G,),
            in_specs=[data_block] + [rep(o.shape) for o in flat],
            out_specs=data_block,
            out_shape=jax.ShapeDtypeStruct((Bk, Lpk, D), x.dtype),
            scratch_shapes=scratch,
        )(xp, *flat)

    if pack > 1:
        xp = xp.reshape(Bp, Lp, D)

    if cls_only:
        rq = 8  # one sublane tile of query rows (row 0 = CLS)
        out_block = pl.BlockSpec((G, rq, D), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        cls_in_block = pl.BlockSpec((G, Lp, D), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
        if fusecls:
            flat = (layer_operands(full_layers[-1])
                    + layer_operands(layer_params_list[-1]))

            def combo_kernel(x_ref, *rest):
                w = rest[:-8]
                (o_ref, mid_s, attn_f, nums_f, dens_f,
                 attn_c, nums_c, dens_c) = rest[-8:]
                _fused_layer_kernel_v3(
                    x_ref, *w[:N_OPS], mid_s, attn_f, nums_f, dens_f,
                    seq_len=seq_len, n_head=n_head, vpu_tail=vpu_tail,
                    epi=epi)
                _fused_layer_kernel_v3_cls(
                    mid_s, *w[N_OPS:], o_ref, attn_c, nums_c, dens_c,
                    seq_len=seq_len, n_head=n_head, vpu_tail=vpu_tail,
                    epi=epi)

            xp = _pallas_call(
                combo_kernel,
                grid=(Bp // G,),
                in_specs=[cls_in_block] + [rep(o.shape) for o in flat],
                out_specs=out_block,
                out_shape=jax.ShapeDtypeStruct((Bp, rq, D), x.dtype),
                scratch_shapes=[pltpu.VMEM((G, Lp, D), x.dtype),   # mid act
                                pltpu.VMEM((G, Lp, D), x.dtype),
                                pltpu.VMEM((G, Lp, D), nums_dtype),
                                pltpu.VMEM((G, Lp, dens_width), jnp.float32),
                                pltpu.VMEM((G, rq, D), x.dtype),
                                pltpu.VMEM((G, rq, D), nums_dtype),
                                pltpu.VMEM((G, rq, dens_width), jnp.float32)],
            )(xp, *flat)
            return xp[:B, :1, :D]
        flat = layer_operands(layer_params_list[-1])
        cls_kernel = functools.partial(
            _fused_layer_kernel_v3_cls, seq_len=seq_len, n_head=n_head,
            vpu_tail=vpu_tail, epi=epi)
        xp = _pallas_call(
            cls_kernel,
            grid=(Bp // G,),
            in_specs=[cls_in_block] + [rep(o.shape) for o in flat],
            out_specs=out_block,
            out_shape=jax.ShapeDtypeStruct((Bp, rq, D), x.dtype),
            scratch_shapes=[pltpu.VMEM((G, rq, D), x.dtype),
                            pltpu.VMEM((G, rq, D), nums_dtype),
                            pltpu.VMEM((G, rq, dens_width), jnp.float32)],
        )(xp, *flat)
        return xp[:B, :1, :D]
    return xp[:B, :L, :D]


def _fused_layer_kernel_v4long(
    x_ref, qq_ref, kv_ref, wo_ref, bo_ref,
    g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    o_ref, attn_scratch, nums_scratch, dens_scratch,
    *, seq_len: int, n_head: int, epi: str = "div",
):
    """Query-tiled layer kernel for LONG sequences (rawIQ conv1d, 1025
    tokens — ref: transformer_rawIQ/models/encoder.py:34-41).

    At Lp ~1040 the all-rows v3 kernel degrades to batch block G=1 and
    5.5K frames/s. Here the QKV GEMM runs OUTSIDE in XLA (a [B*L, D] x
    [D, 3D] GEMM XLA already runs at high MFU) and the kernel processes one
    [G, TQ, D] query-row tile per grid step against the full key/value
    stream: attention (v3 core, q_sec mode) + projection + post-norms + FFN
    are all row-local, so everything after the QKV GEMM tiles freely over
    queries. kv_ref carries the full [G, Lp, 3D] qkv block (constant over
    the inner query-tile grid axis, so Pallas DMAs it once per batch block);
    qq_ref is the same array's q section for this tile (lane-blocked spec).
    """
    g, tq, d = x_ref.shape
    x = x_ref[:]

    _v3_attention_core(kv_ref[:], x.dtype, attn_scratch, nums_scratch,
                       dens_scratch, seq_len=seq_len, n_head=n_head,
                       vpu_tail=False, epi=epi, q_sec=qq_ref[:])

    proj = jax.lax.dot_general(
        attn_scratch[:], wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    x1 = _layer_norm(proj + x.astype(jnp.float32), g1_ref[:], be1_ref[:], x.dtype)
    hmid = jax.lax.dot_general(
        x1, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    hmid = jnp.maximum(hmid, 0.0).astype(x.dtype)
    y = jax.lax.dot_general(
        hmid, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    o_ref[:] = _layer_norm(y + x1.astype(jnp.float32), g2_ref[:], be2_ref[:],
                           o_ref.dtype)


def fused_encoder_layer_v4long_stack(
    x: jnp.ndarray,
    layer_params_list,
    n_head: int,
    seq_len: Optional[int] = None,
    cls_only: bool = False,
) -> jnp.ndarray:
    """Long-sequence stack: XLA QKV GEMM + query-tiled Pallas layer tail.

    Used automatically by the encoder for L > 512 (the conv1d mode); the
    v3 stack keeps short sequences. With cls_only, the final layer runs the
    existing v3 CLS-only kernel (single query-row tile)."""
    import os

    B, L, D = x.shape
    seq_len = L if seq_len is None else seq_len
    TQ = int(os.environ.get("VITIQ_V4_TQ", "128"))
    Lp = _round_up(L, TQ)
    G = int(os.environ.get("VITIQ_V4_G", "0")) or _pick_batch_block_v4long(
        Lp, D, max(lp_["ffn"]["linear1"]["kernel"].shape[1]
                   for lp_ in layer_params_list), x.dtype.itemsize, TQ)
    Bp = _round_up(B, G)
    epi = os.environ.get("VITIQ_V3_EPI", "div")
    if epi not in ("div", "div2", "div3", "mul", "mul2"):
        epi = "div"
    nums_dtype = x.dtype if epi in ("div2", "mul2") else jnp.float32
    dens_width = D if epi == "div3" else n_head

    xp = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))
    scale = _LOG2E / ((D // n_head) ** 0.5)

    x_block = pl.BlockSpec((G, TQ, D), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    # same qkv array twice: lane-block 0 of a (G, TQ, D)-partition is the
    # (pre-scaled) q section for tile j; the (G, Lp, 3D) view is the full
    # key/value stream, constant over j so it is DMA'd once per batch block
    qq_block = pl.BlockSpec((G, TQ, D), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    kv_block = pl.BlockSpec((G, Lp, 3 * D), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def rep(shape):
        index_map = lambda i, j: tuple(0 for _ in shape)
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    full_layers = layer_params_list[:-1] if cls_only else layer_params_list
    for lp_ in full_layers:
        ap = lp_["attention"]
        wqkv = jnp.concatenate([
            ap["w_q"]["kernel"].astype(jnp.float32) * scale,
            ap["w_k"]["kernel"].astype(jnp.float32),
            ap["w_v"]["kernel"].astype(jnp.float32),
        ], axis=1).astype(x.dtype)
        bqkv = jnp.concatenate([
            ap["w_q"]["bias"].astype(jnp.float32) * scale,
            ap["w_k"]["bias"].astype(jnp.float32),
            ap["w_v"]["bias"].astype(jnp.float32),
        ])
        qkv = (jax.lax.dot_general(
            xp, wqkv, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv).astype(x.dtype)  # [Bp, Lp, 3D] — XLA GEMM at full MFU
        ops = [
            ap["w_concat"]["kernel"].astype(x.dtype),
            ap["w_concat"]["bias"].astype(jnp.float32),
            lp_["norm1"]["gamma"].astype(jnp.float32),
            lp_["norm1"]["beta"].astype(jnp.float32),
            lp_["ffn"]["linear1"]["kernel"].astype(x.dtype),
            lp_["ffn"]["linear1"]["bias"].astype(jnp.float32),
            lp_["ffn"]["linear2"]["kernel"].astype(x.dtype),
            lp_["ffn"]["linear2"]["bias"].astype(jnp.float32),
            lp_["norm2"]["gamma"].astype(jnp.float32),
            lp_["norm2"]["beta"].astype(jnp.float32),
        ]
        kernel = functools.partial(_fused_layer_kernel_v4long,
                                   seq_len=seq_len, n_head=n_head, epi=epi)
        xp = _pallas_call(
            kernel,
            grid=(Bp // G, Lp // TQ),
            in_specs=[x_block, qq_block, kv_block] + [rep(o.shape) for o in ops],
            out_specs=pl.BlockSpec((G, TQ, D), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype),
            scratch_shapes=[pltpu.VMEM((G, TQ, D), x.dtype),
                            pltpu.VMEM((G, TQ, D), nums_dtype),
                            pltpu.VMEM((G, TQ, dens_width), jnp.float32)],
        )(xp, qkv, qkv, *ops)

    if cls_only:
        return fused_encoder_layer_v3_stack(
            xp[:B, :L, :D], [layer_params_list[-1]], n_head,
            seq_len=seq_len, cls_only=True)
    return xp[:B, :L, :D]


def _pick_batch_block_v4long(Lp: int, D: int, H: int, itemsize: int,
                             tq: int) -> int:
    """The dominant VMEM tenant is the double-buffered full-sequence qkv
    block (G * Lp * 3D); everything else is TQ-row-local. Budget is 6 MB —
    measured: the 10 MB budget OOM'd the 16 MB scoped-VMEM stack at TQ=384
    (in-kernel per-head slices/probs/accs roughly double the estimate)."""
    for g in (8, 4, 2, 1):
        vmem = (
            2 * g * Lp * 3 * D * itemsize      # kv view, double-buffered
            + 2 * 3 * g * tq * D * itemsize    # x/qq/out blocks (2 buf)
            + g * tq * D * (itemsize + 4 + 4)  # attn + nums + score tile
            + 2 * g * tq * H * itemsize        # ffn hidden
            + 3 * g * tq * D * 4               # f32 LN temps
        )
        if vmem <= 6 * 1024 * 1024:
            return g
    return 1


def _row_quant(t):
    """[..., K] float -> (int8 values, [..., 1] f32 scales). Symmetric absmax."""
    t32 = t.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(t32), axis=-1, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(t32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _fused_layer_kernel_int8(
    x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    g1_ref, be1_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    g2_ref, be2_ref, o_ref, attn_scratch,
    *, seq_len: int, n_head: int, scale: float,
):
    """Int8 W8A8 twin of _fused_layer_kernel: every GEMM runs int8 x int8 ->
    int32 on the MXU (2x the bf16 rate) with dynamic per-row activation
    scales; attention probabilities, LayerNorms and residuals stay float."""
    g, lp, d = x_ref.shape
    x = x_ref[:]

    def int8_gemm(t, w_ref, s_ref, b_ref):
        tq, rs = _row_quant(t)
        acc = jax.lax.dot_general(
            tq, w_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * rs * s_ref[:] + b_ref[:]

    qkv = int8_gemm(x, wqkv_ref, sqkv_ref, bqkv_ref).astype(x.dtype)

    dh = d // n_head
    key_bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, lp), dimension=2) < seq_len,
        0.0, _NEG_INF,
    ).astype(jnp.float32)
    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        q = qkv[:, :, h * dh:(h + 1) * dh].astype(jnp.float32)
        k = qkv[:, :, d + h * dh:d + (h + 1) * dh].astype(jnp.float32)
        v = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        probs = jnp.exp2(scores * 1.4426950408889634 + key_bias)
        denom = jnp.sum(probs, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            probs.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        attn_scratch[:, :, sl] = (out / denom).astype(attn_scratch.dtype)

    proj = int8_gemm(attn_scratch[:], wo_ref, so_ref, bo_ref)
    x1 = _layer_norm(proj + x.astype(jnp.float32), g1_ref[:], be1_ref[:], x.dtype)
    hmid = jnp.maximum(int8_gemm(x1, w1_ref, s1_ref, b1_ref), 0.0).astype(x.dtype)
    y = int8_gemm(hmid, w2_ref, s2_ref, b2_ref)
    o_ref[:] = _layer_norm(y + x1.astype(jnp.float32), g2_ref[:], be2_ref[:],
                           o_ref.dtype)


def fused_encoder_layer_int8(
    x: jnp.ndarray,
    qlayer,
    n_head: int,
    seq_len: Optional[int] = None,
) -> jnp.ndarray:
    """x: [B, L, D] -> [B, L, D] through one int8-GEMM fused layer.

    `qlayer` is a vitiq encoder-layer param dict quantized by
    vitiq.ops.quant.quantize_params_int8 (per-linear int8 kernels + per-out-
    channel scales). QKV kernels/scales are concatenated at trace time
    (constants, folded by XLA) — per-channel scales make the concat exact.
    """
    B, L, D = x.shape
    seq_len = L if seq_len is None else seq_len
    ap = qlayer["attention"]
    wqkv = jnp.concatenate([ap["w_q"]["kernel_q"], ap["w_k"]["kernel_q"],
                            ap["w_v"]["kernel_q"]], axis=1)
    sqkv = jnp.concatenate([ap["w_q"]["scale"], ap["w_k"]["scale"],
                            ap["w_v"]["scale"]])
    bqkv = jnp.concatenate([ap["w_q"]["bias"], ap["w_k"]["bias"],
                            ap["w_v"]["bias"]]).astype(jnp.float32)
    ffn = qlayer["ffn"]
    H = ffn["linear1"]["kernel_q"].shape[1]
    g1 = qlayer["norm1"]["gamma"].astype(jnp.float32)
    be1 = qlayer["norm1"]["beta"].astype(jnp.float32)
    g2 = qlayer["norm2"]["gamma"].astype(jnp.float32)
    be2 = qlayer["norm2"]["beta"].astype(jnp.float32)

    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    G = _pick_batch_block(Lp, D, H, x.dtype.itemsize)
    Bp = _round_up(B, G)
    xp = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))

    kernel = functools.partial(
        _fused_layer_kernel_int8, seq_len=seq_len, n_head=n_head,
        scale=1.0 / ((D // n_head) ** 0.5),
    )
    data_block = pl.BlockSpec((G, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def rep(shape):
        index_map = lambda i: tuple(0 for _ in shape)
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    operands = [
        xp,
        wqkv, sqkv, bqkv,
        ap["w_concat"]["kernel_q"], ap["w_concat"]["scale"],
        ap["w_concat"]["bias"].astype(jnp.float32),
        g1, be1,
        ffn["linear1"]["kernel_q"], ffn["linear1"]["scale"],
        ffn["linear1"]["bias"].astype(jnp.float32),
        ffn["linear2"]["kernel_q"], ffn["linear2"]["scale"],
        ffn["linear2"]["bias"].astype(jnp.float32),
        g2, be2,
    ]
    out = _pallas_call(
        kernel,
        grid=(Bp // G,),
        in_specs=[data_block] + [rep(o.shape) for o in operands[1:]],
        out_specs=data_block,
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((G, Lp, D), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Lp * D * (4 * D + 2 * H)
            + 4 * Bp * n_head * Lp * Lp * (D // n_head),
            bytes_accessed=2 * Bp * Lp * D * x.dtype.itemsize,
            transcendentals=Bp * n_head * Lp * Lp,
        ),
    )(*operands)
    return out[:B, :L, :]


def _fused_layer_kernel_v3_w8(
    x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    g1_ref, be1_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    g2_ref, be2_ref, o_ref, attn_scratch, nums_scratch, dens_scratch,
    *, seq_len: int, n_head: int, vpu_tail: bool = False,
):
    """v3 attention + INT8 weight GEMMs (W8A8: per-out-channel weight scales,
    dynamic per-row activation scales). The attention core stays the bf16 v3
    path — the int8 ATTENTION core measured 2.5x SLOWER (docs/BENCHMARKS.md),
    but the weight GEMMs (QKV/proj/FFN, ~34% of MXU passes) run at the int8
    MXU's 2x rate. The q-section of sqkv/bqkv arrives pre-multiplied by
    softmax_scale*log2e (host fold), as in v3."""
    g, lp, d = x_ref.shape
    x = x_ref[:]

    def int8_gemm(t, w_ref, s_ref, b_ref):
        tq, rs = _row_quant(t)
        acc = jax.lax.dot_general(
            tq, w_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * rs * s_ref[:] + b_ref[:]

    qkv = int8_gemm(x, wqkv_ref, sqkv_ref, bqkv_ref).astype(x.dtype)

    # epi fixed to the default wide divide: this stack allocates the f32
    # nums / [*, n_head] dens scratch shapes that mode requires
    _v3_attention_core(qkv, x.dtype, attn_scratch, nums_scratch, dens_scratch,
                       seq_len=seq_len, n_head=n_head, vpu_tail=vpu_tail)

    proj = int8_gemm(attn_scratch[:], wo_ref, so_ref, bo_ref)
    x1 = _layer_norm(proj + x.astype(jnp.float32), g1_ref[:], be1_ref[:], x.dtype)
    hmid = jnp.maximum(int8_gemm(x1, w1_ref, s1_ref, b1_ref), 0.0).astype(x.dtype)
    y = int8_gemm(hmid, w2_ref, s2_ref, b2_ref)
    o_ref[:] = _layer_norm(y + x1.astype(jnp.float32), g2_ref[:], be2_ref[:],
                           o_ref.dtype)


def _dequant_layer(qlayer):
    """Quantized layer param dict -> float layer param dict (for reusing the
    bf16 kernels on int8-quantized weights, e.g. the CLS-only last layer)."""
    def deq(ql):
        return {"kernel": ql["kernel_q"].astype(jnp.float32) * ql["scale"],
                "bias": ql["bias"]}

    ap = qlayer["attention"]
    return {
        "attention": {k: deq(ap[k]) for k in ("w_q", "w_k", "w_v", "w_concat")},
        "norm1": qlayer["norm1"],
        "ffn": {"linear1": deq(qlayer["ffn"]["linear1"]),
                "linear2": deq(qlayer["ffn"]["linear2"])},
        "norm2": qlayer["norm2"],
    }


_LOG2E2 = 1.4426950408889634


def fused_encoder_layer_v3_int8_stack(
    x: jnp.ndarray,
    qlayers,
    n_head: int,
    seq_len: Optional[int] = None,
    layers_per_call: int = 2,
    cls_only: bool = False,
) -> jnp.ndarray:
    """Int8-weight v3 stack: W8A8 GEMMs + bf16 v3 attention per layer.

    With cls_only, the final layer runs the bf16 CLS-only kernel on
    dequantized weights (exact same quantized values; the 8-row tail is not
    worth an int8 twin)."""
    import os

    B, L, D = x.shape
    seq_len = L if seq_len is None else seq_len
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    H = max(q["ffn"]["linear1"]["kernel_q"].shape[1] for q in qlayers)
    G = _pick_batch_block_v3(Lp, D, H, x.dtype.itemsize)
    Bp = _round_up(B, G)
    xp = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))

    data_block = pl.BlockSpec((G, Lp, D), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    def rep(shape):
        index_map = lambda i: tuple(0 for _ in shape)
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    scale = _LOG2E2 / ((D // n_head) ** 0.5)
    full_layers = qlayers[:-1] if cls_only else qlayers
    # same VITIQ_V3_TAIL gating as the bf16 v3 stack (default OFF — the
    # tail-key rework is a measured net loss, docs/BENCHMARKS.md)
    _tail_env = os.environ.get("VITIQ_V3_TAIL", "0")
    vpu_tail = "drop" if _tail_env == "drop" else _tail_env != "0"

    def layer_operands(ql):
        ap = ql["attention"]
        wqkv = jnp.concatenate([ap["w_q"]["kernel_q"], ap["w_k"]["kernel_q"],
                                ap["w_v"]["kernel_q"]], axis=1)
        # fold softmax scale*log2e into the q-section DEQUANT scales + biases
        sqkv = jnp.concatenate([ap["w_q"]["scale"] * scale, ap["w_k"]["scale"],
                                ap["w_v"]["scale"]]).astype(jnp.float32)
        bqkv = jnp.concatenate([
            ap["w_q"]["bias"].astype(jnp.float32) * scale,
            ap["w_k"]["bias"].astype(jnp.float32),
            ap["w_v"]["bias"].astype(jnp.float32)])
        ffn = ql["ffn"]
        return [
            wqkv, sqkv, bqkv,
            ap["w_concat"]["kernel_q"], ap["w_concat"]["scale"].astype(jnp.float32),
            ap["w_concat"]["bias"].astype(jnp.float32),
            ql["norm1"]["gamma"].astype(jnp.float32),
            ql["norm1"]["beta"].astype(jnp.float32),
            ffn["linear1"]["kernel_q"], ffn["linear1"]["scale"].astype(jnp.float32),
            ffn["linear1"]["bias"].astype(jnp.float32),
            ffn["linear2"]["kernel_q"], ffn["linear2"]["scale"].astype(jnp.float32),
            ffn["linear2"]["bias"].astype(jnp.float32),
            ql["norm2"]["gamma"].astype(jnp.float32),
            ql["norm2"]["beta"].astype(jnp.float32),
        ]

    N_OPS = 16
    for start in range(0, len(full_layers), layers_per_call):
        group = full_layers[start:start + layers_per_call]
        flat = [op for ql in group for op in layer_operands(ql)]

        def kernel(x_ref, *rest, n_layers=len(group)):
            weight_refs = rest[:-4]
            o_ref, attn_scratch, nums_s, dens_s = rest[-4:]
            for c in range(n_layers):
                src = x_ref if c == 0 else o_ref
                _fused_layer_kernel_v3_w8(
                    src, *weight_refs[c * N_OPS:(c + 1) * N_OPS],
                    o_ref, attn_scratch, nums_s, dens_s,
                    seq_len=seq_len, n_head=n_head, vpu_tail=vpu_tail,
                )

        xp = _pallas_call(
            kernel,
            grid=(Bp // G,),
            in_specs=[data_block] + [rep(o.shape) for o in flat],
            out_specs=data_block,
            out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype),
            scratch_shapes=[pltpu.VMEM((G, Lp, D), x.dtype),
                            pltpu.VMEM((G, Lp, D), jnp.float32),
                            pltpu.VMEM((G, Lp, n_head), jnp.float32)],
        )(xp, *flat)

    if cls_only:
        return fused_encoder_layer_v3_stack(
            xp[:B, :L, :D], [_dequant_layer(qlayers[-1])], n_head,
            seq_len=seq_len, cls_only=True)
    return xp[:B, :L, :D]


def _pick_batch_block(Lp: int, D: int, H: int, itemsize: int) -> int:
    for g in (16, 8, 4, 2, 1):
        x_like = g * Lp * D  # x / qkv(3x) / attn / out blocks
        vmem = (
            2 * 2 * x_like * itemsize          # in/out double-buffered
            + 3 * x_like * itemsize            # qkv
            + x_like * itemsize                # attn scratch
            + 2 * g * Lp * Lp * 4              # scores + probs (f32)
            + 2 * g * Lp * H * itemsize        # ffn hidden (+relu copy)
            + 3 * x_like * 4                   # f32 LN temps / residuals
        )
        if vmem <= 10 * 1024 * 1024:
            return g
    return 1


def fused_encoder_layer(
    x: jnp.ndarray,
    layer_params,
    n_head: int,
    seq_len: Optional[int] = None,
) -> jnp.ndarray:
    """x: [B, L, D] (bf16 or f32) -> [B, L, D] through one fused layer.

    `layer_params` is the standard vitiq encoder-layer param dict. seq_len
    defaults to L (callers that pre-pad pass the true length).
    """
    B, L, D = x.shape
    seq_len = L if seq_len is None else seq_len
    ap = layer_params["attention"]
    wqkv = jnp.concatenate(
        [ap["w_q"]["kernel"], ap["w_k"]["kernel"], ap["w_v"]["kernel"]], axis=1
    ).astype(x.dtype)
    bqkv = jnp.concatenate(
        [ap["w_q"]["bias"], ap["w_k"]["bias"], ap["w_v"]["bias"]]
    ).astype(jnp.float32)
    wo = ap["w_concat"]["kernel"].astype(x.dtype)
    bo = ap["w_concat"]["bias"].astype(jnp.float32)
    ffn = layer_params["ffn"]
    w1 = ffn["linear1"]["kernel"].astype(x.dtype)
    b1 = ffn["linear1"]["bias"].astype(jnp.float32)
    w2 = ffn["linear2"]["kernel"].astype(x.dtype)
    b2 = ffn["linear2"]["bias"].astype(jnp.float32)
    g1 = layer_params["norm1"]["gamma"].astype(jnp.float32)
    be1 = layer_params["norm1"]["beta"].astype(jnp.float32)
    g2 = layer_params["norm2"]["gamma"].astype(jnp.float32)
    be2 = layer_params["norm2"]["beta"].astype(jnp.float32)
    H = w1.shape[1]

    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    G = _pick_batch_block(Lp, D, H, x.dtype.itemsize)
    Bp = _round_up(B, G)
    xp = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))

    kernel = functools.partial(
        _fused_layer_kernel, seq_len=seq_len, n_head=n_head,
        scale=1.0 / ((D // n_head) ** 0.5),
    )
    data_block = pl.BlockSpec((G, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def rep(shape):  # weights replicated to every program
        index_map = lambda i: tuple(0 for _ in shape)
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    out = _pallas_call(
        kernel,
        grid=(Bp // G,),
        in_specs=[
            data_block,
            rep(wqkv.shape), rep(bqkv.shape), rep(wo.shape), rep(bo.shape),
            rep(g1.shape), rep(be1.shape),
            rep(w1.shape), rep(b1.shape), rep(w2.shape), rep(b2.shape),
            rep(g2.shape), rep(be2.shape),
        ],
        out_specs=data_block,
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((G, Lp, D), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Lp * D * (4 * D + 2 * H)
            + 4 * Bp * n_head * Lp * Lp * (D // n_head),
            bytes_accessed=2 * Bp * Lp * D * x.dtype.itemsize,
            transcendentals=Bp * n_head * Lp * Lp,
        ),
    )(xp, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2, g2, be2)
    return out[:B, :L, :]
