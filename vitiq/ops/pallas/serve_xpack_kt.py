"""KEY-TILED cross-head packed attention (xpack-kt) for LONG sequences.

The monolithic xpack core (fused_encoder_layer._v3_attention_core_xpack)
materializes the full [nq, H*Lp] score tensor, so it falls back to the
chained core when that cannot fit VMEM even at G=1 — in practice the rawIQ
conv1d arm (1025 tokens, 5.5K frames/s), whose measured wall is the SAME
d_head=16 per-head serialization the flagship had: 8 heads x 9 key tiles of
narrow score->exp->PV chains per layer (docs/BENCHMARKS.md round-2: the
v4long query-tiled rework did not touch it and lost).

This module tiles the PACKED core over key blocks instead: for each block of
`kt` keys, K/V are scattered into block-diagonal [H*kt, D] scratch and ONE
score GEMM + ONE wide exp2 + ONE PV GEMM + a ones-matmul process ALL heads'
scores for those keys, accumulating the attention numerator [nq, D] and
per-head denominators [nq, H] across blocks (plain exp2 accumulation — the
same finite-score contract as every v3-family kernel, |score| < 88). The 72
serialized narrow stages per layer become ceil(Lp/kt) packed chain steps.

MXU pass count is unchanged (a dh=16 contraction wastes 7/8 of the MXU depth
in EVERY formulation — that waste is the d_head lever's territory, not a
kernel's); the win is the serialization, exactly like flagship xpack.

Scope: serving only (no dropout), full layers; callers route the CLS-only
last layer through the existing v3 stack (cheap at nq=8). Wired as the
fallback in fused_encoder_layer_v3_stack when monolithic xpack returns G=0.

Reference numerics contract: ViT/models/blocks/encoder_layer.py:18-35 (post
-norm), layers_norm.py:4-19 (eps=1e-12 biased var), scale folded into W_q.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitiq.ops.pallas._common import pallas_call as _pallas_call
from vitiq.ops.pallas.fused_encoder_layer import (_den_expand, _layer_norm,
                                                  xpack_layer_operands)

_LOG2E = 1.4426950408889634


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _xpack_kt_attention(qkv, kp_ref, vp_ref, *, n_head: int, seq_len: int,
                        kt: int, x_dtype):
    """[G, Lp, 3D] qkv (q pre-scaled by scale*log2e) -> attention [G, Lp, D].

    Accumulates nums/dens over ceil(Lp/kt) packed key blocks. kp/vp scratch
    is [G, H*kt, D]; the off-block zeros are never dirtied after the one
    zero fill (same rows/lanes are rewritten every block), so callers zero
    once at grid step 0.
    """
    g, lp, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_head
    q = qkv[:, :, :d]

    nums = None
    dens = None
    for c0 in range(0, lp, kt):
        t = min(kt, lp - c0)  # the last tile may be a remainder
        for h in range(n_head):
            k_h = qkv[:, c0:c0 + t, d + h * dh:d + (h + 1) * dh]
            v_h = qkv[:, c0:c0 + t, 2 * d + h * dh:2 * d + (h + 1) * dh]
            if c0 + t > seq_len:
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (g, t, dh), dimension=1) + c0
                v_h = jnp.where(row < seq_len, v_h, 0)
            kp_ref[:, h * kt:h * kt + t, h * dh:(h + 1) * dh] = k_h
            vp_ref[:, h * kt:h * kt + t, h * dh:(h + 1) * dh] = v_h
            if t < kt:
                # rows [t, kt) of this head's block still hold the previous
                # full tile's K/V — zero them so stale keys contribute
                # nothing (zero V rows kill nums; ones_bd already excludes
                # them from dens via the row-index mask)
                zpad = jnp.zeros((g, kt - t, dh), qkv.dtype)
                kp_ref[:, h * kt + t:(h + 1) * kt, h * dh:(h + 1) * dh] = zpad
                vp_ref[:, h * kt + t:(h + 1) * kt, h * dh:(h + 1) * dh] = zpad

        scores = jax.lax.dot_general(
            q, kp_ref[:],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, Lp, H*kt]
        probs = jnp.exp2(scores).astype(x_dtype)
        part = jax.lax.dot_general(
            probs, vp_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, Lp, D]
        r_i = jax.lax.broadcasted_iota(jnp.int32, (n_head * kt, n_head), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (n_head * kt, n_head), 1)
        ones_bd = ((r_i // kt == c_i)
                   & (r_i % kt + c0 < seq_len)).astype(x_dtype)
        dpart = jax.lax.dot_general(
            probs, ones_bd,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, Lp, H]
        nums = part if nums is None else nums + part
        dens = dpart if dens is None else dens + dpart

    den_exp = _den_expand(dens, x_dtype, n_head, dh, d)
    return (nums / den_exp).astype(x_dtype)


def _layer_kernel_kt(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    o_ref, kp_ref, vp_ref,
    *, seq_len: int, n_head: int, kt: int,
):
    x = x_ref[:]
    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]
    qkv = qkv.astype(x.dtype)

    attn = _xpack_kt_attention(qkv, kp_ref, vp_ref, n_head=n_head,
                               seq_len=seq_len, kt=kt, x_dtype=x.dtype)

    proj = jax.lax.dot_general(
        attn, wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    x1 = _layer_norm(proj + x.astype(jnp.float32), g1_ref[:], be1_ref[:],
                     x.dtype)
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


def pick_kt(Lp: int, D: int, ffn_h: int, n_head: int, itemsize: int):
    """(G, kt) for the key-tiled stack, or (0, 0) when nothing fits.

    Budget mirrors the v3 pickers (10 MB scoped-VMEM target): the dominant
    terms are the [Lp, H*kt] score/prob tensors and the FFN hidden; kp/vp
    at [H*kt, D] are small by construction."""
    for g in (4, 2, 1):
        for kt in (128, 64, 32):
            if kt >= Lp:  # monolithic xpack territory, not ours
                continue
            x_like = g * Lp * D
            vmem = (
                2 * 2 * x_like * itemsize
                + 3 * x_like * itemsize                  # qkv
                + 2 * g * n_head * kt * D * itemsize     # kp + vp
                + g * Lp * n_head * kt * (4 + itemsize)  # scores f32 + probs
                + x_like * 4                             # nums f32
                + g * Lp * n_head * 4                    # dens
                + x_like * itemsize                      # attn
                + 2 * g * Lp * ffn_h * itemsize          # ffn hidden
                + 3 * x_like * 4                         # LN temps
            )
            if vmem <= 10 * 1024 * 1024:
                return g, kt
    return 0, 0


def fused_encoder_layer_xpack_kt_stack(
    x: jnp.ndarray,
    layer_params_list,
    n_head: int,
    seq_len: Optional[int] = None,
) -> jnp.ndarray:
    """Run FULL encoder layers through the key-tiled packed kernel, all
    layers in one pallas_call (weights VMEM-resident, no inter-layer HBM
    round-trips — the measured xpack win carries over). CLS-only tails are
    the caller's job (route the last layer through the v3 stack)."""
    B, L, D = x.shape
    seq_len = L if seq_len is None else seq_len
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    ffn_h = max(lp_["ffn"]["linear1"]["kernel"].shape[1]
                for lp_ in layer_params_list)
    G, kt = pick_kt(Lp, D, ffn_h, n_head, x.dtype.itemsize)
    g_env = int(os.environ.get("VITIQ_KT_G", "0"))
    kt_env = int(os.environ.get("VITIQ_KT", "0"))
    G, kt = g_env or G, kt_env or kt
    if G == 0 or kt == 0:
        raise ValueError(
            f"xpack-kt does not fit VMEM for Lp={Lp}, D={D}, H={n_head}")
    Bp = _round_up(B, G)
    xp = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))

    data_block = pl.BlockSpec((G, Lp, D), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    def rep(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    scale = _LOG2E / ((D // n_head) ** 0.5)

    def layer_operands(lp_):
        return xpack_layer_operands(lp_, x.dtype, scale)

    N_OPS = 12
    # VITIQ_KT_LPC: layers per pallas_call. Default = the whole stack in one
    # call (weights VMEM-resident, no inter-layer HBM round-trips — the
    # measured xpack win). Long stacks unroll n_layers * ceil(Lp/kt) packed
    # key-block steps into one Mosaic program; if the remote-AOT compile
    # window becomes the wall, lower this.
    lpc = (int(os.environ.get("VITIQ_KT_LPC", "0"))
           or len(layer_params_list))
    for start in range(0, len(layer_params_list), lpc):
        group = layer_params_list[start:start + lpc]
        flat = [op for lp_ in group for op in layer_operands(lp_)]

        def kernel(x_ref, *rest, n_layers=len(group)):
            weight_refs = rest[:-3]
            o_ref, kp_s, vp_s = rest[-3:]

            @pl.when(pl.program_id(0) == 0)
            def _zero():
                kp_s[:] = jnp.zeros_like(kp_s)
                vp_s[:] = jnp.zeros_like(vp_s)

            for c in range(n_layers):
                src = x_ref if c == 0 else o_ref
                _layer_kernel_kt(
                    src, *weight_refs[c * N_OPS:(c + 1) * N_OPS],
                    o_ref, kp_s, vp_s,
                    seq_len=seq_len, n_head=n_head, kt=kt)

        xp = _pallas_call(
            kernel,
            grid=(Bp // G,),
            in_specs=[data_block] + [rep(o.shape) for o in flat],
            out_specs=data_block,
            out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype),
            scratch_shapes=[pltpu.VMEM((G, n_head * kt, D), x.dtype),
                            pltpu.VMEM((G, n_head * kt, D), x.dtype)],
        )(xp, *flat)
    return xp[:B, :L, :]
