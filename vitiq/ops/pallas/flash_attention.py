"""Fused self-attention Pallas kernel for the AMC encoder.

Why a custom kernel instead of translating the reference's matmul chain
(ref: ViT/models/layers/scale_dot_product_attention.py:18-39): the reference
materializes the [B, H, L, L] score tensor in device memory twice (pre- and
post-softmax). At this model's shapes (L = 17..1025) that tensor dominates the
layer's HBM traffic — at inference batch 8192 on the ViT arm it alone is
~4.4 GB, which is exactly what OOMs a 16 GB v5e under the XLA path. Here
scores/probs live only in VMEM.

Layout design (the part that matters on TPU): heads are kept PACKED in the
model dimension — kernel operands are [B, Lp, d_model] with d_model = 128 = one
lane tile. A [B, H, L, d_head] layout with d_head = 16 would be physically
padded 16 -> 128 lanes in HBM (8x memory blowup); packed, the arrays are
compact and the per-head split happens for free in VMEM via a reshape. L is
padded to the sublane tile only (129 -> 144 for bf16), with padded keys masked
to -inf before the softmax.

One grid step per batch element holds the whole [H, Lp, Lp] score block in
VMEM (~600 KB at L=144) — no K/V streaming loop is needed at these sequence
lengths.

The public entry `fused_attention` is packed-layout (consumed by
`mha_apply` before head splitting); backward recomputes attention under XLA
(flash-style rematerialization). On CPU/GPU it falls back to the XLA
reference implementation so tests run anywhere.

Precision note: in-kernel dot_generals run at the MXU's native precision —
f32 operands are truncated to bf16 (measured max err ~1e-2 vs a
Precision.HIGHEST reference on hardware; exact in interpreter mode). This is
by design: the kernel serves the bf16 'tpu' preset only. The f32 'reference'
parity preset never routes through Pallas.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitiq.ops.attention import scaled_dot_product_attention
from vitiq.ops.numerics import Policy, REFERENCE, TPU

_NEG_INF = -1e30


from vitiq.ops.pallas._common import (  # noqa: E402
    generic_interpret as _generic_interpret,
    pallas_call as _pallas_call,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, n_head: int,
                      scale: float):
    """One block of G batch rows: packed [G, Lp, D] -> attention -> [G, Lp, D].

    Heads are carved out with STATIC lane slices and processed in an unrolled
    loop: Mosaic cannot relayout a lane-splitting reshape ([Lp, 128] ->
    [Lp, H, dh], "unsupported shape cast"), but static slices at dh-aligned
    offsets lower cleanly. Each head does one G-batched [G, Lp, dh] x
    [G, dh, Lp] MXU matmul — G amortizes both the per-program launch/DMA
    overhead (a 1-row grid spends more time launching than computing at these
    shapes) and the MXU tiling waste of the dh=16 contraction.
    """
    g, lp, d = q_ref.shape
    dh = d // n_head
    # additive -inf bias row for padded keys: ONE vpu op per score element vs
    # three for iota+compare+select
    key_bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, lp), dimension=2) < seq_len,
        0.0, _NEG_INF,
    ).astype(jnp.float32)

    # Softmax cost dominates this kernel (the score matrix has ~Lp/dh x more
    # elements than everything else), so the VPU work per score element is
    # pared to bias-add + exp + sum-accumulate:
    #  * no max-subtraction — mathematically a no-op, and with LayerNorm'd
    #    q/k at these widths |score| << 88, the f32 exp overflow bound;
    #  * the 1/sum normalization is applied to the [G, Lp, dh] OUTPUT of the
    #    probs @ v matmul instead of the [G, Lp, Lp] probs (dh/Lp ~ 9x fewer
    #    divisions), using the exact same f32 values.
    # Each head writes its output-lane slice immediately so its temporaries
    # are dead before the next head starts (a final concatenate keeps all
    # heads' score matrices live at once and blows the scoped-VMEM stack).
    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        scores = jax.lax.dot_general(
            q_ref[:, :, sl].astype(jnp.float32), k_ref[:, :, sl].astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [G, Lp, Lp]
        # exp2: the VPU-native base-2 exponential; log2e folds into the scale
        probs = jnp.exp2(scores * 1.4426950408889634 + key_bias)
        denom = jnp.sum(probs, axis=-1, keepdims=True)  # [G, Lp, 1]
        out = jax.lax.dot_general(
            probs.astype(v_ref.dtype), v_ref[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, Lp, dh]
        o_ref[:, :, sl] = (out / denom).astype(o_ref.dtype)


def _pick_batch_block(B: int, Lp: int, D: int, itemsize: int) -> int:
    """Largest G (power of two <= 32) dividing the padded batch such that the
    kernel's VMEM working set stays comfortably under budget."""
    for g in (32, 16, 8, 4, 2, 1):
        # q/k/v/o blocks are double-buffered by the pipeline (x2); q/k are
        # cast to f32 in-kernel; scores+probs per head live in f32
        blocks = 2 * 4 * g * Lp * D * itemsize
        casts = 2 * g * Lp * D * 4
        scores = 2 * g * Lp * Lp * 4
        if blocks + casts + scores <= 10 * 1024 * 1024:
            return g
    return 1


def _pallas_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      n_head: int) -> jnp.ndarray:
    """Packed [B, L, D] fused self-attention (no mask support — the AMC
    encoder never passes one, ref: ViT/models/encoder.py src_mask=None)."""
    B, L, D = q.shape
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sublane)
    G = _pick_batch_block(B, Lp, D, q.dtype.itemsize)
    Bp = _round_up(B, G)
    pad = lambda t: jnp.pad(t, ((0, Bp - B), (0, Lp - L), (0, 0)))
    qp, kp, vp = pad(q), pad(k), pad(v)

    kernel = functools.partial(
        _attention_kernel, seq_len=L, n_head=n_head,
        scale=1.0 / ((D // n_head) ** 0.5),
    )
    block = pl.BlockSpec((G, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = _pallas_call(
        kernel,
        grid=(Bp // G,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * Bp * n_head * Lp * Lp * (D // n_head),
            bytes_accessed=4 * Bp * Lp * D * q.dtype.itemsize,
            transcendentals=Bp * n_head * Lp * Lp,
        ),
    )(qp, kp, vp)
    return out[:B, :L, :]


def _xla_packed_attention(q, k, v, n_head, policy):
    """Packed-layout reference path (CPU fallback + backward recompute)."""
    B, L, D = q.shape
    dh = D // n_head
    split = lambda t: t.reshape(B, L, n_head, dh).transpose(0, 2, 1, 3)
    out = scaled_dot_product_attention(split(q), split(k), split(v), policy=policy)
    return out.transpose(0, 2, 1, 3).reshape(B, L, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention_tpu(q, k, v, n_head):
    return _pallas_attention(q, k, v, n_head)


def _fwd(q, k, v, n_head):
    return _pallas_attention(q, k, v, n_head), (q, k, v)


def _bwd(n_head, residuals, g):
    # Flash-style backward: recompute attention under XLA (fused by the
    # compiler) instead of saving the [B, H, L, L] probability tensor.
    # The recompute runs under the PRIMAL's policy: inputs already arrive in
    # the policy's compute dtype (bf16 under 'tpu'), so forcing REFERENCE
    # (Precision.HIGHEST = the 3-pass bf16 f32-emulation, ~3x matmul cost)
    # here would triple the rematerialization cost of every training step for
    # no extra precision — the primal itself ran native bf16.
    # The recompute must still match the primal's output dtype or jax.vjp
    # rejects the cotangent.
    q, k, v = residuals
    policy = TPU if q.dtype == jnp.bfloat16 else REFERENCE
    B, L, D = q.shape

    def one(args):
        qc, kc, vc, gc = args
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_packed_attention(q_, k_, v_, n_head,
                                                     policy).astype(q.dtype),
            qc, kc, vc,
        )
        return vjp(gc)

    # The XLA recompute materializes ~7 bytes/score-element ([B,H,L,L] f32
    # scores + bf16 probs + a pred mask); at conv1d length (1025 tokens,
    # train batch 256) that measured 16.9 GB against the 15.75 GB chip.
    # Tile the batch with lax.map so only one chunk's score tensors are
    # live at a time — semantics-identical, and a no-op for every shape
    # whose full recompute fits the budget (flagship 129 tokens: 238 MB).
    per_frame = n_head * L * L * 7
    budget = int(os.environ.get("VITIQ_ATTN_BWD_BUDGET",
                                str(2 * 1024 ** 3)))
    chunk = max(1, min(B, budget // max(per_frame, 1)))
    if chunk >= B:
        return one((q, k, v, g))
    nb = -(-B // chunk)
    pad = nb * chunk - B

    def tile(t):
        tp = jnp.pad(t, ((0, pad), (0, 0), (0, 0))) if pad else t
        return tp.reshape(nb, chunk, L, D)

    dq, dk, dv = jax.lax.map(
        one, (tile(q), tile(k), tile(v), tile(g.astype(q.dtype))))
    untile = lambda t: t.reshape(nb * chunk, L, D)[:B]
    return untile(dq), untile(dk), untile(dv)


_fused_attention_tpu.defvjp(_fwd, _bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_head: int,
    mask: Optional[jnp.ndarray] = None,
    policy: Policy = REFERENCE,
    return_scores: bool = False,
):
    """Packed-layout fused attention: [B, L, d_model] in/out.

    Pallas on TPU; XLA everywhere else (and whenever a mask or the score
    matrix is requested).
    """
    if mask is not None or return_scores or jax.default_backend() != "tpu":
        if mask is not None or return_scores:
            B, L, D = q.shape
            dh = D // n_head
            split = lambda t: t.reshape(B, L, n_head, dh).transpose(0, 2, 1, 3)
            res = scaled_dot_product_attention(
                split(q), split(k), split(v), mask=mask, policy=policy,
                return_scores=return_scores,
            )
            if return_scores:
                out, scores = res
                return out.transpose(0, 2, 1, 3).reshape(B, L, D), scores
            return res.transpose(0, 2, 1, 3).reshape(B, L, D)
        return _xla_packed_attention(q, k, v, n_head, policy)
    compute = policy.cast_compute
    # stays in the policy's compute dtype: the downstream w_concat matmul
    # consumes bf16 directly under the TPU policy (no f32 round-trip in HBM)
    return _fused_attention_tpu(compute(q), compute(k), compute(v), n_head)


fused_attention.packed_layout = True
