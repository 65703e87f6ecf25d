"""Fused self-attention Pallas kernel for the AMC encoder.

Why a custom kernel instead of translating the reference's matmul chain
(ref: ViT/models/layers/scale_dot_product_attention.py:18-39): the reference
materializes the [B, H, L, L] score tensor in device memory twice (pre- and
post-softmax). At this model's shapes (L = 17..1025, d_head = 16..32) the score
tensor is the dominant memory traffic of the layer. Here Q/K/V tiles stream
HBM -> VMEM once, scores live only in VMEM/registers, and the (already
padding-masked) softmax+PV product writes a single [L, dh] result per
(batch, head) program.

Shapes are tiny relative to VMEM (a padded 1152x1152 f32 score block is ~5 MB),
so one grid step per (batch*head) with the full sequence resident is both the
simplest and the fastest schedule — no K/V streaming loop is needed.

The public entry `fused_attention` is a drop-in for
`vitiq.ops.attention.scaled_dot_product_attention` (same [B,H,L,Dh] layout):
  * on TPU backends it calls the Pallas kernel with a custom VJP whose backward
    recomputes attention under XLA (flash-style rematerialization — no probs
    tensor saved);
  * on CPU/GPU it falls back to the XLA implementation so tests run anywhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitiq.ops.attention import scaled_dot_product_attention
from vitiq.ops.numerics import Policy, REFERENCE

_LANE = 128
_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float):
    """One (batch*head) program: full-sequence attention in VMEM.

    Refs are [Lp, Dp] blocks (padded). Padded KEY columns are masked to -inf
    before the softmax; padded query rows compute garbage that the caller
    slices off. Padded Dh columns of q/k are zero so they add nothing to the
    logits; padded v columns produce zeros in the output.
    """
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    # scores: [Lp, Lp] on the MXU, f32 accumulation
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    lp = scores.shape[-1]
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), dimension=1)
    scores = jnp.where(key_ids < seq_len, scores, _NEG_INF)
    # numerically stable softmax over keys
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    o_ref[:] = jnp.dot(
        probs.astype(v_ref.dtype), v_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pallas_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, H, L, Dh] fused attention (no mask support — the AMC encoder never
    passes one, ref: ViT/models/encoder.py src_mask=None throughout)."""
    B, H, L, Dh = q.shape
    Lp = _round_up(L, _LANE)
    Dp = _round_up(Dh, _LANE)
    pad = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, Lp - L), (0, Dp - Dh)))
    qp, kp, vp = pad(q), pad(k), pad(v)
    # fold batch & heads into the grid
    qf = qp.reshape(B * H, Lp, Dp)
    kf = kp.reshape(B * H, Lp, Dp)
    vf = vp.reshape(B * H, Lp, Dp)

    kernel = functools.partial(
        _attention_kernel, seq_len=L, scale=1.0 / (Dh ** 0.5)
    )
    block = pl.BlockSpec((1, Lp, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        lambda qr, kr, vr, orf: kernel(qr.at[0], kr.at[0], vr.at[0], orf.at[0]),
        grid=(B * H,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, Dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lp * Lp * Dp,
            bytes_accessed=4 * B * H * Lp * Dp * 4,
            transcendentals=B * H * Lp * Lp,
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, Lp, Dp)[:, :, :L, :Dh]


@jax.custom_vjp
def _fused_attention_tpu(q, k, v):
    return _pallas_attention(q, k, v)


def _fwd(q, k, v):
    return _pallas_attention(q, k, v), (q, k, v)


def _bwd(residuals, g):
    # Flash-style backward: recompute attention under XLA (fused by the
    # compiler) instead of saving the [B,H,L,L] probability tensor.
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: scaled_dot_product_attention(q_, k_, v_), q, k, v)
    return vjp(g)


_fused_attention_tpu.defvjp(_fwd, _bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    policy: Policy = REFERENCE,
    return_scores: bool = False,
):
    """Drop-in for scaled_dot_product_attention; Pallas on TPU, XLA elsewhere."""
    if (
        mask is not None
        or return_scores
        or jax.default_backend() not in ("tpu", "axon")
    ):
        return scaled_dot_product_attention(
            q, k, v, mask=mask, policy=policy, return_scores=return_scores
        )
    compute = policy.cast_compute
    return _fused_attention_tpu(compute(q), compute(k), compute(v)).astype(jnp.float32)
