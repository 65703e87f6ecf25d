#!/usr/bin/env python
"""DIAGNOSTIC ONLY: time the fused-layer kernel with softmax-exp removed
(mathematically wrong, structurally identical) to attribute the per-layer cost
between the exp VPU work and the matmul/memory structure."""
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitiq.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from vitiq.models.layers import encoder_layer_init
from vitiq.ops.pallas import fused_encoder_layer as fel


def kernel_noexp(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                 g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 g2_ref, be2_ref, o_ref, attn_scratch,
                 *, seq_len, n_head, scale):
    g, lp, d = x_ref.shape
    dh = d // n_head
    x = x_ref[:]
    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv = qkv.astype(x.dtype)
    key_bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, lp), 2) < seq_len, 0.0, -1e30
    ).astype(jnp.float32)
    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        q = qkv[:, :, h * dh:(h + 1) * dh].astype(jnp.float32)
        k = qkv[:, :, d + h * dh:d + (h + 1) * dh].astype(jnp.float32)
        v = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        probs = scores + key_bias  # <-- exp removed
        denom = jnp.sum(probs, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            probs.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        attn_scratch[:, :, sl] = (out / denom).astype(attn_scratch.dtype)
    proj = jax.lax.dot_general(
        attn_scratch[:], wo_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[:]
    x1 = fel._layer_norm(proj + x.astype(jnp.float32), g1_ref[:], be1_ref[:], x.dtype)
    hmid = jax.lax.dot_general(
        x1, w1_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[:]
    hmid = jnp.maximum(hmid, 0.0).astype(x.dtype)
    y = jax.lax.dot_general(
        hmid, w2_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[:] = fel._layer_norm(y + x1.astype(jnp.float32), g2_ref[:], be2_ref[:],
                               o_ref.dtype)


def main() -> int:
    B, L, D, H, NH = 8192, 129, 128, 512, 8
    params = encoder_layer_init(jax.random.PRNGKey(0), D, H)
    ap = params["attention"]
    wqkv = jnp.concatenate([ap[k]["kernel"] for k in ("w_q", "w_k", "w_v")],
                           axis=1).astype(jnp.bfloat16)
    bqkv = jnp.concatenate([ap[k]["bias"] for k in ("w_q", "w_k", "w_v")])
    args = [
        wqkv, bqkv, ap["w_concat"]["kernel"].astype(jnp.bfloat16),
        ap["w_concat"]["bias"],
        params["norm1"]["gamma"], params["norm1"]["beta"],
        params["ffn"]["linear1"]["kernel"].astype(jnp.bfloat16),
        params["ffn"]["linear1"]["bias"],
        params["ffn"]["linear2"]["kernel"].astype(jnp.bfloat16),
        params["ffn"]["linear2"]["bias"],
        params["norm2"]["gamma"], params["norm2"]["beta"],
    ]
    Lp, G = 144, 16
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, Lp, D)),
                    jnp.bfloat16)
    kernel = functools.partial(kernel_noexp, seq_len=L, n_head=NH, scale=0.25)
    data_block = pl.BlockSpec((G, Lp, D), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    rep = lambda s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                                 memory_space=pltpu.VMEM)

    @jax.jit
    def run(x, *args):
        t = x
        for _ in range(6):
            t = pl.pallas_call(
                kernel, grid=(B // G,),
                in_specs=[data_block] + [rep(a.shape) for a in args],
                out_specs=data_block,
                out_shape=jax.ShapeDtypeStruct((B, Lp, D), x.dtype),
                scratch_shapes=[pltpu.VMEM((G, Lp, D), x.dtype)],
            )(t, *args)
        return jnp.sum(t.astype(jnp.float32))

    t0 = time.perf_counter()
    float(run(x, *args))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(run(x, *args))
        ts.append(time.perf_counter() - t0)
    print(f"noexp 6-layer stack: {np.median(ts) * 1e3:.2f} ms/batch", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
