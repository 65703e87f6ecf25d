#!/usr/bin/env python
"""Micro-probes: which elementwise op crashes Mosaic on a narrow (16-lane)
tile with 144 sublanes? Each variant is one tiny pallas_call.
Usage: python scripts/tpu_probe_mask_ops.py v1 v2 ...  (default: all)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

from vitiq.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, LP, T = 8, 144, 16
SEQ = 129
C0 = 128


def k_splat_add(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def k_iota_narrow_int(x_ref, o_ref):
    i = jax.lax.broadcasted_iota(jnp.int32, (G, LP, T), dimension=2)
    o_ref[:] = x_ref[:] + i.astype(jnp.float32)


def k_iota_full_slice(x_ref, o_ref):
    i = jax.lax.broadcasted_iota(jnp.int32, (G, LP, 128), dimension=2)[:, :, :T]
    o_ref[:] = x_ref[:] + i.astype(jnp.float32)


def k_clip_chain(x_ref, o_ref):
    i = jax.lax.broadcasted_iota(jnp.int32, (G, LP, 128), dimension=2)[:, :, :T] + C0
    valid = jnp.clip((SEQ - i).astype(jnp.float32), 0.0, 1.0)
    o_ref[:] = x_ref[:] + (valid - 1.0) * 1e30


def k_select_narrow(x_ref, o_ref):
    i = jax.lax.broadcasted_iota(jnp.int32, (G, LP, T), dimension=2)
    o_ref[:] = x_ref[:] + jnp.where(i + C0 < SEQ, 0.0, -1e30)


def k_bcast_add(x_ref, o_ref):
    b = jnp.zeros((1, 1, T), jnp.float32) - 1.0
    o_ref[:] = x_ref[:] + b


def k_exp2(x_ref, o_ref):
    o_ref[:] = jnp.exp2(x_ref[:])


KS = {
    "splat": k_splat_add,
    "iota_narrow": k_iota_narrow_int,
    "iota_full_slice": k_iota_full_slice,
    "clip_chain": k_clip_chain,
    "select_narrow": k_select_narrow,
    "bcast_add": k_bcast_add,
    "exp2": k_exp2,
}


def main() -> int:
    names = sys.argv[1:] or list(KS)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((G, LP, T)),
                    jnp.float32)
    blk = pl.BlockSpec((G, LP, T), lambda: (0, 0, 0), memory_space=pltpu.VMEM)
    for name in names:
        try:
            out = pl.pallas_call(
                KS[name], in_specs=[blk], out_specs=blk,
                out_shape=jax.ShapeDtypeStruct((G, LP, T), jnp.float32),
            )(x)
            jax.block_until_ready(out)
            print(f"{name}: OK", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
    return 0




def _mm(x_ref, w_ref):
    return jax.lax.dot_general(
        x_ref[:], w_ref[:], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def k_mm_plain(x_ref, w_ref, o_ref):
    o_ref[:] = _mm(x_ref, w_ref)


def k_mm_add_splat(x_ref, w_ref, o_ref):
    o_ref[:] = _mm(x_ref, w_ref) + 1.0


def k_mm_add_select(x_ref, w_ref, o_ref):
    i = jax.lax.broadcasted_iota(jnp.int32, (G, LP, T), dimension=2)
    o_ref[:] = _mm(x_ref, w_ref) + jnp.where(i + C0 < SEQ, 0.0, -1e30)


def k_mm_add_clip(x_ref, w_ref, o_ref):
    i = jax.lax.broadcasted_iota(jnp.int32, (G, LP, T), dimension=2) + C0
    valid = jnp.clip((SEQ - i).astype(jnp.float32), 0.0, 1.0)
    o_ref[:] = _mm(x_ref, w_ref) + (valid - 1.0) * 1e30


def main2() -> int:
    names = sys.argv[1:]
    x = jnp.asarray(np.random.default_rng(0).standard_normal((G, LP, 32)),
                    jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((G, T, 32)),
                    jnp.bfloat16)
    xblk = pl.BlockSpec((G, LP, 32), lambda: (0, 0, 0), memory_space=pltpu.VMEM)
    wblk = pl.BlockSpec((G, T, 32), lambda: (0, 0, 0), memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((G, LP, T), lambda: (0, 0, 0), memory_space=pltpu.VMEM)
    ks = {"mm_plain": k_mm_plain, "mm_add_splat": k_mm_add_splat,
          "mm_add_select": k_mm_add_select, "mm_add_clip": k_mm_add_clip}
    for name in names:
        try:
            out = pl.pallas_call(
                ks[name], in_specs=[xblk, wblk], out_specs=oblk,
                out_shape=jax.ShapeDtypeStruct((G, LP, T), jnp.float32),
            )(x, w)
            jax.block_until_ready(out)
            print(f"{name}: OK", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
    return 0


if __name__ == "__main__":
    if sys.argv[1:] and sys.argv[1].startswith("mm_"):
        sys.exit(main2())
    sys.exit(main())
