#!/usr/bin/env python
"""Bisection probe for the v3 fused-layer kernel on real TPU hardware.
Usage: python scripts/tpu_probe_v3.py <variant> [L]
Variants compile a single grouped layer at small batch so iteration is fast.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

from vitiq.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
import jax.numpy as jnp
import numpy as np

from vitiq.models import layers as L


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    Lx = int(sys.argv[2]) if len(sys.argv) > 2 else 129
    B, D, H, n_head = 64, 128, 512, 8
    params = L.encoder_layer_init(jax.random.PRNGKey(0), D, H)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, Lx, D)),
                    jnp.bfloat16)

    from vitiq.ops.pallas import fused_encoder_layer as F

    if variant == "full":
        fn = jax.jit(lambda x: F.fused_encoder_layer_v3_stack(x, [params], n_head))
    elif variant == "bf16":
        fn = jax.jit(lambda x: F.fused_encoder_layer_v3_stack(
            x, [params], n_head, scores_bf16=True))
    elif variant == "nomask":
        # seq_len == Lp: bias branch never taken
        lp = ((Lx + 15) // 16) * 16
        xp = jnp.pad(x, ((0, 0), (0, lp - Lx), (0, 0)))
        fn = jax.jit(lambda x: F.fused_encoder_layer_v3_stack(xp, [params], n_head))
    else:
        raise SystemExit(f"unknown variant {variant}")

    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(x if variant != "nomask" else x))
    print(f"[{variant} L={Lx}] ok, {time.perf_counter() - t0:.1f}s, "
          f"out {out.shape} finite={bool(jnp.isfinite(out.astype(jnp.float32)).all())}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
