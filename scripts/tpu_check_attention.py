#!/usr/bin/env python
"""On-TPU correctness check for the standalone Pallas attention kernel
(the training-path forward) against the XLA packed reference."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vitiq.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from vitiq.ops.pallas import flash_attention as fa


def main() -> int:
    rng = np.random.default_rng(0)
    for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)):
        for B, L, D, H in ((4, 129, 128, 8), (2, 17, 128, 8), (3, 65, 128, 4)):
            q, k, v = (jnp.asarray(rng.standard_normal((B, L, D)), dtype)
                       for _ in range(3))
            got = np.asarray(jax.jit(
                lambda q, k, v: fa._pallas_attention(q, k, v, H))(q, k, v),
                dtype=np.float32)
            want = np.asarray(fa._xla_packed_attention(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), H, fa.REFERENCE))
            err = np.abs(got - want).max()
            print(f"dtype={dtype.__name__} B={B} L={L} H={H}: max|err|={err:.5f}",
                  flush=True)
            assert err < max(tol, 0.05 * np.abs(want).max()), "KERNEL MISMATCH"
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
