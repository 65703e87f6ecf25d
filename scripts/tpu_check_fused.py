#!/usr/bin/env python
"""On-TPU correctness spot-check: the fused-layer bf16 inference path vs the
reference f32 path, on the flagship model. Run on a TPU backend."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vitiq.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from vitiq.bench import FLAGSHIP_STATS, flagship_vit_config
from vitiq.dsp import preprocess_batch_vit
from vitiq.models import init_amc_params, make_forward


def main() -> int:
    cfg_tpu = flagship_vit_config("tpu")
    cfg_ref = flagship_vit_config("reference")
    params = init_amc_params(jax.random.PRNGKey(0), cfg_tpu)
    pre = lambda x: preprocess_batch_vit(x, FLAGSHIP_STATS)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 1024, 2)), jnp.float32)

    fused = jax.jit(lambda p, x: make_forward(cfg_tpu)(p, pre(x), train=False))
    ref = jax.jit(lambda p, x: make_forward(cfg_ref)(p, pre(x), train=False))
    a = np.asarray(fused(params, x))
    b = np.asarray(ref(params, x))
    agree = float(np.mean(a.argmax(-1) == b.argmax(-1)))
    max_abs = float(np.abs(a - b).max())
    print(f"fused-vs-reference: argmax agreement {agree:.3f}, "
          f"max |dlogit| {max_abs:.4f}", flush=True)
    assert agree >= 0.95, "fused bf16 path diverges from reference"
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
