#!/usr/bin/env python
"""seg-64 (Lp=32) serving decomposition probes. Usage:

    python scripts/tpu_probe_seg64.py [variant] [batch] [inner]

Variants:
  full    end-to-end auto route (z-score + segment embed + encoder + head)
  pre     preprocess_batch_rawiq only (z-score + [2,1024] transpose)
  layersS fused v3 stack alone on a pre-embedded [B, 17, 128] stream
          (honors VITIQ_V3_* env knobs incl. VITIQ_V3_PROBE surgery)
  full_mp / layersS_mp
          same for the MEAN-POOL geometry (use_cls_token=False: 16
          tokens, Lp=16, zero sublane padding — pass-SOL 2.82M frames/s)

Glue (z-score + embed GEMM + PE/CLS + head + dispatch) is attributed by
subtraction: full − layersS − pre.

The seg-64 arm is the reference's production_rawIQv1 tokenization
(transformer_rawIQ/result/checkpoints/production_rawIQv1/config.json) and
the only served shape whose pass-arithmetic ceiling (1.48M frames/s,
scripts/pass_roofline.py) crosses the 1M frames/s BASELINE north star —
this script attributes the measured-vs-ceiling gap. Timing follows the
amortized in-jit lax.scan protocol (CLAUDE.md: per-call block_until_ready
through the relay under-reports ~3000x).
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

from vitiq.bench import FLAGSHIP_STATS, rawiq_seg64_config
from vitiq.dsp import preprocess_batch_rawiq
from vitiq.models import init_amc_params, make_forward


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    INNER = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    label = variant
    cfg = rawiq_seg64_config("tpu")
    if variant.endswith("_mp"):
        from vitiq.bench import rawiq_seg64_mp_config

        cfg = rawiq_seg64_mp_config("tpu")
        variant = variant[:-3]
    params = init_amc_params(jax.random.PRNGKey(0), cfg)
    n_tok = 16 if not cfg.use_cls_token else 17
    pre = lambda x: preprocess_batch_rawiq(x, FLAGSHIP_STATS)

    if variant == "full":
        fwd = make_forward(cfg)
        fn = lambda p, xi: fwd(p, pre(xi), train=False)
    elif variant == "pre":
        fn = lambda p, xi: pre(xi)
    elif variant == "layersS":
        from vitiq.ops.pallas.fused_encoder_layer import (
            fused_encoder_layer_v3_stack,
        )

        layer_list = params["encoder"]["layers"]

        def fn(p, xi):
            # [B, 1024, 2] -> [B, n_tok, 128] bf16 tokens (data-dependent)
            t = jnp.tile(xi[:, :n_tok, 0:1], (1, 1, 128)).astype(jnp.bfloat16)
            return fused_encoder_layer_v3_stack(t, layer_list, cfg.n_head)
    else:
        raise SystemExit(f"unknown variant {variant}")

    @jax.jit
    def run(params, x):
        def body(c, i):
            xi = x + (i.astype(x.dtype) * 1e-6)
            return c + jnp.sum(fn(params, xi).astype(jnp.float32)), None

        t, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(INNER))
        return t

    x = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 1024, 2)), jnp.float32))
    t0 = time.perf_counter()
    float(run(params, x))
    print(f"[seg64:{label}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, x))
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts)) / INNER
    print(f"[seg64:{label}] B={B} per-batch {p50 * 1e3:.3f} ms  "
          f"{B / p50:,.0f} frames/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
