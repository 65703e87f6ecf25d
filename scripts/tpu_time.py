#!/usr/bin/env python
"""Amortized TPU timing of one model variant. Usage:
    python scripts/tpu_time.py [pallas|xla|noattn|pre] [batch] [inner]

Times an in-jit scan of `inner` forward passes over perturbed inputs (defeats
loop-invariant hoisting and per-dispatch relay overhead) and reports honest
frames/s. Prints are flushed immediately for background capture.
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

from vitiq.bench import FLAGSHIP_STATS, flagship_vit_config
from vitiq.dsp import preprocess_batch_vit
from vitiq.models import init_amc_params, make_forward
from vitiq.ops.attention import scaled_dot_product_attention


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    INNER = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    cfg = flagship_vit_config("tpu")
    params = init_amc_params(jax.random.PRNGKey(0), cfg)
    pre = lambda x: preprocess_batch_vit(x, FLAGSHIP_STATS)

    if variant == "pallas":
        fwd = make_forward(cfg)
        fn = lambda p, xi: fwd(p, pre(xi), train=False)
    elif variant == "xla":
        fwd = make_forward(cfg, attention_fn=scaled_dot_product_attention)
        fn = lambda p, xi: fwd(p, pre(xi), train=False)
    elif variant == "noattn":
        ident = lambda q, k, v, mask=None, policy=None, return_scores=False: v
        fwd = make_forward(cfg, attention_fn=ident)
        fn = lambda p, xi: fwd(p, pre(xi), train=False)
    elif variant == "pre":
        fn = lambda p, xi: pre(xi)
    elif variant == "layers2":
        from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v2_stack

        params = init_amc_params(jax.random.PRNGKey(0), cfg)
        layer_list = params["encoder"]["layers"]

        def fn(p, xi):
            t = jnp.tile(xi[:, :129, 0:1], (1, 1, 128)).astype(jnp.bfloat16)
            return fused_encoder_layer_v2_stack(t, layer_list, 8)
    elif variant == "layers3i":
        from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

        params = init_amc_params(jax.random.PRNGKey(0), cfg)
        layer_list = params["encoder"]["layers"]

        def fn(p, xi):
            t = jnp.tile(xi[:, :129, 0:1], (1, 1, 128)).astype(jnp.bfloat16)
            return fused_encoder_layer_v3_stack(t, layer_list, 8, attn_int8=True)
    elif variant == "layers3":
        from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

        params = init_amc_params(jax.random.PRNGKey(0), cfg)
        layer_list = params["encoder"]["layers"]

        def fn(p, xi):
            t = jnp.tile(xi[:, :129, 0:1], (1, 1, 128)).astype(jnp.bfloat16)
            return fused_encoder_layer_v3_stack(t, layer_list, 8)
    elif variant == "layersL":
        # 6 fused layers at conv1d length (1025 tokens): isolates the
        # long-sequence encoder cost from embedding/head glue. Honors
        # VITIQ_V3_* env knobs incl. surgery probes.
        from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

        params = init_amc_params(jax.random.PRNGKey(0), cfg)
        layer_list = params["encoder"]["layers"]

        def fn(p, xi):
            t = jnp.tile(xi[:, :1024, 0:1], (1, 1, 128)).astype(jnp.bfloat16)
            t = jnp.concatenate([t[:, :1, :], t], axis=1)  # [B, 1025, 128]
            return fused_encoder_layer_v3_stack(t, layer_list, 8)
    elif variant == "layers":
        # 6 fused layers on a pre-embedded token stream: isolates the encoder
        # from the patchify/PE/head glue
        from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer

        params = init_amc_params(jax.random.PRNGKey(0), cfg)
        layer_list = params["encoder"]["layers"]

        def fn(p, xi):
            # xi [B, 1024, 2] -> tokens [B, 129, 128] bf16 (cheap broadcast,
            # data-dependent so nothing constant-folds)
            t = jnp.tile(xi[:, :129, 0:1], (1, 1, 128)).astype(jnp.bfloat16)
            for lp_ in layer_list:
                t = fused_encoder_layer(t, lp_, 8)
            return t
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
    print(f"[{variant}] compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, x))
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts)) / INNER
    print(f"[{variant}] B={B} per-batch {p50 * 1e3:.2f} ms  "
          f"{B / p50:,.0f} frames/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
