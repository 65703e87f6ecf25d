#!/usr/bin/env python
"""Train-step cost attribution on TPU. Usage:
    python scripts/tpu_train_probe.py <variant> [batch] [steps]
Variants:
  step        — full train step (flagship ViT, dropout 0.1)
  step_nodrop — same with drop_prob=0 (isolates dropout mask cost)
  fwdtrain    — forward only, train=True with dropout (no grad)
  fwdgrad     — value_and_grad of the loss, no optimizer update
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

from dataclasses import replace

from vitiq.bench import FLAGSHIP_STATS, flagship_vit_config
from vitiq.config import TrainConfig
from vitiq.dsp import preprocess_batch_vit
from vitiq.models import init_amc_params, make_forward
from vitiq.ops.metrics import label_smoothed_cross_entropy
from vitiq.train.loop import make_train_step
from vitiq.train.optim import create_train_state, make_optimizer


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "step"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_head = int(sys.argv[4]) if len(sys.argv) > 4 else None

    cfg = flagship_vit_config("tpu")
    if variant == "step_nodrop":
        cfg = replace(cfg, drop_prob=0.0)
    if n_head is not None:  # d_head>=32 head variants
        cfg = replace(cfg, n_head=n_head)
    params = init_amc_params(jax.random.PRNGKey(0), cfg)
    fwd = make_forward(cfg)
    pre = lambda x: preprocess_batch_vit(x, FLAGSHIP_STATS)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, 1024, 2)), jnp.float32)
    y = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(0)

    if variant in ("step", "step_nodrop"):
        tcfg = TrainConfig(batch_size=B)
        tx = make_optimizer(tcfg)
        state = create_train_state(params, tcfg)
        step = make_train_step(fwd, tx, tcfg.label_smoothing, pre)
        state, m = step(state, x, y, rng)
        float(m["loss"])
        ts = []
        for _ in range(steps):
            t0 = time.perf_counter()
            state, m = step(state, x, y, rng)
            float(m["loss"])
            ts.append(time.perf_counter() - t0)
    elif variant in ("fwdtrain", "fwdgrad"):
        def loss_fn(params, xi):
            logits = fwd(params, pre(xi), train=True, rng=rng)
            return label_smoothed_cross_entropy(logits, y, 0.1)

        if variant == "fwdtrain":
            run = jax.jit(loss_fn)
        else:
            # consume the grads (sum of leaf sums) or XLA dead-code-eliminates
            # the entire backward
            def run_(p, xi):
                v, g = jax.value_and_grad(loss_fn)(p, xi)
                return v + sum(jnp.sum(le) for le in jax.tree_util.tree_leaves(g))

            run = jax.jit(run_)
        float(run(params, x))
        ts = []
        for _ in range(steps):
            t0 = time.perf_counter()
            v = run(params, x + 1e-6)
            float(v)
            ts.append(time.perf_counter() - t0)
    else:
        raise SystemExit(f"unknown variant {variant}")

    p50 = float(np.median(ts))
    print(f"[{variant}] B={B} p50 {p50 * 1e3:.1f} ms  {B / p50:,.0f} frames/s",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
