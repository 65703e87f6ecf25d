#!/usr/bin/env python
"""Train-step cost attribution on TPU. Usage:
    python scripts/tpu_train_probe.py <variant> [batch] [steps] [n_head] [arm]
Variants:
  step        — full train step (dropout at the arm's configured rate)
  step_nodrop — same with drop_prob=0 (isolates dropout mask cost)
  fwdtrain    — forward only, train=True with dropout (no grad)
  fwdgrad     — value_and_grad of the loss, no optimizer update
  sgdstep     — full step with plain SGD (step - sgdstep = clip+AdamW cost)
  noclip      — full step, AdamW without clip_by_global_norm
  preonly     — preprocess_batch_* alone (z-score + relayout/fold glue)
  preembed    — preprocess + token embedding + PE (everything before layer 0)

`arm` is any bench ARM_CONFIGS key (vit, vit_tiny, rawiq_seg64_mp, ...);
timing is per-call (fetch every step) so TOTALS carry the ~25 ms relay
round-trip tax — use DELTAS between variants from the same session
(docs/BENCHMARKS.md rounds 3u-3w).
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
import optax

from dataclasses import replace

from vitiq.bench import ARM_CONFIGS, FLAGSHIP_STATS
from vitiq.config import TrainConfig
from vitiq.dsp import preprocess_batch_rawiq, preprocess_batch_vit
from vitiq.models import init_amc_params, make_forward
from vitiq.models.encoder import encoder_apply
from vitiq.ops.metrics import label_smoothed_cross_entropy
from vitiq.train.loop import make_train_step
from vitiq.train.optim import TrainState, create_train_state, make_optimizer


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "step"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_head = (int(sys.argv[4]) if len(sys.argv) > 4 and sys.argv[4] != "-"
              else None)
    arm = sys.argv[5] if len(sys.argv) > 5 else "vit"

    cfg = ARM_CONFIGS[arm]("tpu")
    if variant == "step_nodrop":
        cfg = replace(cfg, drop_prob=0.0)
    if n_head is not None:  # d_head>=32 head variants
        cfg = replace(cfg, n_head=n_head)
    params = init_amc_params(jax.random.PRNGKey(0), cfg)
    fwd = make_forward(cfg)
    if cfg.arm == "vit":
        pre = lambda x: preprocess_batch_vit(
            x, FLAGSHIP_STATS, H=cfg.img_size_h, W=cfg.img_size_w)
    else:
        pre = lambda x: preprocess_batch_rawiq(x, FLAGSHIP_STATS)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, cfg.seq_length, 2)), jnp.float32)
    y = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(0)

    def timed_loop(call):
        call()  # compile + warm
        ts = []
        for _ in range(steps):
            t0 = time.perf_counter()
            call()
            ts.append(time.perf_counter() - t0)
        return ts

    if variant in ("step", "step_nodrop", "sgdstep", "noclip"):
        tcfg = TrainConfig(batch_size=B)
        if variant == "sgdstep":
            tx = optax.inject_hyperparams(optax.sgd)(
                learning_rate=tcfg.learning_rate)
        elif variant == "noclip":
            tx = optax.inject_hyperparams(
                lambda learning_rate: optax.adamw(
                    learning_rate, b1=0.9, b2=0.99,
                    weight_decay=tcfg.weight_decay)
            )(learning_rate=tcfg.learning_rate)
        else:
            tx = make_optimizer(tcfg)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32)) \
            if variant in ("sgdstep", "noclip") else \
            create_train_state(params, tcfg)
        step = make_train_step(fwd, tx, tcfg.label_smoothing, pre)
        state, m = step(state, x, y, rng)
        float(m["loss"])

        def call():
            nonlocal state
            state, m = step(state, x, y, rng)
            float(m["loss"])

        ts = timed_loop(call)
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

        v = [None]

        def call():
            v[0] = float(run(params, x + 1e-6))

        ts = timed_loop(call)
    elif variant in ("preonly", "preembed"):
        from vitiq.ops.numerics import policy_for

        policy = policy_for(cfg.numerics)
        if variant == "preonly":
            run = jax.jit(lambda xi: jnp.sum(pre(xi).astype(jnp.float32)))
        else:
            def pe(xi):
                # embedding + CLS + PE + pre-layer dropout, no encoder layers
                from vitiq.models import embeddings as emb

                src = pre(xi)
                if cfg.arm == "vit":
                    t = emb.patch_embed_2d_apply(
                        params["encoder"]["embedding"], src, cfg.patch_size,
                        policy)
                else:
                    t = emb.sequence_embed_apply(
                        params["encoder"]["embedding"], src,
                        cfg.embedding_type, cfg.segment_size, policy)
                if "cls_token" in params["encoder"]:
                    cls = jnp.broadcast_to(
                        params["encoder"]["cls_token"].astype(t.dtype),
                        (t.shape[0], 1, t.shape[2]))
                    t = jnp.concatenate([cls, t], axis=1)
                t = emb.add_positional_encoding(t, cfg.num_tokens)
                return jnp.sum(t.astype(jnp.float32))

            run = jax.jit(pe)
        float(run(x))

        def call():
            float(run(x + 1e-6))

        ts = timed_loop(call)
    else:
        raise SystemExit(f"unknown variant {variant}")

    p50 = float(np.median(ts))
    print(f"[{arm}:{variant}] B={B} p50 {p50 * 1e3:.2f} ms  "
          f"{B / p50:,.0f} frames/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
