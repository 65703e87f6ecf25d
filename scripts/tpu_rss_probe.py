#!/usr/bin/env python
"""Bisect the streaming-train RSS leak on the remote-relay TPU backend.

Hypothesis (stream_train_demo round-3 follow-up): fit() retains the per-step
loss/accuracy DEVICE HANDLES for the whole epoch; through the remote relay
each retained output handle pins its call's serialized argument buffers
(~2 MB per batch-256 step), so RSS grows ~linearly with steps even though
the dispatch FIFO is drained — 3800 steps x 2 MB ~= the 7.5 GB measured
over an 8 GB corpus.

Modes:
  keep  — append metrics["loss"] handles to a list (fit()'s behavior)
  drop  — float() immediately, keep no handles
  fold  — running device-scalar sum (drops old handles each step)
  dput  — explicit jax.device_put then step (fit's actual feed shape)
  del   — dput + explicit .delete() on the device batch after the step
          (tests whether the relay frees on explicit delete vs GC)
  reuse — transfer ONE device batch up front, reuse every step
          (no per-step host->device transfer; isolates the transfer path)
  host  — generate fresh numpy batches but never touch JAX in the loop
          (control: is the growth malloc churn rather than the relay?)

Round-3 measured verdict (/tmp/rss_*.log, 400 steps, batch 256 = 2.1 MB):
keep/drop/fold/dput ALL leak ~2.3 MB/step; reuse is FLAT at 0.42 GB.
=> the leak is per host->device transfer in the relay client, independent
of handle retention — fit()'s metric accumulation is exonerated.

Usage: python -u scripts/tpu_rss_probe.py {keep,drop,fold} [steps] [batch]
Prints RSS every 50 steps; a leak shows as monotone growth in `keep` only.
"""
import pathlib
import resource
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 / 1024


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "keep"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    if mode == "host":
        # pure-host control: fresh numpy batches, no JAX in the loop
        host = np.random.default_rng(0)
        sink = 0.0
        t0 = time.perf_counter()
        print(f"mode=host steps={steps} batch={batch} rss0={rss_gb():.2f} GB",
              flush=True)
        for i in range(steps):
            x = host.standard_normal((batch, 1024, 2)).astype(np.float32)
            y = host.integers(0, 19, batch).astype(np.int32)
            sink += float(x[0, 0, 0]) + float(y[0])
            if (i + 1) % 50 == 0:
                print(f"step {i + 1:5d}  rss {rss_gb():.2f} GB  "
                      f"{(time.perf_counter() - t0) / (i + 1) * 1e3:.1f} ms/step",
                      flush=True)
        print(f"sink {sink:.3f}\nPEAK RSS {rss_gb():.2f} GB", flush=True)
        return 0

    import jax
    import jax.numpy as jnp

    from vitiq.bench import FLAGSHIP_STATS, flagship_vit_config
    from vitiq.config import TrainConfig
    from vitiq.dsp import preprocess_batch_vit
    from vitiq.models import init_amc_params, make_forward
    from vitiq.train.loop import make_train_step
    from vitiq.train.optim import create_train_state, make_optimizer
    from vitiq.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    cfg = flagship_vit_config("tpu")
    params = init_amc_params(jax.random.PRNGKey(0), cfg)
    fwd = make_forward(cfg)
    pre = lambda x: preprocess_batch_vit(x, FLAGSHIP_STATS)  # noqa: E731
    tcfg = TrainConfig(batch_size=batch)
    tx = make_optimizer(tcfg)
    state = create_train_state(params, tcfg)
    train_step = make_train_step(fwd, tx, tcfg.label_smoothing, pre)
    rng = jax.random.PRNGKey(1)

    host = np.random.default_rng(0)
    # fresh host batch each step, like the streaming feed (no reuse)
    def batch_pair():
        x = host.standard_normal((batch, 1024, 2)).astype(np.float32)
        y = host.integers(0, cfg.num_classes, batch).astype(np.int32)
        return x, y

    losses = []
    acc = jnp.float32(0)
    dx = dy = None
    if mode == "reuse":
        bx, by = batch_pair()
        dx, dy = jax.device_put(bx), jax.device_put(by)
    t0 = time.perf_counter()
    print(f"mode={mode} steps={steps} batch={batch} rss0={rss_gb():.2f} GB",
          flush=True)
    for i in range(steps):
        if mode == "reuse":
            state, metrics = train_step(state, dx, dy, rng)
            losses.append(float(metrics["loss"]))
        elif mode == "dput":
            bx, by = batch_pair()
            dx, dy = jax.device_put(bx), jax.device_put(by)
            state, metrics = train_step(state, dx, dy, rng)
            del dx, dy
            losses.append(float(metrics["loss"]))
        elif mode == "del":
            bx, by = batch_pair()
            dx, dy = jax.device_put(bx), jax.device_put(by)
            state, metrics = train_step(state, dx, dy, rng)
            losses.append(float(metrics["loss"]))  # sync before delete
            dx.delete()
            dy.delete()
        else:
            bx, by = batch_pair()
            state, metrics = train_step(state, bx, by, rng)
            if mode == "keep":
                losses.append(metrics["loss"])
            elif mode == "drop":
                losses.append(float(metrics["loss"]))
            else:  # fold
                acc = acc + metrics["loss"]
        if (i + 1) % 64 == 0:
            # fit()'s dispatch drain
            float(metrics["loss"])
        if (i + 1) % 50 == 0:
            print(f"step {i + 1:5d}  rss {rss_gb():.2f} GB  "
                  f"{(time.perf_counter() - t0) / (i + 1) * 1e3:.1f} ms/step",
                  flush=True)
    if mode == "keep":
        print("final loss", float(jnp.mean(jnp.stack(losses))))
    elif mode == "fold":
        print("final loss-sum", float(acc))
    elif losses:
        print("final loss", losses[-1])
    print(f"PEAK RSS {rss_gb():.2f} GB", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
