"""Price the per-ref per-grid-step cost of a pallas_call (round 3av/3aw).

Hypothesis from the round-3at/3au floor arithmetic: the seg-64 mp train
step's 14.3 ms kernel-stubbed floor (~4.7 us/grid-step across 12 calls x
205 steps) is dominated by PER-REF DMA-descriptor work — the backward
call streams ~40 refs per grid step. If per-ref cost is material, the
round-4 mechanism is ref MERGING (fatter, fewer operands at identical
bytes), which — unlike DWPACK/LPC — adds zero resident VMEM.

Three kernels move IDENTICAL bytes per grid step over an identical grid;
only the operand count differs:
  many: NR input refs + NR output refs, each [G, Lp, W]
  mid:  NR/4 refs per side, each [G, Lp, 4W]
  fat:  1 ref per side, [G, Lp, NR*W]
Per-grid-step time vs ref count is the descriptor price.

Usage: python scripts/tpu_probe_refcost.py [batch=8192] [G=40] [NR=16]
"""
import sys
import time

import numpy as np

from vitiq.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LP, W = 16, 128


def make_call(nr_refs: int, width: int, batch: int, g: int):
    """nr_refs refs per side of shape [g, LP, width]; body = copy+1."""

    def kernel(*refs):
        ins, outs = refs[:nr_refs], refs[nr_refs:]
        for i in range(nr_refs):
            outs[i][:] = ins[i][:] + jnp.bfloat16(1.0)

    spec = pl.BlockSpec((g, LP, width), lambda b: (b, 0, 0))
    grid = batch // g

    def run(seed, *xs):
        # fold the perturbation seed in so queued iterations can't be reused.
        # Only the FIRST operand is perturbed: one XLA elementwise op in
        # EVERY arm, so the many-vs-fat delta isolates the pallas per-ref
        # price instead of confounding it with nr_refs-vs-1 XLA dispatch
        # counts (advisor round-3 finding).
        xs = (xs[0] + seed.astype(jnp.bfloat16),) + tuple(xs[1:])
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[spec] * nr_refs,
            out_specs=[spec] * nr_refs if nr_refs > 1 else spec,
            out_shape=(
                [jax.ShapeDtypeStruct((batch, LP, width), jnp.bfloat16)] * nr_refs
                if nr_refs > 1
                else jax.ShapeDtypeStruct((batch, LP, width), jnp.bfloat16)
            ),
        )(*xs)

    return run


def time_amortized(fn, args, inner=40, reps=5):
    run = jax.jit(fn)
    idx = [jnp.asarray(i, jnp.float32) for i in range(inner + 1)]
    out = run(idx[0], *args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    float(jnp.sum(first.astype(jnp.float32)))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(inner):
            out = run(idx[i + 1], *args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.sum(first.astype(jnp.float32)))
        times.append((time.perf_counter() - t0) / inner)
    return float(np.median(times))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    nr = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    # the 'mid' arm (nr//4 refs of width 4W) only moves identical bytes when
    # nr divides by 4, and the grid only tiles exactly when g divides batch
    assert nr % 4 == 0, f"NR must be a multiple of 4 (got {nr})"
    assert batch % g == 0, f"batch ({batch}) must be a multiple of G ({g})"
    grid = batch // g
    key = jax.random.PRNGKey(0)
    print(f"batch={batch} G={g} grid={grid} Lp={LP} W={W} "
          f"bytes/side/step={nr * g * LP * W * 2}")
    rows = []
    for tag, nrefs, width in (("many", nr, W), ("mid", nr // 4, 4 * W),
                              ("fat", 1, nr * W)):
        xs = tuple(
            jax.random.normal(jax.random.fold_in(key, i),
                              (batch, LP, width)).astype(jnp.bfloat16)
            for i in range(nrefs))
        fn = make_call(nrefs, width, batch, g)
        t = time_amortized(fn, xs)
        us_per_step = t / grid * 1e6
        rows.append((tag, 2 * nrefs, t * 1e3, us_per_step))
        print(f"{tag:5s} refs={2 * nrefs:3d}  {t * 1e3:8.3f} ms/call  "
              f"{us_per_step:7.3f} us/grid-step", flush=True)
    (t_many, t_fat) = rows[0][3], rows[2][3]
    dref = rows[0][1] - rows[2][1]
    print(f"per-ref per-grid-step price ~= {(t_many - t_fat) / dref * 1e3:.1f} ns"
          f" (many-vs-fat over {dref} refs)")


if __name__ == "__main__":
    main()
