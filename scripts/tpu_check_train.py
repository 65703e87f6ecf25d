#!/usr/bin/env python
"""On-TPU validation of the fused TRAINING layer (Pallas fwd + Pallas bwd).

Checks, on real hardware (things interpret mode cannot verify):
  1. forward parity vs the XLA reference layer (no dropout, bf16 tolerance)
  2. gradient parity vs XLA autodiff (no dropout)
  3. dropout: deterministic per seed, DIFFERENT across seeds (interpret-mode
     prng ignores seeds, so this is hardware-only)
  4. dropout gradient consistency: analytic directional derivative vs finite
     differences of the same-seed forward (proves the backward kernel
     regenerates the identical masks)
Usage: python scripts/tpu_check_train.py [batch] [seq_len]
seq_len defaults to 129 (flagship token count); pass 16 for the seg-64
mean-pool geometry (Lp=16 — the small-Lp regime where merged-dW and the
xpack train core are the interesting paths).
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

from vitiq.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
import jax.numpy as jnp
import numpy as np

from vitiq.models import layers as L
from vitiq.ops.numerics import TPU
from vitiq.ops.pallas.fused_layer_train import fused_train_layer_stack


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    Lx = int(sys.argv[2]) if len(sys.argv) > 2 else 129
    n_head = 8
    params = L.encoder_layer_init(jax.random.PRNGKey(0), 128, 512)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, Lx, 128)), jnp.bfloat16)
    tgt = jnp.asarray(rng.standard_normal((B, Lx, 128)), jnp.float32)

    def xla_layer(params, x):
        return L.encoder_layer_apply(params, x, n_head=n_head, drop_prob=0.0,
                                     rng=None, train=False, policy=TPU)

    # 1. forward parity (no dropout)
    fused = jax.jit(lambda p, x: fused_train_layer_stack(x, [p], n_head, 0.0, 7))
    ref = jax.jit(xla_layer)
    a = np.asarray(fused(params, x), np.float32)
    b = np.asarray(ref(params, x), np.float32)
    err = np.abs(a - b).max()
    print(f"forward max err vs XLA: {err:.4f}", flush=True)
    assert err < 0.15, "fwd diverges"

    # 2. gradient parity (no dropout)
    def loss_fused(p, x):
        y = fused_train_layer_stack(x, [p], n_head, 0.0, 7)
        return jnp.mean((y.astype(jnp.float32) - tgt) ** 2)

    def loss_ref(p, x):
        y = xla_layer(p, x)
        return jnp.mean((y.astype(jnp.float32) - tgt) ** 2)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(params, x)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(params, x)
    # both sides are bf16 computations (each its own rounding of the true f32
    # gradient — exactness is proven in f32 interpret mode by
    # tests/test_fused_train_layer.py); on hardware compare DIRECTION
    # (cosine) and relative Frobenius error per tensor
    flat_f = jax.tree_util.tree_leaves_with_path(gf[0]) + [(("x",), gf[1])]
    flat_r = jax.tree_util.tree_leaves(gr[0]) + [gr[1]]
    all_a = np.concatenate([np.asarray(a_, np.float32).ravel()
                            for _, a_ in flat_f])
    all_b = np.concatenate([np.asarray(b_, np.float32).ravel()
                            for b_ in flat_r])
    gnorm = np.linalg.norm(all_b)
    gcos = float(np.dot(all_a, all_b) /
                 (np.linalg.norm(all_a) * gnorm + 1e-30))
    grel = float(np.linalg.norm(all_a - all_b) / gnorm)
    worst_cos, worst_rel = 1.0, 0.0
    for (path, a_), b_ in zip(flat_f, flat_r):
        a_ = np.asarray(a_, np.float32).ravel()
        b_ = np.asarray(b_, np.float32).ravel()
        nb = np.linalg.norm(b_)
        # near-zero-norm tensors (e.g. w_k.bias: softmax-grad rows sum to 0,
        # so its true gradient is a cancelling residual) are bf16 noise in
        # BOTH implementations — judge them by the global picture instead
        if nb < 1e-3 * gnorm:
            continue
        rel = float(np.linalg.norm(a_ - b_) / nb)
        cos = float(np.dot(a_, b_) / (np.linalg.norm(a_) * nb + 1e-30))
        if rel > 0.05 or cos < 0.999:
            print(f"  {path}: cos {cos:.4f} rel {rel:.4f} (norm {nb:.2e})",
                  flush=True)
        worst_rel = max(worst_rel, rel)
        worst_cos = min(worst_cos, cos)
    print(f"grad vs XLA autodiff: GLOBAL cosine {gcos:.5f} rel {grel:.4f}; "
          f"worst significant tensor: cosine {worst_cos:.5f}, "
          f"rel-Frobenius {worst_rel:.4f}", flush=True)
    assert gcos > 0.999 and grel < 0.05, "global gradient diverges"
    assert worst_cos > 0.995 and worst_rel < 0.1, "a significant tensor diverges"

    # 3. dropout determinism + seed sensitivity (hardware prng)
    f = jax.jit(lambda p, x, s: fused_train_layer_stack(x, [p], n_head, 0.3, s))
    d1 = np.asarray(f(params, x, 11), np.float32)
    d1b = np.asarray(f(params, x, 11), np.float32)
    d2 = np.asarray(f(params, x, 12), np.float32)
    assert np.array_equal(d1, d1b), "same-seed dropout not deterministic"
    assert not np.allclose(d1, d2), "different seeds produced identical masks"
    print("dropout: deterministic per seed, seed-sensitive OK", flush=True)

    # 4. dropout grad consistency (fwd/bwd regenerate the same masks)
    def loss_drop(x):
        y = fused_train_layer_stack(x, [params], n_head, 0.25, 21)
        return jnp.sum((y.astype(jnp.float32) - tgt) ** 2)

    # single-coordinate finite differences with a resolvable step: a
    # distributed direction vector perturbs each element by ~1e-4, which
    # vanishes in bf16 rounding of x (measured: analytic ~0 vs FD noise).
    # The FD pass runs the kernel in f32: its purpose is to prove the bwd
    # kernel REGENERATES the fwd's hardware masks, and bf16 FD is too noisy
    # for that at small L (measured interpret-mode bisect: bf16 rel err
    # 0.13-1.05 at L=16 while f32 is 0.03-0.05 with the SAME masks —
    # the bf16 failures are rounding, not inconsistency).
    xf = x.astype(jnp.float32)
    g = jax.jit(jax.grad(loss_drop))(xf)
    eps = 0.25
    loss_j = jax.jit(loss_drop)
    ok = 0
    coords = [(0, 0, 5), (1, 7, 64), (min(3, B - 1), min(100, Lx - 1), 17)]
    for c in coords:
        e = jnp.zeros_like(xf).at[c].set(eps)
        fd = (float(loss_j(xf + e)) - float(loss_j(xf - e))) / (2 * eps)
        an = float(g[c])
        rel = abs(an - fd) / max(abs(fd), abs(an), 1e-6)
        print(f"dropout grad @ {c}: analytic {an:.5f} vs FD {fd:.5f} "
              f"(rel err {rel:.3f})", flush=True)
        ok += rel < 0.25
    assert ok >= 2, "dropout bwd masks inconsistent with fwd"
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
